"""End-to-end evaluation harness test over a synthetic dataset.

Mirrors the reference's real correctness check (SURVEY.md section 4): the
librosa-style reference decoder is the oracle and RPA@0 between the
framework's decode and the reference acts as an exact-path agreement test
(reference torbi/evaluate/core.py:105-112), here over synthetic peaked
pitch posteriorgrams instead of the downloaded daps/vctk caches.
"""
import json

import numpy as np
import pytest
import torch

import torbi_tpu


def _synthetic_posteriorgram(rng, frames, states=1440):
    """Peaked log-space posteriorgram like preprocessed pitch data.

    The pitch trajectory is a bounded random walk: real pitch never
    teleports across the transition band, and a wrapped (mod states) walk
    would legitimately decode differently under the reference's
    log(p + tiny) transition floor than under librosa's exact-zero
    probability space.
    """
    tiny = np.finfo(np.float32).tiny
    centers = np.clip(
        np.cumsum(rng.integers(-3, 4, size=frames)) + states // 2,
        0, states - 1)
    bins = np.arange(states, dtype=np.float32)[None, :]
    dist = np.abs(bins - centers[:, None].astype(np.float32))
    logits = -0.5 * (dist / 2.0) ** 2
    obs = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
    return np.log(np.exp(obs.astype(np.float32)) + tiny)


def test_evaluate_datasets_synthetic(tmp_path, monkeypatch):
    dataset = 'synth'
    rng = np.random.default_rng(0)

    # Build a synthetic preprocessed cache + partition
    cache = tmp_path / 'cache' / dataset
    cache.mkdir(parents=True)
    stems = []
    for i, frames in enumerate((8, 12, 10)):
        stem = f'{i:06d}'
        stems.append(stem)
        torch.save(
            torch.from_numpy(_synthetic_posteriorgram(rng, frames)),
            cache / f'{stem}.pt')
    partition_dir = tmp_path / 'partitions'
    partition_dir.mkdir()
    with open(partition_dir / f'{dataset}.json', 'w') as file:
        json.dump(stems, file)

    monkeypatch.setattr(torbi_tpu, 'CACHE_DIR', tmp_path / 'cache')
    monkeypatch.setattr(torbi_tpu, 'EVAL_DIR', tmp_path / 'eval')
    monkeypatch.setattr(torbi_tpu, 'PARTITION_DIR', partition_dir)
    monkeypatch.setattr(
        torbi_tpu, 'PITCH_TRANSITION_MATRIX',
        tmp_path / 'stats' / 'transition.pt')

    results = torbi_tpu.evaluate.datasets([dataset], num_threads=1)

    assert dataset in results
    entry = results[dataset]
    # Exact path agreement with the reference decoder on peaked data
    assert entry['rpa']['0'] == pytest.approx(1.0)
    assert entry['rpa']['1'] == pytest.approx(1.0)
    assert 'torbi' in entry['rtf']
    assert 'librosa' in entry['rtf']
    assert entry['timesteps_per_second']['torbi'] > 0

    # Results JSON written (reference evaluate/core.py:121-123)
    assert (tmp_path / 'eval' / f'{torbi_tpu.CONFIG}.json').exists()

    # Idempotent resume: reference outputs cached, second run skips the
    # reference pass (reference evaluate/core.py:69-75)
    results2 = torbi_tpu.evaluate.datasets([dataset], num_threads=1)
    assert results2[dataset]['rpa']['0'] == pytest.approx(1.0)


def test_evaluate_chunked_self_consistency(tmp_path, monkeypatch):
    """COMPARE_WITH_REFERENCE=False scores chunked decoding against this
    framework's own unchunked output (reference evaluate/core.py:77-82) --
    entropy chunking on near-deterministic stretches should preserve the
    decoded path"""
    dataset = 'synth'
    rng = np.random.default_rng(5)

    cache = tmp_path / 'cache' / dataset
    cache.mkdir(parents=True)
    stems = []
    for i in range(2):
        stem = f'{i:06d}'
        stems.append(stem)
        torch.save(
            torch.from_numpy(_synthetic_posteriorgram(rng, 48)),
            cache / f'{stem}.pt')
    partition_dir = tmp_path / 'partitions'
    partition_dir.mkdir()
    with open(partition_dir / f'{dataset}.json', 'w') as file:
        json.dump(stems, file)

    monkeypatch.setattr(torbi_tpu, 'CACHE_DIR', tmp_path / 'cache')
    monkeypatch.setattr(torbi_tpu, 'EVAL_DIR', tmp_path / 'eval')
    monkeypatch.setattr(torbi_tpu, 'PARTITION_DIR', partition_dir)
    monkeypatch.setattr(
        torbi_tpu, 'PITCH_TRANSITION_MATRIX',
        tmp_path / 'stats' / 'transition.pt')

    # Pass 1: unchunked decode under the default CONFIG produces the
    # self-comparison baseline under eval/<dataset>/torbi_tpu/
    monkeypatch.setattr(torbi_tpu, 'CONFIG', 'torbi_tpu')
    monkeypatch.setattr(torbi_tpu, 'COMPARE_WITH_REFERENCE', False)
    torbi_tpu.evaluate.datasets([dataset], num_threads=1)

    # Pass 2: chunked decode under a different CONFIG, scored against it
    monkeypatch.setattr(torbi_tpu, 'CONFIG', 'chunked')
    monkeypatch.setattr(torbi_tpu, 'MIN_CHUNK_SIZE', 16)
    results = torbi_tpu.evaluate.datasets([dataset], num_threads=1)

    # Peaked synthetic data decodes identically with and without chunking
    assert results[dataset]['rpa']['0'] == pytest.approx(1.0)
