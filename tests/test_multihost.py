"""Two-process multi-host test over jax.distributed (CPU).

Validates the DCN scale-out story end-to-end (SURVEY.md section 2.4): two
host processes initialize jax.distributed against a local coordinator,
shard one file workload disjointly (length-aware), decode their shards, and
the union of outputs matches the single-process oracle exactly.
"""
import json
import socket
import subprocess
import sys

import numpy as np
import pytest
import torch

WORKER = r'''
import os, sys, json
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]))
import torbi_tpu
from torbi_tpu.parallel import files as pfiles

spec = json.load(open(sys.argv[3]))
pfiles.from_files_to_files(
    spec['inputs'], spec['outputs'],
    transition_file=spec['transition'], log_probs=True)
print('WORKER_DONE', jax.process_index(), flush=True)
'''


def _free_port():
    with socket.socket() as sock:
        sock.bind(('127.0.0.1', 0))
        return sock.getsockname()[1]


# Coordinator-setup failures are environmental (the probed free port can
# be stolen before worker 0 binds it, or the distributed handshake can
# time out on a loaded machine); retry those, never decode failures.
_COORD_ERRORS = (
    'ADDRINUSE', 'Failed to bind', 'DEADLINE_EXCEEDED', 'UNAVAILABLE',
    'coordinator', 'barrier timed out')


def _run_workers(worker_src, args, timeout=240, attempts=3):
    """Spawn the two-process pod; returns worker logs. Retries (with a
    fresh coordinator port) only when a failing worker's log names a
    coordinator/bind error."""
    for attempt in range(attempts):
        addr = f'127.0.0.1:{_free_port()}'
        procs = [
            subprocess.Popen(
                [sys.executable, '-c', worker_src, addr, str(pid)] + args,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True)
            for pid in range(2)]
        logs = [proc.communicate(timeout=timeout)[0] for proc in procs]
        failed = [log for proc, log in zip(procs, logs)
                  if proc.returncode != 0]
        if not failed:
            return logs
        if attempt == attempts - 1 or not any(
                err in log for log in failed for err in _COORD_ERRORS):
            for proc, log in zip(procs, logs):
                assert proc.returncode == 0, log[-3000:]


def test_two_process_file_sharding(tmp_path):
    rng = np.random.default_rng(21)
    tiny = np.finfo(np.float32).tiny
    states = 32

    inputs, outputs, expected = [], [], {}
    trans = rng.dirichlet(np.ones(states), size=states).astype(np.float32)
    tfile = tmp_path / 'trans.pt'
    torch.save(torch.from_numpy(trans), tfile)

    from torbi_tpu.ops import oracle
    for i in range(6):
        frames = int(rng.integers(4, 12))
        obs = np.log(
            rng.dirichlet(np.ones(states), size=frames).astype(np.float32)
            + tiny)
        path = tmp_path / f'{i}.pt'
        torch.save(torch.from_numpy(obs), path)
        inputs.append(str(path))
        outputs.append(str(tmp_path / f'{i}_out.pt'))
        # The CLI pipeline applies the epsilon to obs and log(p+tiny) to
        # the transition file
        obs_eps = np.log(np.exp(obs) + tiny)
        init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
        expected[outputs[-1]] = oracle.viterbi_numpy(
            obs_eps[None], np.array([frames], dtype=np.int32),
            np.log(trans + tiny), init)[0]

    spec = tmp_path / 'spec.json'
    with open(spec, 'w') as file:
        json.dump(
            {'inputs': inputs, 'outputs': outputs,
             'transition': str(tfile)}, file)

    logs = _run_workers(WORKER, [str(spec)])
    for log in logs:
        assert 'WORKER_DONE' in log

    # The union of the two shards covers every file, exactly once, and
    # matches the oracle
    for out in outputs:
        got = torch.load(out).numpy().ravel()
        np.testing.assert_array_equal(got, expected[out])


SHARD_WORKER = r'''
import os, sys, json
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]))
import torbi_tpu
from torbi_tpu.ops import dispatch
from torbi_tpu.parallel import files as pfiles

# The auto-shard mesh must use only THIS process's addressable devices:
# a global-device mesh would make jit raise (or misplace data) the moment
# a process-local batch is large enough to shard.
key = dispatch.resolve_mesh(
    None, torbi_tpu.BATCH_PAD_MULTIPLE * 2 * jax.local_device_count())
assert key is not None, 'auto-shard did not engage'
mesh = dispatch._mesh_registry[key]
local = {d.id for d in jax.local_devices()}
assert {d.id for d in mesh.devices.flat} <= local, (
    'auto mesh spans non-addressable devices')

spec = json.load(open(sys.argv[3]))
pfiles.from_files_to_files(
    spec['inputs'], spec['outputs'],
    transition_file=spec['transition'], log_probs=True)
print('WORKER_DONE', jax.process_index(), flush=True)
'''


def test_two_process_large_batch_auto_shard(tmp_path):
    """Pod-safety of the flagship auto-shard path: per-process file shards
    are big enough that decode() engages the sharded (shard_map) dispatch
    on each process's LOCAL 2-device mesh while process_count == 2.
    Results must still match the single-process oracle exactly."""
    rng = np.random.default_rng(77)
    tiny = np.finfo(np.float32).tiny
    states = 32

    trans = rng.dirichlet(np.ones(states), size=states).astype(np.float32)
    tfile = tmp_path / 'trans.pt'
    torch.save(torch.from_numpy(trans), tfile)

    from torbi_tpu.ops import oracle
    inputs, outputs, expected = [], [], {}
    # 40 files -> 20 per process shard -> a single loader batch of 20 rows
    # per process, >= 2 local devices * BATCH_PAD_MULTIPLE (8): the
    # sharded dispatch path fires on every process
    for i in range(40):
        frames = int(rng.integers(4, 12))
        obs = np.log(
            rng.dirichlet(np.ones(states), size=frames).astype(np.float32)
            + tiny)
        path = tmp_path / f'{i}.pt'
        torch.save(torch.from_numpy(obs), path)
        inputs.append(str(path))
        outputs.append(str(tmp_path / f'{i}_out.pt'))
        obs_eps = np.log(np.exp(obs) + tiny)
        init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
        expected[outputs[-1]] = oracle.viterbi_numpy(
            obs_eps[None], np.array([frames], dtype=np.int32),
            np.log(trans + tiny), init)[0]

    spec = tmp_path / 'spec.json'
    with open(spec, 'w') as file:
        json.dump(
            {'inputs': inputs, 'outputs': outputs,
             'transition': str(tfile)}, file)

    logs = _run_workers(SHARD_WORKER, [str(spec)])
    for log in logs:
        assert 'WORKER_DONE' in log

    for out in outputs:
        got = torch.load(out).numpy().ravel()
        np.testing.assert_array_equal(got, expected[out])


EVAL_WORKER = r'''
import os, sys, json
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]))
from pathlib import Path
import torbi_tpu

spec = json.load(open(sys.argv[3]))
torbi_tpu.CACHE_DIR = Path(spec['cache'])
torbi_tpu.EVAL_DIR = Path(spec['eval'])
torbi_tpu.PARTITION_DIR = Path(spec['partitions'])
torbi_tpu.PITCH_TRANSITION_MATRIX = Path(spec['transition'])
results = torbi_tpu.evaluate.datasets(['synth'], num_threads=1)
print('EVAL_RESULT', jax.process_index(),
      json.dumps(results['synth']), flush=True)
'''


def test_two_process_evaluate_aggregates_metrics(tmp_path):
    """The evaluation harness on a two-process 'pod': each process decodes
    a disjoint stem shard, RPA counts aggregate over the distributed
    backend, and both processes report the pod-wide result.

    Process 0's librosa reference outputs are pre-cached on disk, so it
    never enters the 'librosa' timing context while process 1 does -- the
    cross-host timing aggregation must agree on the key union instead of
    gathering positionally from asymmetric local key sets."""
    rng = np.random.default_rng(31)
    tiny = np.finfo(np.float32).tiny
    states, dataset = 1440, 'synth'

    cache = tmp_path / 'cache' / dataset
    cache.mkdir(parents=True)
    stems, total_frames, observations = [], 0, {}
    for i, frames in enumerate((8, 11, 9, 12)):
        stem = f'{i:06d}'
        stems.append(stem)
        total_frames += frames
        centers = np.clip(
            np.cumsum(rng.integers(-3, 4, size=frames)) + states // 2,
            0, states - 1)
        bins = np.arange(states, dtype=np.float32)[None, :]
        logits = -0.5 * (
            (bins - centers[:, None].astype(np.float32)) / 2.0) ** 2
        obs = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
        obs = np.log(np.exp(obs.astype(np.float32)) + tiny)
        observations[stem] = obs
        torch.save(torch.from_numpy(obs), cache / f'{stem}.pt')
    partitions = tmp_path / 'partitions'
    partitions.mkdir()
    with open(partitions / f'{dataset}.json', 'w') as file:
        json.dump(stems, file)

    # Pre-cache the reference outputs for process 0's shard (round-robin:
    # stems 0 and 2) with the oracle decode so that process skips the
    # librosa pass entirely -- asymmetric timing contexts across the pod
    from torbi_tpu.models import pitch
    from torbi_tpu.ops import oracle
    trans_log = np.log(pitch.transition_matrix() + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    refdir = tmp_path / 'eval' / dataset / 'reference'
    refdir.mkdir(parents=True)
    for stem in stems[0::2]:
        # Same epsilon pipeline as the decode path so the target is
        # bitwise torbi_tpu's own output for these stems
        obs = np.log(np.exp(observations[stem]) + tiny)
        decoded = oracle.viterbi_numpy(
            obs[None], np.array([len(obs)], dtype=np.int32),
            trans_log, init)[0]
        torch.save(torch.from_numpy(np.ascontiguousarray(decoded)),
                   refdir / f'{stem}.pt')

    spec = {
        'cache': str(tmp_path / 'cache'),
        'eval': str(tmp_path / 'eval'),
        'partitions': str(partitions),
        'transition': str(tmp_path / 'stats' / 'transition.pt'),
    }
    spec_file = tmp_path / 'spec.json'
    spec_file.write_text(json.dumps(spec))

    outputs = _run_workers(EVAL_WORKER, [str(spec_file)], timeout=900)

    parsed = []
    for output in outputs:
        line = [l for l in output.splitlines()
                if l.startswith('EVAL_RESULT')][0]
        parsed.append(json.loads(line.split(' ', 2)[2]))

    for entry in parsed:
        # Pod-wide aggregation: every process reports ALL frames
        assert entry['frames'] == total_frames, entry
        assert entry['rpa']['0'] == 1.0
    assert parsed[0]['rpa'] == parsed[1]['rpa']
