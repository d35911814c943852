"""Accuracy + speed evaluation over pitch posteriorgram corpora.

Capability parity with the reference harness
(/root/reference/torbi/evaluate/core.py): decode every partition stem with
this framework and with the librosa ground truth (run once, cached on
disk), score RPA agreement at the configured bin thresholds, and report
decoding speed as a real-time factor and timesteps/second. Structure is our
own: per-dataset work is a pipeline of small steps (stem resolution ->
target generation -> decode -> scoring -> speed), each a function below,
and the decode backend is configurable (``EVAL_BACKEND``) so approximate
modes like 'lse' can be scored on real corpora with the same machinery.
"""
import json

import numpy as np

import torbi_tpu
from ..models import pitch
from ..utils import io, time
from ..utils.notify import notify_on_finish


def _transition_file():
    """The band-diagonal pitch transition matrix, built from the penn
    constants inlined in models/pitch.py (reference evaluate/core.py:23-34
    imports penn instead) and cached as a persistent artifact."""
    path = torbi_tpu.PITCH_TRANSITION_MATRIX
    if not path.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
        io.save(pitch.transition_matrix(), path)
    return path


def _stems(dataset):
    with open(torbi_tpu.PARTITION_DIR / f'{dataset}.json') as file:
        return json.load(file)


def _process_shard(stems, input_files):
    """This host process's share of (stems, input_files). Multi-host pods
    decode disjoint shards, balanced by probed file lengths (LPT) so the
    heavy-tailed speech corpus does not straggle one host; single-process
    runs keep everything."""
    import jax

    if jax.process_count() == 1:
        return stems, input_files
    from ..parallel.files import shard_files_balanced

    return shard_files_balanced(input_files, stems)[::-1]


def _aggregate_metrics(metrics):
    """Sum each RPA's (total, count) across host processes over DCN;
    no-op in single-process runs."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    local = np.array(
        [[rpa.total, rpa.count] for rpa in metrics.rpas], np.float64)
    summed = np.asarray(
        multihost_utils.process_allgather(local)).sum(axis=0)
    for rpa, (total, count) in zip(metrics.rpas, summed):
        rpa.total = float(total)
        rpa.count = int(count)


def _union_keys(keys):
    """Agree on the union of string keys across host processes.

    Hosts can legitimately hold different timing contexts (e.g. one host's
    librosa targets are already cached on disk, so it never enters the
    'librosa' context); gathering positionally from each host's local
    sorted keys would misalign. Exchange the key sets first: each host
    contributes its JSON-encoded key list padded to the pod-wide maximum
    byte length, and every host decodes the union.
    """
    from jax.experimental import multihost_utils

    encoded = np.frombuffer(
        json.dumps(sorted(keys)).encode(), dtype=np.uint8)
    lengths = np.asarray(multihost_utils.process_allgather(
        np.array([encoded.size], np.int32)))
    padded = np.zeros(int(lengths.max()), np.uint8)
    padded[:encoded.size] = encoded
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    union = set()
    for row, length in zip(gathered.reshape(lengths.size, -1),
                           lengths.ravel()):
        union.update(json.loads(row[:int(length)].tobytes().decode()))
    return sorted(union)


def _aggregate_seconds(timings):
    """Pod wall time per context: the slowest host bounds the pod, so
    aggregate with max; contexts missing on a host contribute nothing."""
    import jax

    if jax.process_count() == 1:
        return timings
    from jax.experimental import multihost_utils

    keys = _union_keys(timings)
    local = np.array(
        [timings.get(key, 0.0) for key in keys], np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    return dict(zip(keys, gathered.max(axis=0)))


def _paths(dataset, subdir, stems):
    """Output paths under EVAL_DIR/<dataset>/<subdir>/, directories ready"""
    root = torbi_tpu.EVAL_DIR / dataset / subdir
    root.mkdir(parents=True, exist_ok=True)
    return [root / f'{stem}.pt' for stem in stems]


def _ensure_targets(dataset, stems, input_files, num_threads):
    """Decoded targets to score against.

    COMPARE_WITH_REFERENCE selects the librosa decoder (run at most once;
    existing outputs are reused so interrupted runs resume per file,
    reference evaluate/core.py:69-75). Otherwise the targets are this
    framework's own unchunked outputs -- turning the harness into a
    chunked-vs-unchunked self-consistency measurement.
    """
    if not torbi_tpu.COMPARE_WITH_REFERENCE:
        return _paths(dataset, 'torbi_tpu', stems)
    targets = _paths(dataset, 'reference', stems)
    missing = [
        (infile, outfile)
        for infile, outfile in zip(input_files, targets)
        if not outfile.exists()]
    if missing:
        torbi_tpu.reference.from_files_to_files(
            [pair[0] for pair in missing],
            [pair[1] for pair in missing],
            transition_file=_transition_file(),
            log_probs=True,
            num_threads=num_threads)
    return targets


def _score(output_files, target_files):
    metrics = torbi_tpu.evaluate.Metrics()
    for predicted_file, target_file in zip(output_files, target_files):
        metrics.update(io.load(predicted_file), io.load(target_file))
    return metrics


def _speed(frames):
    """Real-time factor and timesteps/second per timing context.

    ``frames`` is the pod-wide frame count; per-context wall time is the
    max across host processes (the slowest host bounds the pod).
    """
    seconds = pitch.frames_to_seconds(frames)
    timings = _aggregate_seconds(time.results())
    return (
        {key: float(seconds / value) for key, value in timings.items()},
        {key: float(frames / value) for key, value in timings.items()})


def _evaluate_dataset(dataset, gpu, num_threads):
    time.reset()
    stems = _stems(dataset)
    input_files = [
        torbi_tpu.CACHE_DIR / dataset / f'{stem}.pt' for stem in stems]
    stems, input_files = _process_shard(stems, input_files)

    target_files = _ensure_targets(dataset, stems, input_files, num_threads)

    output_files = _paths(dataset, torbi_tpu.CONFIG, stems)
    torbi_tpu.from_files_to_files(
        input_files,
        output_files,
        transition_file=_transition_file(),
        log_probs=True,
        gpu=gpu,
        num_threads=num_threads,
        backend=getattr(torbi_tpu, 'EVAL_BACKEND', None))

    metrics = _score(output_files, target_files)
    _aggregate_metrics(metrics)
    rtf, timesteps_per_second = _speed(metrics.rpas[0].count)
    return metrics() | {
        'frames': metrics.rpas[0].count,
        'rtf': rtf,
        'timesteps_per_second': timesteps_per_second,
    }


@notify_on_finish('evaluate')
def datasets(datasets=None, gpu=None, num_threads=1):
    """Evaluate Viterbi decoding over the configured corpora; writes
    EVAL_DIR/<CONFIG>.json and returns the results dict."""
    if datasets is None:
        datasets = torbi_tpu.DATASETS

    results = {
        dataset: _evaluate_dataset(dataset, gpu, num_threads)
        for dataset in datasets}

    # One writer on multi-host pods; every process returns the aggregated
    # results
    import jax
    if jax.process_index() == 0:
        torbi_tpu.EVAL_DIR.mkdir(parents=True, exist_ok=True)
        with open(
                torbi_tpu.EVAL_DIR / f'{torbi_tpu.CONFIG}.json',
                'w') as file:
            json.dump(results, file)
    return results
