"""Evaluation harness (reference: torbi/evaluate/core.py).

Per dataset: run the librosa reference decoder once (cached on disk), run the
TPU decoder over the same files, compute RPA agreement at the configured
thresholds, and report speed as real-time factor (seconds of audio decoded
per second of wall time) plus timesteps/second.
"""
import json

import numpy as np

import torbi_tpu
from ..models import pitch
from ..utils import io, time


def datasets(datasets=None, gpu=None, num_threads=1):
    """Evaluate Viterbi decoding methods"""
    if datasets is None:
        datasets = torbi_tpu.DATASETS

    # Cache transition matrix (reference evaluate/core.py:23-34; constants
    # inlined in models/pitch.py so penn itself is not required)
    if not torbi_tpu.PITCH_TRANSITION_MATRIX.exists():
        torbi_tpu.PITCH_TRANSITION_MATRIX.parent.mkdir(
            parents=True, exist_ok=True)
        io.save(
            pitch.transition_matrix(), torbi_tpu.PITCH_TRANSITION_MATRIX)

    results = {}
    for dataset in datasets:

        # Reset benchmarking
        time.reset()

        # Get evaluation stems
        with open(torbi_tpu.PARTITION_DIR / f'{dataset}.json') as file:
            stems = json.load(file)

        # Get input files
        input_files = [
            torbi_tpu.CACHE_DIR / dataset / f'{stem}.pt' for stem in stems]

        transition_file = torbi_tpu.PITCH_TRANSITION_MATRIX

        # Get location of reference outputs
        if torbi_tpu.COMPARE_WITH_REFERENCE:
            reference_files = [
                torbi_tpu.EVAL_DIR / dataset / 'reference' / f'{stem}.pt'
                for stem in stems]
            (torbi_tpu.EVAL_DIR / dataset / 'reference').mkdir(
                parents=True, exist_ok=True)
            for file in reference_files:
                file.parent.mkdir(exist_ok=True)

            # Run reference implementation if we haven't yet (idempotent
            # skip-if-exists, reference evaluate/core.py:69-75)
            if not all(file.exists() for file in reference_files):
                torbi_tpu.reference.from_files_to_files(
                    input_files,
                    reference_files,
                    transition_file=transition_file,
                    log_probs=True,
                    num_threads=num_threads)
        else:
            # Compare with non-chunked torbi_tpu output
            reference_files = [
                torbi_tpu.EVAL_DIR / dataset / 'torbi_tpu' / f'{stem}.pt'
                for stem in stems]

        # Get location to save output
        output_files = [
            torbi_tpu.EVAL_DIR / dataset / torbi_tpu.CONFIG / f'{stem}.pt'
            for stem in stems]
        (torbi_tpu.EVAL_DIR / dataset / torbi_tpu.CONFIG).mkdir(
            parents=True, exist_ok=True)
        for file in output_files:
            file.parent.mkdir(exist_ok=True)

        # Run Viterbi decoding
        torbi_tpu.from_files_to_files(
            input_files,
            output_files,
            transition_file=transition_file,
            log_probs=True,
            gpu=gpu,
            num_threads=num_threads)

        # Evaluate
        metrics = torbi_tpu.evaluate.Metrics()
        for predicted_file, target_file in zip(
                output_files, reference_files):
            predicted = io.load(predicted_file)
            target = io.load(target_file)
            metrics.update(predicted, target)

        # Speed as real-time factor and timesteps decoded per second
        frames = metrics.rpas[0].count
        seconds = pitch.frames_to_seconds(frames)
        timings = time.results()
        rtf = {key: seconds / value for key, value in timings.items()}
        timesteps_per_second = {
            key: frames / value for key, value in timings.items()}

        results[dataset] = metrics() | {
            'rtf': rtf,
            'timesteps_per_second': timesteps_per_second,
        }

    torbi_tpu.EVAL_DIR.mkdir(parents=True, exist_ok=True)
    with open(torbi_tpu.EVAL_DIR / f'{torbi_tpu.CONFIG}.json', 'w') as file:
        json.dump(results, file)
    return results
