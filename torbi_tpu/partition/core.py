"""Evaluation partitions.

Each dataset's partition is the seeded random sample of preprocessed stems
that the evaluation harness decodes (capped at ``EVALUATION_SAMPLES``). The
sampling procedure is output-compatible with the reference
(torbi/partition/core.py:12-33) -- ``random.seed`` + ``random.shuffle`` with
the configured seed -- so regenerated partition files are interchangeable
with the ones shipped under ``assets/partitions``.
"""
import json
import random

import torbi_tpu


def _audio_stems(dataset):
    """Relative speaker/utterance stems of a dataset's audio cache"""
    root = torbi_tpu.CACHE_DIR / dataset
    return [
        f'{wav.parent.name}/{wav.stem}' for wav in root.rglob('*.wav')]


def _sample(stems):
    """Seeded shuffle, truncated to the evaluation budget"""
    random.seed(torbi_tpu.RANDOM_SEED)
    random.shuffle(stems)
    del stems[torbi_tpu.EVALUATION_SAMPLES:]
    return stems


def _write(dataset, stems):
    path = torbi_tpu.PARTITION_DIR / f'{dataset}.json'
    path.parent.mkdir(exist_ok=True, parents=True)
    with open(path, 'w') as file:
        json.dump(stems, file, indent=4)


def datasets(datasets=None):
    """Create and save evaluation partitions for the given datasets"""
    for dataset in datasets if datasets is not None else torbi_tpu.DATASETS:
        _write(dataset, _sample(_audio_stems(dataset)))
