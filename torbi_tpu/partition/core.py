"""Dataset partitioning (reference: torbi/partition/core.py)."""
import json
import random

import torbi_tpu


def datasets(datasets=None):
    """Partition datasets and save to disk"""
    if datasets is None:
        datasets = torbi_tpu.DATASETS
    for dataset in datasets:
        random.seed(torbi_tpu.RANDOM_SEED)

        # Get stems
        directory = torbi_tpu.CACHE_DIR / dataset
        stems = [
            f'{file.parent.name}/{file.stem}'
            for file in directory.rglob('*.wav')]

        # Shuffle
        random.shuffle(stems)

        # Slice
        stems = stems[:torbi_tpu.EVALUATION_SAMPLES]

        # Save to disk
        file = torbi_tpu.PARTITION_DIR / f'{dataset}.json'
        file.parent.mkdir(exist_ok=True, parents=True)
        with open(file, 'w') as file:
            json.dump(stems, file, indent=4)
