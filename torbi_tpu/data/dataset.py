"""Observation-file dataset.

Same item contract as the reference dataset (torbi/data/dataset.py:6-29):
each item is ``(observation, input_file)``, where the observation is either
one (frames, states) array or -- when entropy chunking is configured via
``MIN_CHUNK_SIZE`` -- a list of chunk arrays that the collate function
flattens into extra batch rows.
"""
import torbi_tpu
from ..utils import io


class Dataset:
    """Lazily-loaded sequence of observation files"""

    def __init__(self, input_files):
        self.input_files = list(input_files)

    def __len__(self):
        return len(self.input_files)

    def __getitem__(self, index):
        path = self.input_files[index]
        observation = io.load(path)
        if torbi_tpu.MIN_CHUNK_SIZE is None:
            return observation, path
        return torbi_tpu.chunk(observation), path
