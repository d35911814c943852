"""Dataset of observation files (reference: torbi/data/dataset.py)."""
import torbi_tpu
from ..utils import io


class Dataset:

    def __init__(self, input_files):
        self.input_files = list(input_files)

    def __getitem__(self, index):
        """Retrieve the indexth item"""
        input_file = self.input_files[index]

        observation = io.load(input_file)

        # Maybe chunk observations (reference dataset.py:19-25)
        if torbi_tpu.MIN_CHUNK_SIZE is not None:
            observation = torbi_tpu.chunk(observation)

        return observation, input_file

    def __len__(self):
        """Length of the dataset"""
        return len(self.input_files)
