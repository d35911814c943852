"""Tensor file IO.

The reference stores observations and decoded indices as torch ``.pt`` files
(/root/reference/torbi/core.py:466-473, data/dataset.py:18). For drop-in
compatibility we read and write ``.pt`` via torch (CPU) when available, and
additionally support ``.npy``.
"""
from pathlib import Path

import numpy as np


def load(file):
    """Load a tensor file as a numpy array"""
    file = Path(file)
    if file.suffix == '.npy':
        return np.load(file)
    import torch
    return torch.load(file, map_location='cpu', weights_only=False).numpy()


def save(array, file):
    """Save a numpy/jax array to a tensor file"""
    file = Path(file)
    array = np.asarray(array)
    if file.suffix == '.npy':
        np.save(file, array)
        return
    import torch
    torch.save(torch.from_numpy(np.ascontiguousarray(array)), file)
