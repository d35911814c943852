"""Chunked Viterbi decoding: batch-process long sequences.

Semantics match the reference (/root/reference/torbi/chunk.py): sequences are
split at pairs of adjacent low-entropy frames (where decoding is locally
near-deterministic, so severing the trellis rarely changes the global path),
with chunks at least ``MIN_CHUNK_SIZE`` frames apart. Chunks become extra
batch items (converting sequence length into batch parallelism) and are
re-joined by ``data.separate``.
"""
from typing import List

import numpy as np

import torbi_tpu


def chunk(
    observation,
    min_chunk_size: int = None,
    entropy_threshold: float = None,
) -> List:
    """Chunk observations based on points of low entropy

    Arguments
        observation
            Time-varying categorical distribution in log space
            shape=(frames, states)
        min_chunk_size
            Minimum chunk size in frames
        entropy_threshold
            Threshold for entropy to allow splitting

    Returns
        chunks
            List of chunked sequence data
    """
    observation = np.asarray(observation)
    start = 0
    chunks = []

    for split_point in split(
        observation,
        min_chunk_size=min_chunk_size,
        entropy_threshold=entropy_threshold,
    ):
        chunks.append(observation[start:split_point])
        start = split_point

    # Last chunk
    chunks.append(observation[start:])

    return chunks


###############################################################################
# Utilities
###############################################################################


def split(
    observation,
    min_chunk_size=None,
    entropy_threshold=None,
) -> List[int]:
    """Find split points of minimum entropy"""
    if min_chunk_size is None:
        min_chunk_size = torbi_tpu.MIN_CHUNK_SIZE
    if entropy_threshold is None:
        entropy_threshold = torbi_tpu.ENTROPY_THRESHOLD
    observation = np.asarray(observation).T  # (states, frames)

    # Find low-entropy time frames
    candidates = entropy(observation) < entropy_threshold

    # Split at pairs of adjacent low-entropy frames >= min_chunk_size apart
    # (reference chunk.py:57-78)
    split_points = []
    i = min_chunk_size
    while i < observation.shape[-1]:
        if candidates[i] and candidates[i - 1]:
            split_points.append(i)
            i += min_chunk_size
        else:
            i += 1

    return split_points


def entropy(observation):
    """Framewise normalized entropy of log-space categorical distributions

    observation: (states, frames). Returns (frames,).
    """
    observation = np.asarray(observation)
    return -(
        (np.exp(observation) * observation).sum(axis=0)
        / np.log(observation.shape[0]))
