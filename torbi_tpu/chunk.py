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
    """Split one (frames, states) log-space observation into a list of
    sub-arrays at low-entropy points (see ``split``), each at least
    ``min_chunk_size`` frames except possibly the last. Same split
    boundaries as the reference chunker (/root/reference/torbi/chunk.py).
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
    """Find split points: pairs of adjacent low-entropy frames at least
    ``min_chunk_size`` apart (same boundaries as the reference's frame-by-
    frame scan, reference chunk.py:57-78, computed by vectorized search --
    a python loop over a million-frame sequence is itself a bottleneck).
    """
    if min_chunk_size is None:
        min_chunk_size = torbi_tpu.MIN_CHUNK_SIZE
    if entropy_threshold is None:
        entropy_threshold = torbi_tpu.ENTROPY_THRESHOLD
    observation = np.asarray(observation).T  # (states, frames)
    return splits_from_entropy(
        entropy(observation), min_chunk_size, entropy_threshold)


def splits_from_entropy(
    entropy_values,
    min_chunk_size,
    entropy_threshold,
) -> List[int]:
    """Split points from precomputed framewise normalized entropy.

    Shared by ``split`` and the dispatcher's batch-1 auto-chunking (which
    computes the entropy on device): frames where both the frame and its
    predecessor fall below ``entropy_threshold``, greedily kept at least
    ``min_chunk_size`` apart.
    """
    entropy_values = np.asarray(entropy_values)
    frames = entropy_values.shape[0]
    candidates = entropy_values < entropy_threshold
    splittable = np.flatnonzero(candidates[1:] & candidates[:-1]) + 1

    # Greedy selection: each split is the first splittable frame at least
    # min_chunk_size after the previous one (frame 0 to start)
    split_points = []
    position = min_chunk_size
    while True:
        index = np.searchsorted(splittable, position)
        if index == len(splittable) or splittable[index] >= frames:
            return split_points
        point = int(splittable[index])
        split_points.append(point)
        position = point + min_chunk_size


def entropy(observation):
    """Framewise normalized entropy of log-space categorical distributions

    observation: (states, frames). Returns (frames,).
    """
    observation = np.asarray(observation)
    return -(
        (np.exp(observation) * observation).sum(axis=0)
        / np.log(observation.shape[0]))
