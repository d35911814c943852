"""Batch collation and chunk re-joining (reference: torbi/data/collate.py)."""
import numpy as np


def collate(batch):
    """Collate (observation, input_file) items into a padded batch.

    Chunked items (lists of arrays) are flattened into extra batch rows with
    per-file chunk counts recorded in batch_chunks (reference collate.py:9-33).
    """
    observations, input_files = zip(*batch)

    # Handle chunking
    if isinstance(observations[0], list):
        batch_chunks = [len(obs) for obs in observations]
        observations = sum(observations, [])
    else:
        batch_chunks = [1] * len(observations)
    batch_frames = np.array(
        [obs.shape[0] for obs in observations], dtype=np.int32)

    size = len(observations)
    if size == 0:
        raise ValueError('batch must contain at least 1 item')

    max_frames = max(obs.shape[0] for obs in observations)

    observation = np.zeros(
        (size, max_frames, observations[0].shape[-1]),
        dtype=np.asarray(observations[0]).dtype)
    for i, obs in enumerate(observations):
        observation[i, :obs.shape[0]] = obs

    return observation, batch_frames, batch_chunks, input_files


def separate(indices, batch_chunks, batch_frames):
    """Re-concatenate decoded chunk rows into per-file sequences"""
    indices = np.asarray(indices)
    batch_frames = np.asarray(batch_frames)
    start = 0
    separated = []
    for chunks in batch_chunks:
        frames = batch_frames[start:start + chunks]
        separated.append(
            np.concatenate([
                indices[start + i, :frames[i]] for i in range(chunks)]))
        start += chunks
    return separated
