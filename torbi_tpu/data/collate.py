"""Batch collation and chunk re-joining.

Semantics match the reference collate (torbi/data/collate.py:9-45): chunked
items (one list of sub-arrays per file) flatten into extra batch rows whose
per-file counts are recorded so ``separate`` can stitch the decoded rows
back together, and observations zero-pad to the longest item with true
lengths in ``batch_frames``.
"""
import itertools

import numpy as np


def _flatten(observations):
    """Flatten per-file chunk lists into rows + per-file chunk counts"""
    if not isinstance(observations[0], list):
        return list(observations), [1] * len(observations)
    counts = [len(chunks) for chunks in observations]
    return list(itertools.chain.from_iterable(observations)), counts


def collate(batch, pad_value=float('-inf')):
    """Collate (observation, input_file) items into a padded batch.

    Returns (observation (rows, frames, states_padded), batch_frames
    (rows,) int32, batch_chunks per file, input_files). BOTH minor
    dimensions pad to pipeline-friendly sizes: frames to the decode bucket
    boundary, and states to a lane multiple (ops.dispatch.padded_states)
    filled with ``pad_value`` (-inf for log-space data, 0.0 for
    probabilities) -- unaligned minor dimensions force a device-side
    relayout on every host-to-device transfer.
    """
    from ..ops.dispatch import bucket_frames, padded_states

    observations, input_files = zip(*batch)
    rows, batch_chunks = _flatten(observations)
    if not rows:
        raise ValueError('batch must contain at least 1 item')

    lengths = np.array([row.shape[0] for row in rows], dtype=np.int32)
    states = rows[0].shape[-1]
    states_p = padded_states(states)
    padded = np.zeros(
        (len(rows), bucket_frames(int(lengths.max())), states_p),
        dtype=np.asarray(rows[0]).dtype)
    if states_p != states:
        padded[:, :, states:] = pad_value
    for row, out, n in zip(rows, padded, lengths):
        out[:n, :states] = row

    return padded, lengths, batch_chunks, input_files


def separate(indices, batch_chunks, batch_frames):
    """Re-concatenate decoded chunk rows into per-file sequences"""
    indices = np.asarray(indices)
    lengths = np.asarray(batch_frames)
    bounds = np.cumsum([0] + list(batch_chunks))
    return [
        np.concatenate([
            indices[row, :lengths[row]]
            for row in range(lo, hi)])
        for lo, hi in zip(bounds[:-1], bounds[1:])]
