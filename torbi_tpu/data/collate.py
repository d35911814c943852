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


def collate(batch, pad_value=float('-inf'), pack=False):
    """Collate (observation, input_file) items into a padded batch.

    Returns (observation (rows, frames, states_padded), batch_frames
    (rows,) int32, batch_chunks per file, input_files). BOTH minor
    dimensions pad to pipeline-friendly sizes: frames to the decode bucket
    boundary, and states to a lane multiple (ops.dispatch.padded_states)
    filled with ``pad_value`` (-inf for log-space data, 0.0 for
    probabilities) -- unaligned minor dimensions force a device-side
    relayout on every host-to-device transfer.

    With ``pack=True`` (and a state count whose lane padding is a 128
    multiple) the observation is built directly in the stitched band
    kernel's mod-M PACKED layout, (M, rows, frames, 128) with state
    s = M*l + r at (r, row, frame, lane l) -- bitwise identical to
    ``ops.dispatch.pack_observation`` of the natural batch, but assembled
    in one pass so the file workload feeds ``decode`` with zero relayout
    copies on either side of the transfer.
    """
    from ..ops.dispatch import bucket_frames, padded_states

    observations, input_files = zip(*batch)
    rows, batch_chunks = _flatten(observations)
    if not rows:
        raise ValueError('batch must contain at least 1 item')

    lengths = np.array([row.shape[0] for row in rows], dtype=np.int32)
    states = rows[0].shape[-1]
    states_p = padded_states(states)
    frames_p = bucket_frames(int(lengths.max()))
    dtype = np.asarray(rows[0]).dtype

    if pack and states_p % 128 == 0:
        m = states_p // 128
        packed = np.zeros((m, len(rows), frames_p, 128), dtype=dtype)
        if states_p != states:
            # The natural layout's lane tail is pad_value for EVERY frame
            # (including frame padding); mirror it so the result is
            # bitwise pack_observation(natural collate)
            for r in range(m):
                k = -(-(states - r) // m) if r < states else 0
                packed[r, :, :, k:] = pad_value
        for i, (row, n) in enumerate(zip(rows, lengths)):
            row = np.asarray(row)
            for r in range(m):
                # States r, r+M, r+2M, ... land on lanes 0.. of block r
                cols = row[:, r::m]
                packed[r, i, :n, :cols.shape[1]] = cols
        return packed, lengths, batch_chunks, input_files

    padded = np.zeros((len(rows), frames_p, states_p), dtype=dtype)
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
