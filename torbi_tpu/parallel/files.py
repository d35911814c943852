"""Multi-host file-batch sharding.

The reference's file workload is single-process
(/root/reference/torbi/core.py:310-373). On a TPU pod each host process
decodes a disjoint shard of the file list on its local devices; only metric
aggregation crosses hosts (over DCN). Output files are the synchronization
artifact -- the skip-if-exists idempotency of the evaluation harness means
interrupted pod jobs resume per file.
"""
import os

import jax

import torbi_tpu


def _probe_npy_frames(file):
    """Frame count from a ``.npy`` header (native C++ probe, then the
    PUBLIC numpy header readers -- the private ``_read_array_header``
    could drift between hosts' numpy versions). None if unparseable."""
    from ..data import native

    probed = native.probe(file)
    if probed is None:
        try:
            import numpy as np
            with open(file, 'rb') as handle:
                major, _ = np.lib.format.read_magic(handle)
                read_header = (
                    np.lib.format.read_array_header_1_0 if major == 1
                    else np.lib.format.read_array_header_2_0)
                shape, _, _ = read_header(handle)
            if len(shape) == 2:
                probed = shape
        except Exception:
            probed = None
    return probed[0] if probed is not None else None


def probe_lengths(files):
    """Best-effort per-file lengths for LPT balancing, in ONE unit.

    ``.npy`` headers are parsed exactly into frame counts; if ANY file in
    the corpus cannot be parsed (non-.npy format, exotic header), the
    WHOLE corpus falls back to byte sizes -- mixing frames and bytes
    within one partition would mis-weight the LPT assignment, and a
    per-file fallback could diverge across pod hosts with heterogeneous
    numpy versions (every host must compute the identical partition:
    output files are the only synchronization artifact, so divergent
    partitions silently decode some files on no host). Byte size is
    proportional to frames whenever the corpus shares one states
    dimension, and LPT only needs lengths up to a common scale. Returns
    None when byte sizes are unavailable too (callers then round-robin).
    """
    lengths = [
        _probe_npy_frames(file) if str(file).endswith('.npy') else None
        for file in files]
    if any(frames is None for frames in lengths):
        try:
            lengths = [os.path.getsize(file) for file in files]
        except OSError:
            return None
    return lengths


def shard_files_balanced(input_files, output_files, process_index=None,
                         process_count=None):
    """shard_files with lengths probed from the input files (LPT when the
    probe succeeds, round-robin otherwise)."""
    if process_count is None:
        process_count = jax.process_count()
    lengths = (
        probe_lengths(input_files) if process_count > 1 else None)
    return shard_files(
        input_files, output_files, process_index=process_index,
        process_count=process_count, lengths=lengths)


def shard_files(input_files, output_files, process_index=None,
                process_count=None, lengths=None):
    """Split a file workload across host processes.

    With ``lengths`` (per-file frame counts), uses length-aware greedy
    balancing (longest-processing-time) so heavy-tailed speech data does not
    straggle one host; otherwise round-robin.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if process_count == 1:
        return list(input_files), list(output_files)

    if lengths is None:
        return (
            list(input_files[process_index::process_count]),
            list(output_files[process_index::process_count]))

    # Greedy LPT assignment
    order = sorted(
        range(len(input_files)), key=lambda i: -lengths[i])
    loads = [0] * process_count
    mine_in, mine_out = [], []
    for i in order:
        target = min(range(process_count), key=lambda p: loads[p])
        loads[target] += lengths[i]
        if target == process_index:
            mine_in.append(input_files[i])
            mine_out.append(output_files[i])
    return mine_in, mine_out


def from_files_to_files(
        input_files,
        output_files,
        transition_file=None,
        initial_file=None,
        log_probs=False,
        gpu=None,
        num_threads=None):
    """Multi-host sharded version of torbi_tpu.from_files_to_files"""
    mine_in, mine_out = shard_files_balanced(
        list(input_files), list(output_files))
    torbi_tpu.from_files_to_files(
        mine_in,
        mine_out,
        transition_file=transition_file,
        initial_file=initial_file,
        log_probs=log_probs,
        gpu=gpu,
        num_threads=num_threads)
