"""Decoding API.

Parity surface with the reference (/root/reference/torbi/core.py): the same
seven public symbols with the same signatures and numerics --
``from_probabilities`` (core.py:110), ``from_file`` (:211),
``from_file_to_file`` (:270), ``from_files_to_files`` (:310),
``from_dataloader`` (:376), ``save`` (:466), ``save_masked`` (:471).

Numerics contract replicated exactly (core.py:160-197): uniform initial
defaults to ``log(1/S + tiny)``, uniform transition to ``log(1/S)``,
probability inputs are ``log``-ed, and the observation is stabilized as
``log(exp(observation) + tiny)`` in float32. ``gpu`` selects a jax device
index (the reference's CUDA index); None uses the default device.
"""
import functools
import math
import os
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

import torbi_tpu
from . import viterbi
from .utils import io, progress, time
from .utils.convert import to_host_or_jax, to_jax

FP32_TINY = float(np.finfo(np.float32).tiny)

# Converted transition/initial arrays cached per live immutable jax input
# so the per-batch loop of from_dataloader reuses one device array (and
# downstream band detection caches hit -- they key on array identity).
# Mutable numpy/torch inputs are converted fresh every call: caching them
# by identity would silently serve stale results after in-place mutation.
from .utils.cache import identity_cached as _identity_cached  # noqa: E402

_prepare_cache = {}


def _prepare_log(array, log_probs):
    """Convert a transition/initial array to a log-space float32 jax array"""
    def convert():
        converted = to_jax(array, jnp.float32)
        if not log_probs:
            converted = jnp.log(converted)
        return converted

    return _identity_cached(
        _prepare_cache, array, convert, extra_key=bool(log_probs))


def _device(gpu):
    """Map the reference's flexible device argument to a jax device.

    The reference accepts an integer CUDA index or the string 'mps'
    (/root/reference/torbi/core.py:146-150). Here: None keeps the default
    device; an integer indexes jax.devices(); a string selects a platform
    -- 'cpu', 'tpu', or 'tpu:2'-style with an index. The accelerator
    aliases 'mps', 'cuda' and 'gpu' resolve to the default backend so
    reference call sites work unchanged on TPU.
    """
    if gpu is None:
        return None
    if isinstance(gpu, str):
        platform, _, index = gpu.partition(':')
        if platform in ('mps', 'cuda', 'gpu'):
            platform = jax.default_backend()
        return jax.devices(platform)[int(index) if index else 0]
    return jax.devices()[gpu]


@functools.lru_cache(maxsize=8)
def _default_initial(states):
    """Uniform initial distribution, log(1/S + tiny) (reference
    core.py:161-166). Cached so repeated calls reuse one device array (and
    the band-detection identity caches hit)."""
    return jnp.full(
        (states,), math.log((1. / states) + FP32_TINY), dtype=jnp.float32)


@functools.lru_cache(maxsize=8)
def _default_transition(states):
    """Uniform transition, log(1/S) (reference core.py:174-180). Cached:
    the constant matrix routes to the width-0 band fast path, and caching
    keeps its detection from re-fetching the matrix every call."""
    return jnp.full(
        (states, states), math.log(1. / states), dtype=jnp.float32)


def from_probabilities(
    observation,
    batch_frames=None,
    transition=None,
    initial=None,
    log_probs: bool = False,
    gpu: Optional[Union[int, str]] = None,
    num_threads: Optional[int] = 1,
    backend: Optional[str] = None,
):
    """Decode a time-varying categorical distribution

    Arguments
        observation
            Time-varying categorical distribution
            shape=(batch, frames, states)
        batch_frames
            Number of frames in each batch item; defaults to all
            shape=(batch,)
        transition
            Categorical transition matrix; defaults to uniform
            shape=(states, states)
        initial
            Categorical initial distribution; defaults to uniform
            shape=(states,)
        log_probs
            Whether inputs are in (natural) log space
        gpu
            Accelerator device to use for decoding: an index into
            jax.devices(), or a platform string ('cpu', 'tpu', 'tpu:2';
            the reference's 'mps'/'cuda' aliases resolve to the default
            accelerator). None uses the default jax device.
        num_threads
            Accepted for reference API compatibility; unused on TPU
        backend
            Optional decode backend override ('pallas', 'xla')

    Returns
        indices
            The decoded bin indices
            shape=(batch, frames)
    """
    # Decode (block_until_ready so the timer measures real device work)
    with time.context('torbi'):
        indices = _dispatch_decode(
            observation, batch_frames, transition, initial, log_probs, gpu,
            num_threads, backend)
        indices = jax.block_until_ready(indices)

    return indices


def _pack_eligible(transition, initial, log_probs, backend):
    """True when decode will take the stitched band fast path for these
    inputs -- i.e. a mod-M PACKED observation (data/collate.py) is
    consumed zero-copy. Mirrors ops.dispatch.decode's gating: packed
    inputs that miss the path are still decoded correctly (decode unpacks
    them on device), so this is a performance predicate, not a
    correctness gate."""
    from .ops import band as band_ops
    from .ops.dispatch import resolve_backend

    if transition is None:
        return False  # uniform transition routes to the width-0 path
    if resolve_backend(backend) not in ('pallas', 'band'):
        return False
    if not torbi_tpu.USE_BAND_KERNEL:
        return False
    if str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled')) \
            != 'stitched':
        return False
    trans = _prepare_log(transition, log_probs)
    states = int(trans.shape[0])
    if initial is None:
        init = _default_initial(states)
    else:
        init = _prepare_log(initial, log_probs)
    band = band_ops.gate_band(
        band_ops.detect_band(trans), init, observation=None,
        finite_observation=True)
    return band is not None and band[1] > 0


def _dispatch_decode(observation, batch_frames, transition, initial,
                     log_probs, gpu, num_threads, backend):
    """Prepare inputs and dispatch the decode WITHOUT waiting for the
    result (JAX dispatch is asynchronous); from_dataloader uses this to
    overlap device compute with host saves."""
    # Host observations stay numpy here: the dispatcher's memory guard
    # slices oversized batches (e.g. a 1M-frame file's ~1400 chunk rows
    # collated into ONE batch) before any device transfer
    observation = to_host_or_jax(observation, np.float32)
    if observation.ndim == 4:
        # mod-M PACKED layout from the data pipeline (data/collate.py):
        # (M, batch, frames, 128) with states interleaved across blocks
        _, batch, frames, _ = observation.shape
        states_in = observation.shape[0] * observation.shape[3]
    else:
        batch, frames, states_in = observation.shape
    device = _device(gpu)
    if device is not None:
        observation = jax.device_put(observation, device)

    if batch_frames is None:
        batch_frames = jnp.full((batch,), frames, dtype=jnp.int32)
    batch_frames = to_jax(batch_frames, jnp.int32)

    # The true state count comes from the transition/initial when given:
    # the data pipeline may pre-pad the observation's state dimension to a
    # lane multiple (tile-aligned transfers, ops.dispatch.padded_states)
    if transition is not None:
        states = int(transition.shape[0])
    elif initial is not None:
        states = int(initial.shape[-1])
    else:
        states = states_in

    # Default to uniform initial probabilities (reference core.py:161-166
    # includes tiny inside the log for initial but not transition)
    if initial is None:
        initial = _default_initial(states)
    else:
        initial = _prepare_log(initial, log_probs)

    # Default to uniform transition probabilities
    if transition is None:
        transition = _default_transition(states)
    else:
        transition = _prepare_log(transition, log_probs)

    # The log conversion and the reference's stability epsilon (reference
    # core.py:193-197: exp, +tiny, log) fold into the staged device
    # program -- per batch this path costs one transfer and one dispatch
    return viterbi.decode(
        observation,
        batch_frames,
        transition,
        initial,
        num_threads=num_threads,
        backend=backend,
        log_input=bool(log_probs),
        apply_epsilon=True)


def from_file(
    input_file: Union[str, os.PathLike],
    transition_file: Optional[Union[str, os.PathLike]] = None,
    initial_file: Optional[Union[str, os.PathLike]] = None,
    log_probs: bool = False,
    gpu: Optional[Union[int, str]] = None,
    num_threads: Optional[int] = 1,
):
    """Decode a time-varying categorical distribution file

    Arguments
        input_file
            Time-varying categorical distribution file
            shape=(frames, states)
        transition_file
            Categorical transition matrix file; defaults to uniform.
            Stores probabilities (not log), matching the reference convention
            (core.py:246-250)
        initial_file
            Categorical initial distribution file; defaults to uniform
            shape=(states,)
        log_probs
            Whether the observation is in (natural) log space
        gpu
            Accelerator device index; None uses the default device
        num_threads
            Accepted for reference API compatibility

    Returns
        indices
            The decoded bin indices
            shape=(frames,)
    """
    observation = io.load(input_file)[None]

    # Transition files store probabilities; take log if observations are
    # already log-space so everything reaches decode in log space
    # (reference core.py:246-250)
    if transition_file:
        transition = io.load(transition_file)
        if log_probs:
            transition = np.log(transition)
    else:
        transition = None

    if initial_file:
        initial = io.load(initial_file)
    else:
        initial = None

    indices = from_probabilities(
        observation=observation,
        transition=transition,
        initial=initial,
        log_probs=log_probs,
        gpu=gpu,
        num_threads=num_threads)
    return indices[0]


def from_file_to_file(
    input_file: Union[str, os.PathLike],
    output_file: Union[str, os.PathLike],
    transition_file: Optional[Union[str, os.PathLike]] = None,
    initial_file: Optional[Union[str, os.PathLike]] = None,
    log_probs: bool = False,
    gpu: Optional[Union[int, str]] = None,
    num_threads: Optional[int] = None,
) -> None:
    """Decode a time-varying categorical distribution file and save"""
    indices = from_file(
        input_file,
        transition_file,
        initial_file,
        log_probs,
        gpu=gpu,
        num_threads=num_threads)
    io.save(indices, output_file)


def from_files_to_files(
    input_files: List[Union[str, os.PathLike]],
    output_files: List[Union[str, os.PathLike]],
    transition_file: Optional[Union[str, os.PathLike]] = None,
    initial_file: Optional[Union[str, os.PathLike]] = None,
    log_probs: bool = False,
    gpu: Optional[Union[int, str]] = None,
    num_threads: Optional[int] = None,
    backend: Optional[str] = None,
) -> None:
    """Decode time-varying categorical distribution files and save

    Arguments mirror the reference (core.py:310-373). The file batch is
    processed through the bucketing data loader; decoded indices are masked
    to each file's frame count (or chunks are re-joined when chunked decoding
    is enabled) and saved per file.
    """
    # Load transition probabilities (files store probabilities; reference
    # core.py:340-346 applies log(x + tiny) when log_probs is set). Convert
    # to immutable device arrays here so the per-batch identity caches
    # (prepared-log, band detection) hit for every batch of the workload.
    if transition_file:
        transition = io.load(transition_file)
        if log_probs:
            transition = np.log(
                transition + np.finfo(transition.dtype).tiny)
        transition = jnp.asarray(transition, dtype=jnp.float32)
    else:
        transition = None

    if initial_file:
        initial = jnp.asarray(io.load(initial_file), dtype=jnp.float32)
    else:
        initial = None

    # Preserve file mapping
    mapping = {
        str(input_file): output_file
        for input_file, output_file in zip(input_files, output_files)}

    from_dataloader(
        dataloader=torbi_tpu.data.loader(
            input_files,
            pad_value=float('-inf') if log_probs else 0.0,
            # Assemble batches directly in the kernel's packed layout when
            # the decode will take the stitched band path (no relayout
            # copies host- or device-side)
            pack=_pack_eligible(transition, initial, log_probs, backend)),
        output_files=mapping,
        transition=transition,
        initial=initial,
        log_probs=log_probs,
        gpu=gpu,
        num_threads=num_threads,
        backend=backend)


###############################################################################
# Utilities
###############################################################################


def from_dataloader(
    dataloader,
    output_files: Dict,
    transition=None,
    initial=None,
    log_probs: bool = False,
    gpu: Optional[Union[int, str]] = None,
    num_threads: Optional[int] = 1,
    backend: Optional[str] = None,
) -> None:
    """Decode time-varying categorical distributions from a dataloader

    Arguments
        dataloader
            torbi_tpu data loader yielding
            (observation, batch_frames, batch_chunks, input_filenames)
        output_files
            A dictionary mapping input filenames to output filenames
        transition, initial, log_probs, gpu, num_threads, backend
            As in from_probabilities
    """
    # Accept str- or Path-keyed mappings (the reference builds Path keys,
    # core.py:355-358); lookups below are by str
    output_files = {str(key): value for key, value in output_files.items()}

    bar = progress.ProgressBar(torbi_tpu.CONFIG, len(dataloader.dataset))

    def write(pending, indices):
        """Save one materialized batch's per-file outputs"""
        _, batch_frames, batch_chunks, filenames = pending
        if torbi_tpu.MIN_CHUNK_SIZE is not None:
            # Re-join chunk rows into per-file sequences
            separated = torbi_tpu.data.separate(
                indices=indices,
                batch_chunks=batch_chunks,
                batch_frames=batch_frames)
            for sequence, filename in zip(separated, filenames):
                save(sequence, filename)
        else:
            for row, filename, frames in zip(
                    indices, filenames, np.asarray(batch_frames)):
                save_masked(row, filename, int(frames))
        bar.update(len(filenames))

    # The decode is dispatched asynchronously; fetching the PREVIOUS batch
    # (np.asarray is the sync point) then overlaps with the current batch's
    # device compute. The 'torbi' timing context brackets dispatch-to-sync
    # -- true decode wall time -- while file writes stay outside it.
    pending = None
    for (
        observation,
        batch_frames,
        batch_chunks,
        input_filenames,
    ) in dataloader:

        with time.context('torbi'):
            indices = _dispatch_decode(
                observation, batch_frames, transition, initial, log_probs,
                gpu, num_threads, backend)
            done = np.asarray(pending[0]) if pending is not None else None

        if pending is not None:
            write(pending, done)
        pending = (
            indices,
            batch_frames,
            batch_chunks,
            [output_files[str(file)] for file in input_filenames])

    if pending is not None:
        with time.context('torbi'):
            done = np.asarray(pending[0])
        write(pending, done)
    bar.close()


def save(tensor, file):
    """Save tensor"""
    io.save(tensor, file)


def save_masked(tensor, file, length):
    """Save masked tensor"""
    io.save(np.asarray(tensor)[..., :length], file)
