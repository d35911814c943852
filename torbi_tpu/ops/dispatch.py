"""Backend dispatch for Viterbi decoding.

The reference dispatches between CPU/CUDA/MPS native kernels through the
torch library mechanism (/root/reference/torbi/csrc/ops.cpp:16-18). Here the
equivalent is a backend check: the Pallas TPU kernels on TPU, the pure-XLA
``lax.scan`` path elsewhere. Because XLA requires static shapes, inputs are
padded -- states to a lane multiple, frames to a configured bucket, batch to
a small multiple -- and results are sliced back. This bounds recompilation
for the variable-length file workload the way the reference's dynamic shapes
never had to.

The entire padded pipeline (pad -> forward kernel -> backtrace kernel ->
slice) is staged as ONE jitted computation per (shape bucket, band
signature), cached. Band detection and the gating finiteness checks are the
only host-synchronizing steps and are cached per input buffer, so the steady
state per decode call is a single compiled-function dispatch.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

import torbi_tpu
from . import band as band_ops
from .backtrace import backtrace_posteriors
from .pallas import viterbi_forward_pallas
from .scan import decode_xla

NEG_INF = float('-inf')


def _round_up(value, multiple):
    return ((value + multiple - 1) // multiple) * multiple


def bucket_frames(frames):
    """Pad a frame count up to the next configured bucket boundary"""
    for bucket in torbi_tpu.FRAME_BUCKETS:
        if frames <= bucket:
            return bucket
    # Beyond the largest bucket, round up to a multiple of it
    largest = torbi_tpu.FRAME_BUCKETS[-1]
    return _round_up(frames, largest)


def resolve_backend(backend=None):
    """Resolve 'auto' to a concrete backend for the current platform"""
    backend = backend or torbi_tpu.BACKEND
    if backend == 'auto':
        return 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    return backend


def _config_key():
    """Config values the staged pipeline reads at trace time; part of the
    build cache key so config changes are not silently ignored"""
    return (
        tuple(torbi_tpu.FRAME_BUCKETS),
        torbi_tpu.BATCH_PAD_MULTIPLE,
        torbi_tpu.BAND_TAIL_GATING,
        torbi_tpu.BAND_CORE_WIDTH,
    )


@functools.lru_cache(maxsize=128)
def _build_decode(batch, frames, states, band, interpret, config_key):
    """Stage the full padded decode pipeline as one jitted function"""
    del config_key  # only disambiguates the cache entry
    frames_p = bucket_frames(frames)
    batch_p = _round_up(batch, torbi_tpu.BATCH_PAD_MULTIPLE)
    states_p = _round_up(states, 128)

    @jax.jit
    def run(observation, batch_frames, transition, initial):
        # The state dimension stays unpadded: the forward kernels lane-pad
        # observation columns in-register, saving a full-size XLA pad copy
        obs = jnp.pad(
            observation,
            ((0, batch_p - batch),
             (0, frames_p - frames),
             (0, 0)),
            constant_values=NEG_INF)
        bf = jnp.pad(
            batch_frames.astype(jnp.int32),
            (0, batch_p - batch),
            constant_values=1)
        trans = jnp.pad(
            transition,
            ((0, states_p - states), (0, states_p - states)),
            constant_values=NEG_INF)
        init = jnp.pad(
            initial, (0, states_p - states), constant_values=NEG_INF)

        if band is not None:
            post_seq, posterior = band_ops.viterbi_forward_band(
                obs, bf, trans, init, band, interpret=interpret)
        else:
            post_seq, posterior = viterbi_forward_pallas(
                obs, bf, trans, init, interpret=interpret)
        indices = backtrace_posteriors(
            post_seq, trans, posterior, bf, interpret=interpret)
        return indices[:batch, :frames]

    return run


def decode(observation, batch_frames, transition, initial, backend=None,
           finite_observation=False):
    """Decode log-space inputs. All arguments are jax arrays.

    observation: (batch, frames, states) float32 log-probs
    batch_frames: (batch,) int32
    transition: (states, states) float32 log-probs (row = destination)
    initial: (states,) float32 log-probs

    Returns (batch, frames) int32 decoded state indices.
    """
    backend = resolve_backend(backend)
    batch, frames, states = observation.shape

    if backend == 'xla':
        return decode_xla(observation, batch_frames, transition, initial)

    if backend == 'lse':
        # MXU-accelerated approximate mode (see ops/lse.py)
        from .lse import decode_lse
        return decode_lse(
            observation, batch_frames, transition, initial,
            beta=torbi_tpu.LSE_BETA)

    interpret = jax.default_backend() != 'tpu'

    # Banded fast path: bit-exact when the transition structure and
    # finiteness preconditions allow it (band.py docstring; detection and
    # the initial-distribution gate are cached per live jax array)
    band = None
    if backend in ('pallas', 'band') and torbi_tpu.USE_BAND_KERNEL:
        band = band_ops.gate_band(
            band_ops.detect_band(transition),
            initial,
            observation,
            finite_observation)

    fn = _build_decode(
        batch, frames, states, band, interpret, _config_key())
    return fn(observation, batch_frames, transition, initial)
