"""Backend dispatch for Viterbi decoding.

The reference dispatches between CPU/CUDA/MPS native kernels through the
torch library mechanism (/root/reference/torbi/csrc/ops.cpp:16-18). Here the
equivalent is a backend check: the Pallas TPU kernel on TPU, the pure-XLA
``lax.scan`` path elsewhere. Because XLA requires static shapes, inputs are
padded -- states to a lane multiple for the kernel, frames to a configured
bucket, batch to a small multiple -- and results are sliced back. This bounds
recompilation for the variable-length file workload the way the reference's
dynamic shapes never had to.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

import torbi_tpu
from . import band as band_ops
from .pallas import viterbi_forward_pallas
from .scan import decode_xla, viterbi_backtrace

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

    # Pad frames to a bucket and batch to a multiple to bound recompilation
    frames_padded = bucket_frames(frames)
    batch_padded = _round_up(batch, torbi_tpu.BATCH_PAD_MULTIPLE)
    states_padded = _round_up(states, 128)

    obs = jnp.pad(
        observation,
        ((0, batch_padded - batch),
         (0, frames_padded - frames),
         (0, states_padded - states)),
        constant_values=NEG_INF)
    bf = jnp.pad(
        batch_frames.astype(jnp.int32),
        (0, batch_padded - batch),
        constant_values=1)
    trans = jnp.pad(
        transition,
        ((0, states_padded - states), (0, states_padded - states)),
        constant_values=NEG_INF)
    init = jnp.pad(
        initial, (0, states_padded - states), constant_values=NEG_INF)

    # Banded fast path: when the transition matrix is band-limited (as in the
    # pitch benchmark), restrict the max-plus recursion to the band
    # Banded / band-plus-floor fast path when the transition structure and
    # finiteness preconditions allow bit-exact equivalence (band.py docstring)
    band = None
    if backend in ('pallas', 'band') and torbi_tpu.USE_BAND_KERNEL:
        band = band_ops.gate_band(
            band_ops.detect_band(transition),
            initial,
            observation,
            finite_observation)
    if band is not None:
        trellis, posterior = band_ops.viterbi_forward_band(
            obs, bf, trans, init, band, interpret=interpret)
    else:
        trellis, posterior = viterbi_forward_pallas(
            obs, bf, trans, init, interpret=interpret)

    indices = viterbi_backtrace(trellis, bf, posterior)
    return indices[:batch, :frames]
