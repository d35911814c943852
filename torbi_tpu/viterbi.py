"""Low-level decode entry point.

Parity with the reference dispatch wrapper (/root/reference/torbi/viterbi.py):
same signature and docstring contract. ``num_threads`` is accepted for API
compatibility; on TPU the analog of the reference's CPU thread count is the
XLA runtime's thread pool, so it is ignored except by the librosa reference
runner.
"""
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .ops import dispatch
from .utils.convert import to_host_or_jax, to_jax


def decode(
        observation,
        batch_frames,
        transition,
        initial,
        num_threads: int = 0,
        backend: Optional[str] = None,
        finite_observation: bool = False,
        log_input: bool = True,
        apply_epsilon: bool = False):
    """Maximum-likelihood state decoding of log-space inputs.

    All inputs are log-probabilities. ``observation`` is (batch, frames,
    states) -- a single (frames, states) sequence is auto-promoted --
    ``batch_frames`` is (batch,) valid frame counts, ``transition`` is
    (states, states) with row = destination and column = source, and
    ``initial`` is (states,). ``num_threads`` exists only for reference API
    compatibility (the TPU analog of the reference's CPU thread count is
    XLA's own runtime pool). ``backend`` optionally forces 'pallas' or
    'xla' instead of the configured default; ``finite_observation=True``
    asserts that no observation entry is -inf/NaN, which lets the band
    dispatcher skip a full data scan.

    Returns (batch, frames) int32 decoded state indices.
    """
    del num_threads
    # Host (numpy/torch) observations stay on the host: the dispatcher's
    # memory guard slices oversized batches BEFORE any device transfer
    # (ops/dispatch.py), which only works if the array has not already
    # been shipped to the device whole
    observation = to_host_or_jax(observation, np.float32)
    batch_frames = to_jax(batch_frames, jnp.int32)
    transition = to_jax(transition, jnp.float32)
    initial = to_jax(initial, jnp.float32)
    if observation.ndim == 2:
        observation = observation[None]
    return dispatch.decode(
        observation,
        batch_frames,
        transition,
        initial,
        backend=backend,
        finite_observation=finite_observation,
        log_input=log_input,
        apply_epsilon=apply_epsilon)
