"""Low-level decode entry point.

Parity with the reference dispatch wrapper (/root/reference/torbi/viterbi.py):
same signature and docstring contract. ``num_threads`` is accepted for API
compatibility; on TPU the analog of the reference's CPU thread count is the
XLA runtime's thread pool, so it is ignored except by the librosa reference
runner.
"""
from typing import Optional

import jax.numpy as jnp

from .ops import dispatch
from .utils.convert import to_jax


def decode(
        observation,
        batch_frames,
        transition,
        initial,
        num_threads: int = 0,
        backend: Optional[str] = None,
        finite_observation: bool = False):
    """Decode a time-varying categorical distribution

    Args:
        observation: :math:`(N, T, S)`
            where `S = the number of states`,
            `T = the length of the sequence`,
            and `N = batch size`.
            Time-varying categorical distribution in log space
        batch_frames :math:`(N)`
            Sequence length of each batch item
        transition :math:`(S, S)`
            Categorical transition matrix in log space; row j is the
            destination state, column i the source
        initial :math:`(S)`
            Categorical initial distribution in log space
        num_threads
            Unused on TPU; accepted for reference API compatibility
        backend
            Optional override: 'pallas', 'xla', or None for configured default

    Return:
        indices: :math:`(N, T)`
            The decoded bin indices (int32 jax array)

    Example::

            >>> import jax.numpy as jnp
            >>> observation = jnp.log(jnp.array([[
            ...     [0.25, 0.5, 0.25],
            ...     [0.25, 0.25, 0.5],
            ...     [0.33, 0.33, 0.33]
            ... ]]))
            >>> batch_frames = jnp.array([3])
            >>> transition = jnp.log(jnp.array([
            ...     [0.5, 0.25, 0.25],
            ...     [0.33, 0.34, 0.33],
            ...     [0.25, 0.25, 0.5]
            ... ]))
            >>> initial = jnp.log(jnp.array([0.4, 0.35, 0.25]))
            >>> bins = decode(observation, batch_frames, transition, initial)
    """
    del num_threads
    observation = to_jax(observation, jnp.float32)
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
        finite_observation=finite_observation)
