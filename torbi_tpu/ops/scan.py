"""Pure-XLA Viterbi decode via jax.lax.scan.

This is the portable implementation: it runs on CPU/GPU/TPU through plain XLA
and serves as the bit-exactness oracle for the Pallas TPU kernels. The
algorithmic contract matches the reference native kernels
(/root/reference/torbi/csrc/viterbi.cpp:35-234):

- forward max-sum recursion ``score[j] = max_i(posterior[i] + transition[j, i])``
  with ``posterior'[j] = observation[t, j] + score[j]``
- trellis of int32 backpointers, zero-initialized; argmax ties resolve to the
  lowest source index (the reference CPU kernel writes backpointers only on
  strict improvement, viterbi.cpp:94-100, so first-max-wins)
- per-item sequence lengths ``batch_frames``: the recursion only advances for
  ``t < batch_frames[b]`` (viterbi.cpp:81 loops ``t in [1, frames)``), the
  final posterior is taken at the last valid frame, and decoded indices beyond
  ``batch_frames[b]`` hold the broadcast ``argmax(posterior)`` seed
  (viterbi.cpp:218-221)
- backtrace walks ``index = trellis[t, index]`` for ``t = frames-1 .. 1``
  writing ``indices[t-1]`` (viterbi.cpp:153-157)
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax


def viterbi_forward(observation, batch_frames, transition, initial):
    """Forward max-sum recursion.

    Arguments
        observation: (batch, frames, states) float32 log-probabilities
        batch_frames: (batch,) int32 valid frame counts
        transition: (states, states) float32 log-probabilities; row j is the
            destination, column i the source
        initial: (states,) float32 log-probabilities

    Returns
        trellis: (batch, frames, states) int32 backpointers (column 0 is zeros)
        posterior: (batch, states) float32 path scores at the last valid frame
    """
    batch, frames, states = observation.shape
    post0 = observation[:, 0, :] + initial[None, :]

    if frames == 1:
        trellis = jnp.zeros((batch, 1, states), dtype=jnp.int32)
        return trellis, post0

    def step(post, inputs):
        obs_t, t = inputs
        # scores[n, j, i] = post[n, i] + transition[j, i]
        scores = post[:, None, :] + transition[None, :, :]
        best = jnp.max(scores, axis=-1)
        # jnp.argmax returns the first (lowest-index) maximum, matching the
        # reference CPU tie-breaking rule
        backpointer = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        new_post = obs_t + best
        valid = (t < batch_frames)[:, None]
        post = jnp.where(valid, new_post, post)
        backpointer = jnp.where(valid, backpointer, 0)
        return post, backpointer

    ts = jnp.arange(1, frames, dtype=jnp.int32)
    obs_rest = jnp.swapaxes(observation[:, 1:, :], 0, 1)  # (frames-1, batch, states)
    posterior, backpointers = lax.scan(step, post0, (obs_rest, ts))
    trellis = jnp.concatenate(
        [
            jnp.zeros((batch, 1, states), dtype=jnp.int32),
            jnp.swapaxes(backpointers, 0, 1),
        ],
        axis=1)
    return trellis, posterior


def viterbi_backtrace(trellis, batch_frames, posterior):
    """Backtrace the trellis from the argmax of the final posterior.

    Returns
        indices: (batch, frames) int32 decoded state sequence. Positions at or
        beyond ``batch_frames[b] - 1`` hold the seed ``argmax(posterior[b])``,
        matching the reference broadcast-then-backtrace scheme
        (viterbi.cpp:218-225).
    """
    batch, frames, states = trellis.shape
    seed = jnp.argmax(posterior, axis=-1).astype(jnp.int32)

    if frames == 1:
        return seed[:, None]

    lane = jnp.arange(states, dtype=jnp.int32)[None, :]

    def step(index, inputs):
        trellis_t, t = inputs  # (batch, states), scalar t
        # Row-wise gather trellis_t[b, index[b]] as a one-hot select+reduce:
        # XLA gather inside a scan is an order of magnitude slower on TPU
        nxt = jnp.sum(
            jnp.where(lane == index[:, None], trellis_t, 0), axis=-1)
        index = jnp.where(t <= batch_frames - 1, nxt, index)
        return index, index

    ts = jnp.arange(frames - 1, 0, -1, dtype=jnp.int32)
    trellis_rev = jnp.swapaxes(trellis, 0, 1)[::-1][:-1]  # t = frames-1 .. 1
    _, outs = lax.scan(step, seed, (trellis_rev, ts))
    # outs[k] is indices[t-1] for t = frames-1-k; reverse to positions 0..frames-2
    body = jnp.swapaxes(outs[::-1], 0, 1)  # (batch, frames-1)
    return jnp.concatenate([body, seed[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=())
def decode_xla(observation, batch_frames, transition, initial):
    """Full Viterbi decode: forward + backtrace. Returns (batch, frames) int32."""
    trellis, posterior = viterbi_forward(
        observation, batch_frames, transition, initial)
    return viterbi_backtrace(trellis, batch_frames, posterior)
