"""MXU-accelerated approximate Viterbi via log-sum-exp (smoothed max-plus).

TPU-native capability beyond the reference: the exact max-plus recursion is
VPU-bound (no matmul structure), but its temperature-beta smoothing

    score[j] = (1/beta) * logsumexp_i( beta * (post[i] + T[j, i]) )
             = (1/beta) * log( sum_i exp(beta*post[i]) * exp(beta*T[j,i]) )

is a plain matrix product of exp(beta*post) with exp(beta*T)^T -- which runs
on the 128x128 systolic MXU at hundreds of TFLOPs instead of the ~4 TOPS VPU.
As beta -> inf this converges to exact Viterbi; the approximation error of
each step score is bounded by log(S)/beta, and for peaked posteriorgrams
(margins >> 1 nat) the decoded path is almost always identical to exact
Viterbi. beta=1 is the classical sum-product forward recursion.

Numerical scheme per step (float32 matmul, per-sequence and per-row
normalization against exp underflow):
    c = max(post);  u = exp(beta * (post - c))          # u in (0, 1]
    E[i, j] = exp(beta * (T[j, i] - r[j])), r = rowmax  # E in (0, 1]
    v = u @ E                                           # MXU
    post'[j] = obs[j] + c + r[j] + log(max(v, tiny)) / beta
The tiny clamp floors states whose smoothed score falls more than ~88/beta
nats below (c + r[j]); such states are far off the optimal path.

Backpointers are not tracked during the matmul recursion; the backtrace
recomputes a single exact argmax row per step from the stored posterior
history -- O(N*T*S) total, on the VPU, still cheap relative to the forward.

Use through ``decode(..., backend='lse')`` or ``from_probabilities(...,
backend='lse')``. Accuracy vs the exact kernels is workload-dependent;
the evaluation harness measures RPA against the exact output.
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=('beta',))
def decode_lse(observation, batch_frames, transition, initial, beta=8.0):
    """Approximate Viterbi decode with the forward smoothed-max on the MXU.

    observation: (batch, frames, states) float32 log-probs
    batch_frames: (batch,) int32
    transition: (states, states) float32 log-probs (row = destination)
    initial: (states,) float32 log-probs
    beta: smoothing temperature (higher = closer to exact max; too high
        underflows exp -- candidates more than ~80/beta nats below the
        per-sequence max are dropped, which is also what max would do)

    Returns (batch, frames) int32.
    """
    batch, frames, states = observation.shape
    tiny = jnp.finfo(jnp.float32).tiny
    # Per-destination-row normalization keeps exp(beta * T) in (0, 1].
    # An all--inf row (unreachable destination) must normalize by a FINITE
    # value, or (transition - rowmax) is NaN and poisons the whole decode;
    # with rowmax 0 its exp column is all zeros and the log floor keeps the
    # state at effectively -inf, matching the exact backends.
    rowmax = jnp.max(transition, axis=1)  # (S_dst,)
    rowmax = jnp.where(jnp.isfinite(rowmax), rowmax, 0.0)
    exp_t = jnp.exp(
        beta * (transition - rowmax[:, None])).T  # (S_src, S_dst)
    post0 = observation[:, 0, :] + initial[None, :]

    def step(post, inputs):
        obs_t, t = inputs
        c = jnp.max(post, axis=-1, keepdims=True)  # (N, 1)
        # The same guard for a sequence whose entire posterior hit the
        # log floor (c = -inf would make post - c NaN)
        c = jnp.where(jnp.isfinite(c), c, 0.0)
        u = jnp.exp(beta * (post - c))
        v = jnp.dot(u, exp_t, preferred_element_type=jnp.float32)
        new_post = (
            obs_t + c + rowmax[None, :]
            + jnp.log(jnp.maximum(v, tiny)) / beta)
        valid = (t < batch_frames)[:, None]
        post = jnp.where(valid, new_post, post)
        return post, post

    if frames == 1:
        posts = post0[:, None, :]
        post_final = post0
    else:
        ts = jnp.arange(1, frames, dtype=jnp.int32)
        obs_rest = jnp.swapaxes(observation[:, 1:, :], 0, 1)
        post_final, posts_rest = lax.scan(step, post0, (obs_rest, ts))
        posts = jnp.concatenate(
            [post0[:, None, :], jnp.swapaxes(posts_rest, 0, 1)], axis=1)

    # Backtrace: exact argmax per step against the stored (approximate)
    # posterior history; lowest-index tie rule as everywhere else
    seed = jnp.argmax(post_final, axis=-1).astype(jnp.int32)
    if frames == 1:
        return seed[:, None]

    def bt_step(index, inputs):
        post_prev, t = inputs  # (batch, states)
        # scores[b, i] = post_prev[b, i] + transition[index[b], i]
        trans_rows = transition[index]  # (batch, states) row gather
        nxt = jnp.argmax(post_prev + trans_rows, axis=-1).astype(jnp.int32)
        index = jnp.where(t <= batch_frames - 1, nxt, index)
        return index, index

    ts = jnp.arange(frames - 1, 0, -1, dtype=jnp.int32)
    posts_prev = jnp.swapaxes(posts[:, :-1, :], 0, 1)[::-1]
    _, outs = lax.scan(bt_step, seed, (posts_prev, ts))
    body = jnp.swapaxes(outs[::-1], 0, 1)
    return jnp.concatenate([body, seed[:, None]], axis=1)
