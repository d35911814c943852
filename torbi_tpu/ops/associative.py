"""Exact parallel Viterbi via associative max-plus scan.

New capability beyond the reference (whose only long-sequence tool is the
approximate entropy chunking, torbi/chunk.py): the Viterbi forward recursion
is a linear recurrence in the (max, +) semiring, so the T-sequential
dependency can be broken with ``jax.lax.associative_scan`` over (S, S)
max-plus matrix products (cf. Temporal Parallelization of HMM Inference,
arXiv:2102.05743 -- PAPERS.md). Work inflates from O(T S^2) to
O(T S^3 log T / B) style costs, so this pays off for small state counts or
when the sequence axis is sharded across many chips and latency (not work)
dominates. For S=1440 the elementwise kernels win; this module targets
small-S models and the sequence-sharded regime.

The scan computes, for every prefix t, the max-plus matrix product
M_t = A_t x ... x A_1 where A_t[j, i] = transition[j, i] + observation[t, j].
Then posterior_t[j] = max_i (M_t[j, i] + post_0[i]) matches the sequential
recursion exactly, and backpointers are recovered per step from the standard
argmax using the reconstructed posteriors (bit-exact lowest-index rule).
"""
import jax
import jax.numpy as jnp
from jax import lax


def _maxplus_matmul(a, b):
    """(max, +) matrix product: out[j, i] = max_k a[j, k] + b[k, i].

    a, b: (..., S, S). Associative; used as the combine fn of the scan.
    """
    return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def viterbi_posteriors_scan(observation, transition, initial):
    """All per-step posteriors via associative scan (single sequence).

    observation: (T, S) float32 log-probs
    transition: (S, S) float32 log-probs (row = destination)
    initial: (S,) float32 log-probs

    Returns posteriors: (T, S). Equal to the sequential forward recursion in
    exact arithmetic; in float32 the reassociated additions can differ from
    the sequential order by ulps, so near-exact ties may resolve differently
    (the sequential kernels remain the bit-exact reference).
    """
    T, S = observation.shape
    post0 = observation[0] + initial
    if T == 1:
        return post0[None]

    # Step matrices for t = 1..T-1: A_t[j, i] = transition[j, i] + obs[t, j]
    steps = transition[None, :, :] + observation[1:, :, None]
    # Prefix products M_t = A_t x ... x A_1: the combine must put the later
    # element (b) on the LEFT of the max-plus product
    prefixes = lax.associative_scan(
        lambda a, b: _maxplus_matmul(b, a), steps)
    # posterior_t = maxplus(M_t, post0)
    posts = jnp.max(prefixes + post0[None, None, :], axis=-1)
    return jnp.concatenate([post0[None], posts], axis=0)


def viterbi_decode_scan(observation, transition, initial):
    """Exact Viterbi decode for one sequence using the associative scan for
    the forward pass and per-step argmax reconstruction for the backtrace.

    observation: (T, S); returns (T,) int32. The backtrace recomputes each
    step's argmax from the scan's posterior of the previous step with the
    lowest-index tie rule; agreement with the sequential decoder is exact up
    to float32 reassociation of path sums (see viterbi_posteriors_scan).
    """
    T, S = observation.shape
    posts = viterbi_posteriors_scan(observation, transition, initial)

    seed = jnp.argmax(posts[-1]).astype(jnp.int32)
    if T == 1:
        return seed[None]

    def step(index, post_prev):
        # Reconstruct the backpointer for the winning state only
        scores = post_prev + transition[index]
        nxt = jnp.argmax(scores).astype(jnp.int32)
        return nxt, nxt

    # Walk t = T-1 .. 1, emitting indices[t]; posts[t-1] drives each step
    _, emitted = lax.scan(step, seed, posts[:-1], reverse=True)
    return jnp.concatenate([emitted, seed[None]])
