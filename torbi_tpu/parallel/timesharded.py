"""Exact sequence-sharded Viterbi decode over a device mesh.

New capability beyond the reference (whose only long-sequence tool is the
approximate entropy chunking, /root/reference/torbi/chunk.py): the frame
axis of ONE long sequence is sharded across chips, and the decode stays
exact. The forward recursion is a linear recurrence in the (max, +)
semiring, so it parallelizes as (cf. Temporal Parallelization of HMM
Inference, arXiv:2102.05743 -- PAPERS.md):

1. each chip builds its local step matrices A_t[j, i] = transition[j, i] +
   observation[t, j] (chip 0 substitutes the max-plus diagonal of the
   initial posterior for A_0) and runs a local associative prefix scan of
   max-plus products;
2. ONE all_gather of the (S, S) per-chip chunk products rides the ICI, and
   every chip composes its exclusive cross-chip prefix locally;
3. forward values fwd_t[j] = max_i M_t[j, i] and, from the mirrored suffix
   scan, backward values bwd_t[i] = max_j SUF_t[j, i] are local; the decoded
   state at t is the lowest-index argmax of fwd_t + bwd_t -- no further
   communication, output stays sharded on the frame axis.

Work is O(T S^3 log T / D) per chip, so this pays off for small-to-medium
state counts where a single sequence's length, not the batch, is the
bottleneck; at large S the batched elementwise kernels win. Exactness: path
scores match the sequential recursion up to float32 reassociation; when the
optimal path is unique (real posteriorgrams), the decoded path is identical
to the sequential decoder. Exact ties may resolve differently than the
backpointer chase, mirroring the reference's CPU/CUDA tie divergence
(SURVEY.md section 2.1).
"""
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.associative import _maxplus_matmul
from . import mesh as mesh_lib

NEG_INF = float('-inf')


def decode_time_sharded(observation, transition, initial, mesh=None):
    """Decode one (frames, states) sequence with frames sharded over a mesh.

    observation: (frames, states) float32 log-probs; frames must be a
        multiple of the mesh size
    transition: (states, states) float32 log-probs (row = destination)
    initial: (states,) float32 log-probs
    mesh: 1-D jax Mesh; defaults to all local devices (axis name 'batch'
        from parallel.batch_mesh is reused as the time axis)

    Returns (frames,) int32 decoded states.
    """
    if mesh is None:
        mesh = mesh_lib.batch_mesh()
    axis = mesh.axis_names[0]
    n_shards = mesh.devices.size
    frames, states = observation.shape
    if frames % n_shards:
        raise ValueError(
            f'frames={frames} must be a multiple of the mesh size '
            f'{n_shards}')

    post0 = observation[0] + initial  # only meaningful on shard 0

    def shard_fn(obs_l, trans, post0_rep):
        d = lax.axis_index(axis)
        t_local, s = obs_l.shape

        # Local step matrices; global A_0 is the max-plus diagonal of the
        # initial posterior (so every prefix column i carries "start in i")
        steps = trans[None, :, :] + obs_l[:, :, None]
        diag0 = jnp.where(
            jnp.eye(s, dtype=bool), post0_rep[:, None], NEG_INF)
        first = jnp.where(d == 0, diag0, steps[0])
        steps = steps.at[0].set(first)

        # Local inclusive prefix products M_t = A_t x ... x A_(t0)
        prefix = lax.associative_scan(
            lambda a, b: _maxplus_matmul(b, a), steps)
        # ... and suffix products SUF_t = A_(t0+T_l-1) x ... x A_t
        suffix = lax.associative_scan(
            lambda a, b: _maxplus_matmul(a, b), steps, reverse=True)

        # One (S, S) product per chip crosses the ICI
        chunk = prefix[-1]  # A_last x ... x A_first of this shard
        all_chunks = lax.all_gather(chunk, axis)  # (D, S, S)

        # Exclusive cross-chip composites, computed redundantly per chip
        identity = jnp.where(jnp.eye(s, dtype=bool), 0.0, NEG_INF)
        pre = [identity]   # pre[e] = P_(e-1) x ... x P_0
        suf = [identity]   # suf[e] = P_(D-1) x ... x P_(D-e)
        for e in range(n_shards - 1):
            pre.append(_maxplus_matmul(all_chunks[e], pre[-1]))
            suf.append(
                _maxplus_matmul(suf[-1], all_chunks[n_shards - 1 - e]))
        pre = jnp.stack(pre)[d]                  # (S, S)
        suf = jnp.stack(suf)[n_shards - 1 - d]   # (S, S)

        # fwd_t[j] = best score of any path ending in j at global t
        m_global = _maxplus_matmul(prefix, pre[None])
        fwd = jnp.max(m_global, axis=-1)  # (T_l, S)

        # bwd_t[i] = best continuation from state i at t to the end,
        # excluding A_t itself: SUF over A_(t+1).. composed with the
        # cross-chip suffix. Shift the local suffix down by one step.
        suf_excl = jnp.concatenate(
            [suffix[1:],
             jnp.broadcast_to(identity, (1, s, s))], axis=0)
        suf_global = _maxplus_matmul(suf[None], suf_excl)
        bwd = jnp.max(suf_global, axis=-2)  # (T_l, S): max over final j

        # Lowest-index argmax per frame (jnp.argmax picks the first max)
        return jnp.argmax(fwd + bwd, axis=-1).astype(jnp.int32)

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False)

    observation = jax.device_put(
        observation, NamedSharding(mesh, P(axis)))
    transition = jax.device_put(transition, NamedSharding(mesh, P()))
    post0 = jax.device_put(post0, NamedSharding(mesh, P()))
    return jax.jit(sharded)(observation, transition, post0)
