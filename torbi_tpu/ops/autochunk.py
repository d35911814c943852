"""Batch-1 auto-chunking: one long sequence becomes parallel chunk rows.

The serial backtrace chase binds single-sequence decodes (~0.65 us per
frame on v5e regardless of reduction width -- scripts/chase_lab.py), so a
10,240-frame file pays ~6.7 ms of irreducible serial latency no matter how
fast the forward kernel gets. The reference's own long-sequence answer is
entropy chunking (/root/reference/torbi/chunk.py:57-78): split at adjacent
low-entropy (locally near-deterministic) frame pairs and decode the chunks
as independent batch rows. This module applies that policy automatically
inside ``dispatch.decode`` for a single long banded sequence:

1. framewise normalized entropy is computed ON DEVICE in one fused jitted
   pass (entropy is permutation-invariant over states, so the mod-M packed
   layout needs no unpacking) and fetched as a tiny (frames,) array;
2. split points are planned on the host (``chunk.splits_from_entropy`` --
   the same greedy boundaries as the user-facing chunker) and cached per
   observation identity, so repeated decodes of a resident buffer skip the
   synchronizing round trip entirely;
3. chunk rows are assembled by ONE jitted dynamic-slice gather whose
   boundaries are runtime inputs -- only (n_rows, frame bucket) are static,
   so arbitrary split patterns share a compile;
4. the chunk batch decodes through the ordinary dispatch (stitched band
   kernels, mod-M backtrace -- a serial chase over the longest ROW instead
   of the whole sequence);
5. the per-row paths are stitched back with one jitted gather, with frames
   past the row's valid length frozen at the last decoded state (the
   reference's padded-batch freeze semantics).

Semantics are EXACTLY the reference's chunked mode: each chunk decodes
with the caller's initial distribution, so the result matches the numpy
oracle run per-chunk BITWISE (tests/test_autochunk.py) and matches the
full-sequence oracle whenever the chosen split frames really are
near-deterministic -- the entropy gate's job, and what peaked pitch
posteriorgrams deliver in practice. Diffuse observations produce no
split candidates and fall back to the serial full-sequence-exact kernels;
``torbi_tpu.BATCH1_AUTO_CHUNK = False`` pins that path unconditionally.
"""
import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np

import torbi_tpu

NEG_INF = float('-inf')

# Split plans cached per (observation, batch_frames) identity -- immutable
# jax arrays only (utils/cache.py rationale). A plan is a pure function of
# the array VALUES, so identity caching is exact; it exists because the
# entropy fetch is the route's only host-synchronizing step.
_plan_cache = {}


def _cached_plan(observation, batch_frames, compute, extra_key):
    if not (isinstance(observation, jax.Array)
            and isinstance(batch_frames, jax.Array)):
        return compute()
    key = (
        id(observation), tuple(observation.shape), id(batch_frames),
        extra_key)
    hit = _plan_cache.get(key)
    if hit is not None:
        plan, refs = hit
        if refs[0]() is observation and refs[1]() is batch_frames:
            return plan
        del _plan_cache[key]
    plan = compute()
    if len(_plan_cache) > 64:
        _plan_cache.clear()
    try:
        refs = (weakref.ref(observation), weakref.ref(batch_frames))
    except TypeError:
        refs = ((lambda: observation), (lambda: batch_frames))
    _plan_cache[key] = (plan, refs)
    return plan


@functools.lru_cache(maxsize=16)
def _entropy_fn(packed, log_input, states):
    """Fused framewise-entropy pass: ((frames,) f32, () i32 valid count).

    Entropy of the categorical distribution at each frame, normalized by
    log(states) (chunk.py::entropy); -inf (log) / 0.0 (probability) padded
    lanes contribute exactly zero, so packed and lane-padded layouts need
    no unpacking or slicing beyond the natural-layout state slice.
    """
    log_states = float(np.log(states))

    def compute(observation, batch_frames):
        obs = observation if packed else observation[0, :, :states]
        if log_input:
            terms = jnp.where(jnp.isfinite(obs), jnp.exp(obs) * obs, 0.0)
        else:
            terms = jnp.where(obs > 0, obs * jnp.log(obs), 0.0)
        axes = (0, 1, 3) if packed else 1
        ent = -terms.sum(axis=axes) / log_states
        return ent, batch_frames[0].astype(jnp.int32)

    return jax.jit(compute)


@functools.lru_cache(maxsize=16)
def _assemble_fn(packed, bucket, log_input):
    """One gather: (1, frames) observation -> (n_rows, bucket) chunk rows.

    Chunk row i is frames [starts[i], starts[i] + bucket) of the single
    real row; frames past the row's real length are live LATER frames (or
    the -inf/0.0 tail pad), masked downstream by batch_frames exactly like
    the dispatcher's own frame-bucket padding. Boundaries are runtime
    inputs: every split pattern with the same (n_rows, bucket) shares this
    compile.
    """
    pad_value = NEG_INF if log_input else 0.0

    def assemble(observation, starts):
        if packed:
            obs = jnp.pad(
                observation, ((0, 0), (0, 0), (0, bucket), (0, 0)),
                constant_values=pad_value)

            def one(start):
                return jax.lax.dynamic_slice_in_dim(
                    obs[:, 0], start, bucket, axis=1)

            rows = jax.vmap(one)(starts)        # (n, M, bucket, 128)
            return jnp.transpose(rows, (1, 0, 2, 3))
        obs = jnp.pad(
            observation, ((0, 0), (0, bucket), (0, 0)),
            constant_values=pad_value)

        def one(start):
            return jax.lax.dynamic_slice_in_dim(obs[0], start, bucket, axis=0)

        return jax.vmap(one)(starts)            # (n, bucket, states_in)

    return jax.jit(assemble)


@functools.lru_cache(maxsize=2)
def _reassemble_fn():
    """One gather: per-row decoded indices -> the (1, frames) path.

    out[t] = indices[row(t), t - starts[row(t)]] for t < valid, frozen at
    the final decoded state beyond (the reference's argmax-seed broadcast,
    /root/reference/torbi/csrc/viterbi.cpp:218-225).
    """
    def reassemble(indices, starts, valid, frames):
        t = jnp.arange(frames, dtype=jnp.int32)
        tc = jnp.minimum(t, valid - 1)
        row = jnp.searchsorted(starts, tc, side='right') - 1
        return indices[row, tc - starts[row]][None]

    return jax.jit(reassemble, static_argnums=3)


def plan_splits(entropy_values, valid, target):
    """Host-side split plan: (starts, lengths) int32 arrays, or None when
    chunking cannot pay.

    Aims for ~``target`` frames per chunk in multiples of 8 rows (one
    backtrace batch tile), requiring at least 4 rows and at least a 2x
    reduction in serial tile-frames (tiles x padded frame bucket) over the
    unchunked sequence -- diffuse observations with few confident split
    points fall back to the exact serial kernels.
    """
    from ..chunk import splits_from_entropy
    from .dispatch import bucket_frames

    n_target = max(8, -(-valid // int(target)))
    min_chunk = max(2, valid // n_target)
    points = splits_from_entropy(
        entropy_values[:valid], min_chunk,
        float(torbi_tpu.ENTROPY_THRESHOLD))
    if len(points) < 3:
        return None
    starts = np.concatenate([[0], points]).astype(np.int32)
    lengths = np.diff(np.concatenate([starts, [valid]])).astype(np.int32)
    bucket = bucket_frames(int(lengths.max()))
    tiles = -(-len(starts) // 8)
    if tiles * bucket * 2 > bucket_frames(valid):
        return None
    return starts, lengths, bucket


def decode_chunked(observation, batch_frames, transition, initial, *,
                   backend, packed, states, log_input, apply_epsilon):
    """Auto-chunked batch-1 decode, or None to fall back to the serial
    kernels (no viable split plan, or the assembly would not fit the
    memory budget). Called by ``dispatch.decode`` only; preconditions
    (batch 1, banded transition with width > 0, finiteness established by
    the band gate) hold there.
    """
    from . import dispatch

    frames = observation.shape[2] if packed else observation.shape[1]
    # The assembly materializes ~2.2x the observation (tail-padded copy +
    # the gathered rows); a sequence too big for that decodes serially,
    # exactly as before this route existed
    obs_bytes = int(np.prod(observation.shape)) * 4
    if obs_bytes * 5 > int(torbi_tpu.DECODE_MEMORY_BUDGET) * 2:
        return None

    observation = jnp.asarray(observation)
    batch_frames = jnp.asarray(batch_frames).astype(jnp.int32)
    target = int(getattr(torbi_tpu, 'BATCH1_CHUNK_FRAMES', 1280))

    def compute():
        ent, valid = jax.device_get(_entropy_fn(
            packed, log_input, states)(observation, batch_frames))
        valid = int(min(int(valid), frames))
        if valid < int(getattr(
                torbi_tpu, 'BATCH1_AUTO_CHUNK_MIN_FRAMES', 4096)):
            return None
        split_plan = plan_splits(ent, valid, target)
        if split_plan is None:
            return None
        starts, lengths, bucket = split_plan
        # Device copies live in the plan so steady-state decodes of a
        # resident buffer re-submit with no host->device transfers
        return (jnp.asarray(starts), jnp.asarray(lengths), bucket, valid)

    plan = _cached_plan(
        observation, batch_frames, compute,
        extra_key=(target, float(torbi_tpu.ENTROPY_THRESHOLD),
                   int(getattr(
                       torbi_tpu, 'BATCH1_AUTO_CHUNK_MIN_FRAMES', 4096))))
    if plan is None:
        return None
    starts, lengths, bucket, valid = plan

    rows = _assemble_fn(packed, bucket, log_input)(observation, starts)
    indices = dispatch.decode(
        rows, lengths, transition, initial, backend=backend,
        finite_observation=True, log_input=log_input,
        apply_epsilon=apply_epsilon)
    return _reassemble_fn()(indices, starts, valid, frames)
