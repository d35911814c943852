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
3. ONE jitted program does everything else -- chunk rows gather out of the
   sequence by dynamic slice (boundaries are runtime inputs: every split
   pattern with the same (rows, frame bucket) shares the compile), the
   ordinary staged decode pipeline from ``dispatch._build_decode`` inlines
   over the row batch (stitched band kernels, mod-M backtrace: a serial
   chase over the longest ROW instead of the whole sequence), and the
   per-row paths gather back into the (1, frames) sequence, frames past a
   row's valid length frozen at its last decoded state (the reference's
   padded-batch freeze semantics). One dispatch per decode, exactly like
   the serial path -- the earlier three-dispatch form (assemble / decode /
   reassemble as separate jits) measured 2.3 ms/call slower through the
   per-dispatch tunnel latency.

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


@functools.lru_cache(maxsize=32)
def _chunked_decode_fn(backend, batch_p, bucket, frames, packed, states,
                       states_in, band, interpret, log_input, apply_epsilon,
                       config_key):
    """The single-dispatch chunked decode: gather rows -> staged pipeline
    -> gather the sequence back, jitted as one program.

    Chunk row i is frames [starts[i], starts[i] + bucket) of the single
    real row; frames past the row's real length are live LATER frames (or
    the -inf/0.0 tail pad), masked downstream by lengths exactly like the
    dispatcher's own frame-bucket padding. Padding rows (batch_p > real
    rows) gather from start 0 with length 1. The final gather reads
    out[t] = indices[row(t), t - starts[row(t)]] for t < valid and freezes
    the tail at the last decoded state (the reference's argmax-seed
    broadcast, /root/reference/torbi/csrc/viterbi.cpp:218-225).
    """
    from .dispatch import _build_decode

    pipeline = _build_decode(
        backend, batch_p, bucket, states, states_in, band, interpret,
        log_input, apply_epsilon, None, config_key, packed,
        single=False, spread=False)
    pad_value = NEG_INF if log_input else 0.0

    def combined(observation, starts_pad, lengths_pad, starts, valid,
                 trans_p, init_p, band_matrix):
        if packed:
            obs = jnp.pad(
                observation, ((0, 0), (0, 0), (0, bucket), (0, 0)),
                constant_values=pad_value)
            rows = jax.vmap(
                lambda start: jax.lax.dynamic_slice_in_dim(
                    obs[:, 0], start, bucket, axis=1))(starts_pad)
            rows = jnp.transpose(rows, (1, 0, 2, 3))
        else:
            obs = jnp.pad(
                observation, ((0, 0), (0, bucket), (0, 0)),
                constant_values=pad_value)
            rows = jax.vmap(
                lambda start: jax.lax.dynamic_slice_in_dim(
                    obs[0], start, bucket, axis=0))(starts_pad)
        indices = pipeline(rows, lengths_pad, trans_p, init_p, band_matrix)
        t = jnp.arange(frames, dtype=jnp.int32)
        tc = jnp.minimum(t, valid - 1)
        row = jnp.searchsorted(starts, tc, side='right') - 1
        return indices[row, tc - starts[row]][None]

    return jax.jit(combined)


def plan_splits(entropy_values, valid, target):
    """Host-side split plan: (starts, lengths, frame bucket), or None when
    chunking cannot pay.

    Aims for ~``target`` frames per chunk in multiples of 8 rows (one
    backtrace batch tile), requiring at least 4 rows and at least a 2x
    reduction in serial tile-frames (tiles x padded frame bucket; the TPU
    grid is sequential, so chase steps ADD across tiles) over the
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
                   backend, packed, states, band, log_input, apply_epsilon):
    """Auto-chunked batch-1 decode, or None to fall back to the serial
    kernels (no viable split plan, or the assembly would not fit the
    memory budget). Called by ``dispatch.decode`` only; preconditions
    (batch 1, banded transition with width > 0, finiteness established by
    the band gate) hold there. Bypasses the dispatcher's memory guard and
    auto-shard (single-chip batch-1 is the target; the size guard below
    bounds the footprint instead).
    """
    from . import dispatch

    frames = observation.shape[2] if packed else observation.shape[1]
    states_in = (
        observation.shape[0] * observation.shape[3] if packed
        else observation.shape[2])
    # The program materializes ~2.2x the observation (tail-padded copy +
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
        batch_p = dispatch.bucket_batch(len(starts))
        pad = batch_p - len(starts)
        # Device copies live in the plan so steady-state decodes of a
        # resident buffer re-submit with no host->device transfers;
        # padding rows gather [0, bucket) and decode 1 valid frame
        return (
            jnp.asarray(np.pad(starts, (0, pad))),
            jnp.asarray(np.pad(lengths, (0, pad), constant_values=1)),
            jnp.asarray(starts), batch_p, bucket, valid)

    plan = _cached_plan(
        observation, batch_frames, compute,
        extra_key=(target, float(torbi_tpu.ENTROPY_THRESHOLD),
                   int(getattr(
                       torbi_tpu, 'BATCH1_AUTO_CHUNK_MIN_FRAMES', 4096))))
    if plan is None:
        return None
    starts_pad, lengths_pad, starts, batch_p, bucket, valid = plan

    interpret = jax.default_backend() != 'tpu'
    states_p = ((states + 127) // 128) * 128
    trans_p, init_p, band_matrix = dispatch._prepare_padded(
        transition, initial, states, states_p, band)
    fn = _chunked_decode_fn(
        backend, batch_p, bucket, frames, packed, states, states_in, band,
        interpret, log_input, apply_epsilon, dispatch._config_key())
    return fn(observation, starts_pad, lengths_pad, starts, valid,
              trans_p, init_p, band_matrix)
