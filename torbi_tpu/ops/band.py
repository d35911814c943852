"""Banded Viterbi forward kernels (pure band and band + constant floor).

The reference always runs the dense O(S^2) recursion
(/root/reference/torbi/csrc/cuda/viterbi.cu:87-117). But its own headline
benchmark uses a band-limited pitch transition matrix
(/root/reference/torbi/evaluate/core.py:23-34): after the evaluation
pipeline's ``log(p + tiny)`` (torbi/core.py:340-346), entries outside a
diagonal band of ~175 of 1440 columns are all exactly ``log(tiny)`` -- a
constant floor. These kernels exploit that structure TPU-natively:

- In-band scores: the transition band is compressed to a (bandwidth, states)
  matrix and the recursion computes ``max_d(posterior[j+d+lo] + band[d, j])``
  by rolling the posterior along the lane axis once per diagonal offset --
  O(S * bandwidth) work, no layout transposes, 8 sequences vectorized on
  sublanes.
- Out-of-band scores (floor mode): for every destination j the out-of-band
  candidates share the constant ``floor``, so their max is
  ``floor + max(posterior outside [j+lo, j+hi])``. The window complement is a
  prefix [0, j+lo) plus a suffix (j+hi, S); both maxes (and leftmost argmaxes)
  come from two Hillis-Steele cumulative-max lane scans -- O(S log S) per
  step, shared across all j.

Exactness incl. tie-breaking (first-max = lowest source index): prefix
argmax keeps the leftmost tie; prefix indices < in-band indices < suffix
indices, and the in-band scan keeps the lowest offset, so combining with
strict-greater updates reproduces the dense lowest-index rule bit-exactly.
With a finite floor, every posterior entry is finite from t>=1 onward
(score_j >= floor + global max) provided at least one initial entry is
finite; ``detect_band`` + dispatch gating enforce the preconditions and fall
back to the dense kernel otherwise.
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float('-inf')
_INT_MAX = 2**30

# Grid tile sizes: sequences and frames per kernel invocation
BATCH_TILE = 8
FRAME_TILE = 8


def _round_up(value, multiple):
    return ((value + multiple - 1) // multiple) * multiple


@functools.partial(jax.jit, static_argnames=())
def _band_stats(transition):
    """Fused device-side band statistics: (floor, lo, hi, n_above)"""
    states = transition.shape[0]
    floor = jnp.min(transition)
    above = transition > floor
    n_above = jnp.sum(above)
    rows = jnp.arange(states)[:, None]
    cols = jnp.arange(states)[None, :]
    d = cols - rows
    big = 2 * states
    lo = jnp.min(jnp.where(above, d, big))
    hi = jnp.max(jnp.where(above, d, -big))
    return floor, lo, hi, n_above


# Detection results cached per live transition array (keyed by buffer
# identity); detection costs a host sync per call otherwise
_detect_cache = {}


def detect_band(transition, states_padded=None):
    """Detect a diagonal band (with -inf or constant-floor exterior).

    transition: (states, states) log-probabilities (unpadded).

    Returns (lo, width, floor) with python-scalar lo/width and floor either
    None (exterior is -inf) or a finite python float (exterior is exactly
    constant), or None when the banded kernels do not apply.
    """
    import weakref

    import torbi_tpu

    del states_padded
    cache_key = None
    try:
        cache_key = (id(transition), transition.shape,
                     transition.unsafe_buffer_pointer())
    except Exception:
        pass
    if cache_key is not None and cache_key in _detect_cache:
        result, ref = _detect_cache[cache_key]
        if ref() is transition:
            return result
        del _detect_cache[cache_key]

    states = transition.shape[0]
    # Exterior entries (outside [lo, hi]) must all equal the floor exactly;
    # since floor is the global min and `above` is defined by > floor, no
    # above-floor entry lies outside [lo, hi] by construction, and exterior
    # entries are both <= floor (it is the min) and >= floor, i.e. == floor.
    floor, lo, hi, n_above = jax.device_get(_band_stats(transition))

    result = None
    if n_above > 0:
        lo, hi = int(lo), int(hi)
        width = hi - lo + 1
        floor = float(floor)
        if width <= torbi_tpu.BAND_MAX_FRACTION * states:
            import numpy as np
            if floor == NEG_INF:
                result = (lo, width, None)
            elif np.isfinite(floor):
                result = (lo, width, floor)

    if cache_key is not None:
        if len(_detect_cache) > 64:
            _detect_cache.clear()
        # Hold a weakref so a GC'd buffer cannot alias a new array at the
        # same id/pointer
        try:
            ref = weakref.ref(transition)
        except TypeError:
            ref = lambda: transition
        _detect_cache[cache_key] = (result, ref)
    return result


def gate_band(band, initial, observation=None, finite_observation=False):
    """Enforce the exactness preconditions (module docstring); returns band
    or None (fall back to dense).

    - pure -inf band: initial must be all-finite
    - constant floor: at least one finite initial entry
    - both: finite observation (``finite_observation=True`` asserts it
      without scanning -- true for from_probabilities' epsilon pipeline)
    """
    if band is None:
        return None
    floor = band[2]
    if floor is None:
        if not bool(jnp.isfinite(initial).all()):
            return None
    else:
        if not bool(jnp.isfinite(initial).any()):
            return None
    if not finite_observation and observation is not None:
        if not bool(jnp.isfinite(observation).all()):
            return None
    return band


def build_band_matrix(transition_padded, lo, width):
    """Compress a padded dense transition into (width_padded, states_padded).

    band[d, j] = transition[j, j + d + lo], -inf where out of range (the -inf
    padding of the dense matrix makes out-of-matrix gathers -inf as well).
    Traced (jit-safe) given static lo/width.
    """
    states_padded = transition_padded.shape[0]
    width_padded = _round_up(width, 8)
    j = jnp.arange(states_padded)[None, :]
    dd = jnp.arange(width_padded)[:, None]
    i = j + dd + lo
    valid = (dd < width) & (i >= 0) & (i < states_padded)
    gathered = transition_padded[
        jnp.broadcast_to(j, i.shape), jnp.clip(i, 0, states_padded - 1)]
    return jnp.where(valid, gathered, NEG_INF)


def _lane_scan_max(values, lane_index, states_padded, reverse=False):
    """Hillis-Steele cumulative (max, leftmost-argmax) along the lane axis.

    values: (8, S) float32; lane_index: (8, S) int32 absolute lane ids.
    Returns (running max, running argmax) arrays of the same shape; entry k
    holds the max/argmax over lanes [0, k] (or [k, S) when reverse).
    """
    m = values
    a = lane_index
    shift = 1
    while shift < states_padded:
        if reverse:
            m_s = pltpu.roll(m, states_padded - shift, 1)
            a_s = pltpu.roll(a, states_padded - shift, 1)
            oob = lane_index >= states_padded - shift
        else:
            m_s = pltpu.roll(m, shift, 1)
            a_s = pltpu.roll(a, shift, 1)
            oob = lane_index < shift
        m_s = jnp.where(oob, NEG_INF, m_s)
        a_s = jnp.where(oob, _INT_MAX, a_s)
        # Combine, preferring the lower index on ties
        take = (m_s > m) | ((m_s == m) & (a_s < a))
        m = jnp.where(take, m_s, m)
        a = jnp.where(take, a_s, a)
        shift *= 2
    return m, a


def _band_kernel(
        obs_ref,       # (8, 8, S) VMEM block at (n, t)
        band_ref,      # (width_padded, S) VMEM, resident
        init_ref,      # (1, S) VMEM, resident
        frames_ref,    # (8, 1) int32 VMEM block at (n, 0)
        trellis_ref,   # out: (8, 8, S) int32 block at (n, t)
        post_ref,      # out: (8, S) float32 block at (n, 0); also the carry
        *,
        states_padded,
        lo,
        width,
        floor):
    tb = pl.program_id(1)
    hi = lo + width - 1

    # Max frame count within this 8-row block, for whole-frame skipping
    block_max = frames_ref[0, 0]
    for b in range(1, BATCH_TILE):
        block_max = jnp.maximum(block_max, frames_ref[b, 0])

    frames_col = frames_ref[...]  # (8, 1)
    shift0 = (-lo) % states_padded
    lane_index = lax.broadcasted_iota(
        jnp.int32, (BATCH_TILE, states_padded), 1)

    for k in range(FRAME_TILE):
        t = tb * FRAME_TILE + k

        @pl.when(t == 0)
        def _init(k=k):
            post_ref[...] = obs_ref[:, 0, :] + init_ref[...]
            trellis_ref[:, k, :] = jnp.zeros(
                (BATCH_TILE, states_padded), jnp.int32)

        @pl.when(jnp.logical_and(t > 0, t < block_max))
        def _step(k=k, t=t):
            post = post_ref[...]  # (8, S)

            if floor is not None:
                # Out-of-band floor candidates via prefix/suffix lane scans.
                # left_best[j] = max(post[0 .. j+lo-1]) (leftmost argmax),
                # right_best[j] = max(post[j+hi+1 ..]).
                p_m, p_a = _lane_scan_max(
                    post, lane_index, states_padded, reverse=False)
                s_m, s_a = _lane_scan_max(
                    post, lane_index, states_padded, reverse=True)

                lshift = (1 - lo) % states_padded
                left_m = pltpu.roll(p_m, lshift, 1)
                left_a = pltpu.roll(p_a, lshift, 1)
                left_empty = (lane_index + lo - 1 < 0) | (
                    lane_index + lo - 1 >= states_padded)
                best = jnp.where(
                    left_empty, NEG_INF, left_m + floor)
                arg = jnp.where(left_empty, _INT_MAX, left_a)

                rshift = (-(hi + 1)) % states_padded
                right_m = pltpu.roll(s_m, rshift, 1)
                right_a = pltpu.roll(s_a, rshift, 1)
                right_empty = lane_index + hi + 1 >= states_padded
                right_v = jnp.where(
                    right_empty, NEG_INF, right_m + floor)
                right_arg = jnp.where(right_empty, _INT_MAX, right_a)
            else:
                best = jnp.full(
                    (BATCH_TILE, states_padded), NEG_INF, jnp.float32)
                arg = jnp.zeros((BATCH_TILE, states_padded), jnp.int32)

            # In-band max via rolled posterior windows. Statically unrolled
            # with an independent roll per offset: a fori_loop with a
            # loop-carried roll serializes the whole chain and stalls the
            # vector pipeline on scalar index math
            m_ib = jnp.full(
                (BATCH_TILE, states_padded), NEG_INF, jnp.float32)
            a_ib = jnp.zeros((BATCH_TILE, states_padded), jnp.int32)
            for d in range(width):
                rolled = pltpu.roll(post, (shift0 - d) % states_padded, 1)
                v = rolled + band_ref[d:d + 1, :]  # (8,S) + (1,S)
                gt = v > m_ib
                a_ib = jnp.where(gt, d, a_ib)
                m_ib = jnp.where(gt, v, m_ib)
            abs_ib = lane_index + a_ib + lo  # absolute source index

            if floor is not None:
                # Combine: prefix-floor (lowest indices) loses only to a
                # strictly greater in-band score; in-band loses only to a
                # strictly greater suffix-floor score. Index ordering
                # prefix < in-band < suffix makes this the lowest-index rule.
                take = m_ib > best
                best = jnp.where(take, m_ib, best)
                arg = jnp.where(take, abs_ib, arg)
                take = right_v > best
                best = jnp.where(take, right_v, best)
                arg = jnp.where(take, right_arg, arg)
                # Degenerate all -inf row: dense argmax yields 0
                arg = jnp.where(arg == _INT_MAX, 0, arg)
            else:
                best = m_ib
                arg = abs_ib

            valid = t < frames_col  # (8, 1)
            trellis_ref[:, k, :] = jnp.where(valid, arg, 0)
            post_ref[...] = jnp.where(
                valid, obs_ref[:, k, :] + best, post)

        @pl.when(jnp.logical_and(t > 0, t >= block_max))
        def _padded(k=k):
            trellis_ref[:, k, :] = jnp.zeros(
                (BATCH_TILE, states_padded), jnp.int32)


@functools.lru_cache(maxsize=64)
def _build_band_forward(batch, frames, states_padded, lo, width, floor,
                        interpret=False):
    assert batch % BATCH_TILE == 0 and frames % FRAME_TILE == 0
    width_padded = _round_up(width, 8)
    kernel = functools.partial(
        _band_kernel,
        states_padded=states_padded,
        lo=lo,
        width=width,
        floor=floor)
    grid = (batch // BATCH_TILE, frames // FRAME_TILE)
    in_specs = [
        pl.BlockSpec(
            (BATCH_TILE, FRAME_TILE, states_padded),
            lambda n, t: (n, t, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (width_padded, states_padded),
            lambda n, t: (0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, states_padded),
            lambda n, t: (0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (BATCH_TILE, 1),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec(
            (BATCH_TILE, FRAME_TILE, states_padded),
            lambda n, t: (n, t, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (BATCH_TILE, states_padded),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((batch, frames, states_padded), jnp.int32),
            jax.ShapeDtypeStruct((batch, states_padded), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=batch * frames * 5 * width * states_padded,
            bytes_accessed=(
                batch * frames * states_padded * 8
                + width_padded * states_padded * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret)

    def forward(observation, batch_frames, transition_padded, initial):
        band_matrix = build_band_matrix(transition_padded, lo, width)
        bf = batch_frames.astype(jnp.int32)
        return call(
            observation,
            band_matrix,
            initial.reshape(1, states_padded),
            bf.reshape(batch, 1))

    return jax.jit(forward)


def viterbi_forward_band(observation, batch_frames, transition_padded,
                         initial, band, interpret=False):
    """Banded Pallas forward pass over pre-padded inputs.

    band: (lo, width, floor) from detect_band, measured on the unpadded
    transition. Returns (trellis (batch, frames, states_padded) int32,
    posterior (batch, states_padded) float32).
    """
    lo, width, floor = band
    batch, frames, states_padded = observation.shape
    fwd = _build_band_forward(
        batch, frames, states_padded, lo, width, floor, interpret)
    return fwd(observation, batch_frames, transition_padded, initial)
