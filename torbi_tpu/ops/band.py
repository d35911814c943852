"""Banded Viterbi forward kernels (pure band and band + constant floor).

The reference always runs the dense O(S^2) recursion
(/root/reference/torbi/csrc/cuda/viterbi.cu:87-117). But its own headline
benchmark uses a band-limited pitch transition matrix
(/root/reference/torbi/evaluate/core.py:23-34): after the evaluation
pipeline's ``log(p + tiny)`` (torbi/core.py:340-346), entries outside a
diagonal band of ~175 of 1440 columns are all exactly ``log(tiny)`` -- a
constant floor. These kernels exploit that structure TPU-natively.

Design (v2, max-only forward). The forward recursion computes *values only*:

    score[j] = max_d(posterior[j + d + lo] + band[d, j])        (in-band)
    score[j] = max(score[j], floor + max_i posterior[i])        (floor mode)

- The in-band max rolls the posterior along the lane axis once per diagonal
  offset: 3 VPU ops per (state, offset) candidate (roll, add, max) -- no
  argmax bookkeeping in the hot loop.
- The out-of-band floor candidates all share the constant ``floor``, and any
  in-band source i double-counted at ``floor + posterior[i]`` is dominated by
  its in-band score (``band[d, j] >= floor`` because floor is the global
  minimum), so the exact out-of-band contribution reduces to one lane-max of
  the posterior per frame -- O(log S), not O(S log S).

Instead of an int32 backpointer trellis, the kernel streams the *posterior
columns* (same bytes, float32) to HBM, plus every 8th column again as
``boundary`` blocks. Backpointers are recovered exactly -- including the
dense lowest-source-index tie rule -- only along the realized path by the
Pallas backtrace kernel (ops/backtrace.py), which re-argmaxes one full
transition row per step from the stored posteriors. This halves forward
arithmetic versus tracking argmax inline and makes tie-breaking trivially
match the reference CPU rule (viterbi.cpp:94-100).

Exactness preconditions (``gate_band`` enforces; dispatch falls back to the
dense kernel otherwise): a pure -inf exterior requires all-finite initial;
a constant finite floor requires at least one finite initial entry; both
require a finite observation (guaranteed by from_probabilities' epsilon
pipeline, torbi/core.py:193-197).
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float('-inf')

# Grid tile sizes: sequences and frames per kernel invocation
BATCH_TILE = 8
FRAME_TILE = 8


def _round_up(value, multiple):
    return ((value + multiple - 1) // multiple) * multiple


# Detection and gating results cached per live jax array (keyed by object
# identity -- jax arrays are immutable, so identity implies content; a host
# sync per decode call otherwise). Mutable numpy inputs are never cached:
# their stats are computed directly in numpy instead.
from ..utils.cache import identity_cached as _identity_cached  # noqa: E402

_detect_cache = {}
_initial_gate_cache = {}


def detect_band(transition, states_padded=None):
    """Detect a diagonal band (with -inf or constant-floor exterior).

    transition: (states, states) log-probabilities (unpadded).

    Returns (lo, width, floor) with python-scalar lo/width and floor either
    None (exterior is -inf) or a finite python float (exterior is exactly
    constant), or None when the banded kernels do not apply.
    """
    import numpy as np

    import torbi_tpu

    del states_padded
    states = transition.shape[0]

    def stats():
        # Exterior entries (outside [lo, hi]) must all equal the floor
        # exactly; since floor is the global min and `above` is defined by
        # > floor, no above-floor entry lies outside [lo, hi] by
        # construction, and exterior entries are both <= floor (it is the
        # min) and >= floor, i.e. == floor. Computed on the host: one D2H
        # of the matrix is orders of magnitude cheaper than compiling and
        # synchronizing a device reduction for a one-time detection.
        host = np.asarray(transition)
        floor = host.min()
        rows, cols = np.nonzero(host > floor)
        d = cols.astype(np.int64) - rows.astype(np.int64)
        n_above = d.size
        lo = d.min() if n_above else 0
        hi = d.max() if n_above else 0
        return floor, lo, hi, n_above

    floor, lo, hi, n_above = _identity_cached(
        _detect_cache, transition, stats)

    result = None
    if n_above > 0:
        lo, hi = int(lo), int(hi)
        width = hi - lo + 1
        floor = float(floor)
        if width <= torbi_tpu.BAND_MAX_FRACTION * states:
            if floor == NEG_INF:
                result = (lo, width, None)
            elif np.isfinite(floor):
                result = (lo, width, floor)
    elif np.isfinite(floor):
        # Constant transition matrix (e.g. the uniform default,
        # torbi/core.py:174-180): a width-0 band whose every candidate is
        # the floor -- the recursion collapses to one lane-max per frame,
        # score[j] = floor + max_i posterior[i], exactly (monotone
        # rounding: fl(floor + max p) == max_i fl(floor + p_i))
        result = (0, 0, float(floor))
    return result


def _initial_finite_ok(initial, need_all):
    import numpy as np

    if isinstance(initial, np.ndarray):
        finite = np.isfinite(initial)
        return bool(finite.all() if need_all else finite.any())

    def compute():
        finite = jnp.isfinite(initial)
        return bool(finite.all() if need_all else finite.any())

    return _identity_cached(
        _initial_gate_cache, initial, compute, extra_key=bool(need_all))


def gate_band(band, initial, observation=None, finite_observation=False):
    """Enforce the exactness preconditions (module docstring); returns band
    or None (fall back to dense).

    - pure -inf band: initial must be all-finite
    - constant floor: at least one finite initial entry
    - both: finite observation (``finite_observation=True`` asserts it
      without scanning -- true for from_probabilities' epsilon pipeline)

    The initial-distribution check is cached per live jax array; the
    observation check is per call (data-dependent) unless asserted away.
    """
    if band is None:
        return None
    if not _initial_finite_ok(initial, need_all=band[2] is None):
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
    width_padded = max(_round_up(width, 8), 8)  # width 0: all--inf block
    j = jnp.arange(states_padded)[None, :]
    dd = jnp.arange(width_padded)[:, None]
    i = j + dd + lo
    valid = (dd < width) & (i >= 0) & (i < states_padded)
    gathered = transition_padded[
        jnp.broadcast_to(j, i.shape), jnp.clip(i, 0, states_padded - 1)]
    return jnp.where(valid, gathered, NEG_INF)


def _band_kernel(
        obs_ref,       # (8, 8, S_in) VMEM block at (n, t); S_in unpadded
        band_ref,      # (width_padded, S) VMEM, resident
        init_ref,      # (1, S) VMEM, resident
        frames_ref,    # (8, 1) int32 VMEM block at (n, 0)
        postseq_ref,   # out: (8, 8, S) float32 block at (n, t)
        post_ref,      # out: (8, S) float32 block at (n, 0); also the carry
        *,
        states_in,
        states_padded,
        lo,
        width,
        floor,
        log_input=True,
        apply_epsilon=False,
        frame_tile=FRAME_TILE):
    tb = pl.program_id(1)

    def obs_col(k):
        # Observations stream in unpadded (saves an XLA pad copy of the
        # largest input); lane-pad to the padded state count in-register.
        # The probability->log conversion and the reference's epsilon
        # stabilization (torbi/core.py:188-197: log, then exp/+tiny/log,
        # exactly in that order for bitwise parity) fold into the stream
        # -- in-register VPU work instead of an extra full-size HBM
        # read+write pass before the kernel.
        col = obs_ref[:, k, :]
        if not log_input:
            col = jnp.log(col)
        if apply_epsilon:
            col = jnp.log(
                jnp.exp(col) + jnp.float32(jnp.finfo(jnp.float32).tiny))
        if states_in == states_padded:
            return col
        pad = jnp.full(
            (BATCH_TILE, states_padded - states_in), NEG_INF, jnp.float32)
        return jnp.concatenate([col, pad], axis=1)

    # Max frame count within this 8-row block, for whole-frame skipping
    block_max = frames_ref[0, 0]
    for b in range(1, BATCH_TILE):
        block_max = jnp.maximum(block_max, frames_ref[b, 0])

    frames_col = frames_ref[...]  # (8, 1)
    shift0 = (-lo) % states_padded

    for k in range(frame_tile):
        t = tb * frame_tile + k

        @pl.when(t == 0)
        def _init(k=k):
            post0 = obs_col(0) + init_ref[...]
            post_ref[...] = post0
            postseq_ref[:, k, :] = post0

        @pl.when(jnp.logical_and(t > 0, t < block_max))
        def _step(k=k, t=t):
            post = post_ref[...]  # (8, S)

            # In-band max via rolled posterior windows: one full-width
            # lane-roll, broadcast-add, and max per diagonal offset,
            # statically unrolled. MEASURED FLOOR (scripts/kernel_lab.py,
            # headline shape): the v5e permute port retires ~1 vreg/cycle
            # while the ALUs retire ~4 vreg-ops/cycle, so the W rolls --
            # not the adds/maxes -- are the critical resource (roll+add+max
            # 95.5 ms vs add+max alone 39.9 ms). Attempts to cut roll
            # traffic all failed: sharing one roll per (shift mod 128)
            # residue with vreg-granular rotations of the result (rolls or
            # aligned slice+concat) lowers to the same permute work, and
            # one-hot matmul shifts on the idle MXU are ~8x slower. The
            # interleaved accumulators keep the reduction in short
            # dependency chains; wrap-around lanes are masked by the -inf
            # band-matrix edges (build_band_matrix), so circular rolls are
            # exact.
            m = None
            if width:
                n_acc = min(4, width)
                accs = [
                    jnp.full(
                        (BATCH_TILE, states_padded), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                for d in range(width):
                    rolled = pltpu.roll(
                        post, (shift0 - d) % states_padded, 1)
                    accs[d % n_acc] = jnp.maximum(
                        accs[d % n_acc], rolled + band_ref[d:d + 1, :])
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)

            if floor is not None:
                # Exact out-of-band contribution: floor + global posterior
                # max (in-band sources double-counted at the floor are
                # dominated by their in-band candidate since band >= floor).
                # With width 0 (constant transition) this is the whole
                # recursion: one lane-max per frame
                gmax = jnp.max(post, axis=1, keepdims=True)  # (8, 1)
                fm = gmax + floor
                m = fm if m is None else jnp.maximum(m, fm)

            valid = t < frames_col  # (8, 1)
            new_post = jnp.where(valid, obs_col(k) + m, post)
            post_ref[...] = new_post
            postseq_ref[:, k, :] = new_post

        @pl.when(jnp.logical_and(t > 0, t >= block_max))
        def _padded(k=k):
            postseq_ref[:, k, :] = post_ref[...]


def build_band_matrix_tilted(band_matrix, states_padded):
    """Tilt a (width_padded, S) band matrix to (width_padded, R, 128).

    Tilted layout (see _band_kernel_tilted): destination state
    s = 128*a + l lives at sublane a*BATCH_TILE + b, lane l -- the band
    value is batch-independent, so each a-row is repeated across the
    BATCH_TILE b-sublanes. Traced (jit-safe)."""
    width_padded = band_matrix.shape[0]
    n_vregs = states_padded // 128
    rows = band_matrix.reshape(width_padded, n_vregs, 1, 128)
    return jnp.broadcast_to(
        rows, (width_padded, n_vregs, BATCH_TILE, 128)).reshape(
            width_padded, n_vregs * BATCH_TILE, 128)


def _band_kernel_tilted(
        obs_ref,       # (8, ft, S_in) VMEM block at (n, t); S_in unpadded
        band_ref,      # (width_padded, R, 128) VMEM, resident (tilted)
        init_ref,      # (1, S) VMEM, resident
        frames_ref,    # (8, 1) int32 VMEM block at (n, 0)
        postseq_ref,   # out: (8, ft, S) float32 block at (n, t)
        post_ref,      # out: (8, S) float32 block at (n, 0)
        carry_ref,     # out: (R, 128) float32 block at (n, 0) -- the
                       #      TILTED posterior carry
        *,
        states_in,
        states_padded,
        lo,
        width,
        floor,
        log_input=True,
        apply_epsilon=False,
        frame_tile=FRAME_TILE):
    """Tilted-layout banded forward step.

    State s = 128*a + l sits at (sublane a*8 + b, lane l) for batch row b
    (R = 8 * S/128 sublanes by 128 lanes). An arbitrary state shift
    s_shift = 128*q + r then costs ONE intra-vreg lane rotate by r --
    shared by every diagonal offset with the same lane residue r -- plus
    two sublane rolls by multiples of 8 (pure vreg renaming, free on the
    measured v5e lowering) and one lane-mask select (ALU). The rolled
    layout pays a full-width unaligned roll (rotates + unshared cross-vreg
    merges on the permute port) per offset; this layout exposes the rotate
    sharing, cutting permute-port pressure by ~width/128 and moving the
    merge selects to the ALUs, which have slack (kernel-lab measurements
    in config/defaults.py).

    Tilt/untilt are sublane-aligned vreg moves (12 per frame at S=1536),
    paid once per frame rather than per offset; postseq and the final
    posterior are written UNTILTED so the backtrace kernel and dispatch
    glue are unchanged.
    """
    tb = pl.program_id(1)
    n_vregs = states_padded // 128
    rows = n_vregs * BATCH_TILE

    def obs_col(k):
        # Same conversion fold as _band_kernel (probability->log and the
        # reference epsilon, torbi/core.py:188-197)
        col = obs_ref[:, k, :]
        if not log_input:
            col = jnp.log(col)
        if apply_epsilon:
            col = jnp.log(
                jnp.exp(col) + jnp.float32(jnp.finfo(jnp.float32).tiny))
        if states_in == states_padded:
            return col
        pad = jnp.full(
            (BATCH_TILE, states_padded - states_in), NEG_INF, jnp.float32)
        return jnp.concatenate([col, pad], axis=1)

    def tilt(col):
        # (8, S) -> (R, 128): sublane-aligned vreg moves
        return jnp.concatenate(
            [col[:, i * 128:(i + 1) * 128] for i in range(n_vregs)],
            axis=0)

    def untilt(tilted):
        # (R, 128) -> (8, S)
        return jnp.concatenate(
            [tilted[i * BATCH_TILE:(i + 1) * BATCH_TILE, :]
             for i in range(n_vregs)],
            axis=1)

    # Offsets grouped by lane residue r of the roll shift; within a
    # residue they differ only by free sublane renames
    shift0 = (-lo) % states_padded
    groups = {}
    for d in range(width):
        s = (shift0 - d) % states_padded
        groups.setdefault(s % 128, []).append((d, s // 128))

    block_max = frames_ref[0, 0]
    for b in range(1, BATCH_TILE):
        block_max = jnp.maximum(block_max, frames_ref[b, 0])
    frames_col = frames_ref[...]  # (8, 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)

    for k in range(frame_tile):
        t = tb * frame_tile + k

        @pl.when(t == 0)
        def _init(k=k):
            post0 = obs_col(0) + init_ref[...]
            post_ref[...] = post0
            postseq_ref[:, k, :] = post0
            carry_ref[...] = tilt(post0)

        @pl.when(jnp.logical_and(t > 0, t < block_max))
        def _step(k=k, t=t):
            post = carry_ref[...]  # (R, 128), tilted

            m = None
            n_acc = min(4, max(width, 1))
            if width:
                accs = [
                    jnp.full((rows, 128), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                i = 0
                for r, items in groups.items():
                    rot = post if r == 0 else pltpu.roll(post, r, 1)
                    for d, q in items:
                        a = pltpu.roll(rot, (8 * q) % rows, 0)
                        if r == 0:
                            v = a
                        else:
                            b = pltpu.roll(rot, (8 * (q + 1)) % rows, 0)
                            v = jnp.where(lane >= r, a, b)
                        v = v + band_ref[d]
                        accs[i % n_acc] = jnp.maximum(accs[i % n_acc], v)
                        i += 1
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)

            if floor is not None:
                # Global per-batch-row posterior max in tilted layout:
                # reduce the n_vregs a-groups (aligned vreg maxes), then
                # lanes; broadcast back across the a-groups
                per_a = post[:BATCH_TILE, :]
                for i in range(1, n_vregs):
                    per_a = jnp.maximum(
                        per_a, post[i * BATCH_TILE:(i + 1) * BATCH_TILE, :])
                gmax = jnp.max(per_a, axis=1, keepdims=True)  # (8, 1)
                fm = jnp.concatenate([gmax] * n_vregs, axis=0) + floor
                m = fm if m is None else jnp.maximum(m, fm)

            new_tilted = tilt(obs_col(k)) + m
            valid = t < frames_col  # (8, 1)
            valid_t = jnp.concatenate([valid] * n_vregs, axis=0)  # (R, 1)
            kept_tilted = jnp.where(valid_t, new_tilted, post)
            kept = untilt(kept_tilted)
            post_ref[...] = kept
            postseq_ref[:, k, :] = kept
            carry_ref[...] = kept_tilted

        @pl.when(jnp.logical_and(t > 0, t >= block_max))
        def _padded(k=k):
            postseq_ref[:, k, :] = post_ref[...]


def mod_plan(states_padded, lo, width):
    """Static structure of the stitched mod-M band decomposition.

    Layout: state s lives at (sublane (s mod M)*8 + b, lane s div M) with
    M = states_padded / 128. A candidate source offset sigma = d + lo then
    reaches its destination through a lane-rotate alpha = -((r + sigma)
    div M) mod 128 (r = destination row) and a sublane rename beta =
    (-sigma) mod M. Only ~width/M + 1 DISTINCT lane-rotates exist for the
    whole band -- shared by every offset -- while renames are free vreg
    renaming on v5e (measured, scripts/kernel_lab.py 'subroll'). The
    per-offset work collapses to one masked add + max against a stitched
    band matrix per (alpha, beta) pair (~width + M pairs total).

    Returns (keys, pairs): sorted (alpha, beta) keys and, per key, the
    {destination row r: band offset d} assignment. Each (key, r) stripe
    has a unique owner by construction (the modular system has exactly one
    solution per cell), which is what makes the stitched max exact.
    """
    states = states_padded
    M = states // 128
    pairs = {}
    for d in range(width):
        sigma = (d + lo) % states
        beta = (-sigma) % M
        for r in range(M):
            kk = (r + sigma) // M
            alpha = (-kk) % 128
            pairs.setdefault((alpha, beta), {})[r] = d
    return sorted(pairs), pairs


@functools.lru_cache(maxsize=16)
def _mod_plan_indices(states_padded, lo, width):
    """Numpy gather indices for building stitched band matrices."""
    import numpy as np

    M = states_padded // 128
    rows = M * BATCH_TILE
    keys, pairs = mod_plan(states_padded, lo, width)
    idx_d = np.zeros((len(keys), rows), np.int32)
    mask = np.zeros((len(keys), rows), bool)
    for i, key in enumerate(keys):
        for r, d in pairs[key].items():
            idx_d[i, r * BATCH_TILE:(r + 1) * BATCH_TILE] = d
            mask[i, r * BATCH_TILE:(r + 1) * BATCH_TILE] = True
    col = (
        np.arange(128)[None, :] * M
        + (np.arange(rows) // BATCH_TILE)[:, None]).astype(np.int32)
    return keys, idx_d, mask, col


def build_band_matrix_stitched(band_matrix, states_padded, lo, width):
    """(width_padded, S) band matrix -> (P, M*8, 128) stitched matrices
    for the mod-M kernel (traced, jit-safe; see mod_plan)."""
    _, idx_d, mask, col = _mod_plan_indices(states_padded, lo, width)
    gathered = band_matrix[
        jnp.asarray(idx_d)[:, :, None], jnp.asarray(col)[None, :, :]]
    return jnp.where(jnp.asarray(mask)[:, :, None], gathered, NEG_INF)


def _band_kernel_stitched(
        obs_ref,       # (M, 8, ft, 128) mod-M-layout obs block at (0,n,t,0)
        band_ref,      # (P, R, 128) stitched band matrices, resident
        init_ref,      # (R, 128) mod-M initial distribution, resident
        frames_ref,    # (8, 1) int32 block at (n, 0)
        postseq_ref,   # out: (M, 8, ft, 128) posterior columns at (0,n,t,0)
        post_ref,      # out: (M, 8, 128) posterior at (0, n, 0); the carry
        *,
        states_padded,
        lo,
        width,
        floor,
        log_input=True,
        apply_epsilon=False,
        frame_tile=FRAME_TILE):
    """Stitched mod-M banded forward step (layout/permute math: mod_plan).

    Per frame: ~width/M + 1 lane-rotates (the permute-port bill -- the
    rolled kernel pays width full-width rolls), a free sublane rename and
    ONE masked add + max per stitched pair (~width + M), all against
    pre-built band matrices. The probability->log conversion and epsilon
    stabilization fold into the obs reads exactly like the rolled kernel
    (elementwise, layout-independent).

    All inputs/outputs carry the M-major layout (M, batch, ..., 128):
    state s = M*l + r lives at (r-block, batch row, lane l). In-kernel
    this is a pure sublane-merge view of the (R = M*8, 128) working
    shape; outside it means the posterior stream feeds the mod-M-aware
    backtrace kernel DIRECTLY -- no relayout copy between the kernels.
    """
    tb = pl.program_id(1)
    M = states_padded // 128
    rows = M * BATCH_TILE

    keys, _ = mod_plan(states_padded, lo, width)
    alphas = sorted({alpha for alpha, _ in keys})

    def obs_col(k):
        col = obs_ref[:, :, k, :].reshape(rows, 128)
        if not log_input:
            col = jnp.log(col)
        if apply_epsilon:
            col = jnp.log(
                jnp.exp(col) + jnp.float32(jnp.finfo(jnp.float32).tiny))
        return col

    block_max = frames_ref[0, 0]
    for b in range(1, BATCH_TILE):
        block_max = jnp.maximum(block_max, frames_ref[b, 0])
    frames_col = frames_ref[...]  # (8, 1)

    for k in range(frame_tile):
        t = tb * frame_tile + k

        @pl.when(t == 0)
        def _init(k=k):
            post0 = obs_col(0) + init_ref[...]
            post_ref[...] = post0.reshape(M, BATCH_TILE, 128)
            postseq_ref[:, :, k, :] = post0.reshape(M, BATCH_TILE, 128)

        @pl.when(jnp.logical_and(t > 0, t < block_max))
        def _step(k=k, t=t):
            post = post_ref[...].reshape(rows, 128)  # mod-M working shape

            m = None
            if width:
                rotated = {
                    alpha: (post if alpha == 0
                            else pltpu.roll(post, alpha, 1))
                    for alpha in alphas}
                n_acc = min(4, len(keys))
                accs = [
                    jnp.full((rows, 128), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                for i, (alpha, beta) in enumerate(keys):
                    v = rotated[alpha]
                    if beta:
                        v = pltpu.roll(v, (BATCH_TILE * beta) % rows, 0)
                    accs[i % n_acc] = jnp.maximum(
                        accs[i % n_acc], v + band_ref[i])
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)

            if floor is not None:
                # Global per-batch-row max: reduce the M row-groups
                # (aligned vreg maxes), then lanes, broadcast back
                per_a = post[:BATCH_TILE, :]
                for i in range(1, M):
                    per_a = jnp.maximum(
                        per_a,
                        post[i * BATCH_TILE:(i + 1) * BATCH_TILE, :])
                gmax = jnp.max(per_a, axis=1, keepdims=True)  # (8, 1)
                fm = jnp.concatenate([gmax] * M, axis=0) + floor
                m = fm if m is None else jnp.maximum(m, fm)

            valid = t < frames_col  # (8, 1)
            valid_m = jnp.concatenate([valid] * M, axis=0)  # (R, 1)
            kept = jnp.where(valid_m, obs_col(k) + m, post)
            kept_m = kept.reshape(M, BATCH_TILE, 128)
            post_ref[...] = kept_m
            postseq_ref[:, :, k, :] = kept_m

        @pl.when(jnp.logical_and(t > 0, t >= block_max))
        def _padded(k=k):
            postseq_ref[:, :, k, :] = post_ref[...]


@functools.lru_cache(maxsize=64)
def _build_band_forward(batch, frames, states_in, states_padded, lo, width,
                        floor, interpret=False,
                        log_input=True, apply_epsilon=False,
                        frame_tile=FRAME_TILE,
                        external_band_matrix=False,
                        layout='rolled',
                        raw12=False,
                        packed=False,
                        spread=False):
    width_padded = max(_round_up(width, 8), 8)
    # Callers may pass any band tuple; the kernel body needs at least one
    # candidate source per step (width == 0 is only meaningful with the
    # constant-floor contribution)
    assert width > 0 or floor is not None, (
        'band width 0 requires a finite floor (constant transition)')
    # Frames per grid step: more frames per tile amortize per-step costs
    # (block_max, grid iteration, DMA setup) against VMEM block size
    assert frame_tile >= 8 and frame_tile & (frame_tile - 1) == 0, (
        f'BAND_FRAME_TILE must be a power of two >= 8, got {frame_tile}')
    assert frames % 8 == 0, (
        f'frames must be padded to a multiple of 8, got {frames} '
        '(dispatch.bucket_frames does this)')
    while frames % frame_tile:
        frame_tile //= 2
    if spread and width > 0:
        # Batch-1 replicated-offsets kernel (spread_plan): consumes the
        # UNPADDED single-row observation and emits the stitched raw12
        # stream with all 8 rows replicas of it
        assert frames % frame_tile == 0
        return _build_band_forward_spread(
            batch, frames, states_in, states_padded, lo, width, floor,
            interpret, log_input, apply_epsilon, frame_tile,
            external_band_matrix, packed=packed)
    assert batch % BATCH_TILE == 0 and frames % frame_tile == 0
    if layout == 'stitched' and width > 0:
        return _build_band_forward_stitched(
            batch, frames, states_in, states_padded, lo, width, floor,
            interpret, log_input, apply_epsilon, frame_tile,
            external_band_matrix, raw12=raw12, packed=packed)
    assert not packed, (
        'packed (mod-M) observations require the stitched band layout')
    # Tilted layout only pays when there are rolls to share (width > 0);
    # the width-0 constant-transition path stays on the rolled kernel
    tilted = layout == 'tilted' and width > 0
    kernel = functools.partial(
        _band_kernel_tilted if tilted else _band_kernel,
        states_in=states_in,
        states_padded=states_padded,
        lo=lo,
        width=width,
        floor=floor,
        log_input=log_input,
        apply_epsilon=apply_epsilon,
        frame_tile=frame_tile)
    grid = (batch // BATCH_TILE, frames // frame_tile)
    rows = states_padded // 128 * BATCH_TILE
    in_specs = [
        pl.BlockSpec(
            (BATCH_TILE, frame_tile, states_in),
            lambda n, t: (n, t, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (width_padded, rows, 128) if tilted
            else (width_padded, states_padded),
            (lambda n, t: (0, 0, 0)) if tilted else (lambda n, t: (0, 0)),
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
            (BATCH_TILE, frame_tile, states_padded),
            lambda n, t: (n, t, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (BATCH_TILE, states_padded),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(
            (batch, frames, states_padded), jnp.float32),
        jax.ShapeDtypeStruct((batch, states_padded), jnp.float32),
    ]
    if tilted:
        # The tilted posterior carry rides a third output (constant index
        # map = persists across the frame grid axis, the same pattern as
        # the posterior carry)
        out_specs.append(pl.BlockSpec(
            (rows, 128),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch // BATCH_TILE * rows, 128), jnp.float32))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=batch * frames * 3 * width * states_padded,
            bytes_accessed=(
                batch * frames * states_padded * 8
                + width_padded * states_padded * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret)

    def run(observation, band_matrix, initial, bf):
        out = call(
            observation,
            band_matrix,
            initial.reshape(1, states_padded),
            bf.reshape(batch, 1))
        return out[0], out[1]  # drop the tilted carry when present

    if external_band_matrix:
        # The compressed band matrix is prepared once per transition by the
        # dispatcher (deriving it in-graph cost a 2.75 ms gather per call);
        # the dispatcher pre-tilts it for the tilted layout
        def forward(observation, batch_frames, band_matrix, initial):
            return run(
                observation, band_matrix, initial,
                batch_frames.astype(jnp.int32))
    else:
        def forward(observation, batch_frames, transition_padded, initial):
            band_matrix = build_band_matrix(transition_padded, lo, width)
            if tilted:
                band_matrix = build_band_matrix_tilted(
                    band_matrix, states_padded)
            return run(
                observation, band_matrix, initial,
                batch_frames.astype(jnp.int32))

    return jax.jit(forward)


def spread_plan(states_padded, lo, width):
    """Static structure of the batch-1 'spread' (replicated-offsets)
    decomposition.

    At batch 1 the stitched layout's 8 batch sublane slots idle; spread
    fills slot g with the posterior shifted by band offset g (source
    state dest + lo + g at cell (r*8+g, lane)), so ONE masked add + max
    covers a whole 8-offset chunk d = 8q..8q+7. Shifting the replicated
    array by 8q in state space needs a single free sublane rename --
    (M*kk - 8q)*8 is congruent to -64q mod M*8 for EITHER row carry kk --
    plus the usual per-row lane-rotate split folded into stitched
    matrices: ~width/8 chunks x ~2 pairs instead of ~width + M pairs.
    Measured-exactness note: fp max is order-independent, so only
    coverage uniqueness matters (asserted).

    Returns (keys, pairs, rebuild):
      keys: sorted (lane-rotate alpha, sublane-rename amt) chunk pairs
      pairs: per key {destination row r: chunk q}
      rebuild: per (slot g, row-carry kk): (g, sublane rename amt,
        lane-rotate alpha, first row, last row) -- the recipe to rebuild
        the replicated array from a slot-replicated posterior
    """
    M = states_padded // 128
    rows = M * BATCH_TILE
    pairs = {}
    for q in range((width + 7) // 8):
        amt = (-8 * BATCH_TILE * q) % rows
        for r in range(M):
            kk = (r + 8 * q) // M
            alpha = (-kk) % 128
            prev = pairs.setdefault((alpha, amt), {}).setdefault(r, q)
            assert prev == q, 'spread stitch collision'
    rebuild = []
    for g in range(BATCH_TILE):
        e = g + lo
        amt_g = (-BATCH_TILE * e) % rows
        by_kk = {}
        for r in range(M):
            by_kk.setdefault((r + e) // M, []).append(r)
        for kk, rlist in sorted(by_kk.items()):
            rebuild.append((g, amt_g, (-kk) % 128, min(rlist), max(rlist)))
    return sorted(pairs), pairs, rebuild


@functools.lru_cache(maxsize=16)
def _spread_plan_indices(states_padded, lo, width):
    """Numpy gather indices for building spread band matrices."""
    import numpy as np

    M = states_padded // 128
    rows = M * BATCH_TILE
    keys, pairs, _ = spread_plan(states_padded, lo, width)
    idx_d = np.zeros((len(keys), rows), np.int32)
    mask = np.zeros((len(keys), rows), bool)
    for i, key in enumerate(keys):
        for r, q in pairs[key].items():
            for g in range(BATCH_TILE):
                d = 8 * q + g
                if d < width:
                    idx_d[i, r * BATCH_TILE + g] = d
                    mask[i, r * BATCH_TILE + g] = True
    col = (
        np.arange(128)[None, :] * M
        + (np.arange(rows) // BATCH_TILE)[:, None]).astype(np.int32)
    return keys, idx_d, mask, col


def build_band_matrix_spread(band_matrix, states_padded, lo, width):
    """(width_padded, S) band matrix -> (P, M*8, 128) spread-stitched
    matrices for the batch-1 kernel (traced, jit-safe; see spread_plan)."""
    _, idx_d, mask, col = _spread_plan_indices(states_padded, lo, width)
    gathered = band_matrix[
        jnp.asarray(idx_d)[:, :, None], jnp.asarray(col)[None, :, :]]
    return jnp.where(jnp.asarray(mask)[:, :, None], gathered, NEG_INF)


def _band_kernel_spread(
        obs_ref,       # (M, 1, ft, 128) mod-M obs block (single real row)
        band_ref,      # (P, R, 128) spread-stitched matrices, resident
        init_ref,      # (R, 128) slot-replicated mod-M initial, resident
        frames_ref,    # (1, 1) int32: the real sequence's frame count
        postseq_ref,   # out: (M, 8, ft, 128) REPLICATED posterior columns
        post_ref,      # out: (M, 8, 128) replicated carry
        *,
        states_padded,
        lo,
        width,
        floor,
        log_input=True,
        apply_epsilon=False,
        frame_tile=FRAME_TILE):
    """Batch-1 banded forward with the 8 sublane slots holding 8
    band-offset-shifted posterior copies (layout math: spread_plan).

    The posterior stream it emits is the stitched kernel's (M, batch=8,
    frames, 128) layout with all 8 batch rows REPLICAS of the one real
    sequence -- backtrace_posteriors12 consumes it unchanged (dispatch
    passes real_batch=1 so the chase loads only row 0). Bitwise exact:
    the candidate set per destination is identical to the stitched
    kernel's and fp max is order-independent.
    """
    tb = pl.program_id(0)
    M = states_padded // 128
    rows = M * BATCH_TILE

    keys, _, rebuild = spread_plan(states_padded, lo, width)
    alphas = sorted({alpha for alpha, _ in keys})
    reb_alphas = sorted({a for (_, _, a, _, _) in rebuild})

    sub = lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    g_of = sub % BATCH_TILE
    r_of = sub // BATCH_TILE

    def obs_col(k):
        col = obs_ref[:, 0, k, :]  # (M, 128)
        if not log_input:
            col = jnp.log(col)
        if apply_epsilon:
            col = jnp.log(
                jnp.exp(col) + jnp.float32(jnp.finfo(jnp.float32).tiny))
        # Replicate over the 8 slots: (M, 128) -> (M, 8, 128) -> (R, 128)
        return jnp.concatenate(
            [col[:, None, :]] * BATCH_TILE, axis=1).reshape(rows, 128)

    def rebuild_spread(post):
        """Slot-replicated posterior -> the 8 shifted copies (slot g
        holds post[dest + lo + g]): ~len(reb_alphas) lane rotates, free
        renames, masked selects"""
        rots = {a: (post if a == 0 else pltpu.roll(post, a, 1))
                for a in reb_alphas}
        out = jnp.full((rows, 128), NEG_INF, jnp.float32)
        for (g, amt_g, a, r_lo, r_hi) in rebuild:
            z = rots[a]
            if amt_g:
                z = pltpu.roll(z, amt_g, 0)
            sel = (g_of == g) & (r_of >= r_lo) & (r_of <= r_hi)
            out = jnp.where(sel, z, out)
        return out

    bf0 = frames_ref[0, 0]

    for k in range(frame_tile):
        t = tb * frame_tile + k

        @pl.when(t == 0)
        def _init(k=k):
            post0 = obs_col(0) + init_ref[...]
            post_ref[...] = post0.reshape(M, BATCH_TILE, 128)
            postseq_ref[:, :, k, :] = post0.reshape(M, BATCH_TILE, 128)

        @pl.when(jnp.logical_and(t > 0, t < bf0))
        def _step(k=k, t=t):
            post = post_ref[...].reshape(rows, 128)

            m = None
            if width:
                spread = rebuild_spread(post)
                rotated = {
                    alpha: (spread if alpha == 0
                            else pltpu.roll(spread, alpha, 1))
                    for alpha in alphas}
                n_acc = min(4, len(keys))
                accs = [
                    jnp.full((rows, 128), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                for i, (alpha, amt) in enumerate(keys):
                    v = rotated[alpha]
                    if amt:
                        v = pltpu.roll(v, amt, 0)
                    accs[i % n_acc] = jnp.maximum(
                        accs[i % n_acc], v + band_ref[i])
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)
                # Group-wrapped rotation all-reduce over the 8 slots:
                # after steps 1, 2, 4 every slot holds its group's max
                for delta in (1, 2, 4):
                    y = jnp.where(
                        g_of < BATCH_TILE - delta,
                        pltpu.roll(m, (-delta) % rows, 0),
                        pltpu.roll(m, BATCH_TILE - delta, 0))
                    m = jnp.maximum(m, y)

            if floor is not None:
                # Global max over states: the replication makes every
                # slot's aligned-vreg reduction equal the true global max
                per8 = post[:BATCH_TILE, :]
                for i in range(1, M):
                    per8 = jnp.maximum(
                        per8, post[i * BATCH_TILE:(i + 1) * BATCH_TILE, :])
                gmax = jnp.max(per8, axis=1, keepdims=True)  # (8, 1)
                fm = jnp.concatenate([gmax] * M, axis=0) + floor
                m = fm if m is None else jnp.maximum(m, fm)

            kept = obs_col(k) + m
            kept_m = kept.reshape(M, BATCH_TILE, 128)
            post_ref[...] = kept_m
            postseq_ref[:, :, k, :] = kept_m

        @pl.when(jnp.logical_and(t > 0, t >= bf0))
        def _padded(k=k):
            postseq_ref[:, :, k, :] = post_ref[...]


def _build_band_forward_stitched(batch, frames, states_in, states_padded,
                                 lo, width, floor, interpret, log_input,
                                 apply_epsilon, frame_tile,
                                 external_band_matrix, raw12=False,
                                 packed=False):
    """Stage the stitched mod-M pipeline.

    Inputs transform once in XLA to the M-major layout (M, batch, frames,
    128) (state s = M*l + r at (r, batch_row, lane l)); the conversion
    fold happens in-kernel. With ``raw12=True`` the posterior stream and
    final posterior are returned IN that layout -- the mod-M-aware
    backtrace kernel (ops/backtrace.py::backtrace_posteriors12) consumes
    them directly, eliminating the inverse relayout copy (a measured
    ~10 ms per headline call). ``raw12=False`` returns the natural layout
    for compatibility (tests, profiling, explicit kernel callers).
    """
    M = states_padded // 128
    rows = M * BATCH_TILE
    keys, _ = mod_plan(states_padded, lo, width)

    kernel = functools.partial(
        _band_kernel_stitched,
        states_padded=states_padded,
        lo=lo,
        width=width,
        floor=floor,
        log_input=log_input,
        apply_epsilon=apply_epsilon,
        frame_tile=frame_tile)
    grid = (batch // BATCH_TILE, frames // frame_tile)
    in_specs = [
        pl.BlockSpec(
            (M, BATCH_TILE, frame_tile, 128),
            lambda n, t: (0, n, t, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (len(keys), rows, 128),
            lambda n, t: (0, 0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (rows, 128),
            lambda n, t: (0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (BATCH_TILE, 1),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec(
            (M, BATCH_TILE, frame_tile, 128),
            lambda n, t: (0, n, t, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (M, BATCH_TILE, 128),
            lambda n, t: (0, n, 0),
            memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(
                (M, batch, frames, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, batch, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=batch * frames * 2 * len(keys) * states_padded // M,
            bytes_accessed=(
                batch * frames * states_padded * 8
                + len(keys) * rows * 128 * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret)

    def to_mod(obs):
        # (B, T, S) natural -> (M, B, T, 128)
        arr = obs.reshape(batch, frames, 128, M)
        return jnp.transpose(arr, (3, 0, 1, 2))

    def from_mod_seq(post_m):
        # (M, B, T, 128) -> (B, T, S) natural
        arr = jnp.transpose(post_m, (1, 2, 3, 0))
        return arr.reshape(batch, frames, states_padded)

    def from_mod_final(post_m):
        arr = jnp.transpose(post_m, (1, 2, 0))
        return arr.reshape(batch, states_padded)

    def init_mod(initial):
        arr = initial.reshape(128, M)          # (l, r)
        arr = jnp.transpose(arr, (1, 0))       # (r, l)
        return jnp.repeat(arr, BATCH_TILE, axis=0)

    def run(observation, band_stitched, initial, bf):
        obs = observation
        if packed:
            # Observation arrives pre-packed in the (M, batch, frames,
            # 128) mod-M layout (the pipeline analog of lane-padding):
            # no relayout copy at all on this side
            obs_m = obs
        else:
            if states_in != states_padded:
                # The conversion fold happens in-kernel AFTER this pad, so
                # probability-space inputs pad with 0.0 (log maps it to
                # -inf; the epsilon then makes it log(tiny), which stays
                # dominated everywhere because the padded transition
                # rows/columns are -inf -- the same invariant the
                # pre-padded pipeline relies on)
                obs = jnp.pad(
                    obs, ((0, 0), (0, 0), (0, states_padded - states_in)),
                    constant_values=NEG_INF if log_input else 0.0)
            obs_m = to_mod(obs)
        post_seq_m, post_m = call(
            obs_m, band_stitched, init_mod(initial),
            bf.reshape(batch, 1))
        if raw12:
            return post_seq_m, post_m
        return from_mod_seq(post_seq_m), from_mod_final(post_m)

    if external_band_matrix:
        # The dispatcher pre-builds the stitched matrices per transition
        def forward(observation, batch_frames, band_stitched, initial):
            return run(
                observation, band_stitched, initial,
                batch_frames.astype(jnp.int32))
    else:
        def forward(observation, batch_frames, transition_padded, initial):
            band_matrix = build_band_matrix(transition_padded, lo, width)
            band_stitched = build_band_matrix_stitched(
                band_matrix, states_padded, lo, width)
            return run(
                observation, band_stitched, initial,
                batch_frames.astype(jnp.int32))

    return jax.jit(forward)


def _build_band_forward_spread(batch, frames, states_in, states_padded,
                               lo, width, floor, interpret, log_input,
                               apply_epsilon, frame_tile,
                               external_band_matrix, packed=False):
    """Stage the batch-1 spread pipeline (see spread_plan).

    The observation arrives UNPADDED (batch == 1; skipping the 8-row pad
    copy the stitched path would pay) with a width > 0 band. The emitted
    posterior stream carries the stitched (M, BATCH_TILE, frames, 128)
    layout with all 8 rows replicas of the real sequence, so
    backtrace_posteriors12 consumes it unchanged (dispatch pads
    batch_frames to the 8-row tile and passes real_batch=1).
    """
    assert batch == 1 and width > 0
    M = states_padded // 128
    rows = M * BATCH_TILE
    keys, _, _ = spread_plan(states_padded, lo, width)

    kernel = functools.partial(
        _band_kernel_spread,
        states_padded=states_padded,
        lo=lo,
        width=width,
        floor=floor,
        log_input=log_input,
        apply_epsilon=apply_epsilon,
        frame_tile=frame_tile)
    grid = (frames // frame_tile,)
    in_specs = [
        pl.BlockSpec(
            (M, 1, frame_tile, 128),
            lambda t: (0, 0, t, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (len(keys), rows, 128),
            lambda t: (0, 0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (rows, 128),
            lambda t: (0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1),
            lambda t: (0, 0),
            memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec(
            (M, BATCH_TILE, frame_tile, 128),
            lambda t: (0, 0, t, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (M, BATCH_TILE, 128),
            lambda t: (0, 0, 0),
            memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(
                (M, BATCH_TILE, frames, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, BATCH_TILE, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=frames * 2 * len(keys) * rows * 128,
            bytes_accessed=(
                frames * states_padded * 4 * (1 + BATCH_TILE)
                + len(keys) * rows * 128 * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret)

    def to_mod(obs):
        arr = obs.reshape(batch, frames, 128, M)
        return jnp.transpose(arr, (3, 0, 1, 2))

    def init_mod(initial):
        arr = initial.reshape(128, M)          # (l, r)
        arr = jnp.transpose(arr, (1, 0))       # (r, l)
        return jnp.repeat(arr, BATCH_TILE, axis=0)

    def run(observation, band_spread, initial, bf):
        obs = observation
        if not packed:
            if states_in != states_padded:
                obs = jnp.pad(
                    obs, ((0, 0), (0, 0), (0, states_padded - states_in)),
                    constant_values=NEG_INF if log_input else 0.0)
            obs = to_mod(obs)
        return call(
            obs, band_spread, init_mod(initial), bf[:1].reshape(1, 1))

    if external_band_matrix:
        def forward(observation, batch_frames, band_spread, initial):
            return run(
                observation, band_spread, initial,
                batch_frames.astype(jnp.int32))
    else:
        def forward(observation, batch_frames, transition_padded, initial):
            band_matrix = build_band_matrix(transition_padded, lo, width)
            band_spread = build_band_matrix_spread(
                band_matrix, states_padded, lo, width)
            return run(
                observation, band_spread, initial,
                batch_frames.astype(jnp.int32))

    return jax.jit(forward)


def viterbi_forward_band(observation, batch_frames, transition_padded,
                         initial, band, interpret=False,
                         log_input=True, apply_epsilon=False,
                         band_matrix=None, raw12=False, packed=False,
                         spread=False):
    """Banded Pallas forward pass.

    observation may carry an UNPADDED state dimension (the kernel lane-pads
    in-register); transition_padded and initial must be padded to a lane
    multiple with -inf, and batch/frames must be padded to multiples of 8.

    band: (lo, width, floor) from detect_band, measured on the unpadded
    transition.

    ``log_input=False`` and/or ``apply_epsilon=True`` fold the
    probability->log conversion and the reference epsilon stabilization
    into the kernel's observation stream (saving a full-size XLA pass).

    Returns
        post_seq: (batch, frames, states_padded) float32 posterior columns
            (post_seq[:, t] is the posterior after consuming frame t)
        posterior: (batch, states_padded) float32 posterior at each item's
            last valid frame (the carry; frozen at t >= batch_frames[b])
    """
    import torbi_tpu

    lo, width, floor = band
    if packed:
        # (M, batch, frames, 128) mod-M layout (stitched path only)
        _, batch, frames, _ = observation.shape
        states_in = observation.shape[0] * 128
    else:
        batch, frames, states_in = observation.shape
    states_padded = transition_padded.shape[0]
    fwd = _build_band_forward(
        batch, frames, states_in, states_padded, lo, width, floor,
        interpret, log_input, apply_epsilon,
        int(getattr(torbi_tpu, 'BAND_FRAME_TILE', FRAME_TILE)),
        external_band_matrix=band_matrix is not None,
        layout=str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled')),
        raw12=raw12, packed=packed, spread=spread)
    if band_matrix is not None:
        return fwd(observation, batch_frames, band_matrix, initial)
    return fwd(observation, batch_frames, transition_padded, initial)
