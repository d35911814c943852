"""Pallas TPU backtrace over stored posterior columns.

The reference backtrace chases int32 backpointers
(/root/reference/torbi/csrc/cuda/viterbi.cu:150-176). Here the forward
kernels (ops/band.py, ops/pallas.py) store posterior columns instead, and
this kernel recovers each backpointer exactly where it is needed -- along
the single realized path per sequence:

    pred[b] = argmin-index argmax_i(post[b, t-1, i] + transition[cur[b], i])

which is bitwise the backpointer the dense recursion would have recorded,
including the lowest-source-index tie rule (viterbi.cpp:94-100, first-max
wins on a left-to-right scan). Per frame and sequence tile this costs one
dynamic transition-row load per sequence plus a handful of (BT, S) VPU ops
-- a rounding error next to the forward pass -- while the forward pass
saves the 2 extra selects per candidate it would spend tracking argmax.

Grid: (batch tiles, frame tiles) with the frame axis iterated in reverse via
the index maps. The chase crosses frame-tile boundaries by DEFERRING each
boundary step one grid step: computing index[t0 - 1] needs posterior column
t0 - 1, which lives in the next (earlier-in-time) block, so that step runs
at the START of the next grid step from its own block's last column --
no second operand window into the posterior stream, no boundary array,
each posterior byte read exactly once. The chase index lives in a VMEM
scratch carried across grid steps; the decoded column for position
t0 + FT - 1 of each block is computed by that deferred step (or is the
argmax(posterior) seed for the latest block, so positions at or beyond
batch_frames[b] - 1 hold the seed exactly as the reference
broadcast-then-backtrace scheme, viterbi.cpp:218-225).
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float('-inf')
_INT_MAX = 2**30


def _pick_tiles(batch, frames, states_padded):
    """(batch_tile, frame_tile) under VMEM and tiling constraints.

    - frame_tile is 128 (or the full frame count when smaller) so the
      (BT, FT) output block lane dimension is tile-aligned.
    - The chase is a serial chain over frames: wide batch tiles amortize the
      per-step latency (dynamic row loads + argmax reduction) over more
      sequences per vector op, bounded by VMEM for the double-buffered
      (BT, FT, S) posterior blocks.
    """
    if frames % 128 == 0:
        frame_tile = 128
    elif frames <= 128 and frames % 8 == 0:
        frame_tile = frames  # single frame tile: no boundary reads at all
    else:
        raise ValueError(
            f'backtrace_posteriors requires frames to be a multiple of 128, '
            f'or at most 128 and a multiple of 8 (the TPU output-block lane '
            f'tiling); got frames={frames}. The dispatch pipeline '
            f'guarantees this via FRAME_BUCKETS.')
    # Leave room for the resident transition + row/column scratches under
    # the 112 MB VMEM limit; wider tiles halve the number of serial chase
    # chains (measured: batch tile 64 fits at the headline shape)
    budget = 100 * 1024 * 1024
    for batch_tile in (64, 32, 16, 8):
        if batch % batch_tile:
            continue
        if 2 * batch_tile * frame_tile * states_padded * 4 <= budget:
            return batch_tile, frame_tile
    raise ValueError(
        f'no batch tile fits: batch={batch} must be a multiple of 8 and '
        f'an (8, {frame_tile}, {states_padded}) float32 double-buffered '
        f'block must fit the VMEM budget')


def _backtrace_kernel(
        postseq_ref,   # (BT, FT, S) float32 block at (n, rev)
        trans_ref,     # (S, S) float32, resident
        seed_ref,      # (BT, 1) int32 block at (n, 0)
        frames_ref,    # (BT, 1) int32 block at (n, 0)
        out_ref,       # out: (BT, FT) int32 block at (n, rev)
        idx_ref,       # scratch: (BT, 1) int32 chase index, carried over grid
        rows_ref,      # scratch: (BT, S) float32 gathered transition rows
        *,
        states_padded,
        batch_tile,
        frame_tile,
        n_frame_tiles,
        load_rows=None):
    nf = pl.program_id(1)
    t0 = (n_frame_tiles - 1 - nf) * frame_tile  # block start time

    lane = lax.broadcasted_iota(
        jnp.int32, (batch_tile, states_padded), 1)
    bf = frames_ref[...]  # (BT, 1)

    @pl.when(nf == 0)
    def _seed():
        idx_ref[...] = seed_ref[...]

    def step(prev_post, t, k):
        """One chase step t (writes position t - 1): the predecessor is the
        lowest-index argmax of prev_post + transition[cur]."""
        for b in range(load_rows or batch_tile):
            ib = idx_ref[b, 0]
            rows_ref[b:b + 1, :] = trans_ref[pl.ds(ib, 1), :]
        v = prev_post + rows_ref[...]
        mx = jnp.max(v, axis=1, keepdims=True)
        pred = jnp.min(
            jnp.where(v == mx, lane, _INT_MAX), axis=1, keepdims=True)
        # Chase only while t <= batch_frames - 1; beyond, hold the seed
        new_idx = jnp.where(t <= bf - 1, pred.astype(jnp.int32), idx_ref[...])
        idx_ref[...] = new_idx
        if k >= 1:
            out_ref[:, k - 1:k] = new_idx

    if n_frame_tiles > 1:
        # Deferred cross-tile step (module docstring): the carry entering a
        # non-latest block is index[t0 + FT]; chase it through this block's
        # LAST column (frame t0 + FT - 1) before the in-block loop
        @pl.when(nf > 0)
        def _boundary():
            step(postseq_ref[:, frame_tile - 1, :], t0 + frame_tile, 0)

    # Position t0 + FT - 1: the deferred step's result (or the seed for the
    # latest block: indices[frames - 1] = seed)
    out_ref[:, frame_tile - 1:frame_tile] = idx_ref[...]

    for k in reversed(range(1, frame_tile)):
        step(postseq_ref[:, k - 1, :], t0 + k, k)


def _backtrace_kernel_loop(
        postseq_ref,   # (BT, FT, S) float32 block at (n, rev)
        trans_ref,     # (S, S) float32, resident
        seed_ref,      # (BT, 1) int32 block at (n, 0)
        frames_ref,    # (BT, 1) int32 block at (n, 0)
        out_ref,       # out: (BT, FT) int32 block at (n, rev)
        idx_ref,       # scratch: (BT, 1) int32 chase index, carried over grid
        rows_ref,      # scratch: (BT, S) float32 gathered transition rows
        col_ref,       # scratch: (FT, BT) int32 transposed decoded columns
        *,
        states_padded,
        batch_tile,
        frame_tile,
        n_frame_tiles,
        load_rows=None):
    """Chase kernel with a fori_loop over the frame axis.

    Identical chase math to the unrolled kernel, but the 128-step frame loop
    is a loop in the lowered program instead of 128 unrolled bodies -- the
    Mosaic program is ~frame_tile times smaller, which turns a
    many-minutes (sometimes pathological) kernel compile into seconds.
    Decoded indices are staged in a (FT, BT) scratch via dynamic SUBLANE
    stores (dynamic lane stores are not supported), then transposed once
    per block into the output.
    """
    nf = pl.program_id(1)
    t0 = (n_frame_tiles - 1 - nf) * frame_tile

    lane = lax.broadcasted_iota(
        jnp.int32, (batch_tile, states_padded), 1)
    bf = frames_ref[...]  # (BT, 1)

    @pl.when(nf == 0)
    def _seed():
        idx_ref[...] = seed_ref[...]

    def step(prev_post, t, k):
        """One chase step t (stages position t - 1 at scratch sublane
        k - 1): predecessor = lowest-index argmax of prev_post + trans"""
        for b in range(load_rows or batch_tile):
            ib = idx_ref[b, 0]
            rows_ref[b:b + 1, :] = trans_ref[pl.ds(ib, 1), :]
        v = prev_post + rows_ref[...]
        mx = jnp.max(v, axis=1, keepdims=True)
        pred = jnp.min(
            jnp.where(v == mx, lane, _INT_MAX), axis=1, keepdims=True)
        new_idx = jnp.where(t <= bf - 1, pred.astype(jnp.int32), idx_ref[...])
        idx_ref[...] = new_idx
        return new_idx

    if n_frame_tiles > 1:
        # Deferred cross-tile step (module docstring): the carry entering a
        # non-latest block is index[t0 + FT]; chase it through this block's
        # LAST column (frame t0 + FT - 1) before the in-block loop
        @pl.when(nf > 0)
        def _boundary():
            step(postseq_ref[:, frame_tile - 1, :], t0 + frame_tile, 0)

    # Position t0 + FT - 1: the deferred step's result (or the seed)
    col_ref[frame_tile - 1:frame_tile, :] = jnp.transpose(idx_ref[...])

    def body(i, carry):
        # i = 0 .. frame_tile - 2 maps to k = frame_tile - 1 .. 1
        k = frame_tile - 1 - i
        new_idx = step(postseq_ref[:, k - 1, :], t0 + k, k)
        col_ref[pl.ds(k - 1, 1), :] = jnp.transpose(new_idx)
        return carry

    lax.fori_loop(0, frame_tile - 1, body, 0, unroll=False)

    out_ref[...] = jnp.transpose(col_ref[...])


def _load_rows(batch, batch_tile, real_batch):
    """Static chase-load row count: when the grid has a single batch tile
    and the caller declares fewer REAL rows (a batch-1 decode padded to the
    8-row tile), the per-step dynamic transition-row loads for the padding
    rows are elided at trace time -- they dominate the serial chase cost.
    Padded rows' outputs become unspecified; dispatch slices them off."""
    if (real_batch is not None and batch == batch_tile
            and 0 < real_batch < batch_tile):
        return real_batch
    return None


@functools.lru_cache(maxsize=64)
def _build_backtrace(batch, frames, states_padded, interpret=False,
                     real_batch=None, looped=True):
    batch_tile, frame_tile = _pick_tiles(batch, frames, states_padded)
    n_frame_tiles = frames // frame_tile
    kernel = functools.partial(
        _backtrace_kernel_loop if looped else _backtrace_kernel,
        states_padded=states_padded,
        batch_tile=batch_tile,
        frame_tile=frame_tile,
        n_frame_tiles=n_frame_tiles,
        load_rows=_load_rows(batch, batch_tile, real_batch))
    grid = (batch // batch_tile, n_frame_tiles)

    def rev(t):
        return n_frame_tiles - 1 - t

    in_specs = [
        pl.BlockSpec(
            (batch_tile, frame_tile, states_padded),
            lambda n, t: (n, rev(t), 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (states_padded, states_padded),
            lambda n, t: (0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (batch_tile, 1),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (batch_tile, 1),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec(
        (batch_tile, frame_tile),
        lambda n, t: (n, rev(t)),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((batch, frames), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=batch * frames * 8 * states_padded,
            bytes_accessed=batch * frames * states_padded * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB of VMEM; batch tile 64 needs ~112.2 MB
            vmem_limit_bytes=120 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, 1), jnp.int32),
            pltpu.VMEM((batch_tile, states_padded), jnp.float32),
        ] + ([pltpu.VMEM((frame_tile, batch_tile), jnp.int32)]
             if looped else []),
        interpret=interpret)

    def backtrace(post_seq, transition_padded, posterior, batch_frames):
        # Lowest-index argmax of the final posterior seeds the chase
        # (viterbi.cpp:218-221; jnp.argmax picks the first maximum)
        seed = jnp.argmax(posterior, axis=1).astype(jnp.int32)
        return call(
            post_seq,
            transition_padded,
            seed.reshape(batch, 1),
            batch_frames.astype(jnp.int32).reshape(batch, 1))

    return jax.jit(backtrace)


def _backtrace12_kernel_loop(
        postseq_ref,   # (M, BT, FT, 128) mod-M posterior block at (0,n,rev)
        trans_ref,     # (S, S) float32: natural rows, mod-M-PERMUTED columns
        seed_ref,      # (BT, 1) int32 block at (n, 0) -- natural indices
        frames_ref,    # (BT, 1) int32 block at (n, 0)
        out_ref,       # out: (BT, FT) int32 block at (n, rev)
        idx_ref,       # scratch: (BT, 1) int32 chase index (natural)
        rows_ref,      # scratch: (BT, S) float32 gathered transition rows
        col_ref,       # scratch: (FT, BT) int32 transposed decoded columns
        *,
        states_padded,
        batch_tile,
        frame_tile,
        n_frame_tiles,
        load_rows=None):
    """Backtrace consuming the stitched forward's M-major posterior stream
    DIRECTLY (no relayout copy between the kernels -- a measured ~10 ms
    per headline call).

    The assembled posterior column concatenates the M r-blocks along
    lanes, i.e. lane position s' holds natural state M*(s' mod 128) +
    s' div 128. The transition input has its COLUMNS pre-permuted to the
    same order (dispatch prepares it once per transition), the chase
    index stays a natural state index (row loads are by natural row), and
    the lowest-NATURAL-index tie rule is preserved by minimizing over a
    natural-index map instead of the raw lane iota.
    """
    M = states_padded // 128
    nf = pl.program_id(1)
    t0 = (n_frame_tiles - 1 - nf) * frame_tile

    lane = lax.broadcasted_iota(
        jnp.int32, (batch_tile, states_padded), 1)
    nat_idx = (lane % 128) * M + lane // 128
    bf = frames_ref[...]  # (BT, 1)

    @pl.when(nf == 0)
    def _seed():
        idx_ref[...] = seed_ref[...]

    def assemble(k):
        """(BT, S) posterior column at local frame k, permuted order"""
        return jnp.concatenate(
            [postseq_ref[r, :, k, :] for r in range(M)], axis=1)

    def step(prev_post, t, k):
        for b in range(load_rows or batch_tile):
            ib = idx_ref[b, 0]
            rows_ref[b:b + 1, :] = trans_ref[pl.ds(ib, 1), :]
        v = prev_post + rows_ref[...]
        mx = jnp.max(v, axis=1, keepdims=True)
        pred = jnp.min(
            jnp.where(v == mx, nat_idx, _INT_MAX), axis=1, keepdims=True)
        new_idx = jnp.where(t <= bf - 1, pred.astype(jnp.int32), idx_ref[...])
        idx_ref[...] = new_idx
        return new_idx

    if n_frame_tiles > 1:
        # Deferred cross-tile step (module docstring): the carry entering a
        # non-latest block is index[t0 + FT]; chase it through this block's
        # LAST column (frame t0 + FT - 1) before the in-block loop
        @pl.when(nf > 0)
        def _boundary():
            step(assemble(frame_tile - 1), t0 + frame_tile, 0)

    # Position t0 + FT - 1: the deferred step's result (or the seed)
    col_ref[frame_tile - 1:frame_tile, :] = jnp.transpose(idx_ref[...])

    def body(i, carry):
        k = frame_tile - 1 - i
        new_idx = step(assemble(k - 1), t0 + k, k)
        col_ref[pl.ds(k - 1, 1), :] = jnp.transpose(new_idx)
        return carry

    lax.fori_loop(0, frame_tile - 1, body, 0, unroll=False)

    out_ref[...] = jnp.transpose(col_ref[...])


@functools.lru_cache(maxsize=64)
def _build_backtrace12(batch, frames, states_padded, interpret=False,
                       real_batch=None):
    batch_tile, frame_tile = _pick_tiles(batch, frames, states_padded)
    n_frame_tiles = frames // frame_tile
    M = states_padded // 128
    kernel = functools.partial(
        _backtrace12_kernel_loop,
        states_padded=states_padded,
        batch_tile=batch_tile,
        frame_tile=frame_tile,
        n_frame_tiles=n_frame_tiles,
        load_rows=_load_rows(batch, batch_tile, real_batch))
    grid = (batch // batch_tile, n_frame_tiles)

    def rev(t):
        return n_frame_tiles - 1 - t

    in_specs = [
        pl.BlockSpec(
            (M, batch_tile, frame_tile, 128),
            lambda n, t: (0, n, rev(t), 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (states_padded, states_padded),
            lambda n, t: (0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (batch_tile, 1),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (batch_tile, 1),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec(
        (batch_tile, frame_tile),
        lambda n, t: (n, rev(t)),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((batch, frames), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=batch * frames * 8 * states_padded,
            bytes_accessed=batch * frames * states_padded * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, 1), jnp.int32),
            pltpu.VMEM((batch_tile, states_padded), jnp.float32),
            pltpu.VMEM((frame_tile, batch_tile), jnp.int32),
        ],
        interpret=interpret)

    def backtrace(post_seq12, trans_perm, posterior12, batch_frames):
        # Lowest-NATURAL-index argmax of the final posterior seeds the
        # chase (posterior12[r, b, l] holds natural state M*l + r)
        nat = (
            jnp.arange(128, dtype=jnp.int32)[None, None, :] * M
            + jnp.arange(M, dtype=jnp.int32)[:, None, None])
        mx = jnp.max(posterior12, axis=(0, 2), keepdims=True)
        seed = jnp.min(
            jnp.where(posterior12 == mx, nat, _INT_MAX),
            axis=(0, 2)).astype(jnp.int32)
        return call(
            post_seq12,
            trans_perm,
            seed.reshape(batch, 1),
            batch_frames.astype(jnp.int32).reshape(batch, 1))

    return jax.jit(backtrace)


def window_rows(width):
    """128-lane rows a band window must span: the window base is rounded
    down to a row boundary, so the covered span is (width - 1) + up to 127
    alignment slack."""
    return (width - 1 + 127) // 128 + 1


def _backtrace_window_kernel(
        postseq_ref,   # (FT*M, 128) natural-major posterior block at rev(t)
        trans_ref,     # (S_p*M, 128) natural-major transition, resident
        seed_ref,      # (1, 1) int32
        frames_ref,    # (1, 1) int32
        out_ref,       # out: (8, FT) int32 block at rev(t) (rows identical)
        idx_ref,       # scratch: (1, 1) int32 chase index, carried over grid
        col_ref,       # scratch: (FT, 8) int32 transposed decoded columns
        *,
        states_padded,
        frame_tile,
        n_frame_tiles,
        lo,
        n_rows):
    """Batch-1 chase over a NATURAL-MAJOR posterior stream, reduced over
    the band window only.

    The full-width chase kernels spend their serial latency on 12-vreg
    reduction trees and row loads per step. With a single real sequence the
    posterior stream relayouts cheaply to natural order (dispatch pays one
    XLA transpose over ~T*S floats), where a transition band window of
    ``width`` spans ``n_rows`` consecutive 128-lane rows -- so each chase
    step loads and reduces (n_rows, 128) elements (3 vregs at the pitch
    shape) instead of (8, S_p) (12 vregs x 8 sublane rows). Layout: row
    t*M + q of ``postseq_ref`` holds natural states [128q, 128(q+1)) of
    frame t; ``trans_ref`` row i*M + q likewise for transition row i.

    Bitwise identical to the full-width chase: within a valid frame the
    running maximum is finite and lives inside the band window (the band
    gate guarantees finite in-band posteriors), candidates outside the
    band are -inf in the transition row, and the window is contiguous in
    natural state order so the lowest-natural-index tie rule is the
    window-local argmin over a natural-index map.
    """
    M = states_padded // 128
    nf = pl.program_id(0)
    t0 = (n_frame_tiles - 1 - nf) * frame_tile

    sub = lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0)
    lane = lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    bf = frames_ref[0, 0]

    @pl.when(nf == 0)
    def _seed():
        # idx_ref lives in SMEM: scalar stores to VMEM do not lower
        idx_ref[0, 0] = seed_ref[0, 0]

    def step(k_prev, t):
        """One chase step t (the predecessor of the index carried in
        idx_ref, using the posterior column at local frame k_prev)."""
        ib = idx_ref[0, 0]
        r0 = jnp.clip(
            (ib + lo) // 128, 0, M - n_rows).astype(jnp.int32)
        post_w = postseq_ref[pl.ds(k_prev * M + r0, n_rows), :]
        trans_w = trans_ref[pl.ds(ib * M + r0, n_rows), :]
        v = post_w + trans_w
        nat = (r0 + sub) * 128 + lane
        mx = jnp.max(v)
        pred = jnp.min(jnp.where(v == mx, nat, _INT_MAX))
        new_idx = jnp.where(t <= bf - 1, pred.astype(jnp.int32), ib)
        idx_ref[0, 0] = new_idx
        return new_idx

    if n_frame_tiles > 1:
        # Deferred cross-tile step (module docstring): the carry entering a
        # non-latest block is index[t0 + FT]; chase it through this block's
        # LAST column (frame t0 + FT - 1) before the in-block loop
        @pl.when(nf > 0)
        def _boundary():
            step(frame_tile - 1, t0 + frame_tile)

    # Position t0 + FT - 1: the deferred step's result (or the seed)
    col_ref[frame_tile - 1:frame_tile, :] = jnp.full(
        (1, 8), idx_ref[0, 0], jnp.int32)

    def body(i, carry):
        k = frame_tile - 1 - i
        new_idx = step(k - 1, t0 + k)
        col_ref[pl.ds(k - 1, 1), :] = jnp.full((1, 8), new_idx, jnp.int32)
        return carry

    lax.fori_loop(0, frame_tile - 1, body, 0, unroll=False)

    out_ref[...] = jnp.transpose(col_ref[...])


@functools.lru_cache(maxsize=64)
def _build_backtrace_window(batch, frames, states_padded, lo, width,
                            interpret=False):
    if frames % 128 == 0:
        frame_tile = 128
    elif frames <= 128 and frames % 8 == 0:
        frame_tile = frames
    else:
        raise ValueError(
            f'frames must be a multiple of 128 or at most 128 and a '
            f'multiple of 8; got {frames}')
    n_frame_tiles = frames // frame_tile
    M = states_padded // 128
    n_rows = window_rows(width)
    assert n_rows <= M and batch == 8
    kernel = functools.partial(
        _backtrace_window_kernel,
        states_padded=states_padded,
        frame_tile=frame_tile,
        n_frame_tiles=n_frame_tiles,
        lo=lo,
        n_rows=n_rows)

    def rev(t):
        return n_frame_tiles - 1 - t

    call = pl.pallas_call(
        kernel,
        grid=(n_frame_tiles,),
        in_specs=[
            pl.BlockSpec(
                (frame_tile * M, 128),
                lambda t: (rev(t), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (states_padded * M, 128),
                lambda t: (0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, frame_tile),
            lambda t: (0, rev(t)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, frames), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=frames * 8 * n_rows * 128,
            bytes_accessed=(
                frames * states_padded * 4
                + states_padded * states_padded * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.VMEM((frame_tile, 8), jnp.int32),
        ],
        interpret=interpret)

    def backtrace(post12_row0, trans_padded, posterior12, batch_frames):
        # Relayout the single real row's M-major stream to natural order:
        # (M, T, 128) -> (T, 128, M) -> (T, S_p); flattening (lane l,
        # residue r) gives natural M*l + r. One XLA transpose over the
        # stream -- ~T*S_p floats, cheap at batch 1.
        nat_stream = jnp.transpose(post12_row0, (1, 2, 0)).reshape(
            frames, states_padded)
        post2d = nat_stream.reshape(frames * M, 128)
        trans2d = trans_padded.reshape(states_padded * M, 128)
        # Natural final posterior for the seed (row 0 only)
        post_nat = jnp.transpose(posterior12, (1, 0)).reshape(
            states_padded)
        seed = jnp.argmax(post_nat).astype(jnp.int32)
        return call(
            post2d,
            trans2d,
            seed.reshape(1, 1),
            batch_frames[:1].astype(jnp.int32).reshape(1, 1))

    return jax.jit(backtrace)


def backtrace_posteriors_window(post_seq12, trans_padded, posterior12,
                                batch_frames, band, interpret=False):
    """Batch-1 band-windowed backtrace of the stitched posterior stream.

    post_seq12: (M, 8, frames, 128) float32 mod-M stream whose 8 batch
        rows all describe the SAME single sequence (the batch-1 pad rows,
        or the spread kernel's replicas); only row 0 is consumed
    trans_padded: (S_p, S_p) float32 NATURAL layout (not column-permuted)
    posterior12: (M, 8, 128) float32 final posterior
    band: (lo, width, floor) from detect_band
    real semantics/tie rules: see backtrace_posteriors12 -- outputs are
    bitwise identical on row 0; all 8 output rows carry the row-0 result

    Returns (8, frames) int32 decoded natural indices.
    """
    _, batch, frames, _ = post_seq12.shape
    states_padded = post_seq12.shape[0] * 128
    bt = _build_backtrace_window(
        batch, frames, states_padded, int(band[0]), int(band[1]), interpret)
    return bt(post_seq12[:, 0], trans_padded, posterior12[:, 0],
              batch_frames)


def _backtrace12_fused1_kernel(
        postseq_ref,   # (M, 1, FT, 128) mod-M posterior, batch row 0 only
        trans_ref,     # (S_p, S_p): natural rows, mod-M-PERMUTED columns
        seed_ref,      # (1, 1) int32
        frames_ref,    # (1, 1) int32
        out_ref,       # out: (8, FT) int32 block at (0, rev) (rows equal)
        idx_ref,       # scratch: SMEM (1, 1) int32 chase index (natural)
        col_ref,       # scratch: VMEM (FT, 8) int32 transposed columns
        *,
        states_padded,
        frame_tile,
        n_frame_tiles):
    """Batch-1 chase with a lean single-row reduction step.

    The serial chain of the general mod-M chase spends each step on a
    scratch round trip (transition row -> rows_ref -> reload) and
    (8, S_p) ALU work for one real row. Here the chase index lives in
    SMEM (no vector round trip to carry it), the dynamically loaded
    transition row is consumed in-register, and only the (1, S_p) real
    row is touched; the argmax + lowest-natural-index-tie resolves with
    Mosaic's NATIVE cross-lane max + argmin-of-ties reductions, which
    measured ~220 ns/step FASTER than a hand-built 7-level lane-rotate
    (value, index) pair tree (scripts/chase_lab.py: two_trees 710 vs
    tree12 926 ns/step; the step shape here is two_trees_nomod,
    653 ns/step vs the 479 ns/step bare load->extract floor).

    Consumes the stitched forward's stream directly: block r, lane l
    hold natural state M*l + r, so the assembled (1, S_p) column is a
    lane-concatenate of the M (1, 128) blocks (register renaming, no
    data movement) and the tie rule minimizes over the same
    natural-index map as ``backtrace_posteriors12`` -- identical
    operands (permuted transition columns), row 0 only.
    """
    M = states_padded // 128
    nf = pl.program_id(0)
    t0 = (n_frame_tiles - 1 - nf) * frame_tile

    lane = lax.broadcasted_iota(jnp.int32, (1, states_padded), 1)
    nat_idx = (lane % 128) * M + lane // 128
    bf = frames_ref[0, 0]

    @pl.when(nf == 0)
    def _seed():
        idx_ref[0, 0] = seed_ref[0, 0]

    def step(k_prev, t):
        """One chase step t (the predecessor of the carried index, from
        the posterior column at local frame k_prev)."""
        ib = idx_ref[0, 0]
        row = trans_ref[pl.ds(ib, 1), :]
        col = jnp.concatenate(
            [postseq_ref[r, :, k_prev, :] for r in range(M)], axis=1)
        v = row + col
        mx = jnp.max(v, axis=1, keepdims=True)
        pred = jnp.min(
            jnp.where(v == mx, nat_idx, _INT_MAX), axis=1, keepdims=True)
        new_idx = jnp.where(t <= bf - 1, pred[0, 0], ib)
        idx_ref[0, 0] = new_idx
        return new_idx

    if n_frame_tiles > 1:
        # Deferred cross-tile step (module docstring): the carry entering a
        # non-latest block is index[t0 + FT]; chase it through this block's
        # LAST column (frame t0 + FT - 1) before the in-block loop
        @pl.when(nf > 0)
        def _boundary():
            step(frame_tile - 1, t0 + frame_tile)

    # Position t0 + FT - 1: the deferred step's result (or the seed)
    col_ref[frame_tile - 1:frame_tile, :] = jnp.full(
        (1, 8), idx_ref[0, 0], jnp.int32)

    def body(i, carry):
        k = frame_tile - 1 - i
        new_idx = step(k - 1, t0 + k)
        col_ref[pl.ds(k - 1, 1), :] = jnp.full((1, 8), new_idx, jnp.int32)
        return carry

    lax.fori_loop(0, frame_tile - 1, body, 0, unroll=False)

    out_ref[...] = jnp.transpose(col_ref[...])


@functools.lru_cache(maxsize=64)
def _build_backtrace12_fused1(batch, frames, states_padded, interpret=False):
    if frames % 128 == 0:
        frame_tile = 128
    elif frames <= 128 and frames % 8 == 0:
        frame_tile = frames
    else:
        raise ValueError(
            f'frames must be a multiple of 128 or at most 128 and a '
            f'multiple of 8; got {frames}')
    n_frame_tiles = frames // frame_tile
    M = states_padded // 128
    assert batch == 8
    kernel = functools.partial(
        _backtrace12_fused1_kernel,
        states_padded=states_padded,
        frame_tile=frame_tile,
        n_frame_tiles=n_frame_tiles)

    def rev(t):
        return n_frame_tiles - 1 - t

    call = pl.pallas_call(
        kernel,
        grid=(n_frame_tiles,),
        in_specs=[
            pl.BlockSpec(
                (M, 1, frame_tile, 128),
                lambda t: (0, 0, rev(t), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (states_padded, states_padded),
                lambda t: (0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, frame_tile),
            lambda t: (0, rev(t)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, frames), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=frames * 10 * states_padded,
            bytes_accessed=(
                frames * states_padded * 4
                + states_padded * states_padded * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.VMEM((frame_tile, 8), jnp.int32),
        ],
        interpret=interpret)

    def backtrace(post_seq12, trans_perm, posterior12, batch_frames):
        # Lowest-NATURAL-index argmax of row 0's final posterior seeds the
        # chase (posterior12[r, 0, l] holds natural state M*l + r) --
        # bitwise the backtrace_posteriors12 seed for row 0
        nat = (
            jnp.arange(128, dtype=jnp.int32)[None, :] * M
            + jnp.arange(M, dtype=jnp.int32)[:, None])
        p0 = posterior12[:, 0]
        mx = jnp.max(p0)
        seed = jnp.min(
            jnp.where(p0 == mx, nat, _INT_MAX)).astype(jnp.int32)
        return call(
            post_seq12,
            trans_perm,
            seed.reshape(1, 1),
            batch_frames[:1].astype(jnp.int32).reshape(1, 1))

    return jax.jit(backtrace)


def backtrace_posteriors12_fused1(post_seq12, trans_perm, posterior12,
                                  batch_frames, interpret=False):
    """Batch-1 fused single-row backtrace of the stitched posterior stream.

    Same operands as ``backtrace_posteriors12`` (M-major stream, permuted
    transition columns); only batch row 0 is consumed (the batch-1 pad
    rows, or the spread kernel's replicas, are never touched). Returns
    (8, frames) int32 decoded natural indices with all 8 rows carrying
    the row-0 result, bitwise identical to ``backtrace_posteriors12``
    row 0. The per-step argmax runs as Mosaic's native two-tree form --
    ``jnp.max`` of the scores, then ``jnp.min`` over the tying natural
    indices -- which measured ~220 ns/step FASTER than a hand-built
    single associative (value, index) pair tree (scripts/chase_lab.py);
    the win of this kernel over the general chase is the SMEM-resident
    index, the dropped scratch round trip, and 1-row ALU work.
    """
    _, batch, frames, _ = post_seq12.shape
    states_padded = post_seq12.shape[0] * 128
    bt = _build_backtrace12_fused1(batch, frames, states_padded, interpret)
    return bt(post_seq12, trans_perm, posterior12, batch_frames)


def backtrace_posteriors12(post_seq12, trans_perm, posterior12,
                           batch_frames, interpret=False, real_batch=None):
    """Backtrace the stitched kernel's M-major posterior stream.

    post_seq12: (M, batch, frames, 128) float32 (mod-M layout)
    trans_perm: (S_p, S_p) float32 -- natural rows, columns permuted to
        the assembled-lane order s' = r*128 + l (natural M*l + r)
    posterior12: (M, batch, 128) float32 final posterior
    batch_frames: (batch,) int32
    real_batch: rows beyond this count are declared padding -- their
        decoded output is UNSPECIFIED and the serial chase skips their
        per-step transition-row loads (see _load_rows)

    Returns (batch, frames) int32 decoded NATURAL state indices, bitwise
    identical to backtrace_posteriors on the natural-layout stream.
    """
    _, batch, frames, _ = post_seq12.shape
    states_padded = post_seq12.shape[0] * 128
    bt = _build_backtrace12(batch, frames, states_padded, interpret,
                            real_batch)
    return bt(post_seq12, trans_perm, posterior12, batch_frames)


def backtrace_posteriors(post_seq, transition_padded, posterior,
                         batch_frames, interpret=False, real_batch=None):
    """Backtrace stored posterior columns into decoded state indices.

    post_seq: (batch, frames, states_padded) float32 from the forward kernel
    transition_padded: (states_padded, states_padded) float32
    posterior: (batch, states_padded) float32 final posterior
    batch_frames: (batch,) int32
    real_batch: rows beyond this count are declared padding -- their
        decoded output is UNSPECIFIED and the serial chase skips their
        per-step transition-row loads (see _load_rows)

    Returns (batch, frames) int32 decoded indices.
    """
    import torbi_tpu

    batch, frames, states_padded = post_seq.shape
    # The kernel-flavor config participates in the build cache key so
    # flipping it after a shape has been built is not silently ignored
    bt = _build_backtrace(batch, frames, states_padded, interpret,
                          real_batch,
                          bool(getattr(torbi_tpu, 'BACKTRACE_LOOP', True)))
    return bt(post_seq, transition_padded, posterior, batch_frames)
