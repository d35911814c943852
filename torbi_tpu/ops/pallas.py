"""Pallas TPU kernels for the Viterbi forward (trellis) recursion.

TPU-native design (not a port of the reference CUDA kernel,
/root/reference/torbi/csrc/cuda/viterbi.cu): the grid is
(batch tiles, frame tiles) with frames innermost, so Mosaic's sequential grid
iteration carries each sequence's posterior in a VMEM-resident output block
(the analog of the reference's shared-memory double buffer, viterbi.cu:69-72)
while observation blocks stream in and trellis columns stream out through the
automatic pipelining machinery. Each grid step processes an (8 sequences x 8
frames) tile; the (states x states) transition matrix is VMEM-resident for
the whole kernel. Per frame, destination states are processed in (TJ, 128)
VPU tiles with a running (max, argmax) over source-state lane tiles; ties
resolve to the lowest source index, matching the reference CPU kernel and
librosa (viterbi.cpp:94-100).

All shapes must be pre-padded: states to a multiple of 128, batch and frames
to multiples of 8 (pad transition rows/cols, observation states, and initial
with -inf so padded states never win an argmax).
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


def _pick_dest_tile(states_padded):
    """Largest destination-state tile (multiple of 8) dividing states_padded"""
    for tile in (512, 256, 128):
        if states_padded % tile == 0:
            return tile
    raise ValueError(f'states_padded={states_padded} not a multiple of 128')


def _forward_kernel(
        obs_ref,      # (8, 8, S) VMEM block at (n, t)
        trans_ref,    # (S, S) VMEM, resident
        init_ref,     # (1, S) VMEM, resident
        frames_ref,   # (8, 1) int32 VMEM block at (n, 0)
        trellis_ref,  # out: (8, 8, S) int32 block at (n, t)
        post_ref,     # out: (8, S) float32 block at (n, 0); doubles as the
                      # VMEM-resident posterior carry across the frame axis
        scores_col,   # scratch: (S, 1) float32
        args_col,     # scratch: (S, 1) float32 (bitcast int32 backpointers;
                      # Mosaic cannot transpose int32 (S,1)->(1,S))
        *,
        states_padded,
        dest_tile):
    tb = pl.program_id(1)
    num_dest_tiles = states_padded // dest_tile
    num_src_tiles = states_padded // 128

    for k in range(FRAME_TILE):
        t = tb * FRAME_TILE + k
        for b in range(BATCH_TILE):
            frames_b = frames_ref[b, 0]

            @pl.when(t == 0)
            def _init(b=b, k=k):
                post_ref[b:b + 1, :] = obs_ref[b, 0:1, :] + init_ref[...]
                trellis_ref[b, k:k + 1, :] = jnp.zeros(
                    (1, states_padded), jnp.int32)

            @pl.when(jnp.logical_and(t > 0, t < frames_b))
            def _step(b=b, k=k):
                for jt in range(num_dest_tiles):
                    m = jnp.full((dest_tile, 128), NEG_INF, jnp.float32)
                    a = jnp.zeros((dest_tile, 128), jnp.int32)
                    for it in range(num_src_tiles):
                        # Slice the ref (not a loaded array): lane-sliced
                        # loaded vectors produce layouts Mosaic cannot
                        # broadcast across sublanes
                        v = (
                            trans_ref[jt * dest_tile:(jt + 1) * dest_tile,
                                      it * 128:(it + 1) * 128]
                            + post_ref[b:b + 1, it * 128:(it + 1) * 128])
                        gt = v > m
                        lane_index = (
                            lax.broadcasted_iota(
                                jnp.int32, (dest_tile, 128), 1)
                            + it * 128)
                        a = jnp.where(gt, lane_index, a)
                        m = jnp.where(gt, v, m)
                    best = jnp.max(m, axis=1, keepdims=True)
                    # lowest absolute source index among tied lanes
                    arg = jnp.min(
                        jnp.where(m == best, a, jnp.full_like(a, _INT_MAX)),
                        axis=1,
                        keepdims=True)
                    scores_col[jt * dest_tile:(jt + 1) * dest_tile, :] = best
                    args_col[jt * dest_tile:(jt + 1) * dest_tile, :] = (
                        pltpu.bitcast(arg, jnp.float32))
                trellis_ref[b, k:k + 1, :] = pltpu.bitcast(
                    jnp.transpose(args_col[...]), jnp.int32)
                post_ref[b:b + 1, :] = (
                    obs_ref[b, k:k + 1, :] + jnp.transpose(scores_col[...]))

            @pl.when(jnp.logical_and(t > 0, t >= frames_b))
            def _padded(b=b, k=k):
                # Reference trellis is zero-initialized and untouched past the
                # valid frame count (viterbi.cpp:201, :81); the posterior
                # freezes at the last valid frame
                trellis_ref[b, k:k + 1, :] = jnp.zeros(
                    (1, states_padded), jnp.int32)


@functools.lru_cache(maxsize=64)
def _build_forward(batch, frames, states_padded, interpret=False):
    assert batch % BATCH_TILE == 0 and frames % FRAME_TILE == 0
    dest_tile = _pick_dest_tile(states_padded)
    kernel = functools.partial(
        _forward_kernel, states_padded=states_padded, dest_tile=dest_tile)
    grid = (batch // BATCH_TILE, frames // FRAME_TILE)
    in_specs = [
            pl.BlockSpec(
                (BATCH_TILE, FRAME_TILE, states_padded),
                lambda n, t: (n, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (states_padded, states_padded),
                lambda n, t: (0, 0),
                # Constant block: single buffer, or the ~9.4MB transition at
                # S=1536 is double-buffered and overflows the 16MB VMEM
                pipeline_mode=pl.Buffered(buffer_count=1),
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
        scratch_shapes=[
            pltpu.VMEM((states_padded, 1), jnp.float32),
            pltpu.VMEM((states_padded, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=batch * frames * 4 * states_padded * states_padded,
            bytes_accessed=(
                batch * frames * states_padded * 8
                + states_padded * states_padded * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # v5e exposes ~128MB VMEM; the default 16MB scoped limit cannot
            # hold the resident (S, S) transition plus pipeline buffers
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret)

    def forward(observation, batch_frames, transition, initial):
        bf = batch_frames.astype(jnp.int32)
        return call(
            observation,
            transition,
            initial.reshape(1, states_padded),
            bf.reshape(batch, 1))

    return jax.jit(forward)


def viterbi_forward_pallas(observation, batch_frames, transition, initial,
                           interpret=False):
    """Pallas forward pass over pre-padded inputs.

    observation: (batch, frames, states_padded) float32 log-probs
    batch_frames: (batch,) int32
    transition: (states_padded, states_padded) float32 log-probs
    initial: (states_padded,) float32 log-probs

    Returns (trellis (batch, frames, states_padded) int32,
             posterior (batch, states_padded) float32)
    """
    batch, frames, states_padded = observation.shape
    fwd = _build_forward(batch, frames, states_padded, interpret)
    return fwd(observation, batch_frames, transition, initial)
