"""Pallas TPU kernel for the dense Viterbi forward recursion.

TPU-native design (not a port of the reference CUDA kernel,
/root/reference/torbi/csrc/cuda/viterbi.cu): the grid is
(batch tiles, frame tiles) with frames innermost, so Mosaic's sequential grid
iteration carries each sequence's posterior in a VMEM-resident output block
(the analog of the reference's shared-memory double buffer, viterbi.cu:69-72)
while observation blocks stream in and posterior columns stream out through
the automatic pipelining machinery. Each grid step processes an
(8 sequences x 8 frames) tile; the (states x states) transition matrix is
VMEM-resident for the whole kernel. Per frame, destination states are
processed in (TJ, 128) VPU tiles with a running max over source-state lane
tiles.

Like the banded kernel (ops/band.py), this computes *values only* -- no
argmax bookkeeping in the hot loop. Posterior columns stream to HBM and the
Pallas backtrace kernel (ops/backtrace.py) recovers backpointers exactly,
including the reference CPU lowest-source-index tie rule
(viterbi.cpp:94-100), only along the realized path.

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
        obs_ref,      # (8, 8, S_in) VMEM block at (n, t); S_in unpadded
        trans_ref,    # (S, S) VMEM, resident
        init_ref,     # (1, S) VMEM, resident
        frames_ref,   # (8, 1) int32 VMEM block at (n, 0)
        postseq_ref,  # out: (8, 8, S) float32 block at (n, t)
        post_ref,     # out: (8, S) float32 block at (n, 0); doubles as the
                      # VMEM-resident posterior carry across the frame axis
        scores_col,   # scratch: (S, 1) float32
        *,
        states_in,
        states_padded,
        dest_tile):
    tb = pl.program_id(1)
    num_dest_tiles = states_padded // dest_tile
    num_src_tiles = states_padded // 128

    def obs_row(b, k):
        # Observations stream in unpadded; lane-pad in-register
        row = obs_ref[b, pl.ds(k, 1), :]
        if states_in == states_padded:
            return row
        pad = jnp.full(
            (1, states_padded - states_in), NEG_INF, jnp.float32)
        return jnp.concatenate([row, pad], axis=1)

    # The frame axis is a fori_loop (not unrolled): the dense kernel's body
    # is already num_dest_tiles * num_src_tiles * BATCH_TILE blocks, and an
    # 8x frame unroll put the 1536-state program in the many-minutes Mosaic
    # compile class (measured: the loop form costs no runtime,
    # scripts/kernel_lab.py 'loopk')
    def frame_body(k, carry):
        t = tb * FRAME_TILE + k
        for b in range(BATCH_TILE):
            frames_b = frames_ref[b, 0]

            @pl.when(t == 0)
            def _init(b=b):
                post0 = obs_row(b, 0) + init_ref[...]
                post_ref[b:b + 1, :] = post0
                postseq_ref[b, pl.ds(k, 1), :] = post0

            @pl.when(jnp.logical_and(t > 0, t < frames_b))
            def _step(b=b):
                for jt in range(num_dest_tiles):
                    m = jnp.full((dest_tile, 128), NEG_INF, jnp.float32)
                    for it in range(num_src_tiles):
                        # Slice the ref (not a loaded array): lane-sliced
                        # loaded vectors produce layouts Mosaic cannot
                        # broadcast across sublanes
                        v = (
                            trans_ref[jt * dest_tile:(jt + 1) * dest_tile,
                                      it * 128:(it + 1) * 128]
                            + post_ref[b:b + 1, it * 128:(it + 1) * 128])
                        m = jnp.maximum(m, v)
                    scores_col[jt * dest_tile:(jt + 1) * dest_tile, :] = (
                        jnp.max(m, axis=1, keepdims=True))
                new_post = (
                    obs_row(b, k) + jnp.transpose(scores_col[...]))
                post_ref[b:b + 1, :] = new_post
                postseq_ref[b, pl.ds(k, 1), :] = new_post

            @pl.when(jnp.logical_and(t > 0, t >= frames_b))
            def _padded(b=b):
                # The posterior freezes at the last valid frame
                # (viterbi.cpp:81 loops t in [1, frames))
                postseq_ref[b, pl.ds(k, 1), :] = post_ref[b:b + 1, :]
        return carry

    lax.fori_loop(0, FRAME_TILE, frame_body, 0)


@functools.lru_cache(maxsize=64)
def _build_forward(batch, frames, states_in, states_padded, interpret=False):
    assert batch % BATCH_TILE == 0 and frames % FRAME_TILE == 0
    dest_tile = _pick_dest_tile(states_padded)
    kernel = functools.partial(
        _forward_kernel, states_in=states_in, states_padded=states_padded,
        dest_tile=dest_tile)
    grid = (batch // BATCH_TILE, frames // FRAME_TILE)
    in_specs = [
            pl.BlockSpec(
                (BATCH_TILE, FRAME_TILE, states_in),
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
            jax.ShapeDtypeStruct(
                (batch, frames, states_padded), jnp.float32),
            jax.ShapeDtypeStruct((batch, states_padded), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((states_padded, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=batch * frames * 2 * states_padded * states_padded,
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

    Returns (post_seq, posterior) exactly like band.viterbi_forward_band
    (see its docstring); decode with backtrace.backtrace_posteriors.
    """
    batch, frames, states_in = observation.shape
    states_padded = transition.shape[0]
    fwd = _build_forward(batch, frames, states_in, states_padded, interpret)
    return fwd(observation, batch_frames, transition, initial)
