"""Microbenchmark the serial backtrace-chase step on the TPU.

The batch-1 backtrace is a 10240-step serial chain; each step's latency is
some mix of (a) the scalar->vector->scalar round trip that feeds the next
dynamic row load, (b) VMEM load latency, and (c) the argmax reduction
trees. The windowed-chase experiment showed width reduction alone does not
pay, so this lab isolates the components with dependency-preserving dummy
kernels before committing to a redesign:

- scalar_only : SMEM scalar arithmetic per step (loop + scalar-core floor)
- v2s_floor   : dynamic (1,128) VMEM row load -> extract lane-0 scalar ->
                SMEM store (the minimal vector round trip per step)
- tree1       : v2s_floor + ONE fused (value,index) paired reduction tree
                over (1,128) lanes (7 pltpu.roll levels)
- tree12      : the realistic full-width candidate: 12 x (1,128) row blocks
                pair-reduced (4 levels) then one lane tree (7 levels)
- two_trees   : tree12 but with the production kernel's two SEQUENTIAL
                reductions (max tree, then argmin-of-ties tree) for
                comparison against the fused pair tree

Each kernel preserves the serial dependency (the extracted scalar feeds the
next step's dynamic slice) so Mosaic cannot parallelize across steps. The
numbers are per-call milliseconds for FRAMES steps; compare against the
production backtrace stage from `python profile.py --batch 1`.
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get('CHASE_FRAMES', 10240))
STATES_P = 1536
M = STATES_P // 128


def _build(variant, frames, frame_tile=128, unroll=False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = frames // frame_tile
    INT_MAX = np.int32(np.iinfo(np.int32).max)

    def pair(v_a, i_a, v_b, i_b):
        """Fused (value, lowest-index-tie) combine"""
        v = jnp.maximum(v_a, v_b)
        i = jnp.where(
            v_a > v_b, i_a,
            jnp.where(v_b > v_a, i_b, jnp.minimum(i_a, i_b)))
        return v, i

    def kernel(trans_ref, post_ref, out_ref, idx_ref):
        nf = pl.program_id(0)

        @pl.when(nf == 0)
        def _seed():
            idx_ref[0, 0] = 7

        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def step_scalar_only(k):
            ib = idx_ref[0, 0]
            idx_ref[0, 0] = (ib * 5 + k) % STATES_P

        def step_scalar_nomod(k):
            # Modulo by a non-power-of-2 may lower to an expensive scalar
            # division; mask instead to expose the bare loop floor
            ib = idx_ref[0, 0]
            idx_ref[0, 0] = (ib * 5 + k) & 1023

        def step_v2s_nomod(k):
            ib = idx_ref[0, 0]
            row = trans_ref[pl.ds(ib, 1), :][:, :128]
            nxt = row[0, 0].astype(jnp.int32) & 1023
            idx_ref[0, 0] = (nxt + k) & 1023

        def step_v2s_floor(k):
            # Dynamic sublane loads must span the block's full lane width
            # (Mosaic: "dynamic load with unaligned indices" otherwise);
            # the lane narrowing is a static register slice after the load
            ib = idx_ref[0, 0]
            row = trans_ref[pl.ds(ib, 1), :][:, :128]
            nxt = row[0, 0].astype(jnp.int32) % STATES_P
            idx_ref[0, 0] = (nxt + k) % STATES_P

        def step_tree1(k):
            ib = idx_ref[0, 0]
            v = (trans_ref[pl.ds(ib, 1), :][:, :128]
                 + post_ref[pl.ds(k, 1), :][:, :128])
            i = lane
            for shift in (64, 32, 16, 8, 4, 2, 1):
                v, i = pair(
                    v, i, pltpu.roll(v, shift, 1), pltpu.roll(i, shift, 1))
            idx_ref[0, 0] = i[0, 0] % STATES_P

        def step_tree12(k):
            ib = idx_ref[0, 0]
            row = trans_ref[pl.ds(ib, 1), :]
            col = post_ref[pl.ds(k, 1), :]
            vs = [row[:, 128 * r:128 * (r + 1)]
                  + col[:, 128 * r:128 * (r + 1)] for r in range(M)]
            iis = [lane * M + r for r in range(M)]
            while len(vs) > 1:
                nv, ni = [], []
                for a in range(0, len(vs) - 1, 2):
                    v, i = pair(vs[a], iis[a], vs[a + 1], iis[a + 1])
                    nv.append(v)
                    ni.append(i)
                if len(vs) % 2:
                    nv.append(vs[-1])
                    ni.append(iis[-1])
                vs, iis = nv, ni
            v, i = vs[0], iis[0]
            for shift in (64, 32, 16, 8, 4, 2, 1):
                v, i = pair(
                    v, i, pltpu.roll(v, shift, 1), pltpu.roll(i, shift, 1))
            idx_ref[0, 0] = i[0, 0] % STATES_P

        def step_two_trees(k):
            ib = idx_ref[0, 0]
            v = trans_ref[pl.ds(ib, 1), :] + post_ref[pl.ds(k, 1), :]
            nat = (lax.broadcasted_iota(jnp.int32, (1, STATES_P), 1)
                   % 128) * M
            mx = jnp.max(v, axis=1, keepdims=True)
            pred = jnp.min(
                jnp.where(v == mx, nat, INT_MAX), axis=1, keepdims=True)
            idx_ref[0, 0] = pred[0, 0] % STATES_P

        def step_two_trees_nomod(k):
            # The production-shaped candidate: (1, S) row + posterior
            # column, Mosaic-native max then argmin-of-ties reductions,
            # no modulo anywhere in the chain
            ib = idx_ref[0, 0]
            v = trans_ref[pl.ds(ib, 1), :] + post_ref[pl.ds(k, 1), :]
            nat = (lax.broadcasted_iota(jnp.int32, (1, STATES_P), 1)
                   % 128) * M
            mx = jnp.max(v, axis=1, keepdims=True)
            pred = jnp.min(
                jnp.where(v == mx, nat, INT_MAX), axis=1, keepdims=True)
            idx_ref[0, 0] = pred[0, 0] & 1023

        step = {
            'scalar_only': step_scalar_only,
            'scalar_nomod': step_scalar_nomod,
            'v2s_floor': step_v2s_floor,
            'v2s_nomod': step_v2s_nomod,
            'tree1': step_tree1,
            'tree12': step_tree12,
            'two_trees': step_two_trees,
            'two_trees_nomod': step_two_trees_nomod,
        }[variant]

        def body(i, carry):
            step(frame_tile - 1 - i)
            return carry

        lax.fori_loop(0, frame_tile, body, 0, unroll=unroll)
        out_ref[0, 0] = idx_ref[0, 0]

    grid = (n_tiles,)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (STATES_P, STATES_P), lambda t: (0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (frame_tile, STATES_P), lambda t: (n_tiles - 1 - t, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    return jax.jit(call)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        '--variants',
        default='scalar_only,v2s_floor,tree1,tree12,two_trees')
    parser.add_argument('--frames', type=int, default=FRAMES)
    parser.add_argument('--iters', type=int, default=8)
    parser.add_argument(
        '--unroll', type=int, default=0,
        help='unroll factor for the frame loop (0 = no unrolling)')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from torbi_tpu.utils.profile import time_submissions

    rng = np.random.default_rng(0)
    trans = jnp.asarray(
        rng.normal(size=(STATES_P, STATES_P)).astype(np.float32))
    post = jnp.asarray(
        rng.normal(size=(args.frames, STATES_P)).astype(np.float32))

    results = {}
    for variant in args.variants.split(','):
        call = _build(variant, args.frames, unroll=(args.unroll == 128))

        def run(call=call):
            return call(trans, post)

        sec = time_submissions(run, lambda r: r[0, 0], iters=args.iters)
        results[variant] = {
            'ms_per_call': round(sec * 1e3, 3),
            'ns_per_step': round(sec / args.frames * 1e9, 1),
        }
        print(json.dumps({variant: results[variant]}), flush=True)
    print(json.dumps({'frames': args.frames, 'results': results}))


if __name__ == '__main__':
    main()
