"""Forward-kernel experiment lab (run on real TPU).

Microbenchmarks isolated variants of the banded forward recursion's inner
loop to find where VPU issue goes and which restructurings pay. Each variant
is a small standalone Pallas kernel shaped like ops/band.py's hot loop
(posterior carry in VMEM, W offsets statically unrolled per frame), with the
inner body swapped:

  full        roll + broadcast-add + max        (the production 3-op body)
  rollmax     roll + max                        (no band add)
  addmax      broadcast-add + max               (no roll)
  max         max only                          (pure issue floor)
  vregroll    roll by multiples of 128 + add + max  (vreg-aligned rotates)
  acc1/acc2/acc8  accumulator-count sweep of the full body
  rowadd      roll + ROW-aligned add + max      (band pre-broadcast to (8,S))

Timing: queued submissions of the jitted kernel with one scalar fetch at the
end (utils/profile.time_submissions) -- block_until_ready alone is not
reliable for standalone pallas_call on this platform.

Usage:
  python scripts/kernel_lab.py --variants full,addmax,... \
      [--batch 64] [--frames 64] [--width 44] [--iters 20]
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_TILE = 8
FRAME_TILE = 8
NEG_INF = float('-inf')


def build_kernel(variant, batch, frames, states, width, n_acc=4):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo = -(width // 2)
    shift0 = (-lo) % states

    def kernel(obs_ref, band_ref, post_ref):
        tb = pl.program_id(1)

        for k in range(FRAME_TILE):
            t = tb * FRAME_TILE + k

            @pl.when(t == 0)
            def _init(k=k):
                post_ref[...] = obs_ref[:, k, :]

            @pl.when(t > 0)
            def _step(k=k):
                post = post_ref[...]
                accs = [
                    jnp.full((BATCH_TILE, states), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                for d in range(width):
                    if variant == 'full':
                        v = pltpu.roll(
                            post, (shift0 - d) % states, 1)
                        v = v + band_ref[d:d + 1, :]
                    elif variant == 'rollmax':
                        v = pltpu.roll(post, (shift0 - d) % states, 1)
                    elif variant == 'addmax':
                        v = post + band_ref[d:d + 1, :]
                    elif variant == 'max':
                        v = post
                    elif variant == 'vregroll':
                        v = pltpu.roll(post, (d * 128) % states, 1)
                        v = v + band_ref[d:d + 1, :]
                    elif variant == 'rowadd':
                        # Row-aligned add: band block starts at a sublane
                        # multiple; compare broadcast-add cost
                        v = pltpu.roll(post, (shift0 - d) % states, 1)
                        v = v + band_ref[(d // 8) * 8:(d // 8) * 8 + 8, :][
                            d % 8:d % 8 + 1, :]
                    else:
                        raise ValueError(variant)
                    accs[d % n_acc] = jnp.maximum(accs[d % n_acc], v)
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)
                post_ref[...] = obs_ref[:, k, :] + m

    width_padded = ((width + 7) // 8) * 8
    grid = (batch // BATCH_TILE, frames // FRAME_TILE)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (BATCH_TILE, FRAME_TILE, states),
                lambda n, t: (n, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (width_padded, states),
                lambda n, t: (0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BATCH_TILE, states),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, states), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )
    return jax.jit(lambda obs, band: call(obs, band))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--variants', default='full,rollmax,addmax,max')
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--frames', type=int, default=64)
    parser.add_argument('--states', type=int, default=1536)
    parser.add_argument('--width', type=int, default=44)
    parser.add_argument('--iters', type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import torbi_tpu  # noqa: F401  (enables the persistent compile cache)
    from torbi_tpu.utils.profile import time_submissions

    rng = np.random.default_rng(0)
    obs = jnp.asarray(
        rng.standard_normal(
            (args.batch, args.frames, args.states)).astype(np.float32))
    width_padded = ((args.width + 7) // 8) * 8
    band = jnp.asarray(
        rng.standard_normal(
            (width_padded, args.states)).astype(np.float32))

    candidates = args.batch * args.frames * args.width * args.states
    results = {}
    for spec in args.variants.split(','):
        variant, _, acc = spec.partition(':')
        n_acc = int(acc) if acc else 4
        t0 = time.perf_counter()
        fn = build_kernel(
            variant, args.batch, args.frames, args.states, args.width, n_acc)
        sec = time_submissions(
            lambda: fn(obs, band), lambda r: r[0, 0], args.iters)
        compile_s = time.perf_counter() - t0
        results[spec] = sec * 1e3
        print(json.dumps({
            'variant': spec,
            'ms': round(sec * 1e3, 3),
            'G_candidates_per_s': round(candidates / sec / 1e9, 1),
            'ns_per_vreg_op': round(
                sec * 1e9 / (candidates / 1024), 3),
            'compile_s': round(compile_s, 1),
        }), flush=True)

    print(json.dumps({'summary': {
        k: round(v, 3) for k, v in sorted(results.items(),
                                          key=lambda kv: kv[1])}}))


if __name__ == '__main__':
    main()
