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
import os as _os
INTERPRET = _os.environ.get('KERNEL_LAB_INTERPRET') == '1'

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_TILE = 8
FRAME_TILE = 8
NEG_INF = float('-inf')


def build_kernel(variant, batch, frames, states, width, n_acc=4,
                 batch_tile=BATCH_TILE):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo = -(width // 2)
    shift0 = (-lo) % states

    def kernel_loopk(obs_ref, band_ref, post_ref):
        # Frame axis as a fori_loop: the lowered program is FRAME_TILE x
        # smaller (compile time), same static-shift rolls per offset
        from jax import lax

        tb = pl.program_id(1)

        def body(k, carry):
            t = tb * FRAME_TILE + k

            @pl.when(t == 0)
            def _init():
                post_ref[...] = obs_ref[:, 0, :]

            @pl.when(t > 0)
            def _step():
                post = post_ref[...]
                accs = [
                    jnp.full((batch_tile, states), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                for d in range(width):
                    v = pltpu.roll(post, (shift0 - d) % states, 1)
                    v = v + band_ref[d:d + 1, :]
                    accs[d % n_acc] = jnp.maximum(accs[d % n_acc], v)
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)
                obs_k = obs_ref[:, pl.ds(k, 1), :].reshape(
                    batch_tile, states)
                post_ref[...] = obs_k + m

            return carry

        lax.fori_loop(0, FRAME_TILE, body, 0)

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
                    jnp.full((batch_tile, states), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                if variant.startswith('pipe'):
                    # Software-pipelined emission: issue G rolls, then
                    # their G adds+maxes -- gives Mosaic's scheduler an
                    # explicit window to overlap permute-port rolls with
                    # ALU work from the previous group
                    group = int(variant[4:] or 8)
                    for d0 in range(0, width, group):
                        ds = range(d0, min(d0 + group, width))
                        rolled = [
                            pltpu.roll(post, (shift0 - d) % states, 1)
                            for d in ds]
                        for j, d in enumerate(ds):
                            accs[d % n_acc] = jnp.maximum(
                                accs[d % n_acc],
                                rolled[j] + band_ref[d:d + 1, :])
                    m = accs[0]
                    for acc in accs[1:]:
                        m = jnp.maximum(m, acc)
                    post_ref[...] = obs_ref[:, k, :] + m
                    return
                if variant == 'ushare2':
                    # ushare with the vreg rotation expressed as aligned
                    # slices + concat (no roll-of-roll chains; plain
                    # roll-of-roll proved NOT free: 96.6 ms, = full)
                    groups = {}
                    for d in range(width):
                        s = (shift0 - d) % states
                        groups.setdefault(s % 128, []).append((d, s))
                    i = 0
                    for u, items in groups.items():
                        base = pltpu.roll(post, u, 1)
                        for d, s in items:
                            q = (s - u) % states
                            if q == 0:
                                v = base
                            else:
                                cut = (states - q) % states
                                v = jnp.concatenate(
                                    [base[:, cut:], base[:, :cut]], axis=1)
                            v = v + band_ref[d:d + 1, :]
                            accs[i % n_acc] = jnp.maximum(
                                accs[i % n_acc], v)
                            i += 1
                    m = accs[0]
                    for acc in accs[1:]:
                        m = jnp.maximum(m, acc)
                    post_ref[...] = obs_ref[:, k, :] + m
                    return
                if variant == 'ushare':
                    # One true roll per distinct (shift mod 128); offsets
                    # sharing it differ by a vreg-granular (multiple-of-128)
                    # rotate, which the vregroll result suggests is ~free
                    groups = {}
                    for d in range(width):
                        s = (shift0 - d) % states
                        groups.setdefault(s % 128, []).append((d, s))
                    i = 0
                    for u, items in groups.items():
                        base = pltpu.roll(post, u, 1)
                        for d, s in items:
                            q = (s - u) % states
                            v = base if q == 0 else pltpu.roll(base, q, 1)
                            v = v + band_ref[d:d + 1, :]
                            accs[i % n_acc] = jnp.maximum(
                                accs[i % n_acc], v)
                            i += 1
                    m = accs[0]
                    for acc in accs[1:]:
                        m = jnp.maximum(m, acc)
                    post_ref[...] = obs_ref[:, k, :] + m
                    return
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
    grid = (batch // batch_tile, frames // FRAME_TILE)
    call = pl.pallas_call(
        kernel_loopk if variant == 'loopk' else kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, FRAME_TILE, states),
                lambda n, t: (n, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (width_padded, states),
                lambda n, t: (0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, states),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, states), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=INTERPRET,
    )
    return jax.jit(lambda obs, band: call(obs, band))


def build_kernel_mxushift(batch, frames, states, width, n_acc=4,
                          batch_tile=BATCH_TILE, mxu_k=None):
    """mxushift needs the one-hot shift matrices as an extra input.

    mxu_k=None: every candidate shifts via MXU matmuls. mxu_k=K (hybrid):
    K residue classes shift via MXU while the rest use one true roll per
    residue plus free vreg rotations (the ushare scheme) -- permute port,
    ALUs, and MXU all loaded in parallel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo = -(width // 2)
    shift0 = (-lo) % states
    n_vregs = states // 128

    # Partition residue classes: mxu residues shift by matmul, the rest
    # by one true roll + free vreg rotations
    residues = {}
    for d in range(width):
        s = (shift0 - d) % states
        residues.setdefault(s % 128, []).append((d, s))
    res_list = list(residues.items())
    if mxu_k is None:
        mxu_set = set(residues)
    else:
        # Prefer single-candidate residues for the MXU (less reuse lost)
        singles = [u for u, g in res_list if len(g) == 1]
        mxu_set = set(singles[:mxu_k])

    def kernel(obs_ref, band_ref, mats_ref, post_ref):
        tb = pl.program_id(1)

        def mxu_shift(post, s):
            q_vreg, u_lane = divmod(s, 128)
            a_mat = mats_ref[u_lane, 0]
            b_mat = mats_ref[u_lane, 1]
            parts = []
            for i in range(n_vregs):
                x1 = post[:, ((i - q_vreg) % n_vregs) * 128:
                          ((i - q_vreg) % n_vregs) * 128 + 128]
                x2 = post[:, ((i - q_vreg - 1) % n_vregs) * 128:
                          ((i - q_vreg - 1) % n_vregs) * 128 + 128]
                parts.append(
                    jnp.dot(x1, a_mat,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(x2, b_mat,
                              preferred_element_type=jnp.float32))
            return jnp.concatenate(parts, axis=1)

        for k in range(FRAME_TILE):
            t = tb * FRAME_TILE + k

            @pl.when(t == 0)
            def _init(k=k):
                post_ref[...] = obs_ref[:, k, :]

            @pl.when(t > 0)
            def _step(k=k):
                post = post_ref[...]
                accs = [
                    jnp.full((batch_tile, states), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                index = 0
                for u, group in res_list:
                    if u in mxu_set:
                        for d, s in group:
                            v = mxu_shift(post, s)
                            v = v + band_ref[d:d + 1, :]
                            accs[index % n_acc] = jnp.maximum(
                                accs[index % n_acc], v)
                            index += 1
                    else:
                        base = pltpu.roll(post, u, 1)
                        for d, s in group:
                            q = (s - u) % states
                            v = base if q == 0 else pltpu.roll(base, q, 1)
                            v = v + band_ref[d:d + 1, :]
                            accs[index % n_acc] = jnp.maximum(
                                accs[index % n_acc], v)
                            index += 1
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)
                post_ref[...] = obs_ref[:, k, :] + m

    width_padded = ((width + 7) // 8) * 8
    grid = (batch // batch_tile, frames // FRAME_TILE)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, FRAME_TILE, states),
                lambda n, t: (n, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (width_padded, states),
                lambda n, t: (0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (128, 2, 128, 128),
                lambda n, t: (0, 0, 0, 0),
                pipeline_mode=pl.Buffered(buffer_count=1),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, states),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, states), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=INTERPRET,
    )

    mats = np.zeros((128, 2, 128, 128), np.float32)
    for u in range(128):
        for b in range(128):
            a = b - u
            if a >= 0:
                mats[u, 0, a, b] = 1.0
            else:
                mats[u, 1, a + 128, b] = 1.0
    import jax.numpy as jnp2
    mats_dev = jnp2.asarray(mats)
    return jax.jit(lambda obs, band: call(obs, band, mats_dev))


def build_kernel_tilted(variant, batch, frames, states, width, n_acc=4):
    """Tilted-layout variants: posterior stored (n_vregs*8, 128) per batch
    tile -- state s = 128*a + l lives at (sublane a*8 + b, lane l) for
    batch row b.

    An arbitrary state shift s = 128*q + r then decomposes into one
    intra-vreg lane rotate by r (SHARED by every offset with residue r),
    two sublane rolls by multiples of 8 (pure vreg renaming, free), and a
    lane-mask select (ALU). The full-width roll the production kernel pays
    per offset bundles the rotate with cross-vreg merge work that cannot
    be shared; this layout exposes the sharing to the scheduler.

      introt   intra-vreg rotate + max only     (rotate issue-rate probe)
      subroll  sublane roll by 8k + add + max   (renaming-freeness probe)
      tilted   the exact full recursion in tilted layout
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert states % 128 == 0
    n_vregs = states // 128
    rows = n_vregs * BATCH_TILE
    lo = -(width // 2)
    shift0 = (-lo) % states

    # Offsets grouped by lane residue; within a group by vreg shift
    groups = {}
    for d in range(width):
        s = (shift0 - d) % states
        groups.setdefault(s % 128, []).append((d, s // 128))

    def kernel(obs_ref, band_ref, post_ref):
        tb = pl.program_id(1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)

        for k in range(FRAME_TILE):
            t = tb * FRAME_TILE + k

            @pl.when(t == 0)
            def _init(k=k):
                post_ref[...] = obs_ref[0, :, k, :]

            @pl.when(t > 0)
            def _step(k=k):
                post = post_ref[...]  # (rows, 128)
                accs = [
                    jnp.full((rows, 128), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                i = 0
                if variant == 'tilted':
                    for r, items in groups.items():
                        rot = (
                            post if r == 0
                            else pltpu.roll(post, r, 1))
                        for d, q in items:
                            a = pltpu.roll(rot, 8 * q, 0)
                            if r == 0:
                                v = a
                            else:
                                b = pltpu.roll(
                                    rot, (8 * (q + 1)) % rows, 0)
                                v = jnp.where(lane >= r, a, b)
                            v = v + band_ref[d]
                            accs[i % n_acc] = jnp.maximum(
                                accs[i % n_acc], v)
                            i += 1
                elif variant == 'introt':
                    for d in range(width):
                        v = pltpu.roll(post, (shift0 - d) % 128, 1)
                        accs[d % n_acc] = jnp.maximum(accs[d % n_acc], v)
                    i = width
                elif variant == 'subroll':
                    for d in range(width):
                        v = pltpu.roll(post, (8 * (d % n_vregs)) % rows, 0)
                        v = v + band_ref[d]
                        accs[d % n_acc] = jnp.maximum(accs[d % n_acc], v)
                    i = width
                else:
                    raise ValueError(variant)
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)
                post_ref[...] = obs_ref[0, :, k, :] + m

    grid = (batch // BATCH_TILE, frames // FRAME_TILE)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, rows, FRAME_TILE, 128),
                lambda n, t: (n, 0, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (width, rows, 128),
                lambda n, t: (0, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (batch // BATCH_TILE * rows, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=INTERPRET,
    )
    return jax.jit(lambda obs, band: call(obs, band))


def build_mod12_plan(states, width, band_host):
    """Stitched-band plan for the mod-12 layout kernel.

    Layout: state s lives at (sublane (s mod M)*8 + b, lane s div M) with
    M = states / 128 (M=12 at S=1536). A candidate shift sigma then only
    moves lanes by k or k+1 where sigma = M*k + rho -- ~width/M distinct
    lane-rotates for the WHOLE band -- plus a free sublane rename by rho.
    The k-vs-k+1 row carry is folded into per-(rotate, rename) stitched
    band matrices built here: B[(alpha, beta)][cell] holds the band weight
    of the unique shift whose candidate lands at that cell through that
    (lane-rotate alpha, sublane-rename beta) composition, -inf elsewhere.
    Every (output state, in-band shift) candidate is covered exactly once
    (asserted), so max over all pairs is bit-exact.
    """
    M = states // 128
    rows = M * 8
    lo = -(width // 2)

    # Candidate shifts sigma (source = output + sigma + ... in the lab's
    # convention the roll amount is s(d) = (shift0 - d) mod states; the
    # SOURCE index is output_lane_pos - s(d) i.e. source = j - s(d) mod
    # states... keep the same convention as build_kernel: rolled[j] =
    # post[(j - s) mod states], candidate d at output j reads
    # post[(j - s(d)) mod states] + band[d, j].
    shift0 = (-lo) % states
    shifts = [(d, (shift0 - d) % states) for d in range(width)]

    # For output state j at (r_out = j mod M, l_out = j div M), candidate
    # d reads source u = (j - s) mod states at (u mod M, u div M).
    # Lane-rotate alpha: X[sub, l] = post[sub, (l - alpha) mod 128]
    # Sublane-rename beta rows: Z[sub, l] = X[(sub - 8*beta) mod rows, l]
    # Z holds, at cell (r_out*8+b, l_out), the posterior of state
    # u' with u' mod M = (r_out - beta) mod M and
    # u' div M = (l_out - alpha) mod 128.
    pairs = {}
    owner = {}
    for d, s in shifts:
        sigma = -s % states  # source u = (j - s) mod = (j + sigma) mod
        beta = (-sigma) % M  # (r_out - beta) ≡ (r_out + sigma)  (mod M)
        for r_out in range(M):
            # u div M = (l_out + kk) mod 128 with kk = (r_out+sigma) div M,
            # so the lane-rotate must be alpha = (-kk) mod 128
            kk = (r_out + sigma) // M
            alpha = (-kk) % 128
            key = (alpha, beta)
            mat = pairs.setdefault(
                key, np.full((rows, 128), NEG_INF, np.float32))
            # Each (alpha, beta, r_out) stripe has a unique owning shift
            assert owner.setdefault((key, r_out), d) == d, (
                'stitch collision')
            # band value depends on the output state j = M*l_out + r_out
            jcols = np.arange(128) * M + r_out
            row_vals = band_host[d, jcols].astype(np.float32)
            for b in range(8):
                mat[r_out * 8 + b] = row_vals
    return pairs


def build_kernel_mod12(batch, frames, states, width, band_host, n_acc=4):
    """The stitched mod-12 layout kernel (see build_mod12_plan)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = states // 128
    rows = M * 8
    plan = build_mod12_plan(states, width, band_host)
    keys = sorted(plan)
    stitched = np.stack([plan[key] for key in keys])  # (P, rows, 128)
    alphas = sorted({alpha for alpha, _ in keys})

    def kernel(obs_ref, band_ref, post_ref):
        tb = pl.program_id(1)

        for k in range(FRAME_TILE):
            t = tb * FRAME_TILE + k

            @pl.when(t == 0)
            def _init(k=k):
                post_ref[...] = obs_ref[0, :, k, :]

            @pl.when(t > 0)
            def _step(k=k):
                post = post_ref[...]  # (rows, 128)
                rotated = {
                    alpha: (post if alpha == 0
                            else pltpu.roll(post, alpha, 1))
                    for alpha in alphas}
                accs = [
                    jnp.full((rows, 128), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                for i, (alpha, beta) in enumerate(keys):
                    v = rotated[alpha]
                    if beta:
                        v = pltpu.roll(v, (8 * beta) % rows, 0)
                    accs[i % n_acc] = jnp.maximum(
                        accs[i % n_acc], v + band_ref[i])
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)
                post_ref[...] = obs_ref[0, :, k, :] + m

    grid = (batch // BATCH_TILE, frames // FRAME_TILE)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, rows, FRAME_TILE, 128),
                lambda n, t: (n, 0, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (len(keys), rows, 128),
                lambda n, t: (0, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128),
            lambda n, t: (n, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (batch // BATCH_TILE * rows, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=INTERPRET,
    )
    import jax.numpy as jnp2
    stitched_dev = jnp2.asarray(stitched)
    return jax.jit(lambda obs, band: call(obs, stitched_dev)), len(keys)


def build_kernel_mod12k(batch, frames, states, width, band_host, n_acc=4):
    """mod12 with NATURAL-layout obs in and an untilted per-frame write out:
    the mod-M transform runs IN-KERNEL via reshape/transpose (Mosaic
    relayout / XLU transpose), probing whether the XLA boundary copies
    (4 x ~4.8 ms at the headline shape) can be replaced by in-kernel
    shuffles that hide under the ALU-bound inner loop."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = states // 128
    rows = M * 8
    plan = build_mod12_plan(states, width, band_host)
    keys = sorted(plan)
    stitched = np.stack([plan[key] for key in keys])
    alphas = sorted({alpha for alpha, _ in keys})

    def to_mod(col):
        # (8, S) natural -> (M*8, 128)
        arr = col.reshape(8, 128, M)
        arr = jnp.transpose(arr, (2, 0, 1))  # (M, 8, 128)
        return arr.reshape(rows, 128)

    def from_mod(z):
        # (M*8, 128) -> (8, S)
        arr = z.reshape(M, 8, 128)
        arr = jnp.transpose(arr, (1, 2, 0))  # (8, 128, M)
        return arr.reshape(8, states)

    def kernel(obs_ref, band_ref, post_ref, nat_ref):
        tb = pl.program_id(1)

        for k in range(FRAME_TILE):
            t = tb * FRAME_TILE + k

            @pl.when(t == 0)
            def _init(k=k):
                post_ref[...] = to_mod(obs_ref[:, k, :])
                nat_ref[...] = obs_ref[:, k, :]

            @pl.when(t > 0)
            def _step(k=k):
                post = post_ref[...]
                rotated = {
                    alpha: (post if alpha == 0
                            else pltpu.roll(post, alpha, 1))
                    for alpha in alphas}
                accs = [
                    jnp.full((rows, 128), NEG_INF, jnp.float32)
                    for _ in range(n_acc)]
                for i, (alpha, beta) in enumerate(keys):
                    v = rotated[alpha]
                    if beta:
                        v = pltpu.roll(v, (8 * beta) % rows, 0)
                    accs[i % n_acc] = jnp.maximum(
                        accs[i % n_acc], v + band_ref[i])
                m = accs[0]
                for acc in accs[1:]:
                    m = jnp.maximum(m, acc)
                new = to_mod(obs_ref[:, k, :]) + m
                post_ref[...] = new
                nat_ref[...] = from_mod(new)

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
                (len(keys), rows, 128),
                lambda n, t: (0, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (rows, 128),
                lambda n, t: (n, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BATCH_TILE, states),
                lambda n, t: (n, 0),
                memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch // BATCH_TILE * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((batch, states), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=INTERPRET,
    )
    import jax.numpy as jnp2
    stitched_dev = jnp2.asarray(stitched)
    return jax.jit(lambda obs, band: call(obs, stitched_dev))


def mod12_obs(obs, states):
    """(batch, frames, states) -> (batch/8, M*8, frames, 128) in the
    mod-M layout: state s at (sublane (s mod M)*8 + b, lane s div M)"""
    M = states // 128
    batch, frames, _ = obs.shape
    # s = M*l + r -> split as (l, r) then order rows (r, b)
    arr = obs.reshape(batch // 8, 8, frames, 128, M)
    arr = arr.transpose(0, 4, 1, 2, 3)  # (B/8, M, 8, T, 128)
    return np.ascontiguousarray(
        arr.reshape(batch // 8, M * 8, frames, 128))


def unmod12_posterior(post, batch, states):
    """(batch/8*M*8, 128) -> (batch, states)"""
    M = states // 128
    arr = post.reshape(batch // 8, M, 8, 128)
    arr = arr.transpose(0, 2, 3, 1)  # (B/8, 8, 128, M): s = M*l + r
    return np.ascontiguousarray(arr.reshape(batch, states))


def check_mod12(args):
    """Bitwise-compare the stitched mod-12 kernel against 'full'."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    obs = rng.standard_normal(
        (args.batch, args.frames, args.states)).astype(np.float32)
    width_padded = ((args.width + 7) // 8) * 8
    band = rng.standard_normal(
        (width_padded, args.states)).astype(np.float32)

    full = build_kernel('full', args.batch, args.frames, args.states,
                        args.width)
    ref = np.asarray(full(jnp.asarray(obs), jnp.asarray(band)))

    fn, n_pairs = build_kernel_mod12(
        args.batch, args.frames, args.states, args.width, band)
    got_t = np.asarray(fn(
        jnp.asarray(mod12_obs(obs, args.states)), None))
    got = unmod12_posterior(got_t, args.batch, args.states)
    match = np.array_equal(ref, got)
    print(json.dumps(
        {'mod12_bitwise_match': bool(match), 'stitched_pairs': n_pairs}))
    if not match:
        bad = np.argwhere(ref != got)
        print('first mismatches:', bad[:5].tolist())
        print('ref', ref[tuple(bad[0])], 'got', got[tuple(bad[0])])

    # mod12k: natural in/out with in-kernel relayout; its second output
    # is the natural-layout final posterior, directly comparable
    fnk = build_kernel_mod12k(
        args.batch, args.frames, args.states, args.width, band)
    got_k = np.asarray(fnk(jnp.asarray(obs), None)[1])
    match_k = np.array_equal(ref, got_k)
    print(json.dumps({'mod12k_bitwise_match': bool(match_k)}))
    return match and match_k


def build_spread_plan(states, width, band_host):
    """Stitched plan for the batch-1 'spread' (replicated-offsets) kernel.

    Delegates the layout math to the PRODUCTION plan
    (torbi_tpu.ops.band.spread_plan with the lab's centered band,
    lo = -(width//2)) so the variant measured here runs exactly the
    shipped keys/renames/rebuild; only the band-matrix gather uses the
    lab's host-side band array. Caveat vs production: the lab kernel
    omits the constant-floor term (one extra masked max per frame) and
    the frame-validity gating.

    Returns (keys, stitched, rebuild) -- see ops/band.py::spread_plan.
    """
    from torbi_tpu.ops import band as band_ops

    M = states // 128
    rows = M * 8
    lo = -(width // 2)
    keys, pairs, rebuild = band_ops.spread_plan(states, lo, width)
    stitched = np.full((len(keys), rows, 128), NEG_INF, np.float32)
    for i, key in enumerate(keys):
        for r_out, q in pairs[key].items():
            jcols = np.arange(128) * M + r_out
            for g in range(8):
                d = 8 * q + g
                if d < width:
                    stitched[i, r_out * 8 + g] = band_host[d, jcols]
    return keys, stitched, rebuild


def build_kernel_spread(frames, states, width, band_host, n_acc=4):
    """Batch-1 replicated-offsets stitched kernel (see build_spread_plan).

    Per frame: rebuild the 8 shifted posterior copies (~3 lane rotates +
    free renames + masked selects), ~2 stitched pairs per 8-offset chunk
    (one masked add+max each, 1/8th the stitched kernel's ALU bill), and a
    3-step group-wrapped rotation all-reduce over the slots. Bitwise exact:
    the candidate value set is identical and fp max is order-independent.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = states // 128
    rows = M * 8
    keys, stitched, rebuild = build_spread_plan(states, width, band_host)
    alphas = sorted({alpha for alpha, _ in keys})
    reb_alphas = sorted({a for (_, _, a, _, _) in rebuild})

    def kernel(obs_ref, band_ref, post_ref):
        tb = pl.program_id(0)
        sub = lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        g_of = sub % 8
        r_of = sub // 8

        def rebuild_A(prep):
            rots = {a: (prep if a == 0 else pltpu.roll(prep, a, 1))
                    for a in reb_alphas}
            A = jnp.full((rows, 128), NEG_INF, jnp.float32)
            for (g, amt_g, a, r_lo, r_hi) in rebuild:
                z = rots[a]
                if amt_g:
                    z = pltpu.roll(z, amt_g, 0)
                mask = (g_of == g) & (r_of >= r_lo) & (r_of <= r_hi)
                A = jnp.where(mask, z, A)
            return A

        for k in range(FRAME_TILE):
            t = tb * FRAME_TILE + k

            @pl.when(t == 0)
            def _init(k=k):
                post_ref[...] = obs_ref[:, k, :]

            @pl.when(t > 0)
            def _step(k=k):
                spread = rebuild_A(post_ref[...])
                rotated = {
                    alpha: (spread if alpha == 0
                            else pltpu.roll(spread, alpha, 1))
                    for alpha in alphas}
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
                        g_of < 8 - delta,
                        pltpu.roll(m, (-delta) % rows, 0),
                        pltpu.roll(m, 8 - delta, 0))
                    m = jnp.maximum(m, y)
                post_ref[...] = obs_ref[:, k, :] + m

    grid = (frames // FRAME_TILE,)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rows, FRAME_TILE, 128),
                lambda t: (0, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (len(keys), rows, 128),
                lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, 128),
            lambda t: (0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=INTERPRET,
    )
    import jax.numpy as jnp2
    stitched_dev = jnp2.asarray(stitched)
    return jax.jit(lambda obs, band: call(obs, stitched_dev)), len(keys)


def spread_obs(obs_seq, states):
    """(frames, states) -> (M*8, frames, 128): the mod-M observation
    replicated identically over the 8 sublane slots (replication, not
    shifting -- the posterior add happens after the slot all-reduce)"""
    M = states // 128
    frames = obs_seq.shape[0]
    arr = obs_seq.reshape(frames, 128, M).transpose(2, 0, 1)  # (M, T, 128)
    rep = np.broadcast_to(arr[:, None], (M, 8, frames, 128))
    return np.ascontiguousarray(rep.reshape(M * 8, frames, 128))


def unspread_posterior(post, states):
    """(M*8, 128) replicated posterior -> (states,) natural (slot g=0)"""
    M = states // 128
    arr = post.reshape(M, 8, 128)[:, 0, :]     # (M, 128)
    return np.ascontiguousarray(arr.transpose(1, 0).reshape(states))


def check_spread(args):
    """Bitwise-compare the batch-1 spread kernel against 'full' (row 0 of
    an 8-row batch), including the replication invariant of every slot."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    obs = rng.standard_normal(
        (8, args.frames, args.states)).astype(np.float32)
    width_padded = ((args.width + 7) // 8) * 8
    band = rng.standard_normal(
        (width_padded, args.states)).astype(np.float32)
    band[args.width:] = NEG_INF

    full = build_kernel('full', 8, args.frames, args.states, args.width)
    ref = np.asarray(full(jnp.asarray(obs), jnp.asarray(band)))[0]

    fn, n_pairs = build_kernel_spread(
        args.frames, args.states, args.width, band)
    out = np.asarray(fn(
        jnp.asarray(spread_obs(obs[0], args.states)), None))
    # Every slot must hold the identical replicated posterior
    slots = out.reshape(args.states // 128, 8, 128)
    replicated = bool((slots == slots[:, :1]).all())
    got = unspread_posterior(out, args.states)
    match = np.array_equal(ref, got)
    print(json.dumps(
        {'spread_bitwise_match': bool(match),
         'spread_slots_replicated': replicated,
         'spread_pairs': n_pairs}))
    if not match:
        bad = np.argwhere(ref != got)
        print('first mismatches:', bad[:5].tolist())
        print('ref', ref[tuple(bad[0])], 'got', got[tuple(bad[0])])
    return match and replicated


def tilt_obs(obs, n_vregs):
    """(batch, frames, states) -> (batch/8, n_vregs*8, frames, 128)"""
    batch, frames, states = obs.shape
    tilted = obs.reshape(batch // 8, 8, frames, n_vregs, 128)
    return np.ascontiguousarray(
        tilted.transpose(0, 3, 1, 2, 4).reshape(
            batch // 8, n_vregs * 8, frames, 128))


def tilt_band(band, width, n_vregs):
    """(width_padded, states) -> (width, n_vregs*8, 128), rows repeated
    per batch sublane"""
    rows = band[:width].reshape(width, n_vregs, 1, 128)
    return np.ascontiguousarray(
        np.broadcast_to(rows, (width, n_vregs, 8, 128)).reshape(
            width, n_vregs * 8, 128))


def untilt_posterior(post, batch, states):
    """(batch/8*n_vregs*8, 128) -> (batch, states)"""
    n_vregs = states // 128
    out = post.reshape(batch // 8, n_vregs, 8, 128)
    return np.ascontiguousarray(
        out.transpose(0, 2, 1, 3).reshape(batch, states))


def check_tilted(args):
    """Bitwise-compare the tilted kernel against the production-shaped
    'full' variant on the given shape (small shapes recommended)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    obs = rng.standard_normal(
        (args.batch, args.frames, args.states)).astype(np.float32)
    width_padded = ((args.width + 7) // 8) * 8
    band = rng.standard_normal(
        (width_padded, args.states)).astype(np.float32)

    full = build_kernel('full', args.batch, args.frames, args.states,
                        args.width)
    ref = np.asarray(full(jnp.asarray(obs), jnp.asarray(band)))

    tilted = build_kernel_tilted(
        'tilted', args.batch, args.frames, args.states, args.width)
    n_vregs = args.states // 128
    got_t = np.asarray(tilted(
        jnp.asarray(tilt_obs(obs, n_vregs)),
        jnp.asarray(tilt_band(band, args.width, n_vregs))))
    got = untilt_posterior(got_t, args.batch, args.states)
    match = np.array_equal(ref, got)
    print(json.dumps({'tilted_bitwise_match': bool(match)}))
    if not match:
        bad = np.argwhere(ref != got)
        print('first mismatches:', bad[:5].tolist())
        print('ref', ref[tuple(bad[0])], 'got', got[tuple(bad[0])])
    return match


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--variants', default='full,rollmax,addmax,max')
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--frames', type=int, default=64)
    parser.add_argument('--states', type=int, default=1536)
    parser.add_argument('--width', type=int, default=44)
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument(
        '--check', action='store_true',
        help='bitwise-compare tilted vs full on this shape and exit')
    parser.add_argument(
        '--check-mod12', action='store_true',
        help='bitwise-compare the stitched mod-12 kernel vs full and exit')
    parser.add_argument(
        '--check-spread', action='store_true',
        help='bitwise-compare the batch-1 spread kernel vs full and exit')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import torbi_tpu  # noqa: F401  (enables the persistent compile cache)
    from torbi_tpu.utils.profile import time_submissions

    if args.check:
        sys.exit(0 if check_tilted(args) else 1)
    if args.check_mod12:
        sys.exit(0 if check_mod12(args) else 1)
    if args.check_spread:
        sys.exit(0 if check_spread(args) else 1)

    rng = np.random.default_rng(0)
    obs_host = rng.standard_normal(
        (args.batch, args.frames, args.states)).astype(np.float32)
    obs = jnp.asarray(obs_host)
    width_padded = ((args.width + 7) // 8) * 8
    band_host = rng.standard_normal(
        (width_padded, args.states)).astype(np.float32)
    band = jnp.asarray(band_host)
    obs_t = band_t = None  # tilted copies, staged on first use

    candidates = args.batch * args.frames * args.width * args.states
    results = {}
    for spec in args.variants.split(','):
        # spec syntax: name[:n_acc[:batch_tile]]
        parts = spec.split(':')
        variant = parts[0]
        n_acc = int(parts[1]) if len(parts) > 1 and parts[1] else 4
        batch_tile = int(parts[2]) if len(parts) > 2 else BATCH_TILE
        t0 = time.perf_counter()
        run_obs, run_band = obs, band
        if variant == 'mxushift':
            fn = build_kernel_mxushift(
                args.batch, args.frames, args.states, args.width, n_acc,
                batch_tile)
        elif variant == 'hybrid':
            # spec hybrid:K -> K residues on the MXU (n_acc slot reused)
            fn = build_kernel_mxushift(
                args.batch, args.frames, args.states, args.width, 4,
                batch_tile, mxu_k=n_acc)
        elif variant in ('tilted', 'introt', 'subroll'):
            fn = build_kernel_tilted(
                variant, args.batch, args.frames, args.states, args.width,
                n_acc)
            if obs_t is None:
                n_vregs = args.states // 128
                obs_t = jnp.asarray(tilt_obs(obs_host, n_vregs))
                band_t = jnp.asarray(
                    tilt_band(band_host, args.width, n_vregs))
            run_obs, run_band = obs_t, band_t
        elif variant == 'mod12':
            fn, n_pairs = build_kernel_mod12(
                args.batch, args.frames, args.states, args.width,
                band_host, n_acc)
            print(json.dumps({'mod12_stitched_pairs': n_pairs}),
                  flush=True)
            run_obs = jnp.asarray(mod12_obs(obs_host, args.states))
            run_band = band
        elif variant == 'spread':
            # Batch-1 variant: decodes ONE sequence (obs row 0); compare
            # its ms against other variants at --batch 8 divided by 8 --
            # or run both at their natural batch-1 shapes
            fn, n_pairs = build_kernel_spread(
                args.frames, args.states, args.width, band_host, n_acc)
            print(json.dumps({'spread_stitched_pairs': n_pairs}),
                  flush=True)
            run_obs = jnp.asarray(spread_obs(obs_host[0], args.states))
            run_band = band
        elif variant == 'mod12k':
            fn = build_kernel_mod12k(
                args.batch, args.frames, args.states, args.width,
                band_host, n_acc)
            raw = fn
            fn = lambda o, b, raw=raw: raw(o, b)[0]
        else:
            fn = build_kernel(
                variant, args.batch, args.frames, args.states, args.width,
                n_acc, batch_tile)
        sec = time_submissions(
            lambda fn=fn, a=run_obs, b=run_band: fn(a, b),
            lambda r: r[0, 0], args.iters)
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
