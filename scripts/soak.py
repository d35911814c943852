"""Randomized cross-path bit-exactness soak (CPU, interpreter mode).

Decodes a few hundred random configurations -- dense / banded (-inf or
floor exterior, asymmetric shifts) / constant transitions, batch sizes
including 1, padded frame lengths, folded-epsilon and plain log inputs,
spread on/off, natural and packed observations -- and compares every
decoded path bitwise against ops/oracle.viterbi_numpy. Broader than the
fixed-seed suite; run before perf-sensitive kernel changes land:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/soak.py [N]

Takes ~5 s per case (dominated by XLA CPU compiles of fresh shape
buckets). Exits nonzero on any mismatch, printing the offending config.
"""
import os
import sys

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cases=200, seed=20260818):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    import torbi_tpu
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import (
        decode, pack_observation, padded_states)

    tiny = np.finfo(np.float32).tiny
    rng = np.random.default_rng(seed)
    fails = 0
    for case in range(cases):
        batch = int(rng.choice([1, 1, 2, 3, 5, 8, 11]))
        frames = int(rng.integers(2, 90))
        states = int(rng.choice([5, 17, 40, 129, 200, 256, 384]))
        kind = rng.choice(['dense', 'band', 'bandfloor', 'const'])
        spread = bool(rng.integers(0, 2))
        eps = bool(rng.integers(0, 2))
        torbi_tpu.BAND_BATCH1_SPREAD = spread
        obs = np.log(rng.dirichlet(
            np.ones(states), size=(batch, frames)).astype(np.float32) + tiny)
        if kind == 'dense':
            trans = np.log(rng.dirichlet(
                np.ones(states), size=states).astype(np.float32) + tiny)
        elif kind == 'const':
            trans = np.full(
                (states, states), np.float32(np.log(1.0 / states)),
                np.float32)
        else:
            hw = int(rng.integers(1, max(2, states // 6)))
            xx, yy = np.meshgrid(
                np.arange(states), np.arange(states), indexing='ij')
            shift = int(rng.integers(-2, 3))
            b = np.clip(hw + 1.0 - np.abs(xx - yy + shift), 0, None)
            # A shifted band can leave edge rows empty; rows must stay
            # valid distributions (NaN transitions are out of contract)
            b[b.sum(axis=1) == 0, 0] = 1.0
            b = b / b.sum(axis=1, keepdims=True)
            trans = (np.log(b.astype(np.float32) + tiny)
                     if kind == 'bandfloor'
                     else np.log(b).astype(np.float32))
        init = np.log(
            rng.dirichlet(np.ones(states)).astype(np.float32) + tiny)
        bf = rng.integers(1, frames + 1, size=batch).astype(np.int32)
        bf[rng.integers(0, batch)] = frames

        obs_k = np.log(np.exp(obs) + tiny) if eps else obs
        expected = oracle.viterbi_numpy(obs_k, bf, trans, init)
        got = np.asarray(decode(
            jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
            jnp.asarray(init), backend='pallas',
            finite_observation=not eps, apply_epsilon=eps))
        if not np.array_equal(got, expected):
            fails += 1
            print(f'FAIL case {case}: {kind} b={batch} f={frames} '
                  f's={states} spread={spread} eps={eps}', flush=True)
            continue
        sp = padded_states(states)
        if sp % 128 == 0 and eps:
            padded = np.full((batch, frames, sp), -np.inf, np.float32)
            padded[..., :states] = obs
            got_p = np.asarray(decode(
                jnp.asarray(pack_observation(padded)), jnp.asarray(bf),
                jnp.asarray(trans), jnp.asarray(init), backend='pallas',
                apply_epsilon=True))
            if not np.array_equal(got_p, expected):
                fails += 1
                print(f'FAIL packed case {case}: {kind} b={batch} '
                      f'f={frames} s={states} spread={spread}', flush=True)
        if case % 25 == 24:
            print(f'{case + 1} cases done', flush=True)
    print(f'soak complete: {cases - fails}/{cases} configs exact '
          f'(fails={fails})')
    return 1 if fails else 0


if __name__ == '__main__':
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 200))
