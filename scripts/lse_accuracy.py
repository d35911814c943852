"""Quantify the LSE (smoothed-max, MXU) decode mode against exact Viterbi.

Decodes synthetic peaked pitch posteriorgrams (bench.py's generator, the
realistic workload shape) with the exact backend and with backend='lse' at
several temperatures, and reports RPA agreement at 0/1/2 bins -- the same
metric the evaluation harness uses against librosa. The resulting table
goes in the README; run on any backend (pure XLA).

Usage: python scripts/lse_accuracy.py [--batch 64] [--frames 256]
       [--states 360] [--betas 2,4,8,16,32,64]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--frames', type=int, default=256)
    parser.add_argument('--states', type=int, default=360)
    parser.add_argument('--betas', default='2,4,8,16,32,64')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    import jax.numpy as jnp

    from bench import synthetic_posteriorgrams
    from torbi_tpu.ops import dispatch
    from torbi_tpu.ops.lse import decode_lse

    states = args.states
    tiny = np.finfo(np.float32).tiny
    obs = synthetic_posteriorgrams(
        args.batch, args.frames, states, seed=args.seed)
    # Band-diagonal pitch-style transition (scaled to the state count)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    halfwidth = max(states // 16, 4)
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = trans / trans.sum(axis=1, keepdims=True)
    trans = np.log(trans.astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.full(args.batch, args.frames, dtype=np.int32)

    obs_j = jnp.asarray(obs)
    bf_j = jnp.asarray(bf)
    trans_j = jnp.asarray(trans)
    init_j = jnp.asarray(init)

    exact = np.asarray(dispatch.decode(
        obs_j, bf_j, trans_j, init_j, finite_observation=True))

    total = exact.size
    for beta in [float(b) for b in args.betas.split(',')]:
        approx = np.asarray(decode_lse(
            obs_j, bf_j, trans_j, init_j, beta=beta))
        err = np.abs(approx.astype(np.int64) - exact.astype(np.int64))
        print(json.dumps({
            'beta': beta,
            'rpa0': round(float((err == 0).sum() / total), 6),
            'rpa1': round(float((err <= 1).sum() / total), 6),
            'rpa2': round(float((err <= 2).sum() / total), 6),
            'max_abs_err_bins': int(err.max()),
        }), flush=True)


if __name__ == '__main__':
    main()
