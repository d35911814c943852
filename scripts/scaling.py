"""Scaling-efficiency measurement: decode throughput vs device count.

Runs the same batch workload through the production dispatch path on
meshes of 1, 2, 4, ... local devices and reports weak-scaling efficiency
(throughput_n / (n * throughput_1)). On a real pod this is the
1-chip -> N-chip leg of the BASELINE scaling target (>= 85%); on the
8-device virtual CPU mesh it exercises the measurement harness itself.

Per-shard work is held constant (weak scaling): batch = rows_per_device
* n_devices, so each chip decodes the same rows/call at every scale.

Usage:
  python scripts/scaling.py [--rows-per-device 64] [--frames 128]
      [--states 256] [--iters 5]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--rows-per-device', type=int, default=64)
    parser.add_argument('--frames', type=int, default=128)
    parser.add_argument('--states', type=int, default=256)
    parser.add_argument('--iters', type=int, default=5)
    parser.add_argument(
        '--output', default=None,
        help='append the result rows as one JSON artifact to this path')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import synthetic_posteriorgrams, transition_probabilities
    import bench as bench_mod
    from torbi_tpu.ops import dispatch
    from torbi_tpu.parallel import batch_mesh
    from torbi_tpu.utils.profile import time_submissions

    bench_mod.STATES = args.states
    tiny = np.finfo(np.float32).tiny
    trans = jnp.asarray(np.log(transition_probabilities() + tiny))
    init = jnp.asarray(np.log(
        np.full(args.states, 1.0 / args.states, np.float32) + tiny))

    n_devices = jax.device_count()
    scales = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    base = None
    rows = []
    for n in scales:
        batch = args.rows_per_device * n
        obs = jnp.asarray(synthetic_posteriorgrams(
            batch, args.frames, args.states, seed=n))
        bf = jnp.full((batch,), args.frames, jnp.int32)
        mesh = batch_mesh(n_devices=n)

        def run():
            return dispatch.decode(
                obs, bf, trans, init, finite_observation=True, mesh=mesh)

        sec = time_submissions(run, lambda r: r[0, 0], iters=args.iters)
        throughput = batch * args.frames / sec
        if base is None:
            base = throughput
        row = {
            'devices': n,
            'batch': batch,
            'timesteps_per_s': round(throughput),
            'efficiency': round(throughput / (n * base), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.output:
        artifact = {
            'platform': jax.devices()[0].platform,
            'device_kind': jax.devices()[0].device_kind,
            'rows_per_device': args.rows_per_device,
            'frames': args.frames,
            'states': args.states,
            'iters': args.iters,
            'scales': rows,
        }
        existing = []
        if os.path.exists(args.output):
            with open(args.output) as file:
                existing = json.load(file)
        existing.append(artifact)
        with open(args.output, 'w') as file:
            json.dump(existing, file, indent=1)


if __name__ == '__main__':
    main()
