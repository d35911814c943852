"""Scaling-efficiency measurement: decode throughput vs device count.

Two modes:

``--mode weak`` runs the same per-device workload on meshes of 1, 2, 4,
... devices and reports weak-scaling efficiency (throughput_n / (n *
throughput_1)). Meaningful only when the devices are physically parallel
(a real pod); on this repo's development host the 8 "devices" of the
virtual CPU mesh share ONE physical core, so weak-scaling wall time
cannot improve by construction.

``--mode overhead`` (the honest artifact for a serializing host) decodes
the SAME total batch unsharded and sharded n ways and reports the total
work overhead ratio t_sharded / t_unsharded. Viterbi batch decoding has
no cross-shard communication (each shard runs the identical staged kernel
on its rows), so on hardware where shards actually run in parallel the
expected scaling efficiency is bounded below by work conservation:
efficiency ~= (t_unsharded / t_sharded) x load balance. The per-shard
batch is padded to the same bucket on every shard (dispatch pads each
shard to bucket_batch), so balance is exact for uniform-length batches.

Usage:
  python scripts/scaling.py [--mode overhead] [--rows-per-device 64]
      [--frames 128] [--states 256] [--iters 5] [--output FILE]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write(path, artifact):
    existing = []
    if os.path.exists(path):
        with open(path) as file:
            existing = json.load(file)
    existing.append(artifact)
    with open(path, 'w') as file:
        json.dump(existing, file, indent=1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--mode', choices=('weak', 'overhead'),
                        default='overhead')
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

    import torbi_tpu
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

    n_devices = jax.local_device_count()
    scales = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    rows = []

    if args.mode == 'weak':
        base = None
        for n in scales:
            batch = args.rows_per_device * n
            obs = jnp.asarray(synthetic_posteriorgrams(
                batch, args.frames, args.states, seed=n))
            bf = jnp.full((batch,), args.frames, jnp.int32)
            mesh = batch_mesh(n_devices=n)

            def run(obs=obs, bf=bf, mesh=mesh):
                return dispatch.decode(
                    obs, bf, trans, init, finite_observation=True,
                    mesh=mesh)

            sec = time_submissions(run, lambda r: r[0, 0], args.iters)
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
    else:
        # Fixed total work: rows_per_device * max devices, unsharded first
        batch = args.rows_per_device * scales[-1]
        obs = jnp.asarray(synthetic_posteriorgrams(
            batch, args.frames, args.states, seed=17))
        bf = jnp.full((batch,), args.frames, jnp.int32)

        old_auto = torbi_tpu.AUTO_SHARD
        torbi_tpu.AUTO_SHARD = False
        try:
            sec1 = time_submissions(
                lambda: dispatch.decode(
                    obs, bf, trans, init, finite_observation=True),
                lambda r: r[0, 0], args.iters)
        finally:
            torbi_tpu.AUTO_SHARD = old_auto
        rows.append({
            'devices': 1, 'batch': batch,
            'seconds_per_call': round(sec1, 4),
            'work_overhead': 1.0, 'projected_efficiency': 1.0})
        print(json.dumps(rows[-1]), flush=True)

        for n in scales[1:]:
            mesh = batch_mesh(n_devices=n)

            def run(mesh=mesh):
                return dispatch.decode(
                    obs, bf, trans, init, finite_observation=True,
                    mesh=mesh)

            sec = time_submissions(run, lambda r: r[0, 0], args.iters)
            row = {
                'devices': n,
                'batch': batch,
                'seconds_per_call': round(sec, 4),
                'work_overhead': round(sec / sec1, 4),
                'projected_efficiency': round(sec1 / sec, 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.output:
        artifact = {
            'mode': args.mode,
            'platform': jax.devices()[0].platform,
            'device_kind': jax.devices()[0].device_kind,
            'physical_cpus': os.cpu_count(),
            'rows_per_device': args.rows_per_device,
            'frames': args.frames,
            'states': args.states,
            'iters': args.iters,
            'note': (
                'virtual CPU devices share the physical cores; weak-mode '
                'wall efficiency is bounded by cores/devices, overhead '
                'mode measures work conservation of the sharded dispatch '
                'path (no collectives in batch decode), a lower bound on '
                'real-pod efficiency up to load balance'),
            'scales': rows,
        }
        _write(args.output, artifact)


if __name__ == '__main__':
    main()
