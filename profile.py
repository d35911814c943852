"""Decode-pipeline profiler: where does a batch-512 call spend its time?

Runs the headline 1440-state workload (bench.py's configuration), measures
each pipeline stage with chained-dependency device timing, optionally
captures a jax.profiler trace, and prints a breakdown table plus a
VPU speed-of-light comparison for the forward kernel.

Usage:
    python profile.py [--batch 512] [--frames 512] [--trace DIR] [--json]
"""
import argparse
import json


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--batch', type=int, default=512)
    parser.add_argument('--frames', type=int, default=512)
    parser.add_argument('--states', type=int, default=1440)
    parser.add_argument('--iters', type=int, default=8)
    parser.add_argument(
        '--trace', default=None,
        help='also capture a jax.profiler trace into this directory')
    parser.add_argument(
        '--json', action='store_true', help='print machine-readable JSON')
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import synthetic_posteriorgrams
    from torbi_tpu.models import pitch
    from torbi_tpu.utils import profile as prof

    from torbi_tpu.ops.dispatch import padded_states

    tiny = np.finfo(np.float32).tiny
    # Lane-padded like the data pipeline loads observations (unaligned
    # minor dims cost a full relayout copy per call)
    host = synthetic_posteriorgrams(args.batch, args.frames, args.states)
    states_p = padded_states(args.states)
    if states_p != args.states:
        padded = np.full(
            host.shape[:2] + (states_p,), -np.inf, dtype=np.float32)
        padded[..., :args.states] = host
        host = padded
    # Pack to the stitched kernel's mod-M layout (the bench's input
    # convention) so the pipeline stage measures the production fast path
    import torbi_tpu
    if (states_p % 128 == 0
            and getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', '') == 'stitched'):
        from torbi_tpu.ops.dispatch import pack_observation
        obs_pipeline = jnp.asarray(pack_observation(host))
    else:
        obs_pipeline = jnp.asarray(host)
    obs = jnp.asarray(host)
    if args.states == 1440:
        transition = jnp.asarray(np.log(pitch.transition_matrix() + tiny))
    else:
        rng = np.random.default_rng(0)
        transition = jnp.asarray(np.log(
            rng.dirichlet(np.ones(args.states), size=args.states)
            .astype(np.float32) + tiny))
    initial = jnp.asarray(np.log(
        np.full(args.states, 1.0 / args.states, dtype=np.float32) + tiny))
    batch_frames = np.full(args.batch, args.frames, dtype=np.int32)

    stages = prof.time_stages(
        obs, batch_frames, transition, initial, iters=args.iters,
        pipeline_observation=obs_pipeline)
    band = stages.pop('band')
    states_padded = ((args.states + 127) // 128) * 128
    sol = prof.speed_of_light(
        args.batch, args.frames, states_padded, band, stages['forward_ms'])

    timesteps = args.batch * args.frames
    report = {
        'config': {
            'batch': args.batch, 'frames': args.frames,
            'states': args.states, 'band': band,
            'platform': jax.default_backend()},
        'stages_ms': {k: round(v, 3) for k, v in stages.items()},
        'speed_of_light': {
            'permute_ideal_ms': round(sol['permute_ideal_ms'], 3),
            'alu_ideal_ms': round(sol['alu_ideal_ms'], 3),
            'hbm_ideal_ms': round(sol['hbm_ideal_ms'], 3),
            'utilization': round(sol['utilization'], 4)},
        'throughput': {
            'pipeline_timesteps_per_s': round(
                timesteps / stages['pipeline_ms'] * 1e3),
            'e2e_timesteps_per_s': round(
                timesteps / stages['e2e_ms'] * 1e3)},
    }

    trace_rows = []
    if args.trace:
        def run_once():
            # Trace the PRODUCTION input convention (packed when the
            # stitched layout is active) -- tracing the natural layout
            # here would show relayout copies the packed path never pays
            from torbi_tpu.ops import dispatch
            return jax.block_until_ready(dispatch.decode(
                obs_pipeline, jnp.asarray(batch_frames), transition,
                initial, finite_observation=True))
        try:
            prof.capture(run_once, args.trace)
            trace_rows = prof.device_op_times(args.trace, top=15)
            report['trace_top_ops'] = trace_rows
        except Exception as error:  # platform may not support tracing
            report['trace_error'] = f'{type(error).__name__}: {error}'

    if args.json:
        print(json.dumps(report))
        return

    cfg = report['config']
    print(f"# decode profile: batch={cfg['batch']} frames={cfg['frames']} "
          f"states={cfg['states']} platform={cfg['platform']} "
          f"band={cfg['band']}")
    print(f"{'stage':<14}{'ms':>10}")
    for key in ('forward_ms', 'backtrace_ms', 'glue_ms', 'pipeline_ms',
                'host_ms', 'e2e_ms'):
        print(f"{key[:-3]:<14}{report['stages_ms'][key]:>10.2f}")
    print(f"\nspeed-of-light: permute {sol['permute_ideal_ms']:.1f} ms / "
          f"ALU {sol['alu_ideal_ms']:.1f} ms / HBM {sol['hbm_ideal_ms']:.1f}"
          f" ms -> {sol['vpu_utilization'] * 100:.1f}% of the binding "
          f"(permute-port) ideal")
    tp = report['throughput']
    print(f"throughput: pipeline {tp['pipeline_timesteps_per_s']:,} ts/s, "
          f"e2e {tp['e2e_timesteps_per_s']:,} ts/s")
    if trace_rows:
        print('\ntop device ops (trace):')
        for row in trace_rows:
            print(f"  {row['total_ms']:>9.2f} ms  x{row['count']:<5} "
                  f"{row['name'][:70]}")
    elif args.trace:
        print(f"\ntrace: {report.get('trace_error', 'no device events found')}")


if __name__ == '__main__':
    main()
