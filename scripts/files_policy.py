"""Sweep the native-loader segmentation policy on the real chip.

The file workload's device-resident throughput trades padded slot-frames
(one mixed-length batch pads every row to the longest file's bucket)
against the number of decode calls (each call carries a fixed dispatch
cost -- ~4 ms through this development environment's tunnel, ~0.1 ms on a
production host). This script measures the end-to-end async-pipelined
decode wall for each LOADER_SPLIT_MIN_ROWS policy over the bench.py files
corpus (256 files, 400-1600 frames) and prints one JSON line per policy;
the shipped default in config/defaults.py follows these numbers.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import torbi_tpu
    from bench import synthetic_posteriorgrams, transition_probabilities
    from torbi_tpu.core import _pack_eligible
    from torbi_tpu.ops import dispatch

    tiny = np.finfo(np.float32).tiny
    rng = np.random.default_rng(3)
    lengths = rng.integers(400, 1600, size=256)

    with tempfile.TemporaryDirectory() as tmp:
        inputs = []
        for i, length in enumerate(lengths):
            path = os.path.join(tmp, f'{i:05d}.npy')
            np.save(path, synthetic_posteriorgrams(
                1, int(length), 1440, seed=1000 + i)[0])
            inputs.append(path)
        trans = jnp.asarray(np.log(transition_probabilities() + tiny))
        initial = jnp.asarray(
            np.log(np.full(1440, 1 / 1440, np.float32) + tiny))
        pack = _pack_eligible(trans, initial, True, None)

        policies = os.environ.get('POLICIES', 'none,8,64').split(',')
        for policy in policies:
            torbi_tpu.LOADER_SPLIT_MIN_ROWS = (
                None if policy == 'none' else int(policy))
            groups = []
            for observation, batch_frames, _, _ in torbi_tpu.data.loader(
                    inputs, pad_value=float('-inf'), pack=pack):
                observation = np.asarray(observation)
                batch_frames = np.asarray(batch_frames, np.int32)
                packed = observation.ndim == 4
                rows_total = observation.shape[1 if packed else 0]
                frames = observation.shape[2 if packed else 1]
                rows = dispatch.guard_rows(
                    frames, 1440, states_in=(
                        observation.shape[0] * 128 if packed
                        else observation.shape[2]),
                    packed=packed)
                for start in range(0, rows_total, rows):
                    stop = min(start + rows, rows_total)
                    group = (
                        observation[:, start:stop] if packed
                        else observation[start:stop])
                    groups.append((
                        jnp.asarray(group),
                        jnp.asarray(batch_frames[start:stop])))
            real = sum(int(b.sum()) for _, b in groups)
            slots = sum(
                dispatch.bucket_batch(int(b.shape[0]))
                * (g.shape[2] if g.ndim == 4 else g.shape[1])
                for g, b in groups)

            def run_all():
                return [
                    dispatch.decode(g, b, trans, initial, apply_epsilon=True)
                    for g, b in groups]

            jax.block_until_ready(run_all())  # compile warmup
            best = float('inf')
            for _ in range(3):
                start_t = time.perf_counter()
                for _ in range(4):
                    outs = run_all()
                for out in outs:
                    np.asarray(out[0, 0])
                jax.block_until_ready(outs)
                best = min(
                    best, (time.perf_counter() - start_t) / 4)
            print(json.dumps({
                'policy': policy,
                'calls': len(groups),
                'slot_row_frames': int(slots),
                'real_timesteps': int(real),
                'ms_per_pass': round(best * 1e3, 1),
                'timesteps_per_second': round(real / best),
            }), flush=True)
            del groups


if __name__ == '__main__':
    main()
