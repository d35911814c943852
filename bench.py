"""Headline benchmark: timesteps decoded per second at 1440 states.

Replicates the reference's published benchmark configuration
(/root/reference/README.md:11-21): batch 512, 1440-state pitch transition
matrix, float32 log-space posteriorgrams. The baseline is the reference's
batch-512 A40 number (692,160,422 timesteps/s). Note the reference timed the
CUDA path without device synchronization (torbi/core.py:200 wraps an async
launch), so its published number exceeds the A40's arithmetic peak ~77x;
this benchmark fences with block_until_ready and reports honest wall-clock
device throughput (forward + backtrace + result materialization).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BASELINE_A40_BATCH512 = 692_160_422  # reference README.md:20 (async-timed)

BATCH = 512
FRAMES = 512
STATES = 1440


def synthetic_posteriorgrams(batch, frames, states, seed=0):
    """Peaked synthetic pitch posteriorgrams in log space (float32)"""
    rng = np.random.default_rng(seed)
    tiny = np.finfo(np.float32).tiny
    # Smooth pitch trajectories -> peaked, band-plausible posteriors
    centers = np.cumsum(
        rng.integers(-3, 4, size=(batch, frames)), axis=1) % states
    bins = np.arange(states, dtype=np.float32)[None, None, :]
    out = np.empty((batch, frames, states), dtype=np.float32)
    for start in range(0, batch, 64):
        stop = min(start + 64, batch)
        dist = np.abs(bins - centers[start:stop, :, None].astype(np.float32))
        logits = -0.5 * (dist / 3.0) ** 2
        obs = logits - np.log(
            np.exp(logits).sum(axis=-1, keepdims=True))
        out[start:stop] = np.log(np.exp(obs) + tiny)
    return out


def main():
    import jax
    import jax.numpy as jnp

    import torbi_tpu
    from torbi_tpu.models import pitch
    from torbi_tpu.ops import dispatch

    tiny = np.finfo(np.float32).tiny
    obs = jnp.asarray(synthetic_posteriorgrams(BATCH, FRAMES, STATES))
    transition = jnp.asarray(np.log(pitch.transition_matrix() + tiny))
    initial = jnp.asarray(
        np.log(np.full(STATES, 1.0 / STATES, dtype=np.float32) + tiny))
    batch_frames = jnp.full((BATCH,), FRAMES, dtype=jnp.int32)

    def run():
        return jax.block_until_ready(dispatch.decode(
            obs, batch_frames, transition, initial,
            finite_observation=True))

    # Warmup/compile
    run()

    # Timed runs
    times = []
    for _ in range(3):
        start = time.perf_counter()
        run()
        times.append(time.perf_counter() - start)
    best = min(times)
    timesteps = BATCH * FRAMES
    value = timesteps / best

    print(json.dumps({
        'metric': 'timesteps_decoded_per_second_1440_states_batch512',
        'value': value,
        'unit': 'timesteps/s',
        'vs_baseline': value / BASELINE_A40_BATCH512,
    }))


if __name__ == '__main__':
    main()
