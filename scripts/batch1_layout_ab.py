"""A/B the batch-1 decode across kernel layouts: stitched(+spread) vs the
round-2 natural 'rolled' layout.

The round-2 driver bench recorded 11.43 ms/call (896K ts/s) at the batch-1
10240-frame pitch config on the pre-stitched natural-layout band kernel;
the stitched default regressed that to 24 ms (r03) and the spread kernel
recovered 15 ms (r04). This script measures both layouts through the
production dispatch on the same inputs to decide the batch-1 route.

Run on the real TPU. Feeds each layout the observation form it consumes
zero-copy: mod-M packed for stitched, lane-padded natural for rolled.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get('AB_FRAMES', 10240))
ITERS = int(os.environ.get('AB_ITERS', 8))


def main():
    import jax.numpy as jnp

    import torbi_tpu
    from bench import synthetic_posteriorgrams, transition_probabilities
    from torbi_tpu.core import _default_initial
    from torbi_tpu.ops.dispatch import decode, pack_observation, padded_states
    from torbi_tpu.utils.profile import time_submissions

    tiny = np.finfo(np.float32).tiny
    host = synthetic_posteriorgrams(1, FRAMES, 1440, seed=1)
    states_p = padded_states(1440)
    padded_host = np.full((1, FRAMES, states_p), -np.inf, dtype=np.float32)
    padded_host[..., :1440] = host
    obs_natural = jnp.asarray(padded_host)
    obs_packed = jnp.asarray(pack_observation(padded_host))
    bf = jnp.full((1,), FRAMES, jnp.int32)
    transition = jnp.asarray(np.log(transition_probabilities() + tiny))
    initial = _default_initial(1440)

    cases = [
        ('stitched+spread', 'stitched', True, obs_packed),
        ('rolled-natural', 'rolled', False, obs_natural),
    ]
    results = {}
    paths = {}
    for name, layout, spread, obs in cases:
        torbi_tpu.BAND_KERNEL_LAYOUT = layout
        torbi_tpu.BAND_BATCH1_SPREAD = spread

        def run(obs=obs):
            return decode(obs, bf, transition, initial, apply_epsilon=True)

        sec = time_submissions(run, lambda r: r[0, 0], iters=ITERS)
        paths[name] = np.asarray(run())
        results[name] = {
            'ms_per_call': round(sec * 1e3, 2),
            'timesteps_per_second': round(FRAMES / sec),
        }
        print(json.dumps({name: results[name]}), flush=True)

    names = list(results)
    exact = bool(np.array_equal(paths[names[0]], paths[names[1]]))
    best = min(results, key=lambda k: results[k]['ms_per_call'])
    print(json.dumps({'paths_equal': exact, 'best': best}))


if __name__ == '__main__':
    main()
