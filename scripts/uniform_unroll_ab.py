"""A/B the constant-transition (width-0) batch-1 scan unroll factor.

The uniform-default-transition decode is pure XLA; at batch 1 x 10240
frames its cost is dominated by the length-T scalar carry scan
(ops/dispatch.py constant-transition pipeline). Sweep
CONSTANT_SCAN_UNROLL and print steady-state ms/call per value; the
winner backs the config default.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get('AB_FRAMES', 10240))


def main():
    import jax.numpy as jnp

    import torbi_tpu
    from bench import synthetic_posteriorgrams
    from torbi_tpu.core import _default_initial, _default_transition
    from torbi_tpu.ops.dispatch import decode, padded_states
    from torbi_tpu.utils.profile import time_submissions

    host = synthetic_posteriorgrams(1, FRAMES, 1440, seed=1)
    states_p = padded_states(1440)
    padded = np.full((1, FRAMES, states_p), -np.inf, dtype=np.float32)
    padded[..., :1440] = host
    obs = jnp.asarray(padded)
    bf = jnp.full((1,), FRAMES, jnp.int32)
    uniform = _default_transition(1440)
    initial = _default_initial(1440)

    results = {}
    for unroll in (8, 32, 128, 512):
        torbi_tpu.CONSTANT_SCAN_UNROLL = unroll

        def run():
            return decode(obs, bf, uniform, initial, apply_epsilon=True)

        sec = time_submissions(run, lambda r: r[0, 0], iters=8)
        results[unroll] = round(sec * 1e3, 2)
        print(json.dumps({
            'unroll': unroll,
            'ms_per_call': results[unroll],
            'timesteps_per_second': round(FRAMES / sec)}), flush=True)

    best = min(results, key=results.get)
    print(json.dumps({'best_unroll': best, 'ms': results[best]}))


if __name__ == '__main__':
    main()
