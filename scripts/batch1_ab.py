"""A/B the production batch-1 decode: spread forward off/on x chase flavor.

Runs the exact bench.py batch-1 pitch config (10240 frames, 1440-state
pitch band, mod-M packed observation) through the production dispatch for
each combination of BAND_BATCH1_SPREAD and the backtrace-chase flavor
(full mod-M / band-windowed / fused pair-tree), printing steady-state
ms/call and timesteps/s for each. Run on the real TPU; the decisions this
script backs are the config defaults (config/defaults.py
BAND_BATCH1_SPREAD, BACKTRACE_BATCH1_WINDOW, BACKTRACE_BATCH1_FUSED).
AB_CHASES limits the chase list (e.g. AB_CHASES=full,fused).
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
    from bench import synthetic_posteriorgrams, transition_probabilities
    from torbi_tpu.core import _default_initial
    from torbi_tpu.ops.dispatch import decode, pack_observation, padded_states
    from torbi_tpu.utils.profile import time_submissions

    tiny = np.finfo(np.float32).tiny
    host = synthetic_posteriorgrams(1, FRAMES, 1440, seed=1)
    states_p = padded_states(1440)
    padded = np.full((1, FRAMES, states_p), -np.inf, dtype=np.float32)
    padded[..., :1440] = host
    obs = jnp.asarray(pack_observation(padded))
    bf = jnp.full((1,), FRAMES, jnp.int32)
    transition = jnp.asarray(
        np.log(transition_probabilities() + tiny))
    initial = _default_initial(1440)

    results = {}
    chases = os.environ.get('AB_CHASES', 'full,window,fused').split(',')
    torbi_tpu.BATCH1_AUTO_CHUNK = False  # serial arms measure the kernels
    serial_out = None
    for spread in (False, True):
        for chase in chases:
            torbi_tpu.BAND_BATCH1_SPREAD = spread
            torbi_tpu.BACKTRACE_BATCH1_WINDOW = chase == 'window'
            torbi_tpu.BACKTRACE_BATCH1_FUSED = chase == 'fused'

            def run():
                return decode(
                    obs, bf, transition, initial, apply_epsilon=True)

            serial_out = np.asarray(run())
            sec = time_submissions(run, lambda r: r[0, 0], iters=8)
            key = f'spread={spread},chase={chase}'
            results[key] = {
                'ms_per_call': round(sec * 1e3, 2),
                'timesteps_per_second': round(FRAMES / sec),
            }
            print(json.dumps({key: results[key]}), flush=True)

    # Auto-chunk arm (BATCH1_AUTO_CHUNK, ops/autochunk.py): the sequence
    # decodes as parallel entropy-chunk rows; on this peaked synthetic
    # input the path must MATCH the serial kernels exactly (every frame is
    # a confident split candidate)
    if os.environ.get('AB_AUTOCHUNK', '1') != '0':
        torbi_tpu.BATCH1_AUTO_CHUNK = True
        torbi_tpu.BAND_BATCH1_SPREAD = True     # shipped defaults
        torbi_tpu.BACKTRACE_BATCH1_FUSED = True
        torbi_tpu.BACKTRACE_BATCH1_WINDOW = False

        def run_chunked():
            return decode(
                obs, bf, transition, initial, apply_epsilon=True)

        chunked_out = np.asarray(run_chunked())
        exact = bool((chunked_out == serial_out).all())
        sec = time_submissions(run_chunked, lambda r: r[0, 0], iters=8)
        key = 'autochunk'
        results[key] = {
            'ms_per_call': round(sec * 1e3, 2),
            'timesteps_per_second': round(FRAMES / sec),
            'path_matches_serial': exact,
        }
        print(json.dumps({key: results[key]}), flush=True)

    base = results.get(
        'spread=False,chase=full',
        results[next(iter(results))])['ms_per_call']
    best_key = min(results, key=lambda k: results[k]['ms_per_call'])
    print(json.dumps({
        'best': best_key,
        'speedup_vs_full_chase': round(
            base / results[best_key]['ms_per_call'], 3)}))


if __name__ == '__main__':
    main()
