"""Inspect the compiled headline pipeline for layout/defensive copies.

The round-3 trace shows the staged decode at the headline shape spends
~4.85 ms per full-size copy (a (512, 512, 1536) f32 stream is ~1.6 GB;
read+write at HBM speed is ~5 ms) on top of forward + backtrace. This
dumps the optimized HLO of the exact production program and prints every
copy/bitcast-convert instruction with operand shapes so each one can be
attributed (input layout mismatch, inter-kernel relayout, output
normalization) and attacked (donation, explicit layouts, kernel dimension
order).

Usage (real TPU; compile may take minutes on a cold cache):
  python scripts/hlo_copies.py [--batch 512] [--frames 512] [--dump PATH]
"""
import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--batch', type=int, default=512)
    parser.add_argument('--frames', type=int, default=512)
    parser.add_argument('--states', type=int, default=1440)
    parser.add_argument('--dump', default=None,
                        help='also write the full optimized HLO here')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import torbi_tpu
    from bench import synthetic_posteriorgrams, transition_probabilities
    from torbi_tpu.ops import band as band_ops
    from torbi_tpu.ops import dispatch

    tiny = np.finfo(np.float32).tiny
    host = synthetic_posteriorgrams(args.batch, args.frames, args.states)
    states_p = dispatch.padded_states(args.states)
    padded = np.full(
        (args.batch, args.frames, states_p), -np.inf, dtype=np.float32)
    padded[..., :args.states] = host
    packed = dispatch.pack_observation(padded)

    transition = jnp.asarray(
        np.log(transition_probabilities() + tiny))
    initial = jnp.asarray(
        np.log(np.full(args.states, 1 / args.states, np.float32) + tiny))
    bf = jnp.full((args.batch,), args.frames, jnp.int32)

    band = band_ops.gate_band(
        band_ops.detect_band(transition), initial, None,
        finite_observation=True)
    assert band is not None and band[1] > 0, band
    mesh_key = dispatch.resolve_mesh(None, args.batch)

    fn = dispatch._build_decode(
        'pallas', args.batch, args.frames, args.states, states_p, band,
        False, True, True, mesh_key, dispatch._config_key(), packed=True)
    trans_p, init_p, band_matrix = dispatch._prepare_padded(
        transition, initial, args.states, states_p, band)

    obs = jnp.asarray(packed)
    lowered = fn.lower(obs, bf, trans_p, init_p, band_matrix)
    compiled = lowered.compile()
    text = compiled.as_text()
    if args.dump:
        with open(args.dump, 'w') as file:
            file.write(text)
        print(f'full HLO -> {args.dump}')

    # Big tensors only: the f32[...] copies at this shape are the ~5 ms
    # HBM round-trips worth attacking
    copies = []
    for line in text.splitlines():
        stripped = line.strip()
        if re.match(r'%?(copy|transpose|bitcast-convert)', stripped) or \
                ' = ' in stripped and re.search(
                    r'= (f32|s32|bf16)\[[^\]]*\] (copy|transpose)\(',
                    stripped):
            copies.append(stripped)
    print(f'--- copy/transpose instructions ({len(copies)}) ---')
    for line in copies:
        print(line[:240])

    # Cost summary if available
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        print('--- cost analysis ---')
        for key in ('bytes accessed', 'optimal_seconds', 'flops'):
            if key in analysis:
                print(f'{key}: {analysis[key]:.4g}')
    except Exception as error:  # pragma: no cover - platform dependent
        print(f'(cost analysis unavailable: {error})')


if __name__ == '__main__':
    main()
