"""Command-line decode: ``python -m torbi_tpu`` maps onto
``from_files_to_files``.

The FLAG NAMES are a compatibility contract with the reference CLI
(torbi/__main__.py:16-49): invocations written against the reference run
unchanged. Everything behind them is this framework's pipeline -- the
native .npy loader assembles mod-M packed device batches when the
transition qualifies for the stitched band kernel, long single sequences
auto-chunk into parallel rows (config/defaults.py BATCH1_AUTO_CHUNK), and
``--gpu`` selects among visible accelerator devices (the name is kept for
script compatibility; on this backend it indexes TPU chips).
"""
from pathlib import Path

import torbi_tpu
from torbi_tpu.config import ArgumentParser

# Declarative flag table: one row per reference-compatible flag
_FLAGS = (
    ('--input_files', dict(
        type=Path, nargs='+', required=True,
        help='Observation files to decode (.pt or .npy, (frames, states))')),
    ('--output_files', dict(
        type=Path, nargs='+', required=True,
        help='Where each decoded index sequence lands (paired one-to-one '
             'with --input_files)')),
    ('--transition_file', dict(
        type=Path,
        help='Transition matrix in probability space, row = destination; '
             'a uniform matrix is assumed when omitted')),
    ('--initial_file', dict(
        type=Path,
        help='First-frame state distribution; uniform when omitted')),
    ('--log_probs', dict(
        action='store_true',
        help='Observation files already hold natural-log probabilities')),
    ('--gpu', dict(
        type=int,
        help='Index into jax.devices() to decode on (reference flag name); '
             'the default device is used when omitted')),
    ('--num_threads', dict(
        type=int, default=1,
        help='Accepted for reference-CLI compatibility; TPU decoding '
             'ignores it')),
)


def parse_args():
    parser = ArgumentParser(
        description='Viterbi-decode time-varying categorical distributions')
    for flag, spec in _FLAGS:
        parser.add_argument(flag, **spec)
    return parser.parse_known_args()[0]


def main():
    torbi_tpu.from_files_to_files(**vars(parse_args()))


main()
