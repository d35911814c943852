"""Command-line decode: maps directly onto ``from_files_to_files``.

The FLAG NAMES match the reference CLI (torbi/__main__.py:16-49) -- that
compatibility contract is what lets scripts written against the reference
run unchanged -- but the implementation is a declarative flag table.
"""
from pathlib import Path

import torbi_tpu
from torbi_tpu.config import ArgumentParser

# (flag, argparse spec): the reference-compatible surface, one row per flag
_FLAGS = (
    ('--input_files', dict(
        type=Path, nargs='+', required=True,
        help='Observation files to decode (.pt or .npy, (frames, states))')),
    ('--output_files', dict(
        type=Path, nargs='+', required=True,
        help='Where each decoded index sequence is written (paired '
             'one-to-one with --input_files)')),
    ('--transition_file', dict(
        type=Path,
        help='Transition matrix file in probability space; omit for a '
             'uniform matrix')),
    ('--initial_file', dict(
        type=Path,
        help='Initial state distribution file; omit for uniform')),
    ('--log_probs', dict(
        action='store_true',
        help='Treat the observation files as natural-log probabilities')),
    ('--gpu', dict(
        type=int,
        help='Index into jax.devices() to decode on; omit for the '
             'default device')),
    ('--num_threads', dict(
        type=int, default=1,
        help='Accepted for reference-CLI compatibility; decoding on TPU '
             'ignores it')),
)


def parse_args():
    parser = ArgumentParser(
        description='Viterbi-decode time-varying categorical distributions')
    for flag, spec in _FLAGS:
        parser.add_argument(flag, **spec)
    return parser.parse_known_args()[0]


torbi_tpu.from_files_to_files(**vars(parse_args()))
