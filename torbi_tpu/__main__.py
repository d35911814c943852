"""Command-line decode: maps directly onto ``from_files_to_files``.

The flag surface matches the reference CLI (torbi/__main__.py:16-49) so
scripts written against it keep working.
"""
from pathlib import Path

import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    parser = ArgumentParser(
        description='Viterbi-decode time-varying categorical distributions')
    parser.add_argument(
        '--input_files',
        type=Path,
        nargs='+',
        required=True,
        help='Observation files to decode (.pt or .npy, (frames, states))')
    parser.add_argument(
        '--output_files',
        type=Path,
        nargs='+',
        required=True,
        help='Destination files for the decoded index sequences')
    parser.add_argument(
        '--transition_file',
        type=Path,
        help='Transition matrix file in probability space (uniform if '
             'omitted)')
    parser.add_argument(
        '--initial_file',
        type=Path,
        help='Initial distribution file (uniform if omitted)')
    parser.add_argument(
        '--log_probs',
        action='store_true',
        help='Treat the observation files as natural-log probabilities')
    parser.add_argument(
        '--gpu',
        type=int,
        help='Accelerator device index (default device if omitted)')
    parser.add_argument(
        '--num_threads',
        type=int,
        default=1,
        help='Thread count for the CPU reference decoder')
    return parser.parse_known_args()[0]


torbi_tpu.from_files_to_files(**vars(parse_args()))
