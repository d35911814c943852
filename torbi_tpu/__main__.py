from pathlib import Path

import torbi_tpu
from torbi_tpu.config import ArgumentParser


###############################################################################
# Entry point (reference: torbi/__main__.py)
###############################################################################


def parse_args():
    """Parse command-line arguments"""
    parser = ArgumentParser(
        description='Viterbi decoding of time-varying categorical '
                    'distributions')
    parser.add_argument(
        '--input_files',
        type=Path,
        nargs='+',
        required=True,
        help='Time-varying categorical distribution files')
    parser.add_argument(
        '--output_files',
        type=Path,
        nargs='+',
        required=True,
        help='Files to save decoded indices')
    parser.add_argument(
        '--transition_file',
        type=Path,
        help='Categorical transition matrix file; defaults to uniform')
    parser.add_argument(
        '--initial_file',
        type=Path,
        help='Categorical initial distribution file; defaults to uniform')
    parser.add_argument(
        '--log_probs',
        action='store_true',
        help='Whether inputs are in (natural) log space')
    parser.add_argument(
        '--gpu',
        type=int,
        help='Accelerator device index to use for decoding')
    parser.add_argument(
        '--num_threads',
        type=int,
        default=1,
        help='The number of threads for CPU reference decoding')
    return parser.parse_known_args()[0]


torbi_tpu.from_files_to_files(**vars(parse_args()))
