"""CLI: run the accuracy/speed harness over the evaluation corpora.

Flag names match the reference CLI contract (PARITY.md); the harness
itself lives in evaluate/core.py.
"""
import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    parser = ArgumentParser(
        description='Score decoding accuracy and speed over pitch corpora')
    parser.add_argument(
        '--datasets',
        nargs='+',
        default=torbi_tpu.DATASETS,
        help='Corpora to score (subset of the configured DATASETS)')
    parser.add_argument(
        '--gpu',
        type=int,
        help='Accelerator device index (default device if omitted)')
    parser.add_argument(
        '--num_threads',
        type=int,
        default=1,
        help='Worker count for the CPU librosa ground-truth decoder')
    return parser.parse_args()


torbi_tpu.evaluate.datasets(**vars(parse_args()))
