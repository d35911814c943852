"""CLI: infer pitch posteriorgrams for the downloaded corpora.

Flag names match the reference CLI contract (PARITY.md); the penn
inference pipeline lives in data/preprocess/core.py.
"""
import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    parser = ArgumentParser(
        description='Infer pitch posteriorgrams for evaluation corpora')
    parser.add_argument(
        '--datasets',
        default=torbi_tpu.DATASETS,
        nargs='+',
        help='Corpora to run penn inference over')
    parser.add_argument(
        '--gpu',
        type=int,
        help='Device index for penn inference (CPU if omitted)')
    return parser.parse_args()


torbi_tpu.data.preprocess.datasets(**vars(parse_args()))
