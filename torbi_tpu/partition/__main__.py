"""CLI: sample evaluation partitions (flag contract in PARITY.md)."""
import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    parser = ArgumentParser(
        description='Sample per-dataset evaluation stem lists')
    parser.add_argument(
        '--datasets',
        default=torbi_tpu.DATASETS,
        nargs='+',
        help='Corpora to sample evaluation partitions from')
    return parser.parse_args()


torbi_tpu.partition.datasets(**vars(parse_args()))
