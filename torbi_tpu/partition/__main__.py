"""CLI: build evaluation partitions (same flags as the reference)."""
import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Partition datasets')
    parser.add_argument(
        '--datasets',
        default=torbi_tpu.DATASETS,
        nargs='+',
        help='Corpora to sample evaluation partitions from')
    return parser.parse_args()


torbi_tpu.partition.datasets(**vars(parse_args()))
