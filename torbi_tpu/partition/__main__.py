import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    """Parse command-line arguments"""
    parser = ArgumentParser(description='Partition datasets')
    parser.add_argument(
        '--datasets',
        default=torbi_tpu.DATASETS,
        nargs='+',
        help='The datasets to partition')
    return parser.parse_args()


torbi_tpu.partition.datasets(**vars(parse_args()))
