import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    """Parse command-line arguments"""
    parser = ArgumentParser(description='Preprocess datasets')
    parser.add_argument(
        '--datasets',
        default=torbi_tpu.DATASETS,
        nargs='+',
        help='The datasets to preprocess')
    parser.add_argument(
        '--gpu',
        type=int,
        help='The index of the gpu to use for penn inference')
    return parser.parse_args()


torbi_tpu.data.preprocess.datasets(**vars(parse_args()))
