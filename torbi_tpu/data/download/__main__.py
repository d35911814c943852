import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    """Parse command-line arguments"""
    parser = ArgumentParser(description='Download datasets')
    parser.add_argument(
        '--datasets',
        default=torbi_tpu.DATASETS,
        nargs='+',
        help='The datasets to download')
    return parser.parse_args()


torbi_tpu.data.download.datasets(**vars(parse_args()))
