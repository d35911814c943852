"""CLI: download evaluation corpora (same flags as the reference)."""
import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    parser = ArgumentParser(description='Download datasets')
    parser.add_argument(
        '--datasets',
        default=torbi_tpu.DATASETS,
        nargs='+',
        help='Corpora to fetch (daps, vctk)')
    return parser.parse_args()


torbi_tpu.data.download.datasets(**vars(parse_args()))
