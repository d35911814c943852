import torbi_tpu
from torbi_tpu.config import ArgumentParser


def parse_args():
    """Parse command-line arguments"""
    parser = ArgumentParser(description='Perform evaluation')
    parser.add_argument(
        '--datasets',
        nargs='+',
        default=torbi_tpu.DATASETS,
        help='The datasets to evaluate')
    parser.add_argument(
        '--gpu',
        type=int,
        help='The index of the accelerator device to use for evaluation')
    parser.add_argument(
        '--num_threads',
        type=int,
        default=1,
        help='The number of threads for the CPU reference decoder')
    return parser.parse_args()


torbi_tpu.evaluate.datasets(**vars(parse_args()))
