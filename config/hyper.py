"""Experiment: self-incrementing hyperparameter sweep over batch size,
chunk size, and entropy threshold (reference: config/hyper.py). Each run
advances a progress file so repeated invocations cover the grid; the
evaluation harness's skip-if-exists idempotency makes the sweep resumable.
"""
from pathlib import Path

MODULE = 'torbi_tpu'

# Sweep grid
BATCH_SIZES = [1, 64, 256, 512]
MIN_CHUNK_SIZES = [None, 64, 256]
ENTROPY_THRESHOLDS = [0.5]

_grid = [
    (batch, chunk, entropy)
    for batch in BATCH_SIZES
    for chunk in MIN_CHUNK_SIZES
    for entropy in ENTROPY_THRESHOLDS]

_progress_file = Path(__file__).parent / '.hyper_progress'
_index = (
    int(_progress_file.read_text()) if _progress_file.exists() else 0)
if _index >= len(_grid):
    _index = 0
_progress_file.write_text(str(_index + 1))

BATCH_SIZE, MIN_CHUNK_SIZE, ENTROPY_THRESHOLD = _grid[_index]

CONFIG = (
    f'hyper-batch{BATCH_SIZE}'
    f'-chunk{MIN_CHUNK_SIZE}'
    f'-entropy{ENTROPY_THRESHOLD}')
