"""Default configuration values.

Mirrors the configuration surface of the reference implementation
(/root/reference/torbi/config/defaults.py) so that a user of the reference
can switch over without relearning knobs, plus TPU-specific settings.
"""
from pathlib import Path


###############################################################################
# Metadata
###############################################################################


# Configuration name (names the experiment; routes eval output dirs)
CONFIG = 'torbi_tpu'


###############################################################################
# Directories
###############################################################################


# Root location for saving outputs
ROOT_DIR = Path(__file__).parent.parent.parent

# Location to save assets to be bundled with pip release
ASSETS_DIR = Path(__file__).parent.parent / 'assets'

# Location of preprocessed features
CACHE_DIR = ROOT_DIR / 'data' / 'cache'

# Location of datasets on disk
DATA_DIR = ROOT_DIR / 'data' / 'datasets'

# Location to save evaluation artifacts
EVAL_DIR = ROOT_DIR / 'eval'


###############################################################################
# Decoding
###############################################################################


# When set to a positive integer, enables chunking for long sequences by
# splitting sequences at low-entropy frames
# (reference: torbi/config/defaults.py:41)
MIN_CHUNK_SIZE = None

# Threshold below which to split the sequence when performing chunked decoding
ENTROPY_THRESHOLD = 0.5


###############################################################################
# TPU backend
###############################################################################


# Which decode implementation to use: 'auto' selects the Pallas TPU kernel on
# TPU and the pure-XLA lax.scan path elsewhere. 'xla' forces the scan path;
# 'pallas' forces the kernel (uses interpreter mode off-TPU).
BACKEND = 'auto'

# Automatically use the banded fast-path kernel when the transition matrix is
# detected to be band-limited (log-probabilities -inf outside a diagonal band)
USE_BAND_KERNEL = True

# Maximum bandwidth (as a fraction of the number of states) for which the
# banded kernel is preferred over the dense kernel
BAND_MAX_FRACTION = 0.5

# Speculative gated-tail band kernel: run the full in-band recursion only
# over BAND_CORE_WIDTH central diagonal offsets, and execute the tail
# offsets per 384-lane unit only when an exact upper bound says they could
# matter (value-exact; see ops/band.py). Off by default: although ~80% of
# unit-sides skip on peaked data, Mosaic lowers the dynamic-shift rotate in
# the tail loop far too slowly on v5e for the skipping to pay off
# (measured ~5x slower than the unconditional kernel at width 175).
BAND_TAIL_GATING = False
BAND_CORE_WIDTH = 63

# Bucket sizes used to pad (frames) before jit to bound recompilation in the
# file workload. Frame counts are padded up to the next bucket boundary.
FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384)

# Pad the batch dimension up to the next multiple of this inside decode
BATCH_PAD_MULTIPLE = 8

# Temperature for the MXU-accelerated approximate decode (backend='lse');
# higher is closer to exact Viterbi (see ops/lse.py)
LSE_BETA = 8.0

# Use the native (C++) threaded .npy batch loader when applicable
USE_NATIVE_LOADER = True


###############################################################################
# Evaluation
###############################################################################


# Otherwise compare against self with no chunking
COMPARE_WITH_REFERENCE = True

# Names of all datasets
DATASETS = ['daps', 'vctk']

# Number of randomly-selected samples to evaluate
EVALUATION_SAMPLES = 8192

# Thresholds (in number of 5 cent bins) for raw pitch accuracy evaluation
PITCH_ERROR_THRESHOLDS = [0, 1, 2]

# File for caching transition matrix for pitch decoding evaluation
PITCH_TRANSITION_MATRIX = ASSETS_DIR / 'stats' / 'transition.pt'

# Audio sampling rate
SAMPLE_RATE = 16000

# Seed for all random number generators
RANDOM_SEED = 1234


###############################################################################
# Compute
###############################################################################


# Batch size
BATCH_SIZE = 512

# Number of parallel CPU workers for data loading (threads, not processes)
NUM_WORKERS = 0


###############################################################################
# Metadata
###############################################################################


# Allows config files to detect if this module is being configured
CONFIGURING = None
