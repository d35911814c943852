"""Default configuration values.

The knob NAMES mirror the reference implementation's configuration surface
(/root/reference/torbi/config/defaults.py) so a user of the reference can
switch over without relearning them; the TPU-backend section is new.
Every constant here is promoted to a ``torbi_tpu.<NAME>`` attribute at
import and may be overridden by a ``--config`` composition file.
"""
from pathlib import Path


###############################################################################
# Metadata
###############################################################################


# Experiment name; routes evaluation output directories and results files
CONFIG = 'torbi_tpu'


###############################################################################
# Directories
###############################################################################


# Repository root (output artifacts live below it)
ROOT_DIR = Path(__file__).parent.parent.parent

# Package assets bundled with a pip release (partitions, cached stats)
ASSETS_DIR = Path(__file__).parent.parent / 'assets'

# Preprocessed posteriorgram cache
CACHE_DIR = ROOT_DIR / 'data' / 'cache'

# Raw downloaded datasets
DATA_DIR = ROOT_DIR / 'data' / 'datasets'

# Evaluation artifacts (decoded outputs, results JSON)
EVAL_DIR = ROOT_DIR / 'eval'


###############################################################################
# Decoding
###############################################################################


# Entropy chunking of long sequences: when set to a positive integer,
# sequences split at adjacent low-entropy frame pairs at least this many
# frames apart, and chunks decode as independent batch rows. None disables.
MIN_CHUNK_SIZE = None

# Normalized-entropy cutoff for choosing split points
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

# NOTE (negative results, scripts/kernel_lab.py): a speculative
# gated-tail band kernel -- full recursion over a narrow core of diagonal
# offsets, tail offsets executed per 128/384-lane unit only when an exact
# bound said they could matter -- was implemented and bit-exact, but
# always LOST on v5e: both the tail extraction (unaligned lane slices)
# and the sliding-max bounds are permute-port traffic. Roll-sharing
# across (shift mod 128) residue classes in the NATURAL layout (rolls or
# slice+concat rotations), intra-vreg-rotate sharing with lane-mask
# selects ('tilted'), and one-hot matmul shifts on the MXU also failed:
# the permute port charges ~0.77 vreg/cycle for ANY lane-crossing permute
# regardless of distance. What finally beat the rolled kernel is the
# 'stitched' mod-M layout below, which needs only ~width/M + 1 distinct
# lane-rotates per frame and pushes the rest onto free sublane renames
# and the ALUs (94.6 -> 36.1 ms raw kernel at the headline shape).

# Shard the batch axis over all local devices automatically whenever more
# than one device is visible and the batch is large enough to feed them
# (one BATCH_PAD_MULTIPLE group per chip minimum). Disable to pin decoding
# to a single device.
AUTO_SHARD = True

# Frames per band-kernel grid step (measured on v5e at the headline
# shape: 8 = 105.3 ms, 16 = 106.1 ms, 32 = 114.4 ms -- larger tiles cost
# VMEM pipelining granularity more than they save in per-step overhead)
BAND_FRAME_TILE = 8

# Band forward-kernel layout; all bitwise identical.
# 'stitched' (default): mod-M layout -- state s at (sublane (s mod M)*8 +
#   batch_row, lane s div M), M = S_padded/128 -- so a band shift sigma
#   needs a lane-rotate by only sigma div M: ~width/M + 1 DISTINCT
#   rotates for the whole band, shared across offsets, plus free sublane
#   renames and one masked add+max per stitched pair (ops/band.py::
#   mod_plan). Measured 36.1 ms vs 94.6 ms rolled for the raw kernel at
#   the headline shape (scripts/kernel_lab.py 'mod12', v5e) -- the
#   permute port stops being the binding resource.
# 'rolled': one full-width lane roll per diagonal offset (round-2 kernel).
# 'tilted': shared intra-vreg rotates + lane-mask selects (measured no
#   better than rolled: intra-vreg rotates cost the same as full rolls).
BAND_KERNEL_LAYOUT = 'stitched'

# Backtrace kernel flavor: True lowers the frame chase as a fori_loop
# (Mosaic program ~100x smaller -> compiles in seconds instead of many
# minutes, identical math); False keeps the fully unrolled variant.
# Applies to the natural-layout backtrace only -- the stitched path's
# mod-M backtrace is always the looped form (an unrolled variant was
# never worth the compile time there).
BACKTRACE_LOOP = True

# Batch-1 banded forward flavor: True routes single-sequence decodes
# (stitched layout, width > 0) through the 'spread' replicated-offsets
# kernel (ops/band.py::spread_plan) -- the 8 batch sublane slots that idle
# at batch 1 instead hold 8 band-offset-shifted posterior copies, cutting
# the stitched ALU bill ~5x (36 vs ~187 pairs at the pitch shape) for ~19
# extra lane rotates per frame (rebuild + slot all-reduce). Bitwise exact
# (tests/test_parity.py). Measured on v5e (scripts/batch1_ab.py, the
# production 10240-frame pitch config): 15.23 ms/call vs 22.13 ms with the
# stitched batch-8 kernel -- 1.45x, 672K vs 463K timesteps/s. The isolated
# kernels (scripts/kernel_lab.py --variants mod12,spread) agree on the
# direction (2.72 vs 3.33 ms at 512 frames).
BAND_BATCH1_SPREAD = True

# Batch-1 backtrace flavor: True chases over the band WINDOW of a
# natural-major relayout of the single real row's posterior stream
# (ops/backtrace.py::backtrace_posteriors_window) -- each serial chase
# step loads and reduces window_rows(width) x 128 elements (3 vregs at
# the pitch shape) instead of the full (8, S_padded) tile, cutting the
# step's dependency chain (the batch-1 bottleneck: the chase measured
# 9.0 ms of a 15.2 ms 10240-frame call). Bitwise exact
# (tests/test_parity.py); falls back to the full-width mod-M chase when
# the window does not fit the padded state rows.
#
# MEASURED SLOWER on v5e (scripts/batch1_ab.py, 10240-frame pitch):
# 16.87 ms vs 15.50 ms with spread on, 23.27 vs 21.99 with spread off.
# The serial chase is bound by per-step FIXED latency (scalar extract ->
# dynamic address -> VMEM load -> reduce chain), not reduction width --
# shrinking the reduction from 12 vregs to 3 saved less than the
# mod-M -> natural relayout transpose cost. Kept (default off) as a
# recorded negative result; revisit only with a transpose-free natural
# stream emission.
BACKTRACE_BATCH1_WINDOW = False

# Batch-1 backtrace flavor: True chases with the FUSED single-row kernel
# (ops/backtrace.py::backtrace_posteriors12_fused1) -- full width like
# the general mod-M chase (no relayout, same permuted transition), but
# the serial step keeps its index in SMEM (no scratch round trip),
# touches only the (1, S_padded) real row instead of the (8, S_padded)
# tile, and resolves argmax + lowest-natural-index ties with Mosaic's
# NATIVE two-tree form (jnp.max of the scores, then jnp.min over the
# tie indices): a hand-built single associative (value, index) pair
# tree measured ~220 ns/step SLOWER (scripts/chase_lab.py), so the two
# sequential native reductions are the deliberate shape. Attacks
# exactly the per-step fixed latency the windowed experiment showed was
# binding. Bitwise exact (tests/test_parity.py). Takes precedence over
# BACKTRACE_BATCH1_WINDOW.
#
# MEASURED on v5e (scripts/batch1_ab.py AB_CHASES=full,fused, 10240-frame
# pitch): 13.63 ms/call (751K ts/s) vs 15.16 ms (676K) with spread on;
# 21.5 vs 22.1 ms with spread off. The step shape follows
# scripts/chase_lab.py: native reductions beat a hand-built lane-rotate
# pair tree by ~220 ns/step; the win here is the SMEM index, the dropped
# scratch round trip, and 1-row instead of 8-row ALU work. Fully
# UNROLLING the 128-step chase loop measured neutral-to-worse
# (chase_lab --unroll 128: the bare load->extract floor regressed 479 ->
# 653 ns/step under the 128x program, the production-shaped step was
# unchanged; Mosaic supports no partial unroll) -- the serial chase is
# at its measured structural floor, do not retry loop unrolling here.
BACKTRACE_BATCH1_FUSED = True

# Batch-1 auto-chunking: a single long BANDED sequence (width > 0) decodes
# as parallel chunk rows split at adjacent low-entropy frame pairs -- the
# reference's own long-sequence policy (its chunk.py), applied
# automatically at decode time (ops/autochunk.py). The serial backtrace
# chase that binds batch-1 (~0.65 us/frame on v5e, scripts/chase_lab.py)
# then scales with the longest chunk instead of the whole sequence.
# Semantics are the reference's chunked mode: bitwise equal to the oracle
# run per-chunk, equal to the full-sequence oracle whenever the split
# frames are truly near-deterministic (what the ENTROPY_THRESHOLD gate
# selects for; exact on peaked pitch posteriorgrams, tests/
# test_autochunk.py). Diffuse observations yield no split candidates and
# fall back to the serial kernels; False pins them for every input.
#
# MEASURED on v5e (scripts/batch1_ab.py, 10240-frame pitch config):
# 5.74 ms/call (1.78M timesteps/s) vs 13.27-13.67 ms (~750-772K) for the
# best serial configuration (spread + fused chase), path bitwise equal to
# the serial kernels on the peaked input. The one-jit form matters: the
# same route as three dispatches (gather / decode / regather as separate
# jitted calls) measured 9.03 ms -- per-dispatch latency, not device time.
BATCH1_AUTO_CHUNK = True

# Single-sequence frame count below which auto-chunking is never
# considered (short sequences cannot amortize the entropy pass + plan)
BATCH1_AUTO_CHUNK_MIN_FRAMES = 4096

# Target frames per auto-chunk row. 1280 puts a 10,240-frame sequence in
# ONE 8-row backtrace tile of ~1280-frame chunks (padded to the 1536
# bucket): ~7x fewer serial chase steps than the unchunked decode
BATCH1_CHUNK_FRAMES = 1280

# Bucket sizes used to pad (frames) before jit to bound recompilation in the
# file workload. Frame counts are padded up to the next bucket boundary.
# (640 and 1536 catch sequences just over a power of two -- e.g. entropy
# chunks of MIN_CHUNK_SIZE + a few frames -- at ~20% padding instead of
# ~100%; all buckets satisfy the backtrace kernel's frames % 128 tiling)
FRAME_BUCKETS = (
    64, 128, 256, 512, 640, 1024, 1536, 2048, 4096, 8192, 10240, 16384)

# Pad the batch dimension up to the next multiple of this inside decode
BATCH_PAD_MULTIPLE = 8

# Split a decode batch into independent sub-calls when its estimated
# device footprint exceeds this: (obs_copies * states_in + states_padded)
# * 4 bytes per (row, frame) cell of the bucketed shape, where obs_copies
# is 2 on the stitched path with a natural-layout observation (the mod-M
# relayout materializes a full-size copy; packed inputs skip it). Real
# peak residency also includes the parent batch and slice copies during
# recursive splits, so the budget stays well under the 16 GB HBM.
DECODE_MEMORY_BUDGET = 4_500_000_000

# Temperature for the MXU-accelerated approximate decode (backend='lse');
# higher is closer to exact Viterbi (see ops/lse.py)
LSE_BETA = 8.0

# Route a single unchunked long sequence to the exact time-sharded decoder
# (parallel/timesharded.py) when it actually wins. Cost model: the
# max-plus-scan formulation does ~2*T/D*S^3 VPU work per chip versus T*S^2
# for the serial kernels, so sharding T over D local devices only pays when
# D > 2*S -- tiny state spaces on real meshes, never the 1440-state pitch
# workload (which instead relies on entropy chunking, MIN_CHUNK_SIZE).
# Decoded paths match the serial kernels whenever the optimal path is
# unique; exact ties may resolve differently (the same caveat as the
# reference's CPU-vs-CUDA tie divergence, SURVEY.md section 2.1), which is
# why the policy is gated on a genuine win instead of always-on.
# backend='timesharded' forces the route regardless of the cost model.
TIME_SHARDED_AUTO = True

# Minimum single-sequence frame count before the auto policy considers the
# time-sharded route (shorter sequences never amortize the all_gather)
TIME_SHARDED_MIN_FRAMES = 32768

# Use the native (C++) threaded .npy batch loader when applicable
USE_NATIVE_LOADER = True

# Native-loader batch segmentation over the length-sorted files: split at
# frame-bucket boundaries (rows pad only to their own bucket) when the
# segment has at least this many rows, then subdivide to power-of-two row
# counts (the dispatcher pads batch to the next power of two). None keeps
# one mixed-length batch per BATCH_SIZE. The tradeoff is padded
# slot-frames vs number of decode calls x fixed per-call dispatch cost.
# MEASURED (scripts/files_policy.py, 256-file 400-1600-frame corpus,
# async-pipelined decode, v5e via the axon tunnel,
# eval/files_policy_r5.out):
#   None: 2 calls, 524K slot-row-frames, 74.3 ms -> 3.47M timesteps/s
#   8:   11 calls, 331K slot-row-frames, 135.4 ms -> 1.90M
#   64:   6 calls, 348K slot-row-frames,  97.7 ms -> 2.64M
# Fitting wall = slots*c1 + calls*c2 gives c1 ~ 87 ns/slot-row-frame and
# c2 ~ 10 ms/call -- the tunnel's serialized per-call dispatch dominates,
# so None (fewest calls) wins HERE despite 1.6x more padded slots. On a
# production host (c2 ~ 0.1-0.3 ms) the same fit predicts the fine split
# wins ~1.5x (331K*c1 + 11*c2 ~ 31 ms vs 46 ms); set 8 there.
LOADER_SPLIT_MIN_ROWS = None


###############################################################################
# Evaluation
###############################################################################


# Score against the librosa reference decoder; when False, score chunked
# decoding against this framework's own unchunked output instead
COMPARE_WITH_REFERENCE = True

# Decode backend the evaluation harness runs ('pallas', 'xla', 'lse', or
# None for the configured default) -- lets approximate modes be scored on
# real corpora with the same machinery
EVAL_BACKEND = None

# Evaluation corpora
DATASETS = ['daps', 'vctk']

# Cap on randomly-sampled stems per dataset partition
EVALUATION_SAMPLES = 8192

# Raw-pitch-accuracy tolerance levels, in 5-cent pitch bins
PITCH_ERROR_THRESHOLDS = [0, 1, 2]

# On-disk cache of the band-diagonal pitch transition matrix
PITCH_TRANSITION_MATRIX = ASSETS_DIR / 'stats' / 'transition.pt'

# Audio sampling rate of the evaluation corpora
SAMPLE_RATE = 16000

# Seed shared by all random number generators
RANDOM_SEED = 1234


###############################################################################
# Compute
###############################################################################


# Sequences decoded per device batch
BATCH_SIZE = 512

# Parallel data-loading workers (threads, not processes); 0 loads inline.
# Measured for .pt corpora (96x512x1440 files, simulated 200 ms consumer):
# 0 -> 1.53 s (loads serialize with decode), 1 -> 1.33 s (full overlap),
# 2/4 -> 1.40 s (GIL contention in torch.load). One prefetch thread hides
# the smaller of load/decode wall; more only contend. The .npy fast path
# uses the native GIL-free loader and ignores this knob's thread count.
NUM_WORKERS = 1


###############################################################################
# Metadata
###############################################################################


# Sentinel letting composition files detect an in-progress configure
CONFIGURING = None
