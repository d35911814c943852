"""Profiling: trace capture and device-time breakdown for the decode pipeline.

The reference only has wall-clock timing (torchutil.time wrapped around the
decode call, /root/reference/torbi/core.py:200). The TPU equivalent
(SURVEY.md section 5) is proper device-level accounting:

- ``capture``: run a callable under ``jax.profiler.trace`` and return the
  trace directory (viewable in TensorBoard / Perfetto).
- ``device_op_times``: parse the captured ``.trace.json.gz`` into aggregate
  per-op device durations -- the ground truth for where a decode call spends
  its time (kernels vs XLA glue copies).
- ``time_stages``: a trace-free fallback that measures the pipeline stage by
  stage with chained-dependency timing loops. Standalone ``pallas_call``
  timing via ``block_until_ready`` is unreliable on remote-tunneled
  platforms (it can return before the device finishes), so each timed region
  is iterated K times inside ONE jitted program with a scalar dependency
  chain forcing sequential execution, and the result is fetched to the host.
- ``speed_of_light``: compare measured kernel time against a VPU issue-rate
  model for the banded recursion.
"""
import contextlib
import glob
import gzip
import json
import os
import time

import numpy as np


###############################################################################
# Trace capture
###############################################################################


@contextlib.contextmanager
def trace(trace_dir):
    """Context manager capturing a jax.profiler trace into ``trace_dir``"""
    import jax

    jax.profiler.start_trace(str(trace_dir))
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()


def capture(fn, trace_dir):
    """Run ``fn()`` under the profiler; returns (result, trace_dir)"""
    with trace(trace_dir):
        result = fn()
    return result, trace_dir


###############################################################################
# Trace parsing
###############################################################################


def _find_trace_files(trace_dir):
    return sorted(glob.glob(
        os.path.join(str(trace_dir), '**', '*.trace.json.gz'),
        recursive=True))


def device_op_times(trace_dir, top=None):
    """Aggregate per-op device time from a captured trace.

    Returns a list of dicts ``{name, total_ms, count}`` sorted by total
    duration (device tracks only -- process names containing 'TPU' or
    'device'), or an empty list when the platform produced no device trace
    (fall back to ``time_stages``).
    """
    files = _find_trace_files(trace_dir)
    if not files:
        return []
    events = []
    device_pids = set()
    for path in files:
        with gzip.open(path, 'rt') as f:
            data = json.load(f)
        for event in data.get('traceEvents', []):
            phase = event.get('ph')
            if phase == 'M' and event.get('name') == 'process_name':
                name = event.get('args', {}).get('name', '')
                if 'TPU' in name or 'device' in name.lower():
                    device_pids.add(event.get('pid'))
            elif phase == 'X':
                events.append(event)
    totals = {}
    for event in events:
        if event.get('pid') not in device_pids:
            continue
        name = event.get('name', '?')
        dur_us = float(event.get('dur', 0.0))
        total, count = totals.get(name, (0.0, 0))
        totals[name] = (total + dur_us, count + 1)
    rows = [
        {'name': name, 'total_ms': total / 1000.0, 'count': count}
        for name, (total, count) in totals.items()]
    rows.sort(key=lambda r: -r['total_ms'])
    return rows[:top] if top else rows


###############################################################################
# Trace-free stage timing
###############################################################################


def time_chained(build_step, iters=8, warmup=True):
    """Time one jitted program running ``iters`` dependency-chained steps.

    ``build_step(carry)`` must return a new scalar carry whose value depends
    on the timed computation (forcing the device to actually execute every
    iteration before the final fetch). Returns seconds per step.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(carry0):
        def body(_, carry):
            return build_step(carry)
        return lax.fori_loop(0, iters, body, carry0)

    carry0 = jnp.zeros((), jnp.float32)
    if warmup:
        float(run(carry0))  # compile + first-fetch handshake
    start = time.perf_counter()
    float(run(carry0))  # fetch forces completion
    elapsed = time.perf_counter() - start
    return elapsed / iters


def _log(message):
    import sys

    print(f'[profile] {message}', file=sys.stderr, flush=True)


def time_submissions(fn, fetch_scalar, iters=8):
    """Steady-state seconds per call for an already-compiled program.

    Submits ``iters`` back-to-back executions (the device runs submitted
    programs in order, so they serialize on the accelerator while host
    dispatch overlaps) and forces completion by fetching one scalar from the
    last result via ``fetch_scalar(result) -> jax scalar``. One device_get
    per measurement -- no per-iteration sync, no new program compiles.
    """
    _log('warmup dispatch (may compile)...')
    result = fn()
    _log('warmup fetch...')
    float(np.asarray(fetch_scalar(result)))  # warmup + handshake
    _log(f'timing {iters} queued submissions...')
    start = time.perf_counter()
    result = None
    for _ in range(iters):
        result = fn()
    float(np.asarray(fetch_scalar(result)))
    elapsed = time.perf_counter() - start
    _log(f'done: {elapsed / iters * 1e3:.2f} ms/call')
    return elapsed / iters


def time_stages(observation, batch_frames, transition, initial, iters=8,
                pipeline_observation=None):
    """Measure forward kernel, backtrace kernel, staged pipeline, and
    end-to-end wall time for one decode workload.

    Inputs are the UNPADDED arrays exactly as ``dispatch.decode`` receives
    them. Returns a dict of milliseconds:

    - forward_ms / backtrace_ms: steady-state device time per call
      (queued submissions; host dispatch overlapped)
    - pipeline_ms: the full staged jit (pad + kernels + slice)
    - e2e_ms: one dispatch.decode call with block_until_ready (includes
      host dispatch + result sync)
    - glue_ms: pipeline - forward - backtrace (XLA copies and conversions)
    - host_ms: e2e - pipeline (dispatch/tunnel overhead)

    ``pipeline_observation`` optionally substitutes a different (e.g.
    mod-M packed) observation for the staged-pipeline and e2e stages, so
    they measure the production input convention while the standalone
    kernel stages keep the natural layout.
    """
    import jax
    import jax.numpy as jnp

    from ..ops import band as band_ops
    from ..ops import dispatch
    from ..ops.backtrace import backtrace_posteriors
    from ..ops.pallas import viterbi_forward_pallas

    batch, frames, _ = observation.shape
    # The observation may be lane-padded; the transition holds the true
    # state count
    states = int(transition.shape[0])
    states_p = ((states + 127) // 128) * 128
    interpret = jax.default_backend() != 'tpu'

    trans_p = jnp.pad(
        transition,
        ((0, states_p - states), (0, states_p - states)),
        constant_values=float('-inf'))
    init_p = jnp.pad(
        initial, (0, states_p - states), constant_values=float('-inf'))
    bf = jnp.asarray(batch_frames).astype(jnp.int32)

    # The pipeline/e2e stages measure dispatch.decode on the RAW inputs
    # (dispatch does its own padding and batch-1 specialization); the
    # standalone kernel stages call the kernels directly, so they need the
    # dispatch-layer shape contract themselves: batch padded to the 8-row
    # tile, frames to a bucket (e.g. profiling the batch-1 config)
    observation_raw, pipeline_observation_raw, bf_raw = (
        observation, pipeline_observation, bf)
    batch_k = ((batch + 7) // 8) * 8
    frames_k = dispatch.bucket_frames(frames)
    if batch_k != batch or frames_k != frames:
        observation = jnp.pad(
            observation,
            ((0, batch_k - batch), (0, frames_k - frames), (0, 0)),
            constant_values=float('-inf'))
        if pipeline_observation is not None and (
                pipeline_observation.ndim == 4):
            pipeline_observation = jnp.pad(
                pipeline_observation,
                ((0, 0), (0, batch_k - batch), (0, frames_k - frames),
                 (0, 0)),
                constant_values=float('-inf'))
        bf = jnp.pad(bf, (0, batch_k - batch), constant_values=1)

    band = band_ops.gate_band(
        band_ops.detect_band(transition), initial,
        observation=None, finite_observation=True)

    # Pre-build the band matrix exactly as the production dispatcher does
    # (the in-graph build costs tens of ms of gather per call and would
    # pollute the standalone forward stage)
    band_matrix = None
    if band is not None:
        band_matrix = band_ops.build_band_matrix(trans_p, band[0], band[1])
        import torbi_tpu
        layout = str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled'))
        if layout == 'stitched' and band[1] > 0:
            band_matrix = band_ops.build_band_matrix_stitched(
                band_matrix, states_p, band[0], band[1])
        elif layout == 'tilted' and band[1] > 0:
            band_matrix = band_ops.build_band_matrix_tilted(
                band_matrix, states_p)
        band_matrix = jax.block_until_ready(band_matrix)

    # Production stitched path: when the caller supplies a PACKED
    # pipeline observation and the stitched band kernel applies, the
    # standalone stages measure exactly what the staged pipeline runs --
    # packed forward emitting the raw M-major stream, and the mod-M
    # backtrace consuming it with the column-permuted transition
    # (ops/dispatch._prepare_padded)
    import torbi_tpu
    layout = str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled'))
    packed12 = (
        band is not None and band[1] > 0 and layout == 'stitched'
        and pipeline_observation is not None
        and pipeline_observation.ndim == 4)
    if packed12:
        from ..ops.backtrace import backtrace_posteriors12
        from ..ops.dispatch import _prepare_padded

        trans_perm, _, _ = _prepare_padded(
            transition, initial, states, states_p, band)

        def forward(obs=pipeline_observation):
            return band_ops.viterbi_forward_band(
                obs, bf, trans_p, init_p, band, interpret=interpret,
                band_matrix=band_matrix, raw12=True, packed=True)

        fetch = lambda r: r[1][0, 0, 0]  # noqa: E731 - posterior12 scalar
    else:
        def forward(obs=observation):
            if band is not None:
                return band_ops.viterbi_forward_band(
                    obs, bf, trans_p, init_p, band, interpret=interpret,
                    band_matrix=band_matrix)
            return viterbi_forward_pallas(
                obs, bf, trans_p, init_p, interpret=interpret)

        fetch = lambda r: r[1][0, 0]  # noqa: E731

    _log('stage: forward kernel')
    forward_ms = time_submissions(forward, fetch, iters) * 1e3

    # Backtrace over a fixed forward result
    _log('stage: backtrace kernel')
    post_seq, posterior = jax.block_until_ready(forward())

    if packed12:
        def backtrace():
            return backtrace_posteriors12(
                post_seq, trans_perm, posterior, bf, interpret=interpret)
    else:
        def backtrace():
            return backtrace_posteriors(
                post_seq, trans_p, posterior, bf, interpret=interpret)

    backtrace_ms = time_submissions(
        backtrace, lambda r: r[0, 0], iters) * 1e3

    _log('stage: staged pipeline')

    # Full staged pipeline (what dispatch.decode dispatches per batch) --
    # RAW inputs: dispatch pads and specializes (e.g. batch-1) itself
    pipe_obs = (
        observation_raw if pipeline_observation_raw is None
        else pipeline_observation_raw)

    def pipeline():
        return dispatch.decode(
            pipe_obs, bf_raw, transition, initial, finite_observation=True)

    pipeline_ms = time_submissions(
        pipeline, lambda r: r[0, 0], iters) * 1e3

    # End-to-end single call (host dispatch + sync included)
    def e2e():
        return jax.block_until_ready(pipeline())

    e2e()
    start = time.perf_counter()
    e2e()
    e2e_ms = (time.perf_counter() - start) * 1e3

    return {
        'forward_ms': forward_ms,
        'backtrace_ms': backtrace_ms,
        'pipeline_ms': pipeline_ms,
        'e2e_ms': e2e_ms,
        'glue_ms': pipeline_ms - forward_ms - backtrace_ms,
        'host_ms': e2e_ms - pipeline_ms,
        'band': band,
    }


###############################################################################
# Speed-of-light model
###############################################################################

# v5e TensorCore: 8x128-lane VPU, 4 ALU issue slots, ~940 MHz
V5E_VPU_LANES = 8 * 128
V5E_VPU_ISSUE = 4
V5E_CLOCK_HZ = 940e6
V5E_HBM_GBPS = 819.0


def speed_of_light(batch, frames, states_padded, band, measured_forward_ms,
                   ops_per_candidate=3, layout=None):
    """Port-level speed-of-light model for the banded forward kernel.

    Measured on v5e (scripts/kernel_lab.py): the permute port retires ~1
    vreg/cycle for ANY lane-crossing permute (full-width roll or
    intra-vreg rotate alike) while the ALUs retire ~4 vreg-ops/cycle and
    sublane renames are free. Per layout:

    - 'rolled': W full-width lane-rolls per frame bind the permute port.
    - 'stitched' (mod-M layout): only ~W/M + 1 distinct lane-rotates per
      frame; the ALUs bind at ~(W + M) masked add+max pairs.

    The binding ideal is max(permute, ALU, HBM); utilization is against it.
    """
    import torbi_tpu

    if layout is None:
        layout = str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled'))
    width = band[1] if band else states_padded
    vregs = states_padded // 128
    candidate_lanes = batch * frames * width * states_padded
    if band and layout == 'stitched' and width > 0:
        from ..ops.band import mod_plan
        keys, _ = mod_plan(states_padded, band[0], width)
        n_rotates = len({alpha for alpha, _ in keys})
        permute_cycles = batch / 8 * frames * n_rotates * vregs
        alu_cycles = (
            batch / 8 * frames * len(keys) * 2 * vregs / V5E_VPU_ISSUE)
    else:
        # Permute port: one roll per offset, `vregs` cycles each, 1/cycle.
        # The DENSE kernel shifts nothing (ref-sliced source tiles), so its
        # permute term is zero and the ALUs bind (measured: 88% of the
        # 4-issue ALU ideal at 512x512x1280).
        permute_cycles = (
            batch / 8 * frames * width * vregs if band else 0.0)
        alu_cycles = (
            batch / 8 * frames * width * 2 * vregs / V5E_VPU_ISSUE)
    permute_ms = permute_cycles / V5E_CLOCK_HZ * 1e3
    alu_ms = alu_cycles / V5E_CLOCK_HZ * 1e3
    hbm_bytes = batch * frames * states_padded * 4 * 2  # obs in + post out
    hbm_ms = hbm_bytes / (V5E_HBM_GBPS * 1e9) * 1e3
    binding_ms = max(permute_ms, alu_ms, hbm_ms)
    return {
        'candidate_lanes': candidate_lanes,
        'permute_ideal_ms': permute_ms,
        'alu_ideal_ms': alu_ms,
        'hbm_ideal_ms': hbm_ms,
        'binding_ideal_ms': binding_ms,
        'utilization': (
            binding_ms / measured_forward_ms if measured_forward_ms else 0.0),
        # Back-compat aliases (older callers/tests)
        'vpu_ideal_ms': binding_ms,
        'vpu_utilization': (
            binding_ms / measured_forward_ms if measured_forward_ms else 0.0),
    }
