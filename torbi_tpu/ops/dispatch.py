"""Backend dispatch for Viterbi decoding.

The reference dispatches between CPU/CUDA/MPS native kernels through the
torch library mechanism (/root/reference/torbi/csrc/ops.cpp:16-18). Here the
equivalent is a backend check: the Pallas TPU kernels on TPU, the pure-XLA
``lax.scan`` path elsewhere. Because XLA requires static shapes, inputs are
padded -- states to a lane multiple, frames to a configured bucket, batch to
a small multiple -- and results are sliced back. This bounds recompilation
for the variable-length file workload the way the reference's dynamic shapes
never had to.

The entire padded pipeline (pad -> forward kernel -> backtrace kernel ->
slice) is staged as ONE jitted computation per (shape bucket, band
signature), cached. Band detection and the gating finiteness checks are the
only host-synchronizing steps and are cached per input buffer, so the steady
state per decode call is a single compiled-function dispatch.

Multi-chip is the DEFAULT: when several local devices are visible and the
batch is large enough to feed them, the staged pipeline is wrapped in a
``shard_map`` over a 1-D 'batch' mesh (decoding is embarrassingly parallel
over sequences -- the reference maps batch to the CUDA grid,
/root/reference/torbi/csrc/cuda/viterbi.cu:230; the TPU-native equivalent is
batch sharding with the transition/initial replicated and no collectives).
The sharded build is cached per (shape bucket, mesh) exactly like the
single-device one, so ``from_dataloader``/``from_files_to_files`` use every
local chip with no per-call re-staging.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

import torbi_tpu
from . import band as band_ops
from .backtrace import backtrace_posteriors
from .pallas import viterbi_forward_pallas
from .scan import decode_xla

NEG_INF = float('-inf')

# Padded transition/initial and the compressed band matrix depend only on
# the (immutable) transition/initial arrays, so they are prepared ONCE per
# array identity and passed into the staged program as plain arguments --
# re-deriving the band matrix in-graph cost 2.75 ms of gather per
# batch-512 call
from ..utils.cache import identity_cached as _identity_cached  # noqa: E402

_trans_prep_cache = {}
_init_prep_cache = {}


def _use_fused_chase(band, single):
    """The batch-1 fused pair-tree backtrace
    (backtrace_posteriors12_fused1) applies when a single real sequence
    rides the stitched path: full-width like the general mod-M chase
    (same permuted-transition operand), but the serial step drops the
    scratch round trip, the 7 idle pad rows, and one of the two
    sequential reduction trees."""
    if not single or band is None or band[1] <= 0:
        return False
    if str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled')) != 'stitched':
        return False
    # getattr fallbacks mirror config/defaults.py (fused True, window
    # False) so a missing attribute can never silently flip the measured
    # production chase selection
    return bool(getattr(torbi_tpu, 'BACKTRACE_BATCH1_FUSED', True))


def _use_window_chase(band, states_p, single):
    """The batch-1 band-windowed backtrace (backtrace_posteriors_window)
    applies when a single real sequence rides the stitched path and the
    band window fits inside the padded state rows."""
    if not single or band is None or band[1] <= 0:
        return False
    if str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled')) != 'stitched':
        return False
    if not bool(getattr(torbi_tpu, 'BACKTRACE_BATCH1_WINDOW', False)):
        return False
    # The fused full-width chase takes precedence (it keeps the permuted
    # transition prep and measured faster than the windowed variant)
    if _use_fused_chase(band, single):
        return False
    from .backtrace import window_rows
    return window_rows(int(band[1])) <= states_p // 128


def _prepare_padded(transition, initial, states, states_p, band,
                    spread=False, window=False):
    layout = str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled'))

    def trans_compute():
        trans_p = jnp.pad(
            transition,
            ((0, states_p - states), (0, states_p - states)),
            constant_values=NEG_INF)
        band_matrix = (
            band_ops.build_band_matrix(trans_p, band[0], band[1])
            if band is not None else None)
        if band_matrix is not None and layout == 'tilted' and band[1] > 0:
            band_matrix = band_ops.build_band_matrix_tilted(
                band_matrix, states_p)
        elif (band_matrix is not None and layout == 'stitched'
                and band[1] > 0):
            if spread:
                # Batch-1 replicated-offsets kernel: its stitched
                # matrices cover 8 band offsets per pair
                band_matrix = band_ops.build_band_matrix_spread(
                    band_matrix, states_p, band[0], band[1])
            else:
                band_matrix = band_ops.build_band_matrix_stitched(
                    band_matrix, states_p, band[0], band[1])
            # The mod-M backtrace consumes the forward's M-major posterior
            # stream directly; the transition it adds per chase step needs
            # its COLUMNS in the assembled-lane order s' = r*128 + l
            # (natural M*l + r). Permute once per transition here. The
            # batch-1 windowed chase instead consumes the NATURAL layout
            # (it relayouts the single-row stream, not the transition).
            if not window:
                M = states_p // 128
                sprime = np.arange(states_p)
                nat = (sprime % 128) * M + sprime // 128
                trans_p = trans_p[:, jnp.asarray(nat.astype(np.int32))]
        return trans_p, band_matrix

    trans_p, band_matrix = _identity_cached(
        _trans_prep_cache, transition, trans_compute,
        extra_key=(states_p, band, layout, spread, window))

    def init_compute():
        return jnp.pad(
            initial, (0, states_p - states), constant_values=NEG_INF)

    init_p = _identity_cached(
        _init_prep_cache, initial, init_compute, extra_key=states_p)
    return trans_p, init_p, band_matrix


# Meshes interned by device-id key so the lru-cached builder can key on a
# hashable value while the builder body recovers the Mesh object
_mesh_registry = {}


def _intern_mesh(mesh):
    if mesh is None:
        return None
    key = tuple(int(d.id) for d in mesh.devices.flat)
    _mesh_registry[key] = mesh
    return key


@functools.lru_cache(maxsize=8)
def _auto_mesh_key(n_shards):
    from ..parallel import mesh as mesh_lib

    # LOCAL devices only: on a multi-host pod each process decodes its own
    # file shard with process-local arrays (parallel/files.py), so the
    # auto mesh must never span other hosts' chips -- jit with
    # in_shardings over non-addressable devices fails at dispatch. Pod
    # scale-out happens at the file-shard level, not here.
    devices = jax.local_devices()[:n_shards]
    return _intern_mesh(mesh_lib.batch_mesh(devices=devices))


def resolve_mesh(mesh, batch):
    """The decode mesh for a call: an explicit mesh wins; otherwise all
    local devices the batch can feed (one BATCH_PAD_MULTIPLE group per
    shard minimum), or None (single-device) when sharding cannot pay or
    AUTO_SHARD is off."""
    if mesh is not None:
        return _intern_mesh(mesh)
    if not getattr(torbi_tpu, 'AUTO_SHARD', True):
        return None
    n_devices = jax.local_device_count()
    if n_devices <= 1:
        return None
    n_shards = min(
        n_devices, max(1, batch // max(int(torbi_tpu.BATCH_PAD_MULTIPLE), 8)))
    if n_shards <= 1:
        return None
    return _auto_mesh_key(n_shards)


def _round_up(value, multiple):
    return ((value + multiple - 1) // multiple) * multiple


def bucket_frames(frames):
    """Pad a frame count up to the next configured bucket boundary"""
    for bucket in torbi_tpu.FRAME_BUCKETS:
        if frames <= bucket:
            return bucket
    # Beyond the largest bucket, round up to a multiple of it
    largest = torbi_tpu.FRAME_BUCKETS[-1]
    return _round_up(frames, largest)


def bucket_batch(batch):
    """Pad a batch size up to the next power of two (>= the pad multiple).

    Stray batch sizes -- e.g. the final partial batch of a file workload --
    would otherwise each stage and compile their own pipeline.
    """
    floor = max(int(torbi_tpu.BATCH_PAD_MULTIPLE), 8)
    bucket = floor
    while bucket < batch:
        bucket *= 2
    return bucket


def padded_states(states):
    """Host-side state padding target: the next 128 multiple when the
    relative waste is small, else the raw count.

    Observations whose minor dimension is not a lane multiple force a
    device-side relayout on every host-to-device transfer (an order of
    magnitude slower on some interconnects), so the data pipeline pads
    states with -inf at load time. Tiny state counts skip it -- padding
    7 states to 128 would multiply the batch bytes instead.
    """
    target = _round_up(states, 128)
    return target if target * 4 <= states * 5 else states


def resolve_backend(backend=None):
    """Resolve 'auto' to a concrete backend for the current platform"""
    backend = backend or torbi_tpu.BACKEND
    if backend == 'auto':
        return 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    return backend


def _config_key():
    """Config values the staged pipeline reads at trace time; part of the
    build cache key so config changes are not silently ignored"""
    return (
        tuple(torbi_tpu.FRAME_BUCKETS),
        torbi_tpu.BATCH_PAD_MULTIPLE,
        torbi_tpu.BACKTRACE_LOOP,
        float(torbi_tpu.LSE_BETA),
        int(getattr(torbi_tpu, 'BAND_FRAME_TILE', 8)),
        str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled')),
        bool(getattr(torbi_tpu, 'BACKTRACE_BATCH1_WINDOW', False)),
        bool(getattr(torbi_tpu, 'BACKTRACE_BATCH1_FUSED', True)),
        int(getattr(torbi_tpu, 'CONSTANT_SCAN_UNROLL', 8)),
    )


def pack_observation(observation):
    """Lane-padded natural observation -> the mod-M PACKED layout.

    (batch, frames, states_padded) -> (M, batch, frames, 128) with state
    s = M*l + r at (r, batch_row, frame, lane l), M = states_padded/128 --
    the layout ``decode`` consumes zero-copy on the stitched band path
    (see ``_build_band_forward_stitched``). ``states_padded`` must be a
    multiple of 128 (pad with -inf first, see ``padded_states``). Accepts
    numpy (returns contiguous numpy, e.g. to pack once before a
    host-to-device transfer) or jax arrays.
    """
    batch, frames, states_p = observation.shape
    if states_p % 128:
        raise ValueError(
            f'pack_observation needs a lane-padded observation (states a '
            f'multiple of 128), got {states_p}')
    arr = observation.reshape(batch, frames, 128, states_p // 128)
    if isinstance(arr, np.ndarray):
        return np.ascontiguousarray(arr.transpose(3, 0, 1, 2))
    return jnp.transpose(arr, (3, 0, 1, 2))


@functools.lru_cache(maxsize=2)
def _unpack_packed_fn():
    """(M, B, T, 128) mod-M observation -> (B, T, S_p) natural (cached
    jit; the fallback for packed inputs that cannot take the stitched
    fast path)"""
    def unpack(obs):
        arr = jnp.transpose(obs, (1, 2, 3, 0))
        return arr.reshape(
            obs.shape[1], obs.shape[2], obs.shape[0] * 128)
    return jax.jit(unpack)


@functools.lru_cache(maxsize=128)
def _build_decode(backend, batch_p, frames_p, states, states_in, band,
                  interpret, log_input, apply_epsilon, mesh_key, config_key,
                  packed=False, single=False, spread=False):
    """Stage the decode pipeline for one (bucketed batch, bucketed frames)
    shape as a single jitted function.

    Keyed on the BUCKETED shapes only: the raw-shape pads and the final
    slice live outside (cheap per-shape XLA ops), so a stray batch size --
    e.g. a file workload's final partial batch -- reuses the expensive
    kernel compilation of its bucket. The log conversion and epsilon
    stabilization fold into the same program: per-batch work is one
    host-to-device transfer, one executable dispatch, one result fetch.

    With a mesh (``mesh_key``), the same pipeline body runs inside a
    ``shard_map`` over the 'batch' axis, and the jit carries explicit input
    shardings so host arrays scatter straight to their shards (no bounce
    through device 0). The build is cached, so there is no per-call
    re-staging on the multi-chip path either.
    """
    del config_key  # only disambiguates the cache entry
    states_p = _round_up(states, 128)
    # A batch-1 decode pads to the 8-row kernel tile; declaring the padding
    # rows statically lets the serial backtrace chase skip their per-step
    # transition-row loads (the dominant chase cost). Gated to batch == 1
    # so shape buckets stay shared across stray batch sizes.
    real_batch = 1 if single else None

    # The banded kernel folds the probability->log conversion and epsilon
    # stabilization into its observation stream (in-register, free) -- the
    # other paths convert with one XLA pass first
    fold_obs = band is not None and backend != 'xla'

    def convert(obs):
        if not log_input:
            obs = jnp.log(obs)
        if apply_epsilon:
            # Reference stability epsilon (torbi/core.py:193-197)
            obs = jnp.log(
                jnp.exp(obs) + np.float32(np.finfo(np.float32).tiny))
        return obs

    if backend in ('xla', 'lse'):
        def pipeline(observation, batch_frames, transition, initial):
            obs = observation
            if states_in != states:
                obs = obs[..., :states]  # these paths want raw states
            obs = convert(obs)

            if backend == 'xla':
                # The scan path needs no state padding; it shares the
                # staged pad/bucket pipeline so CPU/GPU file workloads
                # compile once per shape bucket, not per raw shape
                return decode_xla(obs, batch_frames, transition, initial)

            # MXU smoothed-max mode: same staging (bucketed compiles,
            # multi-chip sharding, the memory guard)
            from .lse import decode_lse
            return decode_lse(
                obs, batch_frames, transition, initial,
                beta=torbi_tpu.LSE_BETA)
        n_args = 4
    elif band is not None and band[1] == 0 and band[2] is not None:
        # Constant transition (width-0 floor band, e.g. the uniform
        # default): the whole decode collapses to parallel XLA passes.
        # Forward: post[t][s] = fl(obs[t][s] + m_t) with the SCALAR
        # per-row carry m_t = fl(g_{t-1} + floor), g_t = max_s post[t][s];
        # because fp rounding is monotone, max_s fl(obs[s] + c) =
        # fl(max_s obs[s] + c), so g follows a trivial scalar recurrence
        # over per-frame observation maxima. Backtrace: every
        # destination's backpointer is the same first-argmax of
        # fl(post[t-1] + floor), so no chase exists either. Net: two
        # fused elementwise/reduce passes over the observation, one tiny
        # unrolled scan of length T, NO Pallas kernels and NO posterior
        # stream -- bitwise identical to the kernel path (every retained
        # fp add happens in the same order on the same values).
        floor_f = jnp.float32(band[2])

        def pipeline(observation, batch_frames, trans_p, init_p,
                     band_matrix):
            del band_matrix  # width-0: no in-band candidates
            from jax import lax

            obs = convert(observation)
            states_cur = obs.shape[2]
            init_row = init_p[:states_cur]
            bf = batch_frames.astype(jnp.int32)
            frames_n = obs.shape[1]

            post0 = obs[:, 0, :] + init_row[None, :]       # (B, S)
            g0 = jnp.max(post0, axis=1)                    # (B,)
            mo = jnp.max(obs, axis=2)                      # (B, T)

            def body(g, inputs):
                mo_t, t = inputs
                gm = g + floor_f                           # m_t (B,)
                g_new = mo_t + gm
                # Freeze past each row's last valid frame (the kernel's
                # valid = t < batch_frames)
                return jnp.where(t < bf, g_new, g), gm

            tgrid = jnp.arange(1, frames_n, dtype=jnp.int32)
            _, ms = lax.scan(
                body, g0, (jnp.transpose(mo[:, 1:]), tgrid),
                unroll=int(getattr(torbi_tpu, 'CONSTANT_SCAN_UNROLL', 8)))
            ms = jnp.transpose(ms)                         # (B, T-1)

            # Backpointers: first-argmax of fl(post + floor) per frame
            pred0 = jnp.argmax(post0 + floor_f, axis=1)
            pred_rest = jnp.argmax(
                (obs[:, 1:, :] + ms[:, :, None]) + floor_f, axis=2)
            pred = jnp.concatenate(
                [pred0[:, None], pred_rest], axis=1).astype(jnp.int32)

            # Seed: first-argmax of the posterior at each row's last
            # valid frame (viterbi.cpp:218-221)
            last = jnp.clip(bf - 1, 0, frames_n - 1)       # (B,)
            obs_last = jnp.take_along_axis(
                obs, last[:, None, None], axis=1)[:, 0, :]
            m_last = jnp.take_along_axis(
                jnp.pad(ms, ((0, 0), (1, 1))), last[:, None], axis=1)
            post_last = jnp.where(
                (last == 0)[:, None], post0, obs_last + m_last)
            seed = jnp.argmax(post_last, axis=1).astype(jnp.int32)

            t = jnp.arange(frames_n, dtype=jnp.int32)[None, :]
            # Positions bf-1 .. T-1 hold the seed (the reference's
            # broadcast-then-backtrace scheme, viterbi.cpp:218-225)
            return jnp.where(t >= bf[:, None] - 1, seed[:, None], pred)
        n_args = 5
    elif band is not None:
        # Stitched layout with a real band: the forward's M-major posterior
        # stream feeds the mod-M-aware backtrace directly (trans_p arrives
        # column-permuted from _prepare_padded) -- no relayout copy
        layout = str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled'))
        use12 = layout == 'stitched' and band[1] > 0
        # Batch-1: chase over the band window only (trans_p arrives in its
        # NATURAL layout from _prepare_padded in this case)
        window = (
            use12 and batch_p == band_ops.BATCH_TILE and mesh_key is None
            and _use_window_chase(band, states_p, single))
        fused = (
            use12 and batch_p == band_ops.BATCH_TILE and mesh_key is None
            and _use_fused_chase(band, single))

        def pipeline(observation, batch_frames, trans_p, init_p,
                     band_matrix):
            obs = observation if fold_obs else convert(observation)
            if use12:
                from .backtrace import (
                    backtrace_posteriors12, backtrace_posteriors12_fused1,
                    backtrace_posteriors_window)
                post12, posterior12 = band_ops.viterbi_forward_band(
                    obs, batch_frames, trans_p, init_p, band,
                    interpret=interpret,
                    log_input=(log_input or not fold_obs),
                    apply_epsilon=(apply_epsilon and fold_obs),
                    band_matrix=band_matrix, raw12=True, packed=packed,
                    spread=spread)
                if fused:
                    return backtrace_posteriors12_fused1(
                        post12, trans_p, posterior12, batch_frames,
                        interpret=interpret)
                if window:
                    return backtrace_posteriors_window(
                        post12, trans_p, posterior12, batch_frames,
                        band, interpret=interpret)
                return backtrace_posteriors12(
                    post12, trans_p, posterior12, batch_frames,
                    interpret=interpret, real_batch=real_batch)
            post_seq, posterior = band_ops.viterbi_forward_band(
                obs, batch_frames, trans_p, init_p, band,
                interpret=interpret,
                log_input=(log_input or not fold_obs),
                apply_epsilon=(apply_epsilon and fold_obs),
                band_matrix=band_matrix)
            return backtrace_posteriors(
                post_seq, trans_p, posterior, batch_frames,
                interpret=interpret, real_batch=real_batch)
        n_args = 5
    else:
        def pipeline(observation, batch_frames, trans_p, init_p):
            obs = convert(observation)
            post_seq, posterior = viterbi_forward_pallas(
                obs, batch_frames, trans_p, init_p, interpret=interpret)
            return backtrace_posteriors(
                post_seq, trans_p, posterior, batch_frames,
                interpret=interpret, real_batch=real_batch)
        n_args = 4

    if mesh_key is None:
        return jax.jit(pipeline)

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh_registry[mesh_key]
    obs_spec = P(None, 'batch') if packed else P('batch')
    specs = (obs_spec, P('batch')) + (P(),) * (n_args - 2)
    sharded = shard_map(
        pipeline,
        mesh=mesh,
        in_specs=specs,
        out_specs=P('batch'),
        check_vma=False)
    return jax.jit(
        sharded,
        in_shardings=tuple(
            NamedSharding(mesh, spec) for spec in specs))


def guard_rows(frames, states, states_in=None, packed=True, n_shards=1):
    """Batch rows per decode call that fit ``DECODE_MEMORY_BUDGET``.

    The same (obs + posterior stream) footprint estimate the decode memory
    guard uses, exposed so callers that stage inputs on the device
    themselves (e.g. bench.py's device-resident metric) can slice host
    batches into groups the guard will pass through unsplit. Returns a
    power of two >= 8 (a group IS its own batch bucket).
    """
    states_in = states_in if states_in is not None else states
    frames_est = bucket_frames(frames)
    states_est = _round_up(states, 128)
    obs_copies = 1 if packed else 2
    row_bytes = frames_est * (states_in * obs_copies + states_est) * 4
    fit = max(8, int(torbi_tpu.DECODE_MEMORY_BUDGET) * n_shards // row_bytes)
    rows = 8
    while rows * 2 <= fit:
        rows *= 2
    return rows


def _timesharded_mesh_size(frames, n_devices):
    """Largest local-device count that divides the sequence length"""
    for n in range(n_devices, 1, -1):
        if frames % n == 0:
            return n
    return 1


def _decode_timesharded(observation, batch_frames, transition, initial,
                        log_input, apply_epsilon):
    """Route one batch row through the exact time-sharded decoder
    (parallel/timesharded.py), honoring the staged pipeline's conversion
    and padded-frame semantics (frames beyond batch_frames keep the final
    decoded state, matching the reference's argmax-seed broadcast,
    /root/reference/torbi/csrc/viterbi.cpp:218-221)."""
    from ..parallel import mesh as mesh_lib
    from ..parallel.timesharded import decode_time_sharded

    states = int(transition.shape[0])
    frames = observation.shape[1]
    valid = int(jax.device_get(batch_frames[0]))
    obs = observation[0, :valid, :states]
    if not log_input:
        obs = jnp.log(obs)
    if apply_epsilon:
        obs = jnp.log(jnp.exp(obs) + np.float32(np.finfo(np.float32).tiny))

    n = _timesharded_mesh_size(valid, jax.local_device_count())
    decode_mesh = mesh_lib.batch_mesh(devices=jax.local_devices()[:n])
    decoded = decode_time_sharded(obs, transition, initial, decode_mesh)
    if valid < frames:
        decoded = jnp.concatenate([
            decoded,
            jnp.full((frames - valid,), decoded[valid - 1], jnp.int32)])
    return decoded[None]


def decode(observation, batch_frames, transition, initial, backend=None,
           finite_observation=False, log_input=True, apply_epsilon=False,
           mesh=None):
    """Decode log-space inputs. All arguments are jax arrays.

    observation: (batch, frames, states) float32 log-probs (probabilities
        when ``log_input=False``; the conversion then runs on device).
        May also arrive PACKED as (M, batch, frames, 128) in the stitched
        kernel's mod-M layout (state s = M*l + r at (r, batch_row, lane
        l), M = padded_states/128) -- the pipeline analog of
        lane-padding; requires ``finite_observation``/``apply_epsilon``
        and skips the per-call relayout copy on the stitched band path
    batch_frames: (batch,) int32
    transition: (states, states) float32 log-probs (row = destination)
    initial: (states,) float32 log-probs
    apply_epsilon: fold the reference's exp/+tiny/log stabilization into
        the staged device program (its output is always finite for finite
        or -inf inputs, so it implies ``finite_observation``)
    mesh: optional 1-D jax Mesh with axis 'batch'; by default all local
        devices are used automatically when the batch can feed them
        (disable with ``torbi_tpu.AUTO_SHARD = False``)

    Returns (batch, frames) int32 decoded state indices.

    Tie caveat: a single very long sequence over a tiny state space may
    auto-route to the time-sharded decoder (``TIME_SHARDED_AUTO``,
    config/defaults.py), whose paths match the serial kernels whenever
    the optimal path is unique but may resolve EXACT score ties
    differently (the same divergence class the reference exhibits
    between its CPU and CUDA backends). Set
    ``torbi_tpu.TIME_SHARDED_AUTO = False`` to pin the serial,
    oracle-bitwise kernels for every shape.
    """
    backend = resolve_backend(backend)
    # Packed (mod-M) observations: a 4D (M, batch, frames, 128) array in
    # the stitched kernel's layout (state s = M*l + r at (r-block, batch
    # row, lane l)) -- the pipeline analog of lane-padding, skipping the
    # relayout copy the natural layout pays per call. Falls back to an
    # unpack transform whenever the stitched band path does not apply.
    packed = observation.ndim == 4
    if packed:
        batch, frames = observation.shape[1], observation.shape[2]
        states_in = observation.shape[0] * observation.shape[3]
    else:
        batch, frames, states_in = observation.shape
    states = int(transition.shape[0])
    # The data pipeline may pre-pad the observation's state dimension to a
    # lane multiple with -inf (tile-aligned host-to-device transfers, see
    # padded_states); the kernels consume the padded lanes directly, other
    # backends slice them off
    if packed:
        if states_in != _round_up(states, 128):
            raise ValueError(
                f'packed observation implies {states_in} padded states '
                f'but the transition has {states}')
    elif states_in not in (states, _round_up(states, 128)):
        raise ValueError(
            f'observation has {states_in} states but the transition has '
            f'{states} (pre-padded observations must pad to the next '
            f'128 multiple with -inf)')
    if apply_epsilon:
        finite_observation = True
    if packed and not finite_observation:
        # The packed fast path requires an asserted-finite observation
        # (the finiteness scan cannot exclude the interleaved pad lanes);
        # unpack for the general gating/scan path. Host arrays unpack on
        # the host so the memory guard below still sees them pre-transfer.
        if isinstance(observation, np.ndarray):
            observation = np.ascontiguousarray(
                observation.transpose(1, 2, 3, 0)).reshape(
                    batch, frames, states_in)
        else:
            observation = _unpack_packed_fn()(observation)
        packed = False

    # Exact time-sharded route for single long sequences: forced by
    # backend='timesharded', or taken automatically when the cost model
    # says sharding the frame axis beats the serial kernels (see
    # config/defaults.py TIME_SHARDED_AUTO -- requires more local devices
    # than ~2x the state count, so it never fires at pitch-scale S)
    if backend == 'timesharded' or (
            backend in ('pallas', 'band')
            and getattr(torbi_tpu, 'TIME_SHARDED_AUTO', True)
            and mesh is None
            and batch == 1
            and frames >= int(
                getattr(torbi_tpu, 'TIME_SHARDED_MIN_FRAMES', 32768))
            and jax.local_device_count() > 2 * states):
        if batch != 1:
            raise ValueError(
                "backend='timesharded' decodes one sequence (batch 1), "
                f'got batch {batch}')
        if packed:
            observation = _unpack_packed_fn()(observation)
        return _decode_timesharded(
            observation, batch_frames, transition, initial,
            log_input, apply_epsilon)

    interpret = jax.default_backend() != 'tpu'

    # Banded fast path: bit-exact when the transition structure and
    # finiteness preconditions allow it (band.py docstring; detection and
    # the initial-distribution gate are cached per live jax array). The
    # finiteness precondition applies to the observation AS THE KERNEL SEES
    # IT -- after any on-device log conversion.
    band = None
    if backend in ('pallas', 'band') and torbi_tpu.USE_BAND_KERNEL:
        band = band_ops.gate_band(
            band_ops.detect_band(transition), initial,
            observation=None, finite_observation=True)
        if band is not None and not finite_observation:
            # Host arrays scan on the host: forcing the scan through jnp
            # would transfer the (possibly guard-oversized) observation
            xp = np if isinstance(observation, np.ndarray) else jnp
            finite = xp.isfinite(observation[..., :states])
            if not log_input:
                finite = finite & (observation[..., :states] > 0)
            if not bool(finite.all()):
                band = None

    # Batch-1 auto-chunking: a single long banded sequence converts into
    # parallel chunk rows at low-entropy split points (the reference's own
    # long-sequence answer, applied automatically) -- the serial backtrace
    # chase that binds batch-1 scales with the longest ROW, not the whole
    # sequence. Reference-chunked-mode semantics; BATCH1_AUTO_CHUNK=False
    # pins the serial full-sequence-exact kernels (config/defaults.py).
    if (batch == 1 and band is not None and band[1] > 0
            and backend in ('pallas', 'band') and mesh is None
            and frames >= int(getattr(
                torbi_tpu, 'BATCH1_AUTO_CHUNK_MIN_FRAMES', 4096))
            and bool(getattr(torbi_tpu, 'BATCH1_AUTO_CHUNK', True))):
        from . import autochunk
        chunked = autochunk.decode_chunked(
            observation, batch_frames, transition, initial,
            backend=backend, packed=packed, states=states, band=band,
            log_input=log_input, apply_epsilon=apply_epsilon)
        if chunked is not None:
            return chunked

    # Packed inputs can only ride the stitched band fast path; any other
    # route (dense kernel, width-0 floor, non-stitched layout, xla/lse
    # backends) consumes the natural layout
    stitched_path = (
        band is not None and band[1] > 0
        and backend in ('pallas', 'band')
        and str(getattr(
            torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled')) == 'stitched')
    if packed and not stitched_path:
        observation = _unpack_packed_fn()(observation)
        packed = False

    mesh_key = resolve_mesh(mesh, batch)
    n_shards = len(mesh_key) if mesh_key is not None else 1

    # Memory guard: the pipeline materializes the observation plus the
    # full posterior stream (~(S + S_padded) * 4 bytes per (row, frame)
    # cell, with ~2-3x XLA buffer slack on top). A 1M-frame entropy-chunked
    # file collates into a single ~1400-row batch of ~1024-frame chunks at
    # 1440 states -- ~19 GB, over v5e's 16 GB HBM -- so oversized batches
    # split into independent row groups (batch rows are independent;
    # bitwise identical results). Sharded calls spread the stream across
    # chips, so the guard is per shard.
    #
    # Host (numpy) observations -- the data-pipeline and file-workload case
    # -- slice BEFORE any transfer, so the device only ever holds ~two
    # groups (one decoding, one being fetched); a device-resident input
    # can only be serialized group by group, since the caller already
    # holds the whole observation in HBM.
    frames_est = bucket_frames(frames)
    states_est = _round_up(states, 128)
    # The stitched path with a NATURAL-layout observation materializes a
    # full-size mod-M relayout of it (packed inputs skip that copy); the
    # constant-transition (width-0) path materializes NO posterior stream
    # at all (its decode is fused parallel passes over the observation)
    obs_copies = 2 if (stitched_path and not packed) else 1
    constant_path = (
        band is not None and band[1] == 0 and band[2] is not None
        and backend in ('pallas', 'band'))
    row_bytes = (
        frames_est
        * (states_in * obs_copies + (0 if constant_path else states_est))
        * 4)
    budget = int(torbi_tpu.DECODE_MEMORY_BUDGET)
    if batch * row_bytes // n_shards > budget and batch > 8:
        # Rows per group: the largest power of two under the budget, so
        # every group IS its own batch bucket (bucket_batch would round a
        # stray group size up to the next power of two and allocate that)
        fit = max(8, budget * n_shards // row_bytes)
        rows = 8
        while rows * 2 <= fit:
            rows *= 2
        host_split = isinstance(observation, np.ndarray)
        outs, prev = [], None
        for start in range(0, batch, rows):
            stop = min(start + rows, batch)
            obs_g = (
                observation[:, start:stop] if packed
                else observation[start:stop])
            out = decode(
                obs_g, batch_frames[start:stop], transition, initial,
                backend=backend, finite_observation=finite_observation,
                log_input=log_input, apply_epsilon=apply_epsilon, mesh=mesh)
            if host_split:
                # Depth-1 pipeline: fetching the previous group (which
                # frees its device buffers) overlaps this group's
                # transfer + decode
                if prev is not None:
                    outs.append(np.asarray(prev))
                prev = out
            else:
                # Degraded-memory mode for device-resident inputs:
                # complete each group before dispatching the next (async
                # queuing would hold every group's intermediates at once
                # on top of the caller's full observation)
                outs.append(jax.block_until_ready(out))
        if host_split:
            outs.append(np.asarray(prev))
            return np.concatenate(outs, axis=0)
        return jnp.concatenate(outs, axis=0)
    # Each shard's slice is padded to its own bucket so all shards run the
    # same kernel shape (per-shard batch is a multiple of the pad multiple)
    batch_p = bucket_batch(-(-batch // n_shards)) * n_shards
    frames_p = bucket_frames(frames)
    single = (batch == 1 and batch_p > 1
              and backend not in ('xla', 'lse'))
    # Batch-1 spread kernel (band_ops.spread_plan): replicated-offsets
    # forward for the single-sequence case, measured-gated by config. It
    # reads only the real observation row, so the 8-row batch pad copy of
    # the largest input is skipped (batch_frames still pads: the emitted
    # replicated stream feeds the 8-row backtrace tile).
    spread = (single and stitched_path
              and batch_p == band_ops.BATCH_TILE
              and bool(getattr(torbi_tpu, 'BAND_BATCH1_SPREAD', False)))
    obs_batch_p = batch if spread else batch_p
    if obs_batch_p == batch and frames_p == frames:
        obs = observation  # a zero-width pad would still copy eagerly
    else:
        # Probability-space inputs pad with 0.0 so the (staged or
        # in-kernel) log maps padded entries to -inf (NEG_INF would log
        # to NaN)
        pad_value = NEG_INF if log_input else 0.0
        if packed:
            obs = jnp.pad(
                observation,
                ((0, 0), (0, obs_batch_p - batch),
                 (0, frames_p - frames), (0, 0)),
                constant_values=pad_value)
        else:
            obs = jnp.pad(
                observation,
                ((0, obs_batch_p - batch), (0, frames_p - frames), (0, 0)),
                constant_values=pad_value)
    if batch_p == batch:
        bf = batch_frames
    else:
        bf = jnp.pad(
            jnp.asarray(batch_frames).astype(jnp.int32),
            (0, batch_p - batch),
            constant_values=1)

    fn = _build_decode(
        backend, batch_p, frames_p, states, states_in, band, interpret,
        log_input, apply_epsilon, mesh_key, _config_key(), packed,
        single=single, spread=spread)
    if backend in ('xla', 'lse'):
        indices = fn(obs, bf, transition, initial)
    else:
        states_p = _round_up(states, 128)
        window = (
            batch_p == band_ops.BATCH_TILE and mesh_key is None
            and str(getattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'rolled'))
            == 'stitched'
            and _use_window_chase(band, states_p, single))
        trans_p, init_p, band_matrix = _prepare_padded(
            transition, initial, states, states_p, band, spread=spread,
            window=window)
        if band is not None:
            indices = fn(obs, bf, trans_p, init_p, band_matrix)
        else:
            indices = fn(obs, bf, trans_p, init_p)
    if batch_p == batch and frames_p == frames:
        return indices
    return indices[:batch, :frames]
