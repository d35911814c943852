"""Multi-chip sharded decoding.

Scale-out design (replaces nothing in the reference -- it is single-device,
SURVEY.md section 2.4): the batch axis is sharded across a 1-D device mesh
with ``shard_map``; the transition matrix and initial distribution are
replicated. Each chip runs the same forward kernel + backtrace on its batch
shard; no collectives are needed in the decode itself (the workload is
embarrassingly batch-parallel), so scaling is limited only by host-side IO.
"""
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

import torbi_tpu
from ..ops import band as band_ops
from ..ops.pallas import viterbi_forward_pallas
from ..ops.scan import viterbi_backtrace, viterbi_forward
from . import mesh as mesh_lib

NEG_INF = float('-inf')


def _round_up(value, multiple):
    return ((value + multiple - 1) // multiple) * multiple


def decode_sharded(
        observation,
        batch_frames,
        transition,
        initial,
        mesh=None,
        backend=None):
    """Decode with the batch axis sharded over a device mesh.

    observation: (batch, frames, states) float32 log-probs
    batch_frames: (batch,) int32
    transition: (states, states) float32 log-probs
    initial: (states,) float32 log-probs
    mesh: 1-D jax Mesh with axis 'batch'; defaults to all local devices

    Returns (batch, frames) int32.
    """
    from ..ops import dispatch

    if mesh is None:
        mesh = mesh_lib.batch_mesh()
    n_shards = mesh.devices.size
    backend = dispatch.resolve_backend(backend)

    batch, frames, states = observation.shape
    frames_padded = dispatch.bucket_frames(frames)
    per_shard = _round_up(
        _round_up(batch, n_shards) // n_shards,
        torbi_tpu.BATCH_PAD_MULTIPLE)
    batch_padded = per_shard * n_shards
    states_padded = _round_up(states, 128)

    use_pallas = backend != 'xla'
    interpret = jax.default_backend() != 'tpu'

    band = None
    if use_pallas and torbi_tpu.USE_BAND_KERNEL:
        band = band_ops.gate_band(
            band_ops.detect_band(transition), initial, observation)

    if use_pallas:
        obs = jnp.pad(
            observation,
            ((0, batch_padded - batch),
             (0, frames_padded - frames),
             (0, states_padded - states)),
            constant_values=NEG_INF)
        trans = jnp.pad(
            transition,
            ((0, states_padded - states), (0, states_padded - states)),
            constant_values=NEG_INF)
        init = jnp.pad(
            initial, (0, states_padded - states), constant_values=NEG_INF)
    else:
        obs = jnp.pad(
            observation,
            ((0, batch_padded - batch), (0, frames_padded - frames), (0, 0)))
        trans = transition
        init = initial
    bf = jnp.pad(
        batch_frames.astype(jnp.int32),
        (0, batch_padded - batch),
        constant_values=1)

    def shard_fn(obs_shard, bf_shard, trans_rep, init_rep):
        if use_pallas:
            from ..ops.backtrace import backtrace_posteriors
            if band is not None:
                post_seq, posterior = band_ops.viterbi_forward_band(
                    obs_shard, bf_shard, trans_rep, init_rep, band,
                    interpret=interpret)
            else:
                post_seq, posterior = viterbi_forward_pallas(
                    obs_shard, bf_shard, trans_rep, init_rep,
                    interpret=interpret)
            return backtrace_posteriors(
                post_seq, trans_rep, posterior, bf_shard,
                interpret=interpret)
        trellis, posterior = viterbi_forward(
            obs_shard, bf_shard, trans_rep, init_rep)
        return viterbi_backtrace(trellis, bf_shard, posterior)

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P('batch'), P('batch'), P(), P()),
        out_specs=P('batch'),
        check_vma=False)

    # Place inputs on the mesh so XLA does not bounce through device 0
    obs = jax.device_put(obs, NamedSharding(mesh, P('batch')))
    bf = jax.device_put(bf, NamedSharding(mesh, P('batch')))
    trans = jax.device_put(trans, NamedSharding(mesh, P()))
    init = jax.device_put(init, NamedSharding(mesh, P()))

    indices = jax.jit(sharded)(obs, bf, trans, init)
    return indices[:batch, :frames]
