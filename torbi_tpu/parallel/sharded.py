"""Multi-chip sharded decoding.

Scale-out design (replaces nothing in the reference -- it is single-device,
SURVEY.md section 2.4): the batch axis is sharded across a 1-D device mesh
with ``shard_map``; the transition matrix and initial distribution are
replicated. Each chip runs the same forward kernel + backtrace on its batch
shard; no collectives are needed in the decode itself (the workload is
embarrassingly batch-parallel), so scaling is limited only by host-side IO.

Sharding is the DEFAULT dispatch behavior (ops/dispatch.py stages a cached
shard_map pipeline over all local devices whenever the batch can feed
them); this module keeps the explicit-mesh entry point for callers that
want to pin a specific device subset.
"""
from ..ops import dispatch
from . import mesh as mesh_lib


def decode_sharded(
        observation,
        batch_frames,
        transition,
        initial,
        mesh=None,
        backend=None,
        finite_observation=False):
    """Decode with the batch axis sharded over an explicit device mesh.

    observation: (batch, frames, states) float32 log-probs
    batch_frames: (batch,) int32
    transition: (states, states) float32 log-probs
    initial: (states,) float32 log-probs
    mesh: 1-D jax Mesh with axis 'batch'; defaults to all local devices

    Equivalent to ``ops.dispatch.decode(..., mesh=mesh)``: the staged
    shard_map pipeline is built once per (shape bucket, mesh) and cached,
    so repeated calls dispatch one compiled executable.

    Returns (batch, frames) int32.
    """
    if mesh is None:
        mesh = mesh_lib.batch_mesh()
    return dispatch.decode(
        observation,
        batch_frames,
        transition,
        initial,
        backend=backend,
        finite_observation=finite_observation,
        mesh=mesh)
