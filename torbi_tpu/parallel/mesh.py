"""Device mesh helpers for multi-chip / multi-host decoding."""
import jax
import numpy as np
from jax.sharding import Mesh


def batch_mesh(n_devices=None, devices=None):
    """1-D mesh over the batch axis.

    Viterbi decoding is embarrassingly parallel over sequences (the reference
    maps batch to the CUDA grid, viterbi.cu:230); the TPU-native equivalent is
    a 'batch' mesh axis with sequences sharded across chips and the
    transition/initial distributions replicated.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ('batch',))


def initialize_distributed():
    """Initialize jax.distributed for multi-host pods (no-op if single host
    or already initialized)"""
    try:
        if jax.process_count() > 1:
            return
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        # Single-process environment or already initialized
        pass
