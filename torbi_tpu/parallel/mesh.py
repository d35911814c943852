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
    """Initialize jax.distributed for multi-host pods.

    Must run before any other JAX call: querying the backend (even
    jax.process_count()) initializes single-process mode and makes a later
    distributed initialization impossible. Safe to call twice and in
    single-host environments (where auto-detection finds no coordinator).
    """
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as error:
        # Already initialized is fine (guard above covers current JAX, the
        # message check covers versions without is_initialized); anything
        # else (e.g. called after the backend came up on a pod) must
        # surface, or every host would silently fall back to decoding the
        # full workload
        message = str(error).lower()
        if 'already' not in message and 'only be called once' not in message:
            raise
    except ValueError:
        # No cluster environment detected: single-host run
        pass
