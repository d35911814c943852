"""Array conversion helpers: accept torch / numpy / jax inputs uniformly."""
import jax.numpy as jnp
import numpy as np


def to_numpy(array):
    """Convert torch tensor / jax array / array-like to numpy"""
    if array is None:
        return None
    # torch tensors expose .detach(); avoid importing torch unless present
    if hasattr(array, 'detach'):
        array = array.detach().cpu().numpy()
    return np.asarray(array)


def to_host_or_jax(array, dtype=None):
    """Jax arrays pass through; anything else becomes a HOST numpy array.

    The decode dispatcher's memory guard (ops/dispatch.py) slices oversized
    host batches before any device transfer, so API layers must not convert
    numpy/torch observations to device arrays eagerly.
    """
    if array is None:
        return None
    if isinstance(array, jnp.ndarray) and not isinstance(array, np.ndarray):
        return (
            array if dtype is None or array.dtype == dtype
            else array.astype(dtype))
    array = to_numpy(array)
    if dtype is not None and array.dtype != dtype:
        array = array.astype(dtype)
    return array


def to_jax(array, dtype=None):
    """Convert torch tensor / numpy / array-like to a jax array"""
    if array is None:
        return None
    if isinstance(array, jnp.ndarray) and not isinstance(array, np.ndarray):
        return array.astype(dtype) if dtype is not None else array
    array = to_numpy(array)
    return jnp.asarray(array, dtype=dtype)
