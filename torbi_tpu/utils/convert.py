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


def to_jax(array, dtype=None):
    """Convert torch tensor / numpy / array-like to a jax array"""
    if array is None:
        return None
    if isinstance(array, jnp.ndarray) and not isinstance(array, np.ndarray):
        return array.astype(dtype) if dtype is not None else array
    array = to_numpy(array)
    return jnp.asarray(array, dtype=dtype)
