"""ctypes bindings for the native batch loader (csrc/loader.cpp)."""
import ctypes
import threading

import numpy as np

from ..csrc.build import library_path

_lib = None
_lib_lock = threading.Lock()


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = library_path()
        if path is None:
            _lib = False
            return _lib
        lib = ctypes.CDLL(str(path))
        lib.probe_npy.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.probe_npy.restype = ctypes.c_int
        lib.load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.c_int,
        ]
        lib.load_batch.restype = ctypes.c_int
        if hasattr(lib, 'load_batch_packed'):
            lib.load_batch_packed.argtypes = lib.load_batch.argtypes
            lib.load_batch_packed.restype = ctypes.c_int
        _lib = lib
        return _lib


def available():
    return _load_library() is not False


def probe(path):
    """Return (frames, states) of a .npy observation file, or None"""
    lib = _load_library()
    if lib is False:
        return None
    frames = ctypes.c_int64()
    states = ctypes.c_int64()
    status = lib.probe_npy(
        str(path).encode(), ctypes.byref(frames), ctypes.byref(states))
    if status != 0:
        return None
    return frames.value, states.value


def load_batch(paths, max_frames, states, num_threads=8,
               padded_states=None, pad_value=float('-inf'), pack=False):
    """Load .npy files into a padded (n, max_frames, padded_states) batch.

    Each frame's lane tail [states, padded_states) is filled with
    pad_value (tile-aligned host-to-device transfers); padded frames
    beyond each file's length are zero. Returns (observation float32
    array, batch_frames int32 array), or None when the native path cannot
    handle the inputs (caller falls back).

    With ``pack=True`` (requires a 128-multiple padded_states) the batch
    is written directly in the stitched band kernel's mod-M PACKED layout
    (M, n, max_frames, 128) -- bitwise ``ops.dispatch.pack_observation``
    of the natural batch, assembled in the loader threads.
    """
    lib = _load_library()
    if lib is False:
        return None
    if padded_states is None:
        padded_states = states
    if pack and (padded_states % 128 != 0
                 or not hasattr(lib, 'load_batch_packed')):
        return None
    n = len(paths)
    shape = (
        (padded_states // 128, n, max_frames, 128) if pack
        else (n, max_frames, padded_states))
    observation = np.empty(shape, dtype=np.float32)
    frames = np.empty((n,), dtype=np.int32)
    encoded = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*encoded)
    fn = lib.load_batch_packed if pack else lib.load_batch
    status = fn(
        arr,
        n,
        observation.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_frames,
        states,
        padded_states,
        ctypes.c_float(pad_value),
        num_threads)
    if status != 0:
        return None
    return observation, frames
