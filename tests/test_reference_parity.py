"""Parity against the REFERENCE IMPLEMENTATION ITSELF.

Compiles the reference's C++ CPU kernel (/root/reference/torbi/csrc) with
torch.utils.cpp_extension and checks this framework's decoded paths against
`torbi::viterbi_decode` directly -- not just against our numpy oracle.
Skipped when the reference tree or a C++ toolchain is unavailable.
"""
import os
import shutil

import numpy as np
import pytest

REFERENCE_CSRC = '/root/reference/torbi/csrc'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CSRC), reason='reference tree not present')


@pytest.fixture(scope='module')
def reference_op(tmp_path_factory):
    torch = pytest.importorskip('torch')
    from torch.utils import cpp_extension

    build = tmp_path_factory.mktemp('ref_build')
    src = build / 'csrc'
    src.mkdir()
    for name in ('ops.cpp', 'viterbi.cpp'):
        shutil.copy(os.path.join(REFERENCE_CSRC, name), src / name)
    try:
        # The reference registers a TORCH_LIBRARY op (no python module),
        # so load the shared object into the dispatcher directly
        cpp_extension.load(
            name='torbi_reference_cpu',
            sources=[str(src / 'ops.cpp'), str(src / 'viterbi.cpp')],
            extra_cflags=['-O2'],
            build_directory=str(build),
            is_python_module=False,
            verbose=False)
    except Exception as error:
        pytest.skip(f'reference kernel did not build: {error}')
    return torch.ops.torbi.viterbi_decode


def _random_case(rng, batch, frames, states, padded):
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    trans = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(
        rng.dirichlet(np.ones(states)).astype(np.float32) + tiny)
    if padded:
        bf = rng.integers(1, frames + 1, size=batch).astype(np.int32)
        bf[0] = frames
    else:
        bf = np.full(batch, frames, dtype=np.int32)
    return obs, bf, trans, init


@pytest.mark.parametrize('batch,frames,states,padded', [
    (1, 3, 3, False),
    (3, 24, 17, False),
    (4, 31, 64, True),
    (2, 16, 130, True),
])
def test_decode_matches_reference_kernel(
        reference_op, batch, frames, states, padded):
    import torch
    import jax.numpy as jnp

    from torbi_tpu.ops.dispatch import decode

    rng = np.random.default_rng(500 + batch + frames + states)
    obs, bf, trans, init = _random_case(rng, batch, frames, states, padded)

    expected = reference_op(
        torch.from_numpy(obs),
        torch.from_numpy(bf.astype(np.int32)),
        torch.from_numpy(trans),
        torch.from_numpy(init)).numpy()

    for backend in ('xla', 'pallas'):
        got = np.asarray(decode(
            jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
            jnp.asarray(init), backend=backend))
        np.testing.assert_array_equal(got, expected, err_msg=backend)


def test_oracle_matches_reference_kernel(reference_op):
    """Our numpy oracle (the contract every kernel is tested against)
    agrees with the reference native kernel"""
    import torch

    from torbi_tpu.ops import oracle

    rng = np.random.default_rng(77)
    obs, bf, trans, init = _random_case(rng, 3, 40, 48, padded=True)
    expected = reference_op(
        torch.from_numpy(obs),
        torch.from_numpy(bf.astype(np.int32)),
        torch.from_numpy(trans),
        torch.from_numpy(init)).numpy()
    got = oracle.viterbi_numpy(obs, bf, trans, init)
    np.testing.assert_array_equal(got, expected)


def test_librosa_banded_path_bitwise_equals_dense():
    """The evaluation oracle's O(S*W) banded fast path is BITWISE the
    dense float64 recursion -- including argmax lowest-index ties among
    the constant log(0 + eps) out-of-band candidates (tie-heavy quantized
    observations force sum collisions)"""
    from torbi_tpu.ops.oracle import (
        _column_band, _viterbi_librosa_banded, _viterbi_librosa_dense)

    rng = np.random.default_rng(13)
    for trial in range(12):
        states = int(rng.integers(8, 90))
        halfwidth = int(rng.integers(1, max(2, states // 4)))
        shift = int(rng.integers(-2, 3))
        frames = int(rng.integers(2, 40))
        xx, yy = np.meshgrid(
            np.arange(states), np.arange(states), indexing='ij')
        shape = np.clip(halfwidth + 1.0 - np.abs(xx - yy + shift), 0, None)
        trans = shape * (0.5 + rng.random((states, states)))
        trans[shape == 0] = 0
        trans = (trans / trans.sum(axis=1, keepdims=True)).astype(np.float64)
        if trial % 3 == 0:  # quantized: exact float64 sum collisions
            obs = (rng.integers(1, 4, size=(frames, states)) / 4.0)
            obs = obs / obs.sum(axis=1, keepdims=True)
        else:
            obs = rng.dirichlet(np.ones(states), size=frames)
        init = rng.dirichlet(np.ones(states))
        band = _column_band(trans)
        assert band is not None
        np.testing.assert_array_equal(
            _viterbi_librosa_banded(obs, trans, init, band),
            _viterbi_librosa_dense(obs, trans, init),
            err_msg=f'trial {trial}')

    # All-equal-value tie torture: uniform observations inside the band
    states, frames = 24, 12
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    shape = np.clip(4.0 - np.abs(xx - yy), 0, None)
    trans = (shape / shape.sum(axis=1, keepdims=True)).astype(np.float64)
    obs = np.full((frames, states), 1.0 / states)
    init = np.full(states, 1.0 / states)
    band = _column_band(trans)
    np.testing.assert_array_equal(
        _viterbi_librosa_banded(obs, trans, init, band),
        _viterbi_librosa_dense(obs, trans, init))


def test_librosa_style_gates_banded_path():
    """viterbi_librosa_style routes banded transitions to the fast path
    and non-banded ones to the dense recursion (same results either way)"""
    from torbi_tpu.ops import oracle

    rng = np.random.default_rng(14)
    frames, states = 20, 32
    obs = rng.dirichlet(np.ones(states), size=frames).astype(np.float32)
    init = np.full(states, 1.0 / states, dtype=np.float32)
    dense_trans = rng.dirichlet(
        np.ones(states), size=states).astype(np.float32)
    # Dense transition: full support -> width check rejects the fast path
    out = oracle.viterbi_librosa_style(obs, dense_trans, init)
    np.testing.assert_array_equal(
        out, oracle._viterbi_librosa_dense(
            np.float64(obs), np.float64(dense_trans), np.float64(init)))
