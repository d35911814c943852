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
