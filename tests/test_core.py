"""Core decoding tests, including the reference README toy
(/root/reference/tests/test_core.py asserts the decoded path [1, 2, 2]).
"""
import numpy as np
import pytest

import torbi_tpu

OBSERVATION = np.array([
    [0.25, 0.5, 0.25],
    [0.25, 0.25, 0.5],
    [0.33, 0.33, 0.33],
], dtype=np.float32)[None]
TRANSITION = np.array([
    [0.5, 0.25, 0.25],
    [0.33, 0.34, 0.33],
    [0.25, 0.25, 0.5],
], dtype=np.float32)
INITIAL = np.array([0.4, 0.35, 0.25], dtype=np.float32)


def test_decode():
    """Viterbi decoding test (reference toy fixture)"""
    bins = torbi_tpu.from_probabilities(
        observation=OBSERVATION,
        transition=TRANSITION,
        initial=INITIAL,
        log_probs=False)
    assert (np.asarray(bins) == np.array([[1, 2, 2]])).all()


def test_decode_pallas_interpret():
    """Same toy through the Pallas kernel (interpreter mode on CPU)"""
    bins = torbi_tpu.from_probabilities(
        observation=OBSERVATION,
        transition=TRANSITION,
        initial=INITIAL,
        log_probs=False,
        backend='pallas')
    assert (np.asarray(bins) == np.array([[1, 2, 2]])).all()


def test_decode_log_space():
    """log_probs=True path must match"""
    bins = torbi_tpu.from_probabilities(
        observation=np.log(OBSERVATION),
        transition=np.log(TRANSITION),
        initial=np.log(INITIAL),
        log_probs=True)
    assert (np.asarray(bins) == np.array([[1, 2, 2]])).all()


def test_decode_default_transition_initial():
    """Uniform defaults decode to framewise argmax under uniform transition"""
    bins = torbi_tpu.from_probabilities(observation=OBSERVATION)
    # With uniform transition/initial, the Viterbi path is the frame argmax
    assert (np.asarray(bins) == np.array([[1, 2, 0]])).all()


def test_decode_torch_input():
    """torch tensors are accepted (reference API compatibility)"""
    torch = pytest.importorskip('torch')
    bins = torbi_tpu.from_probabilities(
        observation=torch.tensor(OBSERVATION),
        transition=torch.tensor(TRANSITION),
        initial=torch.tensor(INITIAL),
        log_probs=False)
    assert (np.asarray(bins) == np.array([[1, 2, 2]])).all()


def test_device_string_parity():
    """The reference accepts gpu='mps' (/root/reference/torbi/core.py:146-
    150); here strings select platforms and accelerator aliases resolve to
    the default backend"""
    import jax

    from torbi_tpu.core import _device

    assert _device(None) is None
    assert _device(0) is jax.devices()[0]
    assert _device('cpu') is jax.devices('cpu')[0]
    # 'mps'/'cuda'/'gpu' alias the default accelerator platform
    assert _device('mps') is jax.devices(jax.default_backend())[0]
    assert _device('gpu:1') is jax.devices(jax.default_backend())[1]


def test_from_probabilities_packed_observation():
    """from_probabilities accepts a 4-D mod-M packed observation (the
    data pipeline's zero-copy layout) and matches the natural decode"""
    rng = np.random.default_rng(23)
    batch, frames, states = 2, 10, 240
    from torbi_tpu.ops.dispatch import pack_observation, padded_states

    states_p = padded_states(states)
    obs = rng.dirichlet(np.ones(states), size=(batch, frames)) \
        .astype(np.float32)
    padded = np.zeros((batch, frames, states_p), np.float32)
    padded[..., :states] = obs

    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    t = np.clip(5.0 - np.abs(xx - yy), 0, None)
    trans = (t / t.sum(axis=1, keepdims=True)).astype(np.float32)

    old = torbi_tpu.BACKEND
    torbi_tpu.BACKEND = 'band'
    try:
        natural = np.asarray(torbi_tpu.from_probabilities(
            obs, transition=trans, log_probs=False))
        packed = np.asarray(torbi_tpu.from_probabilities(
            pack_observation(padded), transition=trans, log_probs=False))
    finally:
        torbi_tpu.BACKEND = old
    np.testing.assert_array_equal(packed, natural)
