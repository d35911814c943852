"""Batch-1 auto-chunking (ops/autochunk.py): a single long banded sequence
decodes as parallel chunk rows split at low-entropy frame pairs.

Exactness contract: the result is BITWISE the numpy oracle run per-chunk
(the reference's chunked-mode semantics, /root/reference/torbi/chunk.py),
and equals the full-sequence oracle when split frames are truly
near-deterministic (the entropy gate's selection; peaked posteriorgrams
here). Diffuse observations and the BATCH1_AUTO_CHUNK=False pin take the
serial full-sequence-exact kernels.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import torbi_tpu
from torbi_tpu.ops import autochunk, oracle
from torbi_tpu.ops.dispatch import decode as dispatch_decode


def peaked_case(frames, states, halfwidth, seed=0, sigma=1.0):
    """Strongly peaked synthetic posteriorgrams (normalized log space) with
    a banded transition: every frame is a confident split candidate, so the
    global Viterbi path is pinned to the local peaks and chunked decoding
    is exact end to end."""
    rng = np.random.default_rng(seed)
    tiny = np.finfo(np.float32).tiny
    centers = np.clip(
        np.cumsum(rng.integers(-2, 3, size=frames)) + states // 2,
        0, states - 1)
    bins = np.arange(states, dtype=np.float32)[None, :]
    logits = -0.5 * ((bins - centers[:, None]) / sigma) ** 2
    obs = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    obs = np.log(np.exp(obs) + tiny)[None].astype(np.float32)

    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32))
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    return obs, trans.astype(np.float32), init


def route_plan(obs, frames, states):
    """The split plan the route itself computes (device entropy -> greedy
    host plan), for constructing the expected per-chunk oracle result."""
    ent, _ = autochunk._entropy_fn(False, True, states)(
        jnp.asarray(obs), jnp.asarray(np.array([frames], np.int32)))
    return autochunk.plan_splits(
        np.asarray(ent), frames, int(torbi_tpu.BATCH1_CHUNK_FRAMES))


def per_chunk_oracle(obs, trans, init, starts, lengths):
    rows = []
    for start, length in zip(starts, lengths):
        rows.append(oracle.viterbi_numpy(
            obs[:, start:start + length],
            np.array([length], np.int32), trans, init)[0])
    return np.concatenate(rows)[None]


@pytest.fixture
def small_knobs(monkeypatch):
    monkeypatch.setattr(
        torbi_tpu, 'BATCH1_AUTO_CHUNK_MIN_FRAMES', 128, raising=False)
    monkeypatch.setattr(
        torbi_tpu, 'BATCH1_CHUNK_FRAMES', 48, raising=False)
    monkeypatch.setattr(torbi_tpu, 'BATCH1_AUTO_CHUNK', True, raising=False)


def spy_route(monkeypatch):
    """Record whether the auto-chunk route engaged (returned a result)."""
    results = []
    orig = autochunk.decode_chunked

    def wrapper(*args, **kwargs):
        out = orig(*args, **kwargs)
        results.append(out is not None)
        return out

    monkeypatch.setattr(autochunk, 'decode_chunked', wrapper)
    return results


def test_matches_per_chunk_oracle_bitwise(small_knobs, monkeypatch):
    """The machinery contract: output == oracle run per chunk, bitwise"""
    engaged = spy_route(monkeypatch)
    frames, states = 384, 384
    obs, trans, init = peaked_case(frames, states, halfwidth=6, seed=1)
    bf = np.array([frames], np.int32)

    plan = route_plan(obs, frames, states)
    assert plan is not None and len(plan[0]) >= 4
    starts, lengths, _ = plan

    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    assert engaged == [True]
    np.testing.assert_array_equal(
        got, per_chunk_oracle(obs, trans, init, starts, lengths))


def test_matches_full_oracle_on_peaked_data(small_knobs, monkeypatch):
    """End to end: peaked data splits only at near-deterministic frames,
    so chunked == full-sequence oracle"""
    engaged = spy_route(monkeypatch)
    frames, states = 384, 256
    obs, trans, init = peaked_case(frames, states, halfwidth=5, seed=2)
    bf = np.array([frames], np.int32)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    assert engaged == [True]
    np.testing.assert_array_equal(got, expected)


def test_packed_input_matches_natural(small_knobs, monkeypatch):
    """A mod-M packed observation takes the same route to the same path
    (entropy is permutation-invariant, so no unpacking happens)"""
    from torbi_tpu.ops.dispatch import pack_observation, padded_states

    monkeypatch.setattr(
        torbi_tpu, 'BAND_KERNEL_LAYOUT', 'stitched', raising=False)
    engaged = spy_route(monkeypatch)
    frames, states = 384, 384
    obs, trans, init = peaked_case(frames, states, halfwidth=6, seed=3)
    bf = np.array([frames], np.int32)

    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))

    states_p = padded_states(states)
    padded = np.full((1, frames, states_p), -np.inf, np.float32)
    padded[..., :states] = obs
    packed = pack_observation(padded)
    got_packed = np.asarray(dispatch_decode(
        jnp.asarray(packed), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    assert engaged == [True, True]
    np.testing.assert_array_equal(got_packed, got)


def test_diffuse_observation_falls_back_serial_exact(small_knobs,
                                                     monkeypatch):
    """High-entropy frames yield no split candidates: the route declines
    and the serial kernels decode the full sequence oracle-exactly"""
    engaged = spy_route(monkeypatch)
    rng = np.random.default_rng(4)
    frames, states = 160, 256
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(1, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(6 + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32))
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames], np.int32)

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans.astype(
            np.float32)), jnp.asarray(init), backend='pallas',
        finite_observation=True))
    assert engaged == [False]  # considered, declined (no viable plan)
    np.testing.assert_array_equal(got, expected)


def test_flag_off_pins_serial_full_sequence(small_knobs, monkeypatch):
    monkeypatch.setattr(torbi_tpu, 'BATCH1_AUTO_CHUNK', False, raising=False)
    engaged = spy_route(monkeypatch)
    frames, states = 384, 256
    obs, trans, init = peaked_case(frames, states, halfwidth=5, seed=5)
    bf = np.array([frames], np.int32)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    assert engaged == []  # never consulted
    np.testing.assert_array_equal(got, expected)


def test_padded_tail_freezes_at_last_valid_state(small_knobs, monkeypatch):
    """batch_frames < frames: the plan covers only the valid prefix and
    the tail holds the final decoded state (reference freeze semantics)"""
    engaged = spy_route(monkeypatch)
    frames, states, valid = 416, 256, 352
    obs, trans, init = peaked_case(frames, states, halfwidth=5, seed=6)
    bf = np.array([valid], np.int32)

    plan = route_plan(obs[:, :valid], valid, states)
    assert plan is not None
    starts, lengths, _ = plan

    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    assert engaged == [True]
    expected_valid = per_chunk_oracle(
        obs[:, :valid], trans, init, starts, lengths)
    np.testing.assert_array_equal(got[:, :valid], expected_valid)
    np.testing.assert_array_equal(
        got[:, valid:],
        np.full((1, frames - valid), expected_valid[0, -1], got.dtype))


def test_probability_space_epsilon_pipeline(small_knobs, monkeypatch):
    """log_input=False + apply_epsilon: the folded conversion matches the
    per-chunk oracle on the epsilon-stabilized observation"""
    engaged = spy_route(monkeypatch)
    frames, states = 384, 256
    obs, trans, init = peaked_case(frames, states, halfwidth=5, seed=7)
    bf = np.array([frames], np.int32)
    tiny = np.finfo(np.float32).tiny
    probs = np.exp(obs)
    obs_eps = np.log(np.exp(np.log(probs)) + tiny)

    got = np.asarray(dispatch_decode(
        jnp.asarray(probs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', log_input=False,
        apply_epsilon=True))
    assert engaged == [True]

    # Expected: the plan the route computes from the probability-space
    # entropy, decoded per chunk on the stabilized log observation
    ent, _ = autochunk._entropy_fn(False, False, states)(
        jnp.asarray(probs), jnp.asarray(bf))
    plan = autochunk.plan_splits(
        np.asarray(ent), frames, int(torbi_tpu.BATCH1_CHUNK_FRAMES))
    assert plan is not None
    starts, lengths, _ = plan
    np.testing.assert_array_equal(
        got, per_chunk_oracle(obs_eps, trans, init, starts, lengths))


def test_device_entropy_matches_host_chunker():
    """The device entropy pass agrees with the user-facing chunker's host
    entropy (chunk.py::entropy), so auto-splits match chunk.split"""
    from torbi_tpu.chunk import entropy as host_entropy

    obs, _, _ = peaked_case(200, 256, halfwidth=5, seed=8)
    host = host_entropy(np.asarray(obs[0]).T)
    dev, _ = autochunk._entropy_fn(False, True, 256)(
        jnp.asarray(obs), jnp.asarray(np.array([200], np.int32)))
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5, atol=1e-6)


def test_plan_cache_reuses_per_identity(small_knobs):
    """Repeated decodes of the same resident buffer skip the entropy
    round trip (the route's only host sync) via the identity-keyed plan
    cache"""
    frames, states = 384, 256
    obs, trans, init = peaked_case(frames, states, halfwidth=5, seed=9)
    obs_dev = jnp.asarray(obs)
    bf_dev = jnp.asarray(np.array([frames], np.int32))

    autochunk._plan_cache.clear()
    calls = []
    orig = autochunk._entropy_fn

    class Spy:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, *args):
            calls.append(1)
            return self.fn(*args)

    import unittest.mock as mock
    with mock.patch.object(
            autochunk, '_entropy_fn',
            lambda *a: Spy(orig(*a))):
        first = np.asarray(dispatch_decode(
            obs_dev, bf_dev, jnp.asarray(trans), jnp.asarray(init),
            backend='pallas', finite_observation=True))
        second = np.asarray(dispatch_decode(
            obs_dev, bf_dev, jnp.asarray(trans), jnp.asarray(init),
            backend='pallas', finite_observation=True))
    assert len(calls) == 1
    np.testing.assert_array_equal(first, second)
