"""Tests for the associative-scan and LSE decode modes."""
import jax.numpy as jnp
import numpy as np
import pytest

from torbi_tpu.ops import oracle
from torbi_tpu.ops.associative import (
    viterbi_decode_scan,
    viterbi_posteriors_scan,
)
from torbi_tpu.ops.lse import decode_lse


def _case(rng, frames, states, concentration=0.1):
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states) * concentration, size=frames)
        .astype(np.float32) + tiny)
    trans = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(
        rng.dirichlet(np.ones(states)).astype(np.float32) + tiny)
    return obs, trans, init


def test_associative_posteriors_match_sequential():
    rng = np.random.default_rng(0)
    obs, trans, init = _case(rng, frames=17, states=9)
    posts = np.asarray(viterbi_posteriors_scan(
        jnp.asarray(obs), jnp.asarray(trans), jnp.asarray(init)))

    # Sequential float64 recursion for comparison
    ref = np.zeros_like(posts, dtype=np.float64)
    ref[0] = obs[0].astype(np.float64) + init
    for t in range(1, obs.shape[0]):
        scores = ref[t - 1][None, :] + trans.astype(np.float64)
        ref[t] = obs[t] + scores.max(axis=1)
    np.testing.assert_allclose(posts, ref, rtol=1e-4, atol=1e-3)


def test_associative_decode_matches_oracle():
    rng = np.random.default_rng(1)
    obs, trans, init = _case(rng, frames=25, states=12)
    expected = oracle.viterbi_numpy(
        obs[None], np.array([25]), trans, init)[0]
    got = np.asarray(viterbi_decode_scan(
        jnp.asarray(obs), jnp.asarray(trans), jnp.asarray(init)))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('beta', [8.0, 32.0])
def test_lse_decode_matches_exact_on_peaked_inputs(beta):
    """On peaked posteriorgrams the smoothed-max path equals exact Viterbi"""
    rng = np.random.default_rng(2)
    frames, states = 40, 24
    obs, trans, init = _case(rng, frames, states, concentration=0.05)
    bf = np.array([frames], dtype=np.int32)
    expected = oracle.viterbi_numpy(obs[None], bf, trans, init)[0]
    got = np.asarray(decode_lse(
        jnp.asarray(obs[None]), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), beta=beta))[0]
    agreement = float(np.mean(got == expected))
    assert agreement >= 0.95, agreement


def test_lse_decode_padded_batch():
    rng = np.random.default_rng(3)
    frames, states = 30, 16
    obs, trans, init = _case(rng, frames, states, concentration=0.05)
    obs2, _, _ = _case(rng, frames, states, concentration=0.05)
    batch_obs = np.stack([obs, obs2])
    bf = np.array([frames, 11], dtype=np.int32)
    got = np.asarray(decode_lse(
        jnp.asarray(batch_obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init)))
    assert got.shape == (2, frames)
    # Frames at or beyond batch_frames - 1 all hold the broadcast argmax
    # seed (oracle.viterbi_numpy: indices[b, :] = seed before backtrace)
    assert (got[1, 10:] == got[1, 10]).all()
    expected0 = oracle.viterbi_numpy(obs[None], np.array([frames]),
                                     trans, init)[0]
    agreement = float(np.mean(got[0] == expected0))
    assert agreement >= 0.9, agreement


def test_lse_backend_staged_pipeline_matches_direct():
    """backend='lse' through dispatch (bucketing + auto-sharding + memory
    guard) returns exactly what a direct decode_lse call returns"""
    import torbi_tpu
    from torbi_tpu.ops.dispatch import decode as dispatch_decode

    rng = np.random.default_rng(6)
    batch, frames, states = 64, 21, 16  # auto-shards over the CPU mesh
    obs = np.stack([
        _case(rng, frames, states, concentration=0.05)[0]
        for _ in range(batch)])
    _, trans, init = _case(rng, frames, states, concentration=0.05)
    bf = np.full(batch, frames, dtype=np.int32)
    bf[5] = 9

    direct = np.asarray(decode_lse(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), beta=torbi_tpu.LSE_BETA))
    staged = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='lse'))
    np.testing.assert_array_equal(staged, direct)


def test_timesharded_backend_matches_oracle():
    """backend='timesharded' routes dispatch through the exact
    frame-sharded decoder and matches the sequential oracle (unique
    argmax inputs)"""
    from torbi_tpu.ops.dispatch import decode as dispatch_decode

    rng = np.random.default_rng(7)
    frames, states = 48, 6
    obs, trans, init = _case(rng, frames, states, concentration=0.05)
    bf = np.array([frames], dtype=np.int32)
    expected = oracle.viterbi_numpy(obs[None], bf, trans, init)[0]
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs)[None], jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='timesharded'))
    np.testing.assert_array_equal(got[0], expected)


def test_timesharded_backend_padded_frames_keep_final_state():
    """Padded-batch semantics parity: frames beyond batch_frames hold the
    final decoded state (the reference's argmax-seed broadcast)"""
    from torbi_tpu.ops.dispatch import decode as dispatch_decode

    rng = np.random.default_rng(8)
    frames, valid, states = 48, 36, 5
    obs, trans, init = _case(rng, frames, states, concentration=0.05)
    bf = np.array([valid], dtype=np.int32)
    expected = oracle.viterbi_numpy(obs[None], bf, trans, init)[0]
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs)[None], jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='timesharded'))
    np.testing.assert_array_equal(got[0], expected)


def test_timesharded_auto_policy_routes_tiny_states(monkeypatch):
    """The dispatch-level policy: a single long sequence with
    2*states < local devices auto-routes to the time-sharded decoder"""
    import torbi_tpu
    from torbi_tpu.ops import dispatch

    monkeypatch.setattr(torbi_tpu, 'TIME_SHARDED_MIN_FRAMES', 32,
                        raising=False)
    calls = []
    real = dispatch._decode_timesharded

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(dispatch, '_decode_timesharded', spy)

    rng = np.random.default_rng(9)
    frames, states = 64, 3  # 8 virtual devices > 2 * 3
    obs, trans, init = _case(rng, frames, states, concentration=0.05)
    bf = np.array([frames], dtype=np.int32)
    expected = oracle.viterbi_numpy(obs[None], bf, trans, init)[0]
    got = np.asarray(dispatch.decode(
        jnp.asarray(obs)[None], jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas'))
    assert calls, 'auto policy did not route to the time-sharded decoder'
    np.testing.assert_array_equal(got[0], expected)

    # Pitch-scale state counts must NOT take the route (cost model)
    calls.clear()
    states = 16  # 2 * 16 > 8 devices
    obs, trans, init = _case(rng, frames, states, concentration=0.05)
    dispatch.decode(
        jnp.asarray(obs)[None], jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas')
    assert not calls
