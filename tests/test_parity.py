"""Bit-exactness parity tests: XLA scan path and Pallas kernels (interpreter
mode) against the loop-based numpy oracle that encodes the reference-kernel
contract, over random inputs including padded batches and exact ties.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import torbi_tpu
from torbi_tpu.ops import oracle
from torbi_tpu.ops.dispatch import decode as dispatch_decode


def random_case(rng, batch, frames, states, padded=False, log_probs=True):
    observation = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + np.finfo(np.float32).tiny)
    transition = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + np.finfo(np.float32).tiny)
    initial = np.log(
        rng.dirichlet(np.ones(states)).astype(np.float32)
        + np.finfo(np.float32).tiny)
    if padded:
        batch_frames = rng.integers(1, frames + 1, size=batch).astype(np.int32)
        batch_frames[0] = frames  # at least one full-length item
    else:
        batch_frames = np.full(batch, frames, dtype=np.int32)
    return (
        observation.astype(np.float32),
        batch_frames,
        transition.astype(np.float32),
        initial.astype(np.float32))


CASES = [
    (1, 3, 3, False),
    (2, 16, 8, False),
    (4, 33, 17, True),
    (3, 50, 64, True),
    (8, 20, 130, True),   # states > one lane tile
    (2, 230, 16, True),   # frames bucket to 256: 2 backtrace frame tiles,
                          # exercising the cross-tile chase boundary
]


@pytest.mark.parametrize('batch,frames,states,padded', CASES)
def test_xla_matches_oracle(batch, frames, states, padded):
    rng = np.random.default_rng(42 + batch + frames + states)
    obs, bf, trans, init = random_case(rng, batch, frames, states, padded)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='xla'))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('batch,frames,states,padded', CASES)
def test_pallas_matches_oracle(batch, frames, states, padded):
    rng = np.random.default_rng(1000 + batch + frames + states)
    obs, bf, trans, init = random_case(rng, batch, frames, states, padded)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas'))
    np.testing.assert_array_equal(got, expected)


def test_xla_backend_buckets_compiles_once():
    """Distinct raw shapes within one (batch, frames) bucket share a single
    staged pipeline on the XLA backend (no per-shape recompiles)"""
    from torbi_tpu.ops import dispatch as dispatch_mod

    rng = np.random.default_rng(5)
    dispatch_mod._build_decode.cache_clear()
    shapes = [(2, 9, 12), (3, 11, 12), (1, 14, 12)]  # one (8, 16) bucket
    for batch, frames, states in shapes:
        obs, bf, trans, init = random_case(rng, batch, frames, states)
        expected = oracle.viterbi_numpy(obs, bf, trans, init)
        got = np.asarray(dispatch_decode(
            jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
            jnp.asarray(init), backend='xla'))
        np.testing.assert_array_equal(got, expected)
    info = dispatch_mod._build_decode.cache_info()
    assert info.misses == 1, info


def test_memory_budget_splits_batches(monkeypatch):
    """Oversized batches split into independent sub-calls, bitwise equal
    to the unsplit decode (the guard that keeps a 512 x 1024-frame chunk
    batch under HBM capacity)"""
    from torbi_tpu.ops import dispatch as dispatch_mod

    rng = np.random.default_rng(63)
    obs, bf, trans, init = random_case(rng, 12, 10, 9, padded=True)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)

    monkeypatch.setattr(torbi_tpu, 'DECODE_MEMORY_BUDGET', 1)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='xla'))
    np.testing.assert_array_equal(got, expected)


def test_exact_ties_lowest_index():
    """Exact ties resolve to the lowest source index on every backend"""
    batch, frames, states = 2, 6, 5
    # All-equal observations and transitions force ties everywhere
    obs = np.zeros((batch, frames, states), dtype=np.float32)
    trans = np.zeros((states, states), dtype=np.float32)
    init = np.zeros(states, dtype=np.float32)
    bf = np.array([frames, 3], dtype=np.int32)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    for backend in ('xla', 'pallas'):
        got = np.asarray(dispatch_decode(
            jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
            jnp.asarray(init), backend=backend))
        np.testing.assert_array_equal(got, expected, err_msg=backend)


def test_band_kernel_matches_dense():
    """Banded transition routes through the band kernel and matches dense"""
    rng = np.random.default_rng(7)
    batch, frames, states, halfwidth = 4, 25, 64, 5
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + np.finfo(np.float32).tiny)
    # Band-diagonal transition like the pitch matrix
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = trans / trans.sum(axis=1, keepdims=True)
    trans = np.log(trans).astype(np.float32)  # -inf outside the band
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32))
    bf = np.array([frames, frames - 3, 1, frames], dtype=np.int32)

    from torbi_tpu.ops import band as band_ops
    detected = band_ops.detect_band(jnp.asarray(trans))
    assert detected is not None
    lo, width, floor = detected
    assert lo == -(halfwidth) and width == 2 * halfwidth + 1
    assert floor is None  # -inf exterior

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_constant_transition_fast_path():
    """A constant transition matrix (e.g. the uniform default) detects as a
    width-0 floor band and decodes bit-exactly via one lane-max per frame"""
    from torbi_tpu.ops import band as band_ops

    rng = np.random.default_rng(29)
    batch, frames, states = 3, 30, 40
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    trans = np.full(
        (states, states), np.float32(np.log(1.0 / states)), dtype=np.float32)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames, frames - 11, 1], dtype=np.int32)

    detected = band_ops.detect_band(jnp.asarray(trans))
    assert detected == (0, 0, float(np.float32(np.log(1.0 / states))))

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_constant_transition_single_frame():
    """1-frame decodes through the constant-transition closed form: the
    scalar-carry scan is empty and the argmax seed must come from the
    initial-distribution column alone"""
    rng = np.random.default_rng(7)
    tiny = np.finfo(np.float32).tiny
    for frames, batch, states in [(1, 1, 40), (1, 3, 129)]:
        obs = np.log(
            rng.dirichlet(np.ones(states), size=(batch, frames))
            .astype(np.float32) + tiny)
        trans = np.full(
            (states, states), np.float32(np.log(1.0 / states)), np.float32)
        init = np.log(
            rng.dirichlet(np.ones(states)).astype(np.float32) + tiny)
        bf = np.full(batch, frames, np.int32)
        expected = oracle.viterbi_numpy(obs, bf, trans, init)
        got = np.asarray(dispatch_decode(
            jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
            jnp.asarray(init), backend='pallas', finite_observation=True))
        np.testing.assert_array_equal(got, expected)


def test_band_kernel_folded_epsilon_conversion():
    """log conversion + epsilon stabilization folded into the band kernel's
    observation stream decode exactly like host-side conversion"""
    rng = np.random.default_rng(41)
    batch, frames, states, halfwidth = 3, 20, 48, 4
    tiny = np.finfo(np.float32).tiny
    probs = rng.dirichlet(
        np.ones(states), size=(batch, frames)).astype(np.float32)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames, 7, frames], dtype=np.int32)

    # Expected: the oracle on the SAME conversion arithmetic (jnp ops, so
    # the comparison isolates the decode, not libm-vs-XLA transcendentals)
    converted = np.asarray(jnp.log(jnp.exp(jnp.log(probs)) + tiny))
    expected = oracle.viterbi_numpy(converted, bf, trans, init)

    got = np.asarray(dispatch_decode(
        jnp.asarray(probs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', log_input=False,
        apply_epsilon=True))
    np.testing.assert_array_equal(got, expected)


def test_band_detection_rejects_dense():
    from torbi_tpu.ops import band as band_ops
    rng = np.random.default_rng(3)
    trans = np.log(rng.dirichlet(np.ones(32), size=32).astype(np.float32)
                   + 1e-30)
    assert band_ops.detect_band(jnp.asarray(trans)) is None


def test_floor_band_kernel_matches_dense():
    """The benchmark-style log(p + tiny) banded matrix routes through the
    constant-floor band kernel and matches the dense rule bit-exactly"""
    from torbi_tpu.ops import band as band_ops

    rng = np.random.default_rng(17)
    batch, frames, states, halfwidth = 4, 30, 96, 6
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = trans / trans.sum(axis=1, keepdims=True)
    trans = np.log(trans.astype(np.float32) + tiny)  # finite constant floor
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames, frames - 7, 1, frames], dtype=np.int32)

    detected = band_ops.detect_band(jnp.asarray(trans))
    assert detected is not None
    lo, width, floor = detected
    assert lo == -halfwidth and width == 2 * halfwidth + 1
    assert floor == np.float32(np.log(tiny))

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_floor_band_kernel_large_posterior_spread():
    """Out-of-band floor jumps must win when the posterior spread exceeds
    the in-band advantage (the case a naive band kernel gets wrong)"""
    from torbi_tpu.ops import band as band_ops

    states, frames = 64, 40
    halfwidth = 2
    tiny = np.finfo(np.float32).tiny
    rng = np.random.default_rng(23)
    # Extremely peaked observations force a huge posterior spread quickly
    obs_probs = np.full((frames, states), 1e-12, dtype=np.float64)
    centers = (np.arange(frames) * 3) % states  # moves faster than the band
    obs_probs[np.arange(frames), centers] = 1.0
    obs_probs /= obs_probs.sum(axis=1, keepdims=True)
    obs = np.log(obs_probs.astype(np.float32) + tiny)[None]

    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = trans / trans.sum(axis=1, keepdims=True)
    trans = np.log(trans.astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames], dtype=np.int32)

    assert band_ops.detect_band(jnp.asarray(trans)) is not None
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_librosa_style_oracle_agrees():
    """The float64 librosa-style oracle and the reference-contract oracle
    agree on well-separated inputs"""
    rng = np.random.default_rng(11)
    frames, states = 20, 12
    obs_probs = rng.dirichlet(np.ones(states) * 0.2, size=frames)
    trans_probs = rng.dirichlet(np.ones(states), size=states)
    init_probs = rng.dirichlet(np.ones(states))
    path64 = oracle.viterbi_librosa_style(obs_probs, trans_probs, init_probs)

    tiny = np.finfo(np.float32).tiny
    obs = np.log(obs_probs.astype(np.float32) + tiny)[None]
    # torbi convention: transition rows are destinations -> transpose librosa's
    trans = np.log(trans_probs.T.astype(np.float32) + tiny)
    init = np.log(init_probs.astype(np.float32) + tiny)
    got = oracle.viterbi_numpy(
        obs, np.array([frames]), trans, init)[0]
    np.testing.assert_array_equal(got, path64)


@pytest.mark.parametrize('layout', ['tilted', 'stitched'])
@pytest.mark.parametrize('with_floor', [False, True])
def test_alt_layout_band_kernel_matches_dense(monkeypatch, with_floor,
                                              layout):
    """The alternative band-kernel layouts ('tilted': shared intra-vreg
    rotates + lane-mask selects; 'stitched': mod-M layout with stitched
    band matrices) are bitwise identical to the rolled kernel and the
    dense oracle, including padded batches, the constant-floor
    contribution, and the folded epsilon conversion"""
    import torbi_tpu
    from torbi_tpu.ops import band as band_ops

    monkeypatch.setattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', layout,
                        raising=False)

    rng = np.random.default_rng(23)
    batch, frames, states, halfwidth = 4, 26, 160, 7
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = trans / trans.sum(axis=1, keepdims=True)
    if with_floor:
        trans = np.log(trans.astype(np.float32) + tiny)
    else:
        trans = np.log(trans).astype(np.float32)  # -inf exterior
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames, frames - 5, 1, frames], dtype=np.int32)

    detected = band_ops.detect_band(jnp.asarray(trans))
    assert detected is not None and detected[1] > 0

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('layout', ['tilted', 'stitched'])
def test_alt_layout_band_kernel_lane_padded_epsilon(monkeypatch, layout):
    """Alternative layouts with a lane-padded observation stream and the
    folded probability->log + epsilon conversion (the production
    file-workload configuration)"""
    import torbi_tpu
    from torbi_tpu.ops import band as band_ops

    monkeypatch.setattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', layout,
                        raising=False)

    rng = np.random.default_rng(29)
    batch, frames, states, halfwidth = 2, 19, 100, 4
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames, frames - 4], dtype=np.int32)

    # Lane-pad the observation to the next 128 multiple, as the data
    # pipeline does at load time
    states_p = ((states + 127) // 128) * 128
    padded = np.full((batch, frames, states_p), -np.inf, np.float32)
    padded[..., :states] = obs

    obs_eps = np.log(np.exp(obs) + tiny)
    expected = oracle.viterbi_numpy(obs_eps, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(padded), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', apply_epsilon=True))
    np.testing.assert_array_equal(got, expected)


def test_packed_observation_matches_natural():
    """Packed (mod-M) observations ride the stitched fast path and decode
    bitwise identically to the natural layout -- including through the
    auto-sharded multi-device dispatch"""
    import torbi_tpu
    from torbi_tpu.ops import band as band_ops

    assert torbi_tpu.BAND_KERNEL_LAYOUT == 'stitched'

    rng = np.random.default_rng(41)
    batch, frames, states, halfwidth = 64, 18, 120, 5
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.full(batch, frames, dtype=np.int32)
    bf[3] = 7

    states_p = ((states + 127) // 128) * 128
    M = states_p // 128
    padded = np.full((batch, frames, states_p), -np.inf, np.float32)
    padded[..., :states] = obs
    # Pack: state s = M*l + r -> (r, b, t, l). Derived inline so the
    # library helper is checked against an independent statement of the
    # convention.
    packed = np.ascontiguousarray(
        padded.reshape(batch, frames, 128, M).transpose(3, 0, 1, 2))
    from torbi_tpu.ops.dispatch import pack_observation
    np.testing.assert_array_equal(packed, pack_observation(padded))

    natural = np.asarray(dispatch_decode(
        jnp.asarray(padded), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', apply_epsilon=True))
    got = np.asarray(dispatch_decode(
        jnp.asarray(packed), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', apply_epsilon=True))
    np.testing.assert_array_equal(got, natural)

    # And against the oracle
    obs_eps = np.log(np.exp(obs) + tiny)
    expected = oracle.viterbi_numpy(obs_eps, bf, trans, init)
    np.testing.assert_array_equal(got, expected)


def test_packed_observation_unpacks_for_dense_transition():
    """A packed observation with a dense (unbanded) transition falls back
    to the unpack transform and the dense kernel, still exact"""
    rng = np.random.default_rng(43)
    batch, frames, states = 8, 11, 96
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    trans = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.full(batch, frames, dtype=np.int32)

    from torbi_tpu.ops.dispatch import pack_observation
    states_p = ((states + 127) // 128) * 128
    padded = np.full((batch, frames, states_p), -np.inf, np.float32)
    padded[..., :states] = obs
    packed = pack_observation(padded)

    obs_eps = np.log(np.exp(obs) + tiny)
    expected = oracle.viterbi_numpy(obs_eps, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(packed), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', apply_epsilon=True))
    np.testing.assert_array_equal(got, expected)


def test_stitched_backtrace_multi_frame_tile():
    """The mod-M backtrace's cross-tile chase (frames > one 128-frame
    tile) is bitwise exact -- the only CPU case exercising
    backtrace_posteriors12's frame-tile boundary"""
    import torbi_tpu

    assert torbi_tpu.BAND_KERNEL_LAYOUT == 'stitched'

    rng = np.random.default_rng(47)
    batch, frames, states, halfwidth = 2, 250, 120, 5  # buckets to 256
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames, 133], dtype=np.int32)  # one crossing mid-tile

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_unrolled_backtrace_multi_frame_tile():
    """The unrolled backtrace kernel (BACKTRACE_LOOP=False) also chases
    across frame-tile boundaries exactly"""
    rng = np.random.default_rng(53)
    obs, bf, trans, init = random_case(rng, 2, 140, 24, padded=True)
    bf[1] = 131  # a crossing just above the first tile boundary
    expected = oracle.viterbi_numpy(obs, bf, trans, init)

    old = torbi_tpu.BACKTRACE_LOOP
    torbi_tpu.BACKTRACE_LOOP = False
    try:
        got = np.asarray(dispatch_decode(
            jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
            jnp.asarray(init), backend='pallas'))
    finally:
        torbi_tpu.BACKTRACE_LOOP = old
    np.testing.assert_array_equal(got, expected)


def test_memory_budget_splits_packed_batches(monkeypatch):
    """The HBM guard splits PACKED (mod-M) batches on their batch axis 1,
    bitwise equal to the unsplit decode"""
    from torbi_tpu.ops.dispatch import pack_observation, padded_states

    rng = np.random.default_rng(71)
    batch, frames, states, halfwidth = 12, 10, 240, 4
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = rng.integers(1, frames + 1, size=batch).astype(np.int32)

    states_p = padded_states(states)
    padded = np.full((batch, frames, states_p), -np.inf, np.float32)
    padded[..., :states] = obs
    packed = pack_observation(padded)

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    monkeypatch.setattr(torbi_tpu, 'DECODE_MEMORY_BUDGET', 1)
    got = np.asarray(dispatch_decode(
        jnp.asarray(packed), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('layout', ['rolled', 'stitched'])
def test_batch1_padding_rows_elided(monkeypatch, layout):
    """A batch-1 decode pads to the 8-row kernel tile; the backtrace build
    declares the 7 padding rows statically (real_batch=1) and skips their
    per-step transition-row loads. The REAL row must stay bitwise exact on
    every kernel family (band rolled/stitched and the dense kernel)."""
    monkeypatch.setattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', layout,
                        raising=False)

    rng = np.random.default_rng(83)
    frames, states, halfwidth = 137, 160, 7  # frames bucket above raw
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(1, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    band = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans_band = np.log(
        (band / band.sum(axis=1, keepdims=True)).astype(np.float32) + tiny)
    trans_dense = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames], dtype=np.int32)

    for trans in (trans_band, trans_dense):
        expected = oracle.viterbi_numpy(obs, bf, trans, init)
        got = np.asarray(dispatch_decode(
            jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
            jnp.asarray(init), backend='pallas', finite_observation=True))
        np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('with_floor', [False, True])
def test_spread_batch1_kernel_matches_oracle(monkeypatch, with_floor):
    """BAND_BATCH1_SPREAD routes batch-1 banded decodes through the
    replicated-offsets kernel (ops/band.py::spread_plan); decoded paths
    stay bitwise oracle-exact with the folded epsilon conversion, padded
    frames, both band exteriors, and packed (mod-M) observations."""
    from torbi_tpu.ops import band as band_ops
    from torbi_tpu.ops.dispatch import pack_observation, padded_states

    monkeypatch.setattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'stitched',
                        raising=False)
    monkeypatch.setattr(torbi_tpu, 'BAND_BATCH1_SPREAD', True,
                        raising=False)
    calls = []
    orig = band_ops._build_band_forward_spread

    def spy(*args, **kwargs):
        calls.append(args)
        return orig(*args, **kwargs)
    monkeypatch.setattr(band_ops, '_build_band_forward_spread', spy)
    band_ops._build_band_forward.cache_clear()

    rng = np.random.default_rng(91)
    frames, states, halfwidth = 61, 384, 9  # M=3, frames bucket to 64
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(1, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    # Asymmetric band (three columns upper-heavy): lo is NOT -(width//2),
    # exercising the spread rebuild's lo-dependent renames
    band = np.clip(halfwidth + 1.0 - np.abs(xx - yy + 3), 0, None)
    band = band + np.eye(states, dtype=np.float32) * 1e-3
    band = (band / band.sum(axis=1, keepdims=True)).astype(np.float32)
    if with_floor:
        trans = np.log(band + tiny)  # constant log(tiny) floor exterior
    else:
        trans = np.log(band).astype(np.float32)  # -inf exterior
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames], dtype=np.int32)

    detected = band_ops.detect_band(jnp.asarray(trans))
    assert detected is not None and detected[1] > 0

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)
    assert calls, 'spread kernel did not engage'

    # Packed (mod-M) observation through the same spread path
    states_p = padded_states(states)
    padded = np.full((1, frames, states_p), -np.inf, np.float32)
    padded[..., :states] = obs
    packed = pack_observation(padded)
    got_packed = np.asarray(dispatch_decode(
        jnp.asarray(packed), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got_packed, expected)

    # Folded epsilon conversion from probability space (CLI pipeline)
    probs = np.exp(obs)
    obs_eps = np.log(np.exp(np.log(probs)) + tiny)
    expected_eps = oracle.viterbi_numpy(obs_eps, bf, trans, init)
    got_eps = np.asarray(dispatch_decode(
        jnp.asarray(probs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', log_input=False,
        apply_epsilon=True))
    np.testing.assert_array_equal(got_eps, expected_eps)


@pytest.mark.parametrize('spread', [False, True])
def test_batch1_window_backtrace_matches_full_chase(monkeypatch, spread):
    """BACKTRACE_BATCH1_WINDOW chases over the band window of a
    natural-major relayout of the single-row posterior stream
    (ops/backtrace.py::backtrace_posteriors_window). Decoded paths must be
    bitwise identical to the full-width mod-M chase -- including
    lowest-index ties (a flat in-band transition), frozen padded frames,
    an asymmetric band, and multiple 128-frame chase tiles -- with the
    spread forward both off and on."""
    from torbi_tpu.ops import backtrace as bt
    from torbi_tpu.ops import dispatch

    monkeypatch.setattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'stitched',
                        raising=False)
    monkeypatch.setattr(torbi_tpu, 'BAND_BATCH1_SPREAD', spread,
                        raising=False)
    # The fused chase (default on) takes precedence over the windowed
    # variant under test; disable it so the window path engages
    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_FUSED', False,
                        raising=False)
    calls = []
    orig = bt._build_backtrace_window

    def spy(*args, **kwargs):
        calls.append(args)
        return orig(*args, **kwargs)
    monkeypatch.setattr(bt, '_build_backtrace_window', spy)

    rng = np.random.default_rng(29)
    frames, states, halfwidth = 200, 384, 11  # bucket 256: two chase tiles
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(1, frames))
        .astype(np.float32) + tiny)
    # Asymmetric FLAT in-band transition: every in-band candidate ties on
    # the transition term, so the chase's lowest-natural-index rule decides
    # constantly
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    band = (np.abs(xx - yy + 4) <= halfwidth).astype(np.float32)
    trans = np.log(
        (band / band.sum(axis=1, keepdims=True)).astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([157], dtype=np.int32)  # frozen tail inside tile 2

    expected = oracle.viterbi_numpy(obs, bf, trans, init)

    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_WINDOW', True,
                        raising=False)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)
    assert calls, 'windowed chase did not engage'

    # Flag off: the full-width mod-M chase decodes identically
    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_WINDOW', False,
                        raising=False)
    calls.clear()
    got_full = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got_full, expected)
    assert not calls

    # A band window wider than the padded state rows falls back (gate)
    assert not dispatch._use_window_chase((-150, 301, None), 384, True)
    assert bt.window_rows(301) == 4


@pytest.mark.parametrize('spread', [False, True])
def test_batch1_fused_backtrace_matches_full_chase(monkeypatch, spread):
    """BACKTRACE_BATCH1_FUSED chases with the single associative
    (value, natural-index) pair tree
    (ops/backtrace.py::backtrace_posteriors12_fused1). Decoded paths must
    be bitwise identical to the full-width mod-M chase -- including
    lowest-index ties (a flat in-band transition), frozen padded frames,
    an asymmetric band, and multiple 128-frame chase tiles -- with the
    spread forward both off and on."""
    from torbi_tpu.ops import backtrace as bt
    from torbi_tpu.ops import dispatch

    monkeypatch.setattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'stitched',
                        raising=False)
    monkeypatch.setattr(torbi_tpu, 'BAND_BATCH1_SPREAD', spread,
                        raising=False)
    calls = []
    orig = bt._build_backtrace12_fused1

    def spy(*args, **kwargs):
        calls.append(args)
        return orig(*args, **kwargs)
    monkeypatch.setattr(bt, '_build_backtrace12_fused1', spy)

    rng = np.random.default_rng(31)
    frames, states, halfwidth = 200, 384, 11  # bucket 256: two chase tiles
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(1, frames))
        .astype(np.float32) + tiny)
    # Asymmetric FLAT in-band transition: every in-band candidate ties on
    # the transition term, so the fused tree's lowest-natural-index
    # combine decides constantly
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    band = (np.abs(xx - yy + 4) <= halfwidth).astype(np.float32)
    trans = np.log(
        (band / band.sum(axis=1, keepdims=True)).astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([157], dtype=np.int32)  # frozen tail inside tile 2

    expected = oracle.viterbi_numpy(obs, bf, trans, init)

    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_FUSED', True,
                        raising=False)
    # The spy fires at trace time only; force a re-trace in case another
    # test already staged this exact shape/config combination
    dispatch._build_decode.cache_clear()
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)
    assert calls, 'fused chase did not engage'

    # Fused takes precedence over the windowed chase when both are on
    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_WINDOW', True,
                        raising=False)
    assert not dispatch._use_window_chase(
        (-15, 2 * halfwidth + 1, None), 384, True)

    # Flag off: the full-width mod-M chase decodes identically
    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_FUSED', False,
                        raising=False)
    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_WINDOW', False,
                        raising=False)
    calls.clear()
    got_full = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got_full, expected)
    assert not calls


def test_constant_transition_parallel_backtrace_exact_ties():
    """The width-0 (constant transition) path's PARALLEL backtrace: the
    chase collapses to per-frame first-argmax of post + floor. Engineered
    exact ties must still break to the lowest state index, and padded
    rows/frames keep the seed-broadcast semantics."""
    rng = np.random.default_rng(41)
    batch, frames, states = 3, 17, 24
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    # Exact ties: duplicate state columns pairwise so every frame's
    # posterior has equal-scoring neighbors
    obs[:, :, 1::2] = obs[:, :, 0::2]
    trans = np.full(
        (states, states), np.float32(np.log(1.0 / states)), np.float32)
    init = np.full(states, np.float32(np.log(1.0 / states)), np.float32)
    init[1::2] = init[0::2]
    bf = np.array([frames, 1, frames - 6], dtype=np.int32)

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)
    # The ties are real: every decoded state must be even (lowest of pair)
    assert (got % 2 == 0).all()


def test_spread_multi_frame_tile_backtrace(monkeypatch):
    """Spread's replicated stream through a multi-tile backtrace: frames
    bucket above 128, so the chase crosses frame-tile boundaries via the
    deferred step while load_rows=1 elides the padding rows' loads."""
    from torbi_tpu.ops import band as band_ops

    monkeypatch.setattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'stitched',
                        raising=False)
    monkeypatch.setattr(torbi_tpu, 'BAND_BATCH1_SPREAD', True,
                        raising=False)

    rng = np.random.default_rng(97)
    frames, states, halfwidth = 230, 256, 6  # buckets to 256: 2 tiles
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(1, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    band = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (band / band.sum(axis=1, keepdims=True)).astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames], dtype=np.int32)

    assert band_ops.detect_band(jnp.asarray(trans))[1] > 0
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_spread_epsilon_unaligned_states(monkeypatch):
    """Spread + folded epsilon at a NON-lane-aligned state count: the
    builder pads states with -inf BEFORE the in-kernel conversion, so the
    pad lanes become finite log(tiny) in the posterior stream (unlike the
    natural pipeline's post-conversion -inf pads); exactness must survive
    because transition/initial pads stay -inf and pads sit at the highest
    natural indices (ties break low)."""
    from torbi_tpu.ops import band as band_ops

    monkeypatch.setattr(torbi_tpu, 'BAND_KERNEL_LAYOUT', 'stitched',
                        raising=False)
    monkeypatch.setattr(torbi_tpu, 'BAND_BATCH1_SPREAD', True,
                        raising=False)

    rng = np.random.default_rng(101)
    frames, states, halfwidth = 53, 200, 5  # pads to 256 (M=2)
    tiny = np.finfo(np.float32).tiny
    probs = rng.dirichlet(
        np.ones(states), size=(1, frames)).astype(np.float32)
    # Zero out some probabilities so real lanes hit log(tiny) exactly --
    # the same value the converted pad lanes take
    probs[0, ::7, states - 1] = 0.0
    probs /= probs.sum(axis=-1, keepdims=True)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    band = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (band / band.sum(axis=1, keepdims=True)).astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.array([frames], dtype=np.int32)

    assert band_ops.detect_band(jnp.asarray(trans))[1] > 0
    obs_eps = np.log(probs + tiny)
    expected = oracle.viterbi_numpy(obs_eps, bf, trans, init)
    got = np.asarray(dispatch_decode(
        jnp.asarray(np.log(probs)), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', apply_epsilon=True))
    np.testing.assert_array_equal(got, expected)
