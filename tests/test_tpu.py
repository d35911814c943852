"""Real-TPU checks; skipped automatically off-TPU.

The CPU suite exercises the kernels in Pallas interpreter mode; these run
the same bit-exactness contracts through the actual Mosaic lowering,
including the headline 1440-state pitch configuration.

Run on a TPU host with:
    TORBI_TPU_TESTS_ON_TPU=1 python -m pytest tests/test_tpu.py -q
(conftest.py forces the CPU backend unless that variable is set).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != 'tpu', reason='needs a real TPU backend')


@requires_tpu
def test_toy_decode_tpu():
    import torch
    import torbi_tpu

    observation = torch.tensor([[
        [0.25, 0.5, 0.25],
        [0.25, 0.25, 0.5],
        [0.33, 0.33, 0.33]]])
    transition = torch.tensor([
        [0.5, 0.25, 0.25],
        [0.33, 0.34, 0.33],
        [0.25, 0.25, 0.5]])
    initial = torch.tensor([0.4, 0.35, 0.25])
    bins = torbi_tpu.from_probabilities(
        observation=observation,
        transition=transition,
        initial=initial,
        log_probs=False)
    assert np.asarray(bins).tolist() == [[1, 2, 2]]


@requires_tpu
def test_pitch_1440_states_matches_oracle():
    """The headline benchmark configuration, bit-exact vs the oracle"""
    from torbi_tpu.models import pitch
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import decode

    rng = np.random.default_rng(3)
    tiny = np.finfo(np.float32).tiny
    batch, frames, states = 8, 64, 1440

    centers = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(batch, frames)), axis=1) + 720,
        0, states - 1)
    bins = np.arange(states, dtype=np.float32)[None, None, :]
    logits = -0.5 * (
        (bins - centers[..., None].astype(np.float32)) / 2.5) ** 2
    obs = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
    obs = np.log(np.exp(obs.astype(np.float32)) + tiny)

    trans = np.log(pitch.transition_matrix() + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.full(batch, frames, dtype=np.int32)
    bf[1] = 1
    bf[2] = frames - 11

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


@requires_tpu
def test_dense_random_matches_oracle_tpu():
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import decode

    rng = np.random.default_rng(8)
    tiny = np.finfo(np.float32).tiny
    batch, frames, states = 4, 50, 96
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    trans = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.array([frames, frames - 7, 1, frames], dtype=np.int32)

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


@requires_tpu
def test_constant_transition_fast_path_tpu():
    """The width-0 floor-band fast path (uniform default transition)
    through the real Mosaic lowering"""
    from torbi_tpu.ops import band as band_ops
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import decode

    rng = np.random.default_rng(11)
    tiny = np.finfo(np.float32).tiny
    batch, frames, states = 4, 40, 200
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    trans = np.full(
        (states, states), np.float32(np.log(1.0 / states)), dtype=np.float32)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.array([frames, frames - 13, 1, frames], dtype=np.int32)

    assert band_ops.detect_band(jnp.asarray(trans)) == (
        0, 0, float(np.float32(np.log(1.0 / states))))
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


@requires_tpu
def test_packed_pitch_matches_oracle_tpu():
    """The production hot path through real Mosaic: mod-M PACKED
    observation -> stitched forward (raw12) -> mod-M backtrace, bit-exact
    vs the oracle (the CPU suite covers this in interpreter mode via
    tests/test_parity.py::test_packed_observation_matches_natural)."""
    from torbi_tpu.models import pitch
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import decode, padded_states

    rng = np.random.default_rng(23)
    tiny = np.finfo(np.float32).tiny
    batch, frames, states = 8, 64, 1440

    centers = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(batch, frames)), axis=1) + 720,
        0, states - 1)
    bins = np.arange(states, dtype=np.float32)[None, None, :]
    logits = -0.5 * (
        (bins - centers[..., None].astype(np.float32)) / 2.5) ** 2
    obs = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
    obs = np.log(np.exp(obs.astype(np.float32)) + tiny)

    trans = np.log(pitch.transition_matrix() + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.full(batch, frames, dtype=np.int32)
    bf[3] = 1
    bf[5] = frames - 9

    from torbi_tpu.ops.dispatch import pack_observation
    states_p = padded_states(states)
    padded = np.full((batch, frames, states_p), -np.inf, dtype=np.float32)
    padded[..., :states] = obs
    packed = pack_observation(padded)

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(decode(
        jnp.asarray(packed), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


@requires_tpu
def test_file_workload_end_to_end_tpu(tmp_path):
    """from_files_to_files on the real chip: native loader (lane-padded
    batch), band kernel, saves -- decoded files match the oracle"""
    import torbi_tpu
    from torbi_tpu.models import pitch
    from torbi_tpu.ops import oracle

    rng = np.random.default_rng(17)
    tiny = np.finfo(np.float32).tiny
    states = 1440
    trans_path = tmp_path / 'transition.npy'
    np.save(trans_path, pitch.transition_matrix())

    inputs, outputs, obs_by_file = [], [], {}
    for i, frames in enumerate((40, 57, 33)):
        centers = np.clip(
            np.cumsum(rng.integers(-3, 4, size=frames)) + 720,
            0, states - 1)
        bins = np.arange(states, dtype=np.float32)[None, :]
        logits = -0.5 * (
            (bins - centers[:, None].astype(np.float32)) / 2.5) ** 2
        row = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
        obs = np.log(np.exp(row.astype(np.float32)) + tiny)
        path = tmp_path / f'{i}.npy'
        np.save(path, obs)
        inputs.append(path)
        outputs.append(tmp_path / f'{i}_out.npy')
        obs_by_file[str(path)] = obs

    torbi_tpu.from_files_to_files(
        inputs, outputs, transition_file=trans_path, log_probs=True)

    log_trans = np.log(pitch.transition_matrix() + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    for infile, outfile in zip(inputs, outputs):
        obs = obs_by_file[str(infile)]
        eps_obs = np.log(np.exp(obs) + tiny)
        expected = oracle.viterbi_numpy(
            eps_obs[None], np.array([obs.shape[0]]), log_trans, init)[0]
        got = np.load(outfile)
        np.testing.assert_array_equal(got, expected, err_msg=str(infile))


@requires_tpu
def test_batch1_spread_pitch_matches_oracle_tpu(monkeypatch):
    """The batch-1 spread kernel (BAND_BATCH1_SPREAD) and the real_batch=1
    backtrace load elision through real Mosaic lowering, at the pitch
    configuration, bit-exact vs the oracle. Also decodes with the default
    (stitched) batch-1 path for agreement between the two."""
    import torbi_tpu
    from torbi_tpu.models import pitch
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import decode

    rng = np.random.default_rng(29)
    tiny = np.finfo(np.float32).tiny
    frames, states = 64, 1440

    centers = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(1, frames)), axis=1) + 720,
        0, states - 1)
    bins = np.arange(states, dtype=np.float32)[None, None, :]
    logits = -0.5 * (
        (bins - centers[..., None].astype(np.float32)) / 2.5) ** 2
    obs = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
    obs = np.log(np.exp(obs.astype(np.float32)) + tiny)

    trans = np.log(pitch.transition_matrix() + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.array([frames], dtype=np.int32)

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got_default = np.asarray(decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got_default, expected)

    monkeypatch.setattr(torbi_tpu, 'BAND_BATCH1_SPREAD', True,
                        raising=False)
    got_spread = np.asarray(decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got_spread, expected)


@requires_tpu
@pytest.mark.parametrize('spread', [False, True])
def test_batch1_window_backtrace_matches_oracle_tpu(monkeypatch, spread):
    """The batch-1 band-windowed backtrace (BACKTRACE_BATCH1_WINDOW)
    through real Mosaic lowering -- dynamic sublane-slice loads of the
    natural-major stream -- at the pitch configuration, with the spread
    forward both off and on, incl. a frozen padded tail."""
    import torbi_tpu
    from torbi_tpu.models import pitch
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import decode

    rng = np.random.default_rng(31)
    tiny = np.finfo(np.float32).tiny
    frames, states = 57, 1440  # buckets to 64; frozen tail

    centers = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(1, 64)), axis=1) + 720,
        0, states - 1)
    bins = np.arange(states, dtype=np.float32)[None, None, :]
    logits = -0.5 * (
        (bins - centers[..., None].astype(np.float32)) / 2.5) ** 2
    obs = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
    obs = np.log(np.exp(obs.astype(np.float32)) + tiny)[:, :frames]

    trans = np.log(pitch.transition_matrix() + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.array([frames - 5], dtype=np.int32)

    monkeypatch.setattr(torbi_tpu, 'BAND_BATCH1_SPREAD', spread,
                        raising=False)
    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_WINDOW', True,
                        raising=False)
    # The fused chase (default on) takes precedence; disable it so this
    # test keeps covering the windowed kernel's Mosaic lowering
    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_FUSED', False,
                        raising=False)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


@requires_tpu
@pytest.mark.parametrize('spread', [False, True])
def test_batch1_fused_chase_matches_oracle_tpu(monkeypatch, spread):
    """The batch-1 fused single-row chase (BACKTRACE_BATCH1_FUSED, the
    production default) through real Mosaic lowering -- SMEM chase index,
    in-register dynamic transition-row loads, native two-tree reductions
    -- at the pitch configuration, with the spread forward both off and
    on, incl. a frozen padded tail."""
    import torbi_tpu
    from torbi_tpu.models import pitch
    from torbi_tpu.ops import backtrace as bt
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import decode

    rng = np.random.default_rng(37)
    tiny = np.finfo(np.float32).tiny
    frames, states = 57, 1440  # buckets to 64; frozen tail

    centers = np.clip(
        np.cumsum(rng.integers(-4, 5, size=(1, 64)), axis=1) + 720,
        0, states - 1)
    bins = np.arange(states, dtype=np.float32)[None, None, :]
    logits = -0.5 * (
        (bins - centers[..., None].astype(np.float32)) / 2.5) ** 2
    obs = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
    obs = np.log(np.exp(obs.astype(np.float32)) + tiny)[:, :frames]

    trans = np.log(pitch.transition_matrix() + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.array([frames - 5], dtype=np.int32)

    monkeypatch.setattr(torbi_tpu, 'BAND_BATCH1_SPREAD', spread,
                        raising=False)
    monkeypatch.setattr(torbi_tpu, 'BACKTRACE_BATCH1_FUSED', True,
                        raising=False)
    calls = []
    orig = bt._build_backtrace12_fused1

    def spy(*args, **kwargs):
        calls.append(args)
        return orig(*args, **kwargs)
    monkeypatch.setattr(bt, '_build_backtrace12_fused1', spy)
    # The staged-pipeline builder may have traced this exact shape in an
    # earlier test (the spy only fires at trace time); force a re-trace
    from torbi_tpu.ops import dispatch
    dispatch._build_decode.cache_clear()

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)
    assert calls, 'fused chase did not engage'
