"""Multi-device sharded decoding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torbi_tpu
from torbi_tpu.ops import oracle
from torbi_tpu.parallel import batch_mesh, decode_sharded
from torbi_tpu.parallel.files import shard_files


def _case(rng, batch, frames, states):
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    trans = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(
        rng.dirichlet(np.ones(states)).astype(np.float32) + tiny)
    bf = rng.integers(1, frames + 1, size=batch).astype(np.int32)
    bf[0] = frames
    return obs, bf, trans, init


def test_mesh_has_8_devices():
    mesh = batch_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize('backend', ['xla', 'pallas'])
def test_sharded_matches_oracle(backend):
    rng = np.random.default_rng(5)
    obs, bf, trans, init = _case(rng, batch=20, frames=15, states=12)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(decode_sharded(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend=backend))
    np.testing.assert_array_equal(got, expected)


def test_sharded_on_subset_mesh():
    rng = np.random.default_rng(6)
    obs, bf, trans, init = _case(rng, batch=6, frames=10, states=8)
    mesh = batch_mesh(n_devices=4)
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(decode_sharded(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), mesh=mesh, backend='xla'))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize('backend', ['xla', 'pallas'])
def test_auto_shard_default_path(backend):
    """dispatch.decode auto-shards over all local devices when the batch is
    large enough -- the production path, no explicit mesh anywhere"""
    from torbi_tpu.ops import dispatch

    rng = np.random.default_rng(8)
    batch = 8 * 8  # one BATCH_PAD_MULTIPLE group per device
    obs, bf, trans, init = _case(rng, batch=batch, frames=12, states=10)

    mesh_key = dispatch.resolve_mesh(None, batch)
    assert mesh_key is not None and len(mesh_key) == 8

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch.decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend=backend))
    np.testing.assert_array_equal(got, expected)


def test_auto_shard_band_kernel():
    """Auto-sharding composes with the banded fast path (each shard runs
    the band kernel; detection caches shared across shards)"""
    from torbi_tpu.ops import band as band_ops
    from torbi_tpu.ops import dispatch

    rng = np.random.default_rng(21)
    batch, frames, states, halfwidth = 64, 10, 24, 3
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, dtype=np.float32) + tiny)
    bf = np.full(batch, frames, dtype=np.int32)
    bf[3] = 2

    trans_j = jnp.asarray(trans)
    assert band_ops.detect_band(trans_j) is not None
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch.decode(
        jnp.asarray(obs), jnp.asarray(bf), trans_j, jnp.asarray(init),
        backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_auto_shard_with_prepadded_observation():
    """Pre-padded (lane-aligned) observations flow through the sharded
    dispatch path exactly"""
    from torbi_tpu.ops import dispatch

    rng = np.random.default_rng(33)
    batch, frames, states = 64, 8, 112  # pads to 128 lanes
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    padded = np.full(
        (batch, frames, dispatch.padded_states(states)), -np.inf,
        dtype=np.float32)
    padded[..., :states] = obs
    trans = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.full(batch, frames, dtype=np.int32)

    assert dispatch.resolve_mesh(None, batch) is not None
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch.decode(
        jnp.asarray(padded), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_auto_shard_declines_small_batches():
    from torbi_tpu.ops import dispatch

    assert dispatch.resolve_mesh(None, 7) is None
    assert dispatch.resolve_mesh(None, 15) is None  # one group only


def test_auto_shard_respects_config(monkeypatch):
    import torbi_tpu
    from torbi_tpu.ops import dispatch

    monkeypatch.setattr(torbi_tpu, 'AUTO_SHARD', False)
    assert dispatch.resolve_mesh(None, 512) is None


def test_sharded_build_is_cached():
    """Repeated sharded decodes of one shape bucket stage exactly once"""
    from torbi_tpu.ops import dispatch

    rng = np.random.default_rng(9)
    dispatch._build_decode.cache_clear()
    for _ in range(3):
        obs, bf, trans, init = _case(rng, batch=64, frames=12, states=10)
        expected = oracle.viterbi_numpy(obs, bf, trans, init)
        got = np.asarray(decode_sharded(
            jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
            jnp.asarray(init), backend='xla'))
        np.testing.assert_array_equal(got, expected)
    assert dispatch._build_decode.cache_info().misses == 1


def test_shard_files_round_robin():
    files = [f'in{i}' for i in range(10)]
    outs = [f'out{i}' for i in range(10)]
    seen = []
    for p in range(3):
        mine_in, mine_out = shard_files(
            files, outs, process_index=p, process_count=3)
        assert len(mine_in) == len(mine_out)
        seen += mine_in
    assert sorted(seen) == sorted(files)


def test_shard_files_length_aware():
    files = list(range(8))
    outs = list(range(8))
    lengths = [100, 1, 1, 1, 1, 1, 1, 95]
    shards = [
        shard_files(files, outs, process_index=p, process_count=2,
                    lengths=lengths)[0]
        for p in range(2)]
    # The two heavy files must land on different processes
    assert not (0 in shards[0] and 7 in shards[0])
    assert not (0 in shards[1] and 7 in shards[1])
    assert sorted(shards[0] + shards[1]) == files


def test_probe_lengths_npy_exact_and_bytes_fallback(tmp_path):
    from torbi_tpu.parallel.files import probe_lengths

    npy = tmp_path / 'a.npy'
    np.save(npy, np.zeros((37, 5), np.float32))
    npy2 = tmp_path / 'c.npy'
    np.save(npy2, np.zeros((11, 5), np.float32))
    # All-.npy corpus: exact frame counts from the headers
    assert probe_lengths([npy, npy2]) == [37, 11]
    # One unparseable file demotes the WHOLE corpus to byte sizes (one
    # unit per corpus; a frames/bytes mix would mis-weight LPT)
    other = tmp_path / 'b.pt'
    other.write_bytes(b'x' * 1234)
    lengths = probe_lengths([npy, other])
    assert lengths == [npy.stat().st_size, 1234]
    assert probe_lengths([tmp_path / 'missing.pt']) is None


def test_shard_files_balanced_heavy_tail(tmp_path):
    """Production path probes lengths itself: a heavy-tailed corpus (one
    10x file among short ones) balances within ~10% across two hosts,
    where round-robin would straggle one of them ~5x."""
    from torbi_tpu.parallel.files import shard_files_balanced

    frames = [4000] + [400] * 10
    files = []
    for i, n in enumerate(frames):
        file = tmp_path / f'{i}.npy'
        np.save(file, np.zeros((n, 8), np.float32))
        files.append(file)
    outs = [tmp_path / f'{i}.out' for i in range(len(files))]

    loads = []
    shards = []
    for p in range(2):
        mine_in, mine_out = shard_files_balanced(
            files, outs, process_index=p, process_count=2)
        assert len(mine_in) == len(mine_out)
        shards += mine_in
        loads.append(sum(frames[files.index(f)] for f in mine_in))
    assert sorted(shards) == sorted(files)
    assert max(loads) / min(loads) <= 1.1


def test_time_sharded_matches_oracle():
    """Exact sequence-sharded decode: one sequence's frame axis split over
    the 8-device mesh (associative max-plus scan + one all_gather)"""
    from torbi_tpu.parallel import batch_mesh, decode_time_sharded
    from torbi_tpu.ops import oracle

    rng = np.random.default_rng(13)
    frames, states = 64, 48
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=frames).astype(np.float32)
        + tiny)
    trans = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(
        rng.dirichlet(np.ones(states)).astype(np.float32) + tiny)

    expected = oracle.viterbi_numpy(
        obs[None], np.array([frames], dtype=np.int32), trans, init)[0]
    mesh = batch_mesh(n_devices=8)
    got = np.asarray(decode_time_sharded(
        jnp.asarray(obs), jnp.asarray(trans), jnp.asarray(init), mesh=mesh))
    np.testing.assert_array_equal(got, expected)


def test_time_sharded_frames_not_divisible():
    from torbi_tpu.parallel import batch_mesh, decode_time_sharded

    mesh = batch_mesh(n_devices=8)
    obs = jnp.zeros((10, 4), jnp.float32)
    trans = jnp.zeros((4, 4), jnp.float32)
    init = jnp.zeros((4,), jnp.float32)
    with pytest.raises(ValueError):
        decode_time_sharded(obs, trans, init, mesh=mesh)


def test_auto_shard_packed_observation():
    """A mod-M PACKED observation (the file workload's layout) flows
    through the sharded dispatch path -- obs sharded on its batch AXIS 1
    (P(None, 'batch')) -- bitwise exactly, incl. a padded final shard"""
    from torbi_tpu.ops import dispatch

    rng = np.random.default_rng(41)
    batch, frames, states, halfwidth = 60, 8, 240, 5  # batch pads to 64
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    states_p = dispatch.padded_states(states)
    assert states_p == 256
    padded = np.full((batch, frames, states_p), -np.inf, np.float32)
    padded[..., :states] = obs
    packed = dispatch.pack_observation(padded)

    xx, yy = np.meshgrid(np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    trans = np.log(
        (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32) + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = np.full(batch, frames, dtype=np.int32)
    bf[5] = 3

    assert dispatch.resolve_mesh(None, batch) is not None
    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch.decode(
        jnp.asarray(packed), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)


def test_auto_shard_constant_transition():
    """Auto-sharding composes with the full-XLA constant-transition decode
    (no kernels, no posterior stream): the parallel passes and the scalar
    scan run inside shard_map with per-shard batch_frames"""
    from torbi_tpu.ops import band as band_ops
    from torbi_tpu.ops import dispatch

    rng = np.random.default_rng(33)
    batch, frames, states = 64, 15, 30
    tiny = np.finfo(np.float32).tiny
    obs = np.log(
        rng.dirichlet(np.ones(states), size=(batch, frames))
        .astype(np.float32) + tiny)
    trans = np.full(
        (states, states), np.float32(np.log(1.0 / states)), np.float32)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    bf = rng.integers(1, frames + 1, size=batch).astype(np.int32)
    bf[0] = frames

    assert band_ops.detect_band(jnp.asarray(trans)) is not None
    assert dispatch.resolve_mesh(None, batch) is not None

    expected = oracle.viterbi_numpy(obs, bf, trans, init)
    got = np.asarray(dispatch.decode(
        jnp.asarray(obs), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    np.testing.assert_array_equal(got, expected)
