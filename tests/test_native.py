"""Native (C++) batch loader tests."""
import numpy as np
import pytest

import torbi_tpu
from torbi_tpu.data import native
from torbi_tpu.data.loader import loader

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native loader toolchain unavailable')


def _write(tmp_path, name, frames, states, rng):
    array = rng.normal(size=(frames, states)).astype(np.float32)
    np.save(tmp_path / name, array)
    return tmp_path / f'{name}.npy', array


def test_probe(tmp_path):
    rng = np.random.default_rng(0)
    file, array = _write(tmp_path, 'a', 17, 5, rng)
    assert native.probe(file) == (17, 5)


def test_load_batch_pads_and_matches(tmp_path):
    rng = np.random.default_rng(1)
    file_a, array_a = _write(tmp_path, 'a', 10, 6, rng)
    file_b, array_b = _write(tmp_path, 'b', 4, 6, rng)
    result = native.load_batch([file_a, file_b], 10, 6, num_threads=2)
    assert result is not None
    observation, frames = result
    assert observation.shape == (2, 10, 6)
    assert frames.tolist() == [10, 4]
    np.testing.assert_array_equal(observation[0], array_a)
    np.testing.assert_array_equal(observation[1, :4], array_b)
    assert (observation[1, 4:] == 0).all()


def test_native_loader_used_and_correct(tmp_path):
    rng = np.random.default_rng(2)
    files, arrays = [], []
    for i, frames in enumerate([8, 3, 12, 5]):
        file, array = _write(tmp_path, f'x{i}', frames, 7, rng)
        files.append(file)
        arrays.append(array)
    old = torbi_tpu.BATCH_SIZE
    torbi_tpu.BATCH_SIZE = 3
    try:
        data_loader = loader(files)
        from torbi_tpu.data.loader import NativeDataLoader
        assert isinstance(data_loader, NativeDataLoader)
        batches = list(data_loader)
    finally:
        torbi_tpu.BATCH_SIZE = old
    assert len(batches) == 2
    from torbi_tpu.ops.dispatch import bucket_frames

    # Batches are length-sorted so rows pad to similar maxima: the three
    # short files [3, 5, 8] share one batch (bucket 8, not 16) and the
    # 12-frame file rides alone
    obs, frames, chunks, names = batches[0]
    assert obs.shape == (3, bucket_frames(8), 7)
    assert frames.tolist() == [3, 5, 8]
    by_name = {str(f): a for f, a in zip(files, arrays)}
    for row, name, n in zip(obs, names, frames.tolist()):
        np.testing.assert_array_equal(row[:n], by_name[str(name)])
        assert (row[n:] == 0).all()
    obs1, frames1, _, names1 = batches[1]
    assert frames1.tolist() == [12]
    np.testing.assert_array_equal(obs1[0, :12], by_name[str(names1[0])])


def test_pt_files_fall_back_to_python(tmp_path):
    from torbi_tpu.utils import io
    rng = np.random.default_rng(3)
    file = tmp_path / 'a.pt'
    io.save(rng.normal(size=(5, 4)).astype(np.float32), file)
    data_loader = loader([file])
    from torbi_tpu.data.loader import DataLoader
    assert isinstance(data_loader, DataLoader)


def test_probe_rejects_batched_npy(tmp_path):
    """A 3-D (batch-leading) .npy must be rejected, not silently misread
    as its first two dims"""
    from torbi_tpu.data import native

    if not native.available():
        pytest.skip('native loader unavailable')
    path = tmp_path / 'batched.npy'
    np.save(path, np.zeros((1, 16, 8), dtype=np.float32))
    assert native.probe(str(path)) is None

    path1d = tmp_path / 'flat.npy'
    np.save(path1d, np.zeros(16, dtype=np.float32))
    assert native.probe(str(path1d)) is None


def test_padded_states_pipeline_end_to_end(tmp_path):
    """states=112 pads to 128 lanes at load time (tile-aligned transfers);
    the native batch carries -inf lanes and decodes exactly"""
    import jax.numpy as jnp
    from torbi_tpu.ops import oracle
    from torbi_tpu.ops.dispatch import decode, padded_states

    states = 112
    assert padded_states(states) == 128
    rng = np.random.default_rng(9)
    tiny = np.finfo(np.float32).tiny
    files, arrays = [], []
    for i, frames in enumerate([9, 14]):
        obs = np.log(
            rng.dirichlet(np.ones(states), size=frames).astype(np.float32)
            + tiny)
        path = tmp_path / f'p{i}.npy'
        np.save(path, obs)
        files.append(path)
        arrays.append(obs)

    data_loader = loader(files, pad_value=float('-inf'))
    from torbi_tpu.data.loader import NativeDataLoader
    assert isinstance(data_loader, NativeDataLoader)
    (obs_batch, bf, _, names), = list(data_loader)
    assert obs_batch.shape[-1] == 128
    assert np.isneginf(obs_batch[0, 0, states:]).all()

    trans = np.log(
        rng.dirichlet(np.ones(states), size=states).astype(np.float32)
        + tiny)
    init = np.log(np.full(states, 1.0 / states, np.float32) + tiny)
    by_name = {str(f): a for f, a in zip(files, arrays)}
    expected_rows = [
        oracle.viterbi_numpy(
            by_name[str(name)][None], np.array([n]), trans, init)[0]
        for name, n in zip(names, bf.tolist())]

    got = np.asarray(decode(
        jnp.asarray(obs_batch), jnp.asarray(bf), jnp.asarray(trans),
        jnp.asarray(init), backend='pallas', finite_observation=True))
    for row, n, expected in zip(got, bf.tolist(), expected_rows):
        np.testing.assert_array_equal(row[:n], expected)


def test_padded_states_collate(tmp_path):
    """The python collate path pads states the same way"""
    from torbi_tpu.data.collate import collate
    from torbi_tpu.ops.dispatch import padded_states

    rng = np.random.default_rng(10)
    states = 240  # pads to 256 (within the waste threshold)
    assert padded_states(states) == 256
    assert padded_states(200) == 200  # >25% waste: skipped
    rows = [rng.normal(size=(f, states)).astype(np.float32) for f in (5, 9)]
    obs, bf, chunks, names = collate(
        [(rows[0], 'a'), (rows[1], 'b')], pad_value=float('-inf'))
    assert obs.shape[-1] == 256
    assert np.isneginf(obs[0, 0, states:]).all()
    np.testing.assert_array_equal(obs[1, :9, :states], rows[1])
    assert (obs[0, 5:, :states] == 0).all()


def test_load_batch_packed_matches_pack_observation(tmp_path):
    """The C++ packed writer produces bitwise pack_observation(natural)"""
    from torbi_tpu.ops.dispatch import pack_observation, padded_states

    rng = np.random.default_rng(5)
    states = 240
    states_p = padded_states(states)
    assert states_p == 256
    file_a, _ = _write(tmp_path, 'pa', 10, states, rng)
    file_b, _ = _write(tmp_path, 'pb', 4, states, rng)

    natural = native.load_batch(
        [file_a, file_b], 16, states, num_threads=2,
        padded_states=states_p, pad_value=float('-inf'))
    packed = native.load_batch(
        [file_a, file_b], 16, states, num_threads=2,
        padded_states=states_p, pad_value=float('-inf'), pack=True)
    assert natural is not None and packed is not None
    obs_n, frames_n = natural
    obs_p, frames_p = packed
    assert obs_p.shape == (states_p // 128, 2, 16, 128)
    np.testing.assert_array_equal(frames_p, frames_n)
    np.testing.assert_array_equal(obs_p, pack_observation(obs_n))


def test_load_batch_packed_rejects_unpadded(tmp_path):
    """pack=True needs a 128-multiple padded_states; callers fall back"""
    rng = np.random.default_rng(6)
    file_a, _ = _write(tmp_path, 'pr', 3, 6, rng)
    assert native.load_batch(
        [file_a], 4, 6, padded_states=6, pack=True) is None


def test_native_loader_splits_batches_at_bucket_boundaries(tmp_path):
    """Length-sorted batches split where the frame bucket steps up (rows
    pad only to their own bucket -- the files-device throughput fix), but
    sliver segments under one batch tile absorb the next bucket instead"""
    rng = np.random.default_rng(5)
    from torbi_tpu.data.loader import NativeDataLoader

    # 9 short files (bucket 8) + 3 long (bucket 32): the short run is a
    # full tile, so it forms its own batch instead of padding to 32
    files = []
    for i, frames in enumerate([5] * 9 + [30] * 3):
        file, _ = _write(tmp_path, f's{i}', frames, 7, rng)
        files.append(file)
    old = torbi_tpu.BATCH_SIZE
    old_split = torbi_tpu.LOADER_SPLIT_MIN_ROWS
    torbi_tpu.BATCH_SIZE = 64
    torbi_tpu.LOADER_SPLIT_MIN_ROWS = 8
    try:
        batches = list(loader(files))
        assert [obs.shape[:2] for obs, *_ in batches] == [(9, 8), (3, 32)]
        total = sorted(
            int(n) for _, frames, _, _ in batches for n in frames.tolist())
        assert total == sorted([5] * 9 + [30] * 3)

        # 3 short + 9 long: the 3-file sliver absorbs into one batch
        sliver = files[6:]  # 3 short + 3 long
        data_loader = loader(sliver)
        assert isinstance(data_loader, NativeDataLoader)
        batches = list(data_loader)
        assert [obs.shape[:2] for obs, *_ in batches] == [(6, 32)]
    finally:
        torbi_tpu.BATCH_SIZE = old
        torbi_tpu.LOADER_SPLIT_MIN_ROWS = old_split


def test_native_loader_pow2_subdivision(tmp_path):
    """A segment whose row count would pad far up (82 -> 128) subdivides
    into power-of-two loads (64 + 16 + 2); counts already at their padded
    size stay whole"""
    from torbi_tpu.data.loader import NativeDataLoader

    rng = np.random.default_rng(6)
    files = []
    for i in range(19):  # one bucket, 19 rows: 19 -> 32 pad vs 16 + 8
        file, _ = _write(tmp_path, f'p{i}', 5 + (i % 3), 4, rng)
        files.append(file)
    old = torbi_tpu.BATCH_SIZE
    old_split = torbi_tpu.LOADER_SPLIT_MIN_ROWS
    torbi_tpu.BATCH_SIZE = 64
    torbi_tpu.LOADER_SPLIT_MIN_ROWS = 8
    try:
        batches = list(loader(files))
    finally:
        torbi_tpu.BATCH_SIZE = old
        torbi_tpu.LOADER_SPLIT_MIN_ROWS = old_split
    assert [obs.shape[0] for obs, *_ in batches] == [16, 3]
    total = sorted(
        int(n) for _, frames, _, _ in batches for n in frames.tolist())
    assert len(total) == 19


def test_native_loader_default_policy_keeps_mixed_batches(tmp_path):
    """LOADER_SPLIT_MIN_ROWS=None (the shipped default, tuned for the
    per-call dispatch cost -- config/defaults.py): one mixed batch per
    BATCH_SIZE, no bucket splitting"""
    rng = np.random.default_rng(7)
    files = []
    for i, frames in enumerate([5] * 9 + [30] * 3):
        file, _ = _write(tmp_path, f'd{i}', frames, 4, rng)
        files.append(file)
    old = torbi_tpu.BATCH_SIZE
    torbi_tpu.BATCH_SIZE = 64
    try:
        assert torbi_tpu.LOADER_SPLIT_MIN_ROWS is None
        batches = list(loader(files))
    finally:
        torbi_tpu.BATCH_SIZE = old
    assert [obs.shape[:2] for obs, *_ in batches] == [(12, 32)]
