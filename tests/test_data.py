"""Data pipeline tests: collate/separate, dataset, loader, file APIs."""
import numpy as np
import pytest

import torbi_tpu
from torbi_tpu.data import collate, separate
from torbi_tpu.utils import io


def test_collate_pads_and_records_frames():
    from torbi_tpu.ops.dispatch import bucket_frames

    obs = [np.ones((5, 4), np.float32), np.ones((3, 4), np.float32)]
    batch = [(obs[0], 'a.pt'), (obs[1], 'b.pt')]
    observation, batch_frames, batch_chunks, files = collate(batch)
    # Frames pad straight to the decode bucket boundary
    assert observation.shape == (2, bucket_frames(5), 4)
    assert batch_frames.tolist() == [5, 3]
    assert batch_chunks == [1, 1]
    assert (observation[1, 3:] == 0).all()
    assert files == ('a.pt', 'b.pt')


def test_collate_chunked_and_separate():
    chunks_a = [np.full((4, 3), 1.0), np.full((2, 3), 2.0)]
    chunks_b = [np.full((3, 3), 3.0)]
    batch = [(chunks_a, 'a.pt'), (chunks_b, 'b.pt')]
    observation, batch_frames, batch_chunks, files = collate(batch)
    from torbi_tpu.ops.dispatch import bucket_frames
    padded_frames = bucket_frames(4)
    assert observation.shape == (3, padded_frames, 3)
    assert batch_frames.tolist() == [4, 2, 3]
    assert batch_chunks == [2, 1]

    # Fake decoded indices: row index everywhere
    indices = np.tile(
        np.arange(3)[:, None], (1, padded_frames)).astype(np.int32)
    joined = separate(indices, batch_chunks, batch_frames)
    assert len(joined) == 2
    np.testing.assert_array_equal(joined[0], [0, 0, 0, 0, 1, 1])
    np.testing.assert_array_equal(joined[1], [2, 2, 2])


@pytest.mark.parametrize('suffix', ['.pt', '.npy'])
def test_io_roundtrip(tmp_path, suffix):
    array = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32)
    file = tmp_path / f'x{suffix}'
    io.save(array, file)
    np.testing.assert_array_equal(io.load(file), array)


def test_from_file_to_file(tmp_path):
    rng = np.random.default_rng(0)
    states, frames = 8, 20
    obs = np.log(
        rng.dirichlet(np.ones(states), size=frames).astype(np.float32))
    input_file = tmp_path / 'obs.pt'
    output_file = tmp_path / 'out.pt'
    io.save(obs, input_file)
    torbi_tpu.from_file_to_file(input_file, output_file, log_probs=True)
    decoded = io.load(output_file)
    expected = np.asarray(
        torbi_tpu.from_probabilities(obs[None], log_probs=True))[0]
    np.testing.assert_array_equal(decoded, expected)


def test_from_files_to_files(tmp_path):
    rng = np.random.default_rng(1)
    states = 8
    input_files, output_files, lengths = [], [], [12, 30, 7]
    for i, frames in enumerate(lengths):
        obs = np.log(
            rng.dirichlet(np.ones(states), size=frames).astype(np.float32))
        file = tmp_path / f'obs{i}.pt'
        io.save(obs, file)
        input_files.append(file)
        output_files.append(tmp_path / f'out{i}.pt')

    torbi_tpu.from_files_to_files(input_files, output_files, log_probs=True)

    for input_file, output_file, frames in zip(
            input_files, output_files, lengths):
        decoded = io.load(output_file)
        assert decoded.shape == (frames,)
        obs = io.load(input_file)
        expected = np.asarray(
            torbi_tpu.from_probabilities(obs[None], log_probs=True))[0]
        np.testing.assert_array_equal(decoded, expected)


def test_from_files_to_files_chunked(tmp_path):
    """Chunked file decoding re-joins chunk rows per file"""
    rng = np.random.default_rng(2)
    states = 8
    obs = np.log(
        rng.dirichlet(np.ones(states), size=64).astype(np.float32))
    input_file = tmp_path / 'obs.pt'
    output_file = tmp_path / 'out.pt'
    io.save(obs, input_file)

    old = torbi_tpu.MIN_CHUNK_SIZE
    torbi_tpu.MIN_CHUNK_SIZE = 8
    torbi_tpu.ENTROPY_THRESHOLD = 2.0  # split aggressively
    try:
        torbi_tpu.from_files_to_files(
            [input_file], [output_file], log_probs=True)
    finally:
        torbi_tpu.MIN_CHUNK_SIZE = old
        torbi_tpu.ENTROPY_THRESHOLD = 0.5
    decoded = io.load(output_file)
    assert decoded.shape == (64,)


def test_loader_prefetch(tmp_path):
    rng = np.random.default_rng(3)
    files = []
    for i in range(5):
        file = tmp_path / f'{i}.pt'
        io.save(rng.normal(size=(4, 3)).astype(np.float32), file)
        files.append(file)
    old_workers, old_batch = torbi_tpu.NUM_WORKERS, torbi_tpu.BATCH_SIZE
    torbi_tpu.NUM_WORKERS, torbi_tpu.BATCH_SIZE = 2, 2
    try:
        loader = torbi_tpu.data.loader(files)
        batches = list(loader)
    finally:
        torbi_tpu.NUM_WORKERS, torbi_tpu.BATCH_SIZE = old_workers, old_batch
    from torbi_tpu.ops.dispatch import bucket_frames
    assert len(batches) == 3
    assert batches[0][0].shape == (2, bucket_frames(4), 3)
    assert batches[2][0].shape == (1, bucket_frames(4), 3)


def _banded_transition(states, halfwidth=4):
    """Benchmark-style banded probability transition (finite log floor
    after log(p + tiny), so the band kernels gate in)"""
    xx, yy = np.meshgrid(
        np.arange(states), np.arange(states), indexing='ij')
    trans = np.clip(halfwidth + 1.0 - np.abs(xx - yy), 0, None)
    return (trans / trans.sum(axis=1, keepdims=True)).astype(np.float32)


def test_collate_pack_matches_pack_observation():
    """pack=True builds the mod-M layout bitwise identical to packing the
    natural collate output"""
    from torbi_tpu.ops.dispatch import pack_observation, padded_states

    rng = np.random.default_rng(7)
    states = 240  # padded_states -> 256: two mod-M blocks
    assert padded_states(states) == 256
    batch = [
        (rng.normal(size=(n, states)).astype(np.float32), f'{i}.pt')
        for i, n in enumerate([12, 5, 9])]

    natural, frames_n, chunks_n, files_n = collate(batch)
    packed, frames_p, chunks_p, files_p = collate(batch, pack=True)
    assert packed.shape == (2, 3, natural.shape[1], 128)
    np.testing.assert_array_equal(frames_p, frames_n)
    assert chunks_p == chunks_n and files_p == files_n
    np.testing.assert_array_equal(packed, pack_observation(natural))


def test_collate_pack_falls_back_for_unpadded_states():
    """State counts that skip lane padding (waste guard) collate naturally
    even with pack=True"""
    obs = [np.ones((5, 4), np.float32)]
    observation, _, _, _ = collate([(obs[0], 'a.pt')], pack=True)
    assert observation.ndim == 3


def test_pack_eligible_mirrors_dispatch():
    from torbi_tpu.core import _pack_eligible

    states = 96
    trans = _banded_transition(states)
    # Uniform (None) transition: width-0 fast path, not packable
    assert not _pack_eligible(None, None, False, 'band')
    # Banded transition through the stitched band backend: packable
    assert _pack_eligible(trans, None, False, 'band')
    # Same transition on the xla backend: not packable
    assert not _pack_eligible(trans, None, False, 'xla')
    # Non-stitched layout: not packable
    old = torbi_tpu.BAND_KERNEL_LAYOUT
    torbi_tpu.BAND_KERNEL_LAYOUT = 'rolled'
    try:
        assert not _pack_eligible(trans, None, False, 'band')
    finally:
        torbi_tpu.BAND_KERNEL_LAYOUT = old


def test_from_files_to_files_packed(tmp_path):
    """The packed file workload (banded transition, stitched layout)
    matches the natural-layout decode exactly"""
    from torbi_tpu.core import _pack_eligible

    rng = np.random.default_rng(11)
    states = 240
    trans_prob = _banded_transition(states)
    trans_file = tmp_path / 'transition.npy'
    np.save(trans_file, trans_prob)

    input_files, output_files, lengths = [], [], [12, 30, 7]
    for i, frames in enumerate(lengths):
        obs = rng.dirichlet(np.ones(states), size=frames).astype(np.float32)
        file = tmp_path / f'obs{i}.npy'
        np.save(file, obs)
        input_files.append(file)
        output_files.append(tmp_path / f'out{i}.npy')

    old = torbi_tpu.BACKEND
    torbi_tpu.BACKEND = 'band'
    try:
        # Exactly the tuple from_files_to_files computes internally
        assert _pack_eligible(jnp_asarray(trans_prob), None, False, None)
        torbi_tpu.from_files_to_files(
            input_files, output_files,
            transition_file=trans_file, log_probs=False)
        for input_file, output_file, frames in zip(
                input_files, output_files, lengths):
            decoded = io.load(output_file)
            assert decoded.shape == (frames,)
            expected = np.asarray(torbi_tpu.from_probabilities(
                io.load(input_file)[None], transition=trans_prob,
                log_probs=False))[0]
            np.testing.assert_array_equal(decoded, expected)
    finally:
        torbi_tpu.BACKEND = old


def jnp_asarray(array):
    import jax.numpy as jnp
    return jnp.asarray(array)


def test_from_files_to_files_packed_chunked(tmp_path):
    """Entropy-chunked rows flow through the packed collate path too:
    chunked + packed decode matches the unchunked natural decode on a
    near-deterministic observation (splits land where decoding is
    locally forced, reference chunking semantics)"""
    rng = np.random.default_rng(19)
    states = 240
    trans_prob = _banded_transition(states)
    trans_file = tmp_path / 'transition.npy'
    np.save(trans_file, trans_prob)

    # Peaked observation along an in-band random walk: decoding is locally
    # forced to the planted path, so entropy chunking (approximate by
    # design) cannot change it
    steps = rng.integers(-2, 3, size=48)
    path = np.clip(np.cumsum(steps) + states // 2, 0, states - 1)
    obs = np.full((48, states), 1e-6, dtype=np.float32)
    obs[np.arange(48), path] = 1.0
    obs /= obs.sum(axis=1, keepdims=True)
    input_file = tmp_path / 'obs.npy'
    output_file = tmp_path / 'out.npy'
    np.save(input_file, obs)

    expected = np.asarray(torbi_tpu.from_probabilities(
        obs[None], transition=trans_prob, log_probs=False))[0]

    old_backend = torbi_tpu.BACKEND
    old_chunk = torbi_tpu.MIN_CHUNK_SIZE
    torbi_tpu.BACKEND = 'band'
    torbi_tpu.MIN_CHUNK_SIZE = 8
    try:
        torbi_tpu.from_files_to_files(
            [input_file], [output_file], transition_file=trans_file,
            log_probs=False)
    finally:
        torbi_tpu.BACKEND = old_backend
        torbi_tpu.MIN_CHUNK_SIZE = old_chunk
    decoded = io.load(output_file)
    np.testing.assert_array_equal(decoded, expected)


def test_pack_observation_jax_input_matches_numpy():
    """pack_observation handles live jax arrays (device-side packing for
    callers that already transferred) identically to the numpy path"""
    import jax.numpy as jnp

    from torbi_tpu import pack_observation

    rng = np.random.default_rng(29)
    natural = rng.normal(size=(3, 5, 256)).astype(np.float32)
    via_numpy = pack_observation(natural)
    via_jax = np.asarray(pack_observation(jnp.asarray(natural)))
    np.testing.assert_array_equal(via_jax, via_numpy)
    with pytest.raises(ValueError):
        pack_observation(natural[..., :200])  # not lane-padded
