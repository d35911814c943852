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
