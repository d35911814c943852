"""Chunking tests (the reference has none; SURVEY.md section 4)."""
import numpy as np

import torbi_tpu
# torbi_tpu.chunk (the attribute) is the function, mirroring the reference's
# shadowing; import the module members directly
from torbi_tpu.chunk import entropy, split


def peaked_frame(states, index, peak=0.999):
    frame = np.full(states, (1 - peak) / (states - 1), dtype=np.float32)
    frame[index] = peak
    return np.log(frame)


def uniform_frame(states):
    return np.log(np.full(states, 1.0 / states, dtype=np.float32))


def test_entropy():
    states = 16
    obs = np.stack(
        [uniform_frame(states), peaked_frame(states, 3)]).T  # (states, 2)
    values = entropy(obs)
    assert values[0] > 0.99  # uniform -> normalized entropy ~1
    assert values[1] < 0.5   # peaked -> low entropy


def test_split_points():
    states = 16
    frames = []
    # 10 uniform frames, 2 adjacent peaked (low-entropy) frames, 10 uniform
    frames += [uniform_frame(states)] * 10
    frames += [peaked_frame(states, 5), peaked_frame(states, 5)]
    frames += [uniform_frame(states)] * 10
    obs = np.stack(frames)  # (22, states)
    points = split(obs, min_chunk_size=4, entropy_threshold=0.5)
    assert points == [11]


def test_chunk_roundtrip():
    states = 8
    rng = np.random.default_rng(0)
    obs = np.log(rng.dirichlet(np.ones(states), size=50).astype(np.float32))
    chunks = torbi_tpu.chunk(obs, min_chunk_size=10, entropy_threshold=0.99)
    assert sum(c.shape[0] for c in chunks) == 50
    np.testing.assert_array_equal(np.concatenate(chunks), obs)


def test_chunked_decode_matches_unchunked_on_forced_path():
    """With near-deterministic frames at the split, chunked decode matches"""
    states = 16
    rng = np.random.default_rng(1)
    frames = []
    for _ in range(12):
        frames.append(np.log(
            rng.dirichlet(np.ones(states)).astype(np.float32) + 1e-30))
    frames += [peaked_frame(states, 7), peaked_frame(states, 7)]
    for _ in range(12):
        frames.append(np.log(
            rng.dirichlet(np.ones(states)).astype(np.float32) + 1e-30))
    obs = np.stack(frames)

    full = np.asarray(torbi_tpu.from_probabilities(
        obs[None], log_probs=True))[0]

    chunks = torbi_tpu.chunk(obs, min_chunk_size=4, entropy_threshold=0.5)
    assert len(chunks) > 1
    decoded = [
        np.asarray(torbi_tpu.from_probabilities(c[None], log_probs=True))[0]
        for c in chunks]
    rejoined = np.concatenate(decoded)
    np.testing.assert_array_equal(rejoined, full)


def test_split_matches_reference_scan():
    """The vectorized split selects exactly the boundaries of the
    reference's frame-by-frame scan (reference chunk.py:57-78)"""
    import numpy as np
    from torbi_tpu.chunk import entropy, split

    rng = np.random.default_rng(77)
    for trial in range(20):
        frames, states = int(rng.integers(5, 400)), 12
        conc = [0.05, 0.3, 3.0][trial % 3]
        obs = np.log(
            rng.dirichlet(np.ones(states) * conc, size=frames)
            .astype(np.float32) + np.finfo(np.float32).tiny)
        min_chunk = int(rng.integers(1, 50))
        threshold = float(rng.uniform(0.05, 0.9))

        candidates = entropy(obs.T) < threshold
        expected, i = [], min_chunk
        while i < frames:
            if candidates[i] and candidates[i - 1]:
                expected.append(i)
                i += min_chunk
            else:
                i += 1

        got = split(obs, min_chunk_size=min_chunk,
                    entropy_threshold=threshold)
        assert got == expected, (trial, min_chunk, threshold)
