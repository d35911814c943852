"""Pure-numpy reference oracle for tests.

Implements Viterbi decoding twice over:

- ``viterbi_numpy``: a literal, loop-based float32 max-sum recursion honoring
  the exact reference-kernel contract (lowest-index tie-breaking, masked
  frames, broadcast argmax seed). Used to validate the XLA/Pallas paths on
  arbitrary inputs, including padded batches and ties.
- ``viterbi_librosa_style``: probability-space float64 decoding following the
  algorithm of ``librosa.sequence.viterbi`` (log-space internally), the
  ground-truth the reference evaluates against
  (/root/reference/torbi/reference/core.py:129-132). Used when librosa is not
  installed.
"""
import numpy as np


def viterbi_numpy(observation, batch_frames, transition, initial):
    """Loop-based float32 oracle matching the reference CPU kernel contract.

    observation: (N, T, S) float32 log-probs
    batch_frames: (N,) int
    transition: (S, S) float32 log-probs (row = destination)
    initial: (S,) float32 log-probs
    returns (N, T) int32
    """
    observation = np.asarray(observation, dtype=np.float32)
    transition = np.asarray(transition, dtype=np.float32)
    initial = np.asarray(initial, dtype=np.float32)
    batch_frames = np.asarray(batch_frames, dtype=np.int64)
    N, T, S = observation.shape
    indices = np.zeros((N, T), dtype=np.int32)
    for b in range(N):
        frames = int(batch_frames[b])
        trellis = np.zeros((T, S), dtype=np.int32)
        post = observation[b, 0] + initial
        for t in range(1, frames):
            scores = post[None, :] + transition  # (S_dest, S_src)
            # first maximum wins (lowest source index)
            arg = np.argmax(scores, axis=1)
            best = scores[np.arange(S), arg]
            trellis[t] = arg
            post = observation[b, t] + best
        seed = int(np.argmax(post))
        indices[b, :] = seed
        index = seed
        for t in range(frames - 1, 0, -1):
            index = int(trellis[t, index])
            indices[b, t - 1] = index
    return indices


def viterbi_librosa_style(observation_probs, transition_probs, initial_probs):
    """Single-sequence float64 probability-space Viterbi (librosa semantics).

    observation_probs: (T, S) probabilities (not log)
    transition_probs: (S, S) probabilities, rows sum to 1 (row = source in
        librosa convention: prob[i, j] = P(j at t+1 | i at t))
    initial_probs: (S,)
    returns (T,) int64
    """
    observation = np.asarray(observation_probs, dtype=np.float64)
    transition = np.asarray(transition_probs, dtype=np.float64)
    initial = np.asarray(initial_probs, dtype=np.float64)
    T, S = observation.shape
    eps = np.finfo(np.float64).tiny
    log_obs = np.log(observation + eps)
    log_trans = np.log(transition + eps)
    log_init = np.log(initial + eps)

    value = np.zeros((T, S), dtype=np.float64)
    ptr = np.zeros((T, S), dtype=np.int64)
    value[0] = log_obs[0] + log_init
    for t in range(1, T):
        # librosa: trans_out[i, j] = value[t-1, i] + log_trans[i, j]
        trans_out = value[t - 1][:, None] + log_trans
        ptr[t] = np.argmax(trans_out, axis=0)
        value[t] = log_obs[t] + np.max(trans_out, axis=0)

    path = np.zeros(T, dtype=np.int64)
    path[-1] = np.argmax(value[-1])
    for t in range(T - 2, -1, -1):
        path[t] = ptr[t + 1, path[t + 1]]
    return path
