"""Preprocess pipeline test with a stubbed penn.

penn is not installed in CI; this substitutes a minimal stub so the
audio -> batched inference -> log-softmax -> cache pipeline actually
executes, and checks the saved posteriorgram is the normalized
concatenation over inference batches (the reference overwrites its
``logits`` list each batch, torbi/data/preprocess/core.py:37-42 -- this
implementation accumulates, which is the correct multi-batch behavior).
"""
import sys
import types

import numpy as np
import pytest
import torch

import torbi_tpu
from torbi_tpu.data.preprocess import core as preprocess
from torbi_tpu.utils import io


@pytest.fixture
def stub_modules(monkeypatch, tmp_path):
    batches = [torch.randn(3, 5, 1), torch.randn(2, 5, 1)]

    penn = types.ModuleType('penn')
    penn.preprocess = lambda audio, sample_rate, batch_size, center: iter(
        batches)
    penn.infer = lambda frames: frames
    monkeypatch.setitem(sys.modules, 'penn', penn)

    torchaudio = types.ModuleType('torchaudio')
    torchaudio.load = lambda path: (torch.zeros(1, 160), 16000)
    monkeypatch.setitem(sys.modules, 'torchaudio', torchaudio)

    monkeypatch.setattr(torbi_tpu, 'CACHE_DIR', tmp_path)
    monkeypatch.setattr(torbi_tpu, 'DATASETS', ['stub'])
    (tmp_path / 'stub').mkdir()
    (tmp_path / 'stub' / '000000.wav').write_bytes(b'RIFFfake')
    return batches


def test_preprocess_saves_normalized_posteriorgram(stub_modules, tmp_path):
    preprocess.datasets(['stub'])

    saved = io.load(tmp_path / 'stub' / '000000.pt')
    logits = torch.cat(stub_modules, dim=0).squeeze(2)
    expected = torch.nn.functional.log_softmax(logits, dim=1).numpy()
    # All inference batches contribute (frames = 3 + 2) and each frame is
    # a normalized log-distribution
    assert saved.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(saved), expected, rtol=1e-6)
    np.testing.assert_allclose(
        np.exp(np.asarray(saved)).sum(axis=1), 1.0, rtol=1e-5)


def test_preprocess_without_penn_raises():
    if 'penn' in sys.modules:
        pytest.skip('penn actually installed')
    with pytest.raises(ImportError, match='penn is required'):
        preprocess.datasets(['stub'])
