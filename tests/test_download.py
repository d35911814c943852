"""Downloader tests with mocked archives and a stub torchaudio.

No network and no torchaudio exist in CI; these tests substitute a
pre-built archive for the fetch step and a minimal torchaudio shim so the
extract/rename/normalize logic actually executes.
"""
import sys
import tarfile
import types
import zipfile

import numpy as np
import pytest
import torch

import torbi_tpu
from torbi_tpu.data.download import core as download


class _FakeTorchaudio(types.ModuleType):
    """Just enough of torchaudio for the download formatters."""

    def __init__(self):
        super().__init__('torchaudio')
        self.saved = {}
        self.functional = types.SimpleNamespace(
            resample=lambda audio, sr, target: audio)

    def load(self, path):
        return torch.full((1, 100), 0.1), 22050

    def save(self, path, audio, sample_rate):
        self.saved[str(path)] = (audio.clone(), sample_rate)


@pytest.fixture
def fake_torchaudio(monkeypatch):
    fake = _FakeTorchaudio()
    monkeypatch.setitem(sys.modules, 'torchaudio', fake)
    monkeypatch.setitem(sys.modules, 'torchaudio.functional', fake.functional)
    return fake


@pytest.fixture
def sandbox_dirs(tmp_path, monkeypatch):
    monkeypatch.setattr(torbi_tpu, 'DATA_DIR', tmp_path / 'data')
    monkeypatch.setattr(torbi_tpu, 'CACHE_DIR', tmp_path / 'cache')
    return tmp_path


def test_daps_url_matches_reference_record():
    # Zenodo record pinned by the reference; a different record would
    # fetch a different dataset revision than the shipped partitions
    assert '4783456' in download.DAPS_URL


def test_daps_formats_mocked_archive(sandbox_dirs, fake_torchaudio,
                                     monkeypatch, tmp_path):
    # Build the archive the fetch step would have produced
    src = tmp_path / 'src'
    src.mkdir()
    for name in ['f1_script1_clean.wav', 'f1_script2_clean.wav',
                 'm3_script1_clean.wav']:
        (src / name).write_bytes(b'RIFFfake')
    archive = tmp_path / 'daps-segmented.tar.gz'
    with tarfile.open(archive, 'w:gz') as tar:
        for file in sorted(src.iterdir()):
            tar.add(file, arcname=f'daps-segmented/{file.name}')

    def fetch(url, target):
        assert url == download.DAPS_URL
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_bytes(archive.read_bytes())

    monkeypatch.setattr(download, '_fetch', fetch)
    download.daps()

    cache = torbi_tpu.CACHE_DIR / 'daps'
    # Two speakers (f1, m3), renamed {speaker:04d}/{count:06d}.wav
    assert sorted(p.name for p in cache.iterdir()) == ['0000', '0001']
    saved = sorted(fake_torchaudio.saved)
    assert any(path.endswith('0000/000000.wav') for path in saved)
    assert any(path.endswith('0001/000000.wav') for path in saved)
    # Quiet audio (max 0.1 < 0.35) was volume-normalized up to 0.35
    audio, _ = fake_torchaudio.saved[saved[0]]
    assert float(audio.abs().max()) == pytest.approx(0.35)


def test_vctk_formats_mocked_archive(sandbox_dirs, fake_torchaudio,
                                     monkeypatch, tmp_path):
    import json

    monkeypatch.setattr(
        torbi_tpu, 'SAMPLE_RATE', 16000, raising=False)
    archive = tmp_path / 'vctk.zip'
    with zipfile.ZipFile(archive, 'w') as zfile:
        zfile.writestr('wav48/p225/p225_001_mic2.flac', b'fLaCfake')
        zfile.writestr('wav48/p226/p226_001_mic2.flac', b'fLaCfake')

    def fetch(url, target):
        assert url == download.VCTK_URL
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_bytes(archive.read_bytes())

    monkeypatch.setattr(download, '_fetch', fetch)
    download.vctk()

    cache = torbi_tpu.CACHE_DIR / 'vctk'
    with open(cache / 'correspondence.json') as file:
        correspondence = json.load(file)
    # Original stems preserved in the correspondence map
    assert sorted(correspondence.values()) == [
        'p225_001_mic2', 'p226_001_mic2']
    assert sorted(correspondence.keys()) == [
        '0000/000000', '0001/000000']


def test_datasets_rejects_unknown():
    with pytest.raises(ValueError):
        download.datasets(['nonsense'])
