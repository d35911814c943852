"""CLI and config system tests."""
import json
import subprocess
import sys

import numpy as np

import torbi_tpu
from torbi_tpu.utils import io

ENV_PREAMBLE = (
    "import os; os.environ['JAX_PLATFORMS']='cpu'; "
    "import jax; jax.config.update('jax_platforms', 'cpu'); ")


def test_cli_decode(tmp_path):
    rng = np.random.default_rng(0)
    states, frames = 8, 12
    obs = np.log(
        rng.dirichlet(np.ones(states), size=frames).astype(np.float32))
    input_file = tmp_path / 'obs.pt'
    output_file = tmp_path / 'out.pt'
    io.save(obs, input_file)

    result = subprocess.run(
        [sys.executable, '-c',
         ENV_PREAMBLE
         + 'import runpy, sys; '
         + f'sys.argv = ["torbi_tpu", "--input_files", "{input_file}", '
         + f'"--output_files", "{output_file}", "--log_probs"]; '
         + 'runpy.run_module("torbi_tpu", run_name="__main__")'],
        capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr

    decoded = io.load(output_file)
    expected = np.asarray(
        torbi_tpu.from_probabilities(obs[None], log_probs=True))[0]
    np.testing.assert_array_equal(decoded, expected)


def test_config_override(tmp_path):
    config = tmp_path / 'myconfig.py'
    config.write_text('BATCH_SIZE = 7\nCONFIG = "custom"\n')
    result = subprocess.run(
        [sys.executable, '-c',
         ENV_PREAMBLE
         + 'import sys; '
         + f'sys.argv = ["prog", "--config", "{config}"]; '
         + 'import torbi_tpu; '
         + 'print(torbi_tpu.BATCH_SIZE, torbi_tpu.CONFIG)'],
        capture_output=True, text=True, timeout=120)
    assert result.returncode == 0, result.stderr
    assert result.stdout.strip().endswith('7 custom')


def test_config_missing_file_clear_error(tmp_path):
    """--config with a non-path (e.g. a bare name) must fail with a clear
    FileNotFoundError, not an AttributeError deep inside importlib"""
    result = subprocess.run(
        [sys.executable, '-c',
         ENV_PREAMBLE
         + 'import sys; '
         + 'sys.argv = ["prog", "--config", "not-a-file"]; '
         + 'import torbi_tpu'],
        capture_output=True, text=True, timeout=120)
    assert result.returncode != 0
    assert 'FileNotFoundError' in result.stderr
    assert 'override file' in result.stderr


def test_pitch_transition_matrix():
    from torbi_tpu.models import pitch
    transition = pitch.transition_matrix()
    assert transition.shape == (1440, 1440)
    np.testing.assert_allclose(transition.sum(axis=1), 1.0, rtol=1e-5)
    # Band-limited: zero beyond max_bins_per_frame (~88 bins) off-diagonal
    assert transition[0, 200] == 0.0
    assert transition[0, 0] > 0.0
    halfwidth = int(np.ceil(pitch.max_bins_per_frame())) - 1
    assert transition[0, halfwidth] > 0.0


def test_metrics_rpa():
    from torbi_tpu.evaluate import Metrics
    metrics = Metrics()
    predicted = np.array([1, 2, 3, 10])
    target = np.array([1, 2, 5, 10])
    metrics.update(predicted, target)
    results = metrics()
    assert results['rpa']['0'] == 0.75
    assert results['rpa']['2'] == 1.0
