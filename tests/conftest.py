"""Test configuration: run on an 8-device virtual CPU mesh.

Sharding tests exercise real multi-device code paths without TPU hardware;
Pallas kernels run in interpreter mode on CPU. The platform override happens
via jax.config.update because site customization may have already imported
jax with an accelerator platform configured.
"""
import os

# TORBI_TPU_TESTS_ON_TPU=1 keeps the real backend (for tests/test_tpu.py);
# everything else runs on the virtual CPU mesh
_ON_TPU = os.environ.get('TORBI_TPU_TESTS_ON_TPU') == '1'

if not _ON_TPU:
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=8').strip()
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update('jax_platforms', 'cpu')

# Keep interpret-mode Pallas fast in tests: small frame buckets
import torbi_tpu  # noqa: E402

torbi_tpu.FRAME_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)
