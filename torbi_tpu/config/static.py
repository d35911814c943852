"""Configuration values derived AFTER user overrides are applied.

These cannot live in defaults.py because they depend on constants a
--config composition file may have replaced (reference parity:
torbi/config/static.py).
"""
import torbi_tpu

# Partition JSONs ship inside the package assets
PARTITION_DIR = torbi_tpu.ASSETS_DIR / 'partitions'
