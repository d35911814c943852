"""Derived configuration computed after user overrides are applied

(reference: torbi/config/static.py)
"""
import torbi_tpu


###############################################################################
# Directories
###############################################################################


# Location to save dataset partitions
PARTITION_DIR = torbi_tpu.ASSETS_DIR / 'partitions'
