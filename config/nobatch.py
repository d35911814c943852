"""Experiment: batch size 1 (reference: config/nobatch.py)"""
MODULE = 'torbi_tpu'

CONFIG = 'nobatch'

BATCH_SIZE = 1
