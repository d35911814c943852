"""A small seeded slice of the randomized cross-path soak.

scripts/soak.py sweeps hundreds of random configurations; this runs a
handful with a fixed seed on every suite run so the randomized generator
itself (shifted/floored bands, folded epsilon, packed observations,
spread toggling) stays covered without the full soak's runtime.
"""
import importlib.util
import pathlib

import torbi_tpu

_SOAK = pathlib.Path(__file__).resolve().parent.parent / 'scripts' / 'soak.py'


def test_soak_slice():
    spec = importlib.util.spec_from_file_location('soak', _SOAK)
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)

    prior = torbi_tpu.BAND_BATCH1_SPREAD
    try:
        assert soak.main(cases=8, seed=424242) == 0
    finally:
        torbi_tpu.BAND_BATCH1_SPREAD = prior
