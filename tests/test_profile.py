"""Profiling utility tests (trace parsing and submission timing)."""
import gzip
import json

import numpy as np

from torbi_tpu.utils import profile


def test_device_op_times_parses_trace(tmp_path):
    trace = {
        'traceEvents': [
            {'ph': 'M', 'name': 'process_name', 'pid': 1,
             'args': {'name': '/device:TPU:0'}},
            {'ph': 'M', 'name': 'process_name', 'pid': 2,
             'args': {'name': 'python host'}},
            {'ph': 'X', 'pid': 1, 'tid': 1, 'name': 'fusion.1',
             'ts': 0, 'dur': 1500.0},
            {'ph': 'X', 'pid': 1, 'tid': 1, 'name': 'fusion.1',
             'ts': 2000, 'dur': 500.0},
            {'ph': 'X', 'pid': 1, 'tid': 2, 'name': 'copy.5',
             'ts': 0, 'dur': 250.0},
            {'ph': 'X', 'pid': 2, 'tid': 1, 'name': 'host-noise',
             'ts': 0, 'dur': 9999.0},
        ]}
    run = tmp_path / 'plugins' / 'profile' / 'run1'
    run.mkdir(parents=True)
    with gzip.open(run / 'host.trace.json.gz', 'wt') as f:
        json.dump(trace, f)

    rows = profile.device_op_times(tmp_path)
    assert [r['name'] for r in rows] == ['fusion.1', 'copy.5']
    assert rows[0]['total_ms'] == 2.0 and rows[0]['count'] == 2
    assert rows[1]['total_ms'] == 0.25


def test_device_op_times_empty_dir(tmp_path):
    assert profile.device_op_times(tmp_path) == []


def test_time_submissions_measures_work():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((64, 64), jnp.float32)

    @jax.jit
    def fn():
        return x @ x

    sec = profile.time_submissions(fn, lambda r: r[0, 0], iters=4)
    assert sec > 0


def test_speed_of_light_model():
    sol = profile.speed_of_light(
        batch=512, frames=512, states_padded=1536, band=(-87, 175, -1.0),
        measured_forward_ms=100.0)
    assert 0 < sol['vpu_utilization'] < 1
    assert sol['vpu_ideal_ms'] < 100.0
    assert sol['hbm_ideal_ms'] < sol['vpu_ideal_ms']
