"""Wall-clock timing aggregation.

Replaces the reference's torchutil.time usage
(/root/reference/torbi/core.py:200, evaluate/core.py:40,118): named timing
contexts whose totals accumulate until reset. Timed regions around device
work must fence with jax.block_until_ready at the call site -- asynchronous
dispatch otherwise under-reports (the reference's CUDA numbers suffer exactly
this: no synchronization inside the timed region).
"""
import contextlib
import time as _time

_totals = {}


@contextlib.contextmanager
def context(name):
    start = _time.perf_counter()
    try:
        yield
    finally:
        _totals[name] = _totals.get(name, 0.0) + _time.perf_counter() - start


def reset():
    _totals.clear()


def results():
    return dict(_totals)
