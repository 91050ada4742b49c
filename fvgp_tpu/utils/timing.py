"""Cumulative timing profiler (parity target: /root/reference/fvgp/utils.py).

The reference pipes per-phase timings through loguru; here the same
``log_time`` context manager keeps per-label cumulative totals and an
optional printer.  On-device phases should be bracketed with
``jax.block_until_ready`` by the caller if exact device timings are wanted.
"""

import contextlib
import time
from collections import defaultdict

_TOTALS = defaultdict(float)
_COUNTS = defaultdict(int)
_START = time.time()

ENABLED = False


def enable():
    global ENABLED
    ENABLED = True


def disable():
    global ENABLED
    ENABLED = False


@contextlib.contextmanager
def log_time(label):
    """Time a block; cumulative totals and %-of-runtime are tracked per
    label (ref utils.py:14-29)."""
    start = time.time()
    try:
        yield
    finally:
        elapsed = time.time() - start
        _TOTALS[label] += elapsed
        _COUNTS[label] += 1
        if ENABLED:
            runtime = time.time() - _START
            frac = 100.0 * _TOTALS[label] / max(runtime, 1e-12)
            print(f"[fvgp_tpu timing] {label}: {elapsed:.6f}s "
                  f"(total {_TOTALS[label]:.6f}s, {frac:.1f}% of runtime, "
                  f"n={_COUNTS[label]})")


def timing_report():
    """Dict of cumulative totals per label."""
    return {k: {"total_s": v, "count": _COUNTS[k]} for k, v in _TOTALS.items()}
