"""Observability contract (ref tests/test_fvgp.py:5892-5954 and the
disabled-at-import logger contract, ref fvgp/__init__.py:22)."""

import logging

import pytest
import numpy as np

from fvgp_tpu.utils import logging as flog
from fvgp_tpu.utils.timing import log_time


def test_logger_disabled_at_import():
    """Importing fvgp_tpu must not emit debug records (the reference
    disables loguru at import; users opt in)."""
    assert not flog.logger.isEnabledFor(logging.DEBUG)


def test_enable_disable_cycle(capsys):
    flog.enable()
    try:
        assert flog.logger.isEnabledFor(logging.DEBUG)
        flog.logger.debug("marker-%d", 41)
        err = capsys.readouterr().err
        assert "marker-41" in err
    finally:
        flog.disable()
    assert not flog.logger.isEnabledFor(logging.DEBUG)
    flog.logger.debug("marker-%d", 42)
    assert "marker-42" not in capsys.readouterr().err


def test_phase_timer_emits_elapsed(capsys):
    flog.enable()
    try:
        with flog.phase_timer("unit-test phase"):
            pass
        err = capsys.readouterr().err
        assert "unit-test phase" in err
        assert "s" in err
    finally:
        flog.disable()


def test_phase_timer_silent_when_disabled(capsys):
    with flog.phase_timer("silent phase"):
        pass
    assert "silent phase" not in capsys.readouterr().err


def test_log_time_accumulates(capsys):
    from fvgp_tpu.utils import timing as ftiming
    ftiming.enable()
    try:
        with log_time("accum phase"):
            pass
        with log_time("accum phase"):
            pass
        out = capsys.readouterr().out
        assert out.count("accum phase") >= 2
        rep = ftiming.timing_report()["accum phase"]
        assert rep["count"] >= 2 and rep["total_s"] >= 0.0
    finally:
        ftiming.disable()


@pytest.mark.slow
def test_sparse_lml_phase_timers_fire(capsys):
    """The scale path's phase timers (candidate structure, device program)
    appear on the debug stream when enabled."""
    import warnings
    from fvgp_tpu import GP
    warnings.simplefilter("ignore")
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 30, (300, 2))
    y = np.sin(x[:, 0])
    flog.enable()
    try:
        gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.5, 1.5]),
                gp2Scale=True, args={"gp2Scale_block_size": 64})
        gp.marginal_likelihood.log_likelihood(np.array([1.0, 1.5, 1.5]))
        err = capsys.readouterr().err
        assert "candidate structure" in err
        assert "device program" in err
    finally:
        flog.disable()


@pytest.mark.slow
def test_train_info_prints_progress_for_every_method(capsys):
    """info=True must narrate progress for each training method (contract:
    ref tests/test_fvgp.py test_train_info_prints_progress_for_every_method;
    ref gp.py:902-920)."""
    import numpy as np
    from fvgp_tpu import GP
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 10, (40, 1))
    y = np.sin(x[:, 0])
    for method, kwargs in (
            ("local", dict(max_iter=5)),
            ("global", dict(max_iter=3, pop_size=6)),
            ("adam", dict(max_iter=12)),
            ("mcmc", dict(max_iter=30)),
            ("hgdl", dict(max_iter=4, pop_size=4)),
            ("bo", dict(max_iter=6)),
    ):
        gp = GP(x, y, init_hyperparameters=np.array([1.0, 1.0]))
        gp.train(method=method, info=True, **kwargs)
        out = capsys.readouterr().out
        assert out.strip(), f"method={method} printed nothing with info=True"
