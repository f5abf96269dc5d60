"""Coverage for the runtime utilities: timers, loggers, step dumps."""

import logging

import numpy as np
import jax.numpy as jnp


def test_timer_accumulates_and_reports():
    from pyqsm_tpu.utils.timing import Timer

    t = Timer()
    with t.stage("alpha", sync=jnp.ones(4)):
        _ = jnp.sum(jnp.ones(4))
    with t.stage("alpha"):
        pass
    with t.stage("beta"):
        pass
    assert set(t.stages) == {"alpha", "beta"}
    assert t.stages["alpha"] >= 0.0
    rep = t.report()
    assert "alpha" in rep and "TOTAL" in rep


def test_two_logger_scheme(tmp_path):
    from pyqsm_tpu.utils.logging import setup_logging

    logfile = tmp_path / "pyqsm.log"
    setup_logging(log_file=str(logfile))
    calc = logging.getLogger("pyqsm_tpu.calc")
    viz = logging.getLogger("pyqsm_tpu.viz")
    calc.debug("calc message %d", 42)
    viz.info("viz message")
    for h in logging.getLogger("pyqsm_tpu.calc").handlers + \
            logging.getLogger("pyqsm_tpu").handlers:
        h.flush()
    text = logfile.read_text() if logfile.exists() else ""
    assert "calc message 42" in text or "viz message" in text


def test_step_logger_roundtrip(tmp_path):
    from pyqsm_tpu.utils.viz import StepLogger

    lg = StepLogger(tmp_path, "run1")
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    p = lg.log(3, pts, mask=np.ones(50, bool), labels=np.arange(50))
    assert p.exists()
    d = np.load(p)
    np.testing.assert_allclose(d["points"], pts)
    assert d["labels"].shape == (50,)
    assert lg.steps == [3]
