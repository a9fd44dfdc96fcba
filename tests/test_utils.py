"""Profiling utilities."""

import numpy as np

import jax.numpy as jnp

from himg_tpu.utils.profiling import Timer, device_sync


def test_timer_accumulates_and_reports():
    t = Timer()
    with t("a"):
        sum(range(1000))
    with t("b"):
        pass
    with t("a"):
        pass
    assert set(t.stages) == {"a", "b"}
    rep = t.report()
    assert "a:" in rep and "total:" in rep


def test_device_sync_forces_value():
    x = jnp.arange(128, dtype=jnp.int32).reshape(8, 16) * 2
    device_sync(x)  # must not raise; forces materialization
    assert int(np.asarray(x)[0, 1]) == 2
