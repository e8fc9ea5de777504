"""Stage timers and trace annotations."""

import time

from mmd_tpu.core import profiling


def test_stages_accumulate():
    s = profiling.Stages()
    with s.stage("a", log=False):
        time.sleep(0.01)
    with s.stage("a", log=False):
        time.sleep(0.01)
    with s.stage("b", log=False):
        pass
    assert s.counts["a"] == 2 and s.counts["b"] == 1
    assert s.totals["a"] >= 0.02
    rep = s.report()
    assert "a" in rep and "2x" in rep


def test_nested_stages():
    s = profiling.Stages()
    with s.stage("outer", log=False):
        with s.stage("inner", log=False):
            time.sleep(0.005)
    assert s.totals["outer"] >= s.totals["inner"] > 0


def test_annotate_works_under_jit(rng):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        with profiling.annotate("matmul"):
            return x @ x
    x = jnp.ones((8, 8))
    assert f(x).shape == (8, 8)
