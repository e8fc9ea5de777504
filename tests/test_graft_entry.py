"""Driver-hook contract: entry() compiles, dryrun_multichip runs on 8 CPUs."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert all(np.isfinite(np.asarray(o, np.float32)).all() for o in out)
    assert [tuple(o.shape) for o in out] == [(8, 3)] * 4
