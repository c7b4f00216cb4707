"""Smoke: the driver's dryrun entry points must pass in-suite, so a
broken steady-state store path can never coexist with a green dryrun
(round-3 regression: the toy dryrun sizes missed a NameError on the
grain-compaction path)."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    keys, n_valid = out
    assert keys.ndim == 2 and int(n_valid) > 0


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
