"""The driver's entry points must stay runnable: single-chip compile check
and the multichip dry run on the virtual CPU mesh."""
import importlib.util
import os

import jax
import numpy as np
import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m = _load()
    m.dryrun_multichip(8)
