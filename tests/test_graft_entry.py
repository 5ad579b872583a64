"""Driver-contract tests: entry() compiles; dryrun_multichip runs on the
virtual 8-device mesh."""

import jax
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    pixels, reward = jax.jit(fn)(*args)
    assert pixels.shape == (2, 64, 64, 3)
    assert reward.shape == (2, 1)


def test_dryrun_multichip_8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    if jax.device_count() < 3:
        pytest.skip("needs 3 devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(3)
