"""Pytest twin of the driver contract (__graft_entry__.py).

The dryrun is the one executable the driver grades; round 4 shipped it red
because nothing in the test suite ran it.  This runs the REAL function at
the smallest multi-device scale (4 virtual CPU devices out of the suite's
8) so a regression in any dryrun lane fails the suite before a snapshot.
"""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_four_devices():
    """dryrun_multichip(4) must complete every lane (SPMD distillation,
    parity, sharded checkpoints, CFG scan, sweep_parallel, metric suite,
    Inception, spatial partitioning).  The dryrun's fixed /tmp roots
    self-clean their stale records, so sharing them with a real driver
    invocation is safe."""
    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs >=4 virtual CPU devices (tests/conftest.py)")
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_entry_compiles():
    """entry() returns a jittable forward and example args (driver lane 1)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape
