"""utils/compile_pool.py: concurrent AOT compilation + watchdog semantics."""

import faulthandler

import jax
import jax.numpy as jnp

from distillation_trajectories_tpu.utils.compile_pool import (
    arm_watchdog,
    cancel_watchdog,
    compile_concurrently,
)


def test_compile_concurrently_mixed_items():
    """Accepts Lowered objects and zero-arg producers; executables land in
    the jit dispatch cache (subsequent call returns without recompiling)."""
    f = jax.jit(lambda x: jnp.sin(x) * 2)
    g = jax.jit(lambda x: jnp.cos(x) + 1)
    x = jnp.ones((8, 8))
    per = compile_concurrently(
        [f.lower(x), lambda: g.lower(x)], label="test", verbose=False
    )
    assert len(per) == 2 and all(t >= 0 for t in per)
    assert float(f(x)[0, 0]) != 0.0
    assert float(g(x)[0, 0]) != 0.0


def test_compile_concurrently_empty():
    assert compile_concurrently([], verbose=False) == []


def test_watchdog_noop_on_cpu():
    """The exit-timer must never arm under the CPU backend (it would kill
    slow-compiling pytest processes); cancel is always safe."""
    assert jax.default_backend() == "cpu"
    arm_watchdog(0.001)  # would hard-exit within milliseconds if armed
    import time

    time.sleep(0.05)
    cancel_watchdog()


def test_cancel_watchdog_idempotent():
    cancel_watchdog()
    cancel_watchdog()
    # faulthandler's own timer must be clear afterwards
    faulthandler.cancel_dump_traceback_later()
