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
    """Accepts Lowered objects and zero-arg producers; the jitted fns stay
    callable afterwards (note: AOT compiles do NOT land in the jit dispatch
    cache — consumers that must avoid the re-trace/re-compile keep the
    executables via keep=True and call them directly)."""
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


def test_async_compile_pool_wait_and_close():
    """AsyncCompilePool: trace-up-front, background compiles, per-key wait,
    shared jit objects dedup to one future, errors surface on wait."""
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.utils.compile_pool import (
        AsyncCompilePool,
    )

    @jax.jit
    def f(x):
        return x * 2.0

    @jax.jit
    def g(x):
        return x + 1.0

    x = jnp.ones((4,))
    memo = {}

    def once(obj, produce):
        def make():
            if id(obj) not in memo:
                memo[id(obj)] = produce()
            return memo[id(obj)]
        return make

    pool = AsyncCompilePool(
        {
            "a": [once(f, lambda: f.lower(x))],
            "b": [once(f, lambda: f.lower(x)), once(g, lambda: g.lower(x))],
        },
        verbose=False,
    )
    assert pool.wait("a") >= 0.0
    assert pool.wait("b") >= 0.0
    assert pool.wait("missing-key") == 0.0
    # Shared object f lowered exactly once -> 2 unique executables total.
    assert pool._n_unique == 2
    pool.close()
    assert float(f(x)[0]) == 2.0 and float(g(x)[0]) == 2.0


def test_async_compile_pool_background_trace():
    """trace_in_background: the constructor returns before tracing; wait()
    blocks until its key is traced AND compiled; trace errors surface on
    wait/close; key order is preserved (insertion order traces first)."""
    import threading
    import time

    from distillation_trajectories_tpu.utils.compile_pool import (
        AsyncCompilePool,
    )

    @jax.jit
    def f(x):
        return x * 3.0

    x = jnp.ones((4,))
    gate = threading.Event()
    order = []

    def slow_producer():
        gate.wait(10.0)
        order.append("a")
        return f.lower(x)

    pool = AsyncCompilePool(
        {"a": [slow_producer]}, verbose=False, trace_in_background=True,
    )
    # Constructor must not have run the producer (it is gated).
    assert order == []
    gate.set()
    assert pool.wait("a") >= 0.0
    assert order == ["a"]
    pool.close()
    assert float(f(x)[0]) == 3.0
    # Attribution accessors: the overlapped trace wall is measured and
    # flagged as background (students.py records it as a separate phase).
    assert pool.traced_in_background
    assert pool.trace_seconds > 0.0

    # A producer that raises: the error lands on wait() of that key and
    # again on close().
    def boom():
        raise RuntimeError("trace failed")

    pool = AsyncCompilePool(
        {"bad": [boom]}, verbose=False, trace_in_background=True,
    )
    try:
        pool.wait("bad")
        raise AssertionError("wait() should re-raise the trace error")
    except RuntimeError as e:
        assert "trace failed" in str(e)
    try:
        pool.close()
        raise AssertionError("close() should re-raise the trace error")
    except RuntimeError as e:
        assert "trace failed" in str(e)


def test_compile_concurrently_keep_returns_executables():
    """keep=True returns the Compiled executables in input order; calling
    one directly bypasses the jit dispatch cache entirely (Lowered.compile
    does NOT populate it — f._cache_size() stays 0) and accepts host numpy
    args."""
    import numpy as np

    f = jax.jit(lambda x: jnp.sin(x) * 2)
    g = jax.jit(lambda x: jnp.cos(x) + 1)
    x = jnp.ones((4, 4))
    compiled = compile_concurrently(
        [f.lower(x), lambda: g.lower(x)], label="keep", verbose=False,
        keep=True,
    )
    assert len(compiled) == 2
    assert f._cache_size() == 0  # the premise keep=True exists for
    out_f = compiled[0](np.ones((4, 4), np.float32))
    out_g = compiled[1](np.ones((4, 4), np.float32))
    assert jnp.allclose(out_f, jnp.sin(jnp.ones((4, 4))) * 2)
    assert jnp.allclose(out_g, jnp.cos(jnp.ones((4, 4))) + 1)


def test_compiled_with_fallback():
    """CompiledWithFallback prefers the AOT executable, falls back to the
    jitted fn exactly once on an argument-shape rejection, and never uses
    the dead executable again."""
    from distillation_trajectories_tpu.utils.compile_pool import (
        CompiledWithFallback,
    )

    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((4,))
    compiled = compile_concurrently(
        [f.lower(x)], verbose=False, keep=True)[0]
    fn = CompiledWithFallback(compiled, f, label="test")
    assert jnp.allclose(fn(x), x * 2)
    # Aval mismatch: the executable rejects pre-execution; the wrapper
    # falls back to jit dispatch and keeps working for both shapes.
    y = jnp.ones((8,))
    assert jnp.allclose(fn(y), y * 2)
    assert fn._compiled is None
    assert jnp.allclose(fn(x), x * 2)


def test_compiled_with_fallback_rebinds_prefix():
    """Pre-binding wrappers (VariablesAsArgFn / the _Distill* classes)
    lower() with bound args prepended; CompiledWithFallback re-prepends
    them (aot_prefix) so the AOT executable sees the compiled signature."""
    from distillation_trajectories_tpu.utils.compile_pool import (
        CompiledWithFallback,
        VariablesAsArgFn,
    )

    f = jax.jit(lambda v, x: v["w"] * x)
    wrapped = VariablesAsArgFn(f, {"w": jnp.float32(3.0)})
    x = jnp.ones((4,))
    compiled = compile_concurrently(
        [wrapped.lower(x)], verbose=False, keep=True)[0]
    fn = CompiledWithFallback(compiled, wrapped, label="prefix")
    assert jnp.allclose(fn(x), 3.0 * x)   # AOT path with prefix re-bound
    assert fn._compiled is not None       # no fallback happened
    y = jnp.ones((8,))
    assert jnp.allclose(fn(y), 3.0 * y)   # aval drift -> jit fallback
    assert fn._compiled is None
