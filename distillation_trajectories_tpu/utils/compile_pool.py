"""Concurrent AOT compilation of lowered jax computations.

XLA compilation releases the GIL and (on the axon backend) runs server-side,
so dispatching ``Lowered.compile()`` calls from a thread pool overlaps them
~3-4x in practice (measured in PERFORMANCE.md).  The compiled executables
land in the same pjit dispatch cache the normal ``jit`` call path uses, so
subsequent calls with matching avals execute without recompiling.

Includes the tunnel-hang watchdog: the tunneled TPU backend occasionally
drops an RPC and the client call never returns; a hung C-level call cannot
be cancelled from Python, so after the deadline every thread's stack is
dumped and the process hard-exits — callers at the process level (e.g.
scripts/run_full_sweep.py stages) treat that as transient and retry.
"""

from __future__ import annotations

import concurrent.futures
import faulthandler
import os
import time
from typing import List, Sequence

import jax


class VariablesAsArgFn:
    """Callable wrapping a jitted fn whose first argument is the variables
    pytree, pre-binding that tree while keeping ``lower()`` for AOT pools.

    Why variables are ARGUMENTS and not closure constants: closed-over
    param trees get embedded in the lowered IR, and the axon backend hashes
    the full module for its server-side compile cache on EVERY compile —
    canonicalizing ~40 MB of inline constants took minutes (watchdog stack:
    jax/_src/cache_key.py::_canonicalize_ir) and changed the cache key
    whenever param VALUES changed, defeating cross-run compile reuse.  As
    arguments, only their avals appear in the IR.
    """

    def __init__(self, jitted, variables):
        self._jitted = jitted
        self._variables = variables

    def __call__(self, *args):
        return self._jitted(self._variables, *args)

    def lower(self, *args):
        return self._jitted.lower(self._variables, *args)

    @property
    def aot_prefix(self):
        """Args ``lower()`` prepends — an AOT ``Compiled`` built from that
        lowering needs them re-prepended at call time
        (:class:`CompiledWithFallback`)."""
        return (self._variables,)


class CompiledWithFallback:
    """Prefer an AOT ``Compiled`` executable; fall back to the jitted fn if
    the executable rejects the live args.

    The rejection path exists for aval/sharding drift between the pool's
    example args and the runtime call (e.g. a dataset tail batch of a
    different size).  Only pre-execution argument errors (TypeError /
    ValueError) trigger the fallback — they are raised before any donated
    input buffer is consumed, so re-calling the jitted fn with the same
    args is safe.  Runtime errors propagate unchanged.

    Pre-binding wrappers (``VariablesAsArgFn``, the ``_Distill*`` classes in
    training/state.py) whose ``lower()`` prepends bound args expose them as
    ``aot_prefix``; the Compiled call re-prepends them so both paths see the
    signature the graph was compiled for.
    """

    def __init__(self, compiled, jitted, label: str = ""):
        self._compiled = compiled
        self._jitted = jitted
        self._label = label
        self._prefix = tuple(getattr(jitted, "aot_prefix", ()))

    def __call__(self, *args):
        if self._compiled is not None:
            try:
                return self._compiled(*self._prefix, *args)
            except (TypeError, ValueError) as e:
                print(
                    f"[compile-pool] {self._label or 'aot'}: executable "
                    f"rejected args ({type(e).__name__}: {e}); falling back "
                    "to jit dispatch", flush=True,
                )
                self._compiled = None
        return self._jitted(*args)


def arm_watchdog(seconds: float) -> None:
    """Arm (or re-arm) the hang watchdog for the current phase.

    No-op under the CPU backend — the flake is axon-specific, and an
    exit-timer would hard-kill slow-compiling pytest processes.  Honors
    ``DTT_COMPILE_TIMEOUT`` as an override for every phase.
    """
    override = float(os.environ.get("DTT_COMPILE_TIMEOUT", "0") or 0)
    seconds = override or seconds
    if seconds > 0 and jax.default_backend() != "cpu":
        faulthandler.dump_traceback_later(seconds, exit=True)


def cancel_watchdog() -> None:
    faulthandler.cancel_dump_traceback_later()


class AsyncCompilePool:
    """Compile-AHEAD pool: trace serially (interleaved tracing across
    MULTIPLE threads starves on this 1-core host, see compile_concurrently),
    submit every compile to a thread pool, and let the caller overlap its
    own work (training, which mostly waits on device RPCs with the GIL
    released) with the remaining server-side compiles, waiting per-key only
    when it actually needs that executable.

    ``trace_in_background`` moves the (still serial, single-thread) trace
    loop off the caller's critical path: keys are traced in insertion
    order, each key's compiles are submitted the moment its trace finishes,
    and ``wait(key)`` blocks on trace+compile of that key only.  Training
    student *i* is device-bound (GIL released between dispatches), so the
    tracer gets the host to itself while the chip trains — the r05 students
    stage spent 97.3 s tracing up front (SWEEP_r05.json
    phases.compile_trace_s) that this mode hides behind the 383 s train
    wall.  Tracing is host-side only (variables ride as avals, never
    constants — see VariablesAsArgFn), so the tracer thread cannot hang on
    a tunnel RPC; ``wait`` still deadlines its own blocking.

    ``producers`` maps key -> list of zero-arg callables returning a
    ``Lowered`` (or Lowered directly).  Duplicate list entries across keys
    are fine — pass the same resolved Lowered object; each unique graph
    should appear once overall.
    """

    def __init__(self, producers, workers: int = None, label: str = "",
                 verbose: bool = True, per_item_budget: float = 400.0,
                 trace_in_background: bool = False):
        import threading

        if workers is None:
            workers = int(os.environ.get("DTT_COMPILE_WORKERS", "8") or 8)
        self._budget = per_item_budget
        # Keys trace serially in insertion order, so the LAST key's trace
        # deadline must cover every earlier key's tracing too — same
        # graph-count scaling as the sync path's watchdog.
        n_graphs = sum(len(v) for v in producers.values())
        self._trace_deadline = max(600.0, 60.0 + 30.0 * n_graphs)
        self._label = label
        self._verbose = verbose
        self._t0 = time.perf_counter()
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=workers)
        self._futures = {}
        self._ready = {k: threading.Event() for k in producers}
        self._trace_error = None
        self._trace_s = 0.0
        self._n_unique = 0
        self._tracer = None
        if trace_in_background:
            self._tracer = threading.Thread(
                target=self._trace_all, args=(producers,),
                name="compile-pool-tracer", daemon=True,
            )
            self._tracer.start()
            if verbose:
                n = sum(len(v) for v in producers.values())
                print(f"[compile-pool:async] {label or 'queued'}: "
                      f"{n} graphs tracing in background "
                      "(compiles submit as each trace lands)", flush=True)
        else:
            n = sum(len(v) for v in producers.values())
            arm_watchdog(max(600.0, 60.0 + 30.0 * n))  # tracing only
            try:
                self._trace_all(producers)
            finally:
                cancel_watchdog()
            if self._trace_error is not None:
                raise self._trace_error
            if verbose:
                print(f"[compile-pool:async] {label or 'queued'}: "
                      f"{self._n_unique} executables queued "
                      f"(trace {self._trace_s:.1f}s)", flush=True)

    def _trace_all(self, producers):
        t0 = time.perf_counter()
        seen = {}
        try:
            for k, items in producers.items():
                futs = []
                for item in items:
                    lw = item() if callable(item) else item
                    if id(lw) not in seen:
                        seen[id(lw)] = self._pool.submit(self._timed, lw)
                    futs.append(seen[id(lw)])
                self._futures[k] = futs
                self._ready[k].set()
        except BaseException as e:  # surfaced by wait()/close()
            self._trace_error = e
        finally:
            self._trace_s = time.perf_counter() - t0
            self._n_unique = len(seen)
            for ev in self._ready.values():
                ev.set()  # wake every waiter; error re-raised there

    @property
    def trace_seconds(self) -> float:
        """Wall seconds the trace loop took (meaningful after close() when
        tracing ran in the background — it is OVERLAPPED time there, not
        critical-path time)."""
        return self._trace_s

    @property
    def traced_in_background(self) -> bool:
        return self._tracer is not None

    @staticmethod
    def _timed(lw):
        c0 = time.perf_counter()
        compiled = lw.compile()
        return time.perf_counter() - c0, compiled

    def _await_traced(self, key) -> None:
        ev = self._ready.get(key)
        if ev is not None and not ev.wait(self._trace_deadline):
            raise TimeoutError(
                f"compile pool: trace of {key!r} did not land within "
                f"{self._trace_deadline:.0f}s")
        if self._trace_error is not None:
            raise self._trace_error

    def wait(self, key) -> float:
        """Block until every executable the key needs is traced AND
        compiled; returns the wall seconds spent actually waiting (0 when
        already done)."""
        ready = self._ready.get(key)
        if (ready is None or ready.is_set()) and self._trace_error is None:
            futs = self._futures.get(key, ())
            if all(f.done() for f in futs):
                for f in futs:
                    f.result()  # surface compile errors even when done
                return 0.0
        t0 = time.perf_counter()
        # A legitimate wait may cover the whole serial trace queue (keys
        # trace in insertion order) plus this key's compiles — the hang
        # watchdog must not fire inside that envelope.
        arm_watchdog(self._trace_deadline + max(600.0, self._budget * 4))
        try:
            self._await_traced(key)
            for f in self._futures.get(key, ()):
                f.result()
        finally:
            cancel_watchdog()
        return time.perf_counter() - t0

    def executables(self, key) -> list:
        """The key's ``Compiled`` executables in producer order (blocking
        like :meth:`wait` if they are not ready yet).

        Callers hold these and call them DIRECTLY instead of re-dispatching
        the jitted fn: Lowered.compile() does not populate the jit dispatch
        cache, so a dispatch would re-trace the graph (seconds of host time
        per epoch-scan graph on this 1-core host) and re-compile against
        the backend cache (a from-scratch compile if evicted).  Wrap with
        :class:`CompiledWithFallback` to stay robust to aval drift.
        """
        self.wait(key)
        return [f.result()[1] for f in self._futures.get(key, ())]

    def close(self):
        """Drain remaining traces + compiles (surfacing errors), shut down."""
        # _n_unique is 0 until the tracer's finally runs — size the drain
        # budget off the key count when the trace is still in flight.
        n_drain = max(1, self._n_unique or len(self._ready))
        arm_watchdog(self._trace_deadline + max(600.0, self._budget * n_drain))
        try:
            if self._tracer is not None:
                self._tracer.join(timeout=self._trace_deadline)
                if self._tracer.is_alive():
                    raise TimeoutError("compile pool: tracer did not finish")
            if self._trace_error is not None:
                raise self._trace_error
            for futs in self._futures.values():
                for f in futs:
                    f.result()
        finally:
            cancel_watchdog()
        self._pool.shutdown(wait=True)
        if self._verbose:
            uniq = {id(f): f for futs in self._futures.values() for f in futs}
            per = [f.result()[0] for f in uniq.values()]
            wall = time.perf_counter() - self._t0
            print(f"[compile-pool:async] {self._label or 'done'}: "
                  f"{self._n_unique} executables, pool open {wall:.1f}s "
                  f"(trace {self._trace_s:.1f}s, compile sum "
                  f"{sum(per):.1f}s)", flush=True)


def compile_concurrently(
    lowered: Sequence,
    workers: int = None,
    label: str = "",
    verbose: bool = True,
    per_item_budget: float = 45.0,
    keep: bool = False,
) -> List:
    """Compile a batch of computations in a thread pool; returns per-item
    seconds, or the ``Compiled`` executables (input order) with ``keep``.

    ``keep=True`` exists because ``Lowered.compile()`` does NOT populate the
    jitted function's dispatch cache (verified: ``f._cache_size()`` stays 0
    after an AOT compile) — a later ``f(args)`` call re-traces AND
    re-compiles, leaning on the axon server-side HLO cache to make the
    recompile cheap.  Callers that hold the Compiled object and call it
    directly skip both the re-trace (host-side, seconds on this 1-core
    host for epoch-scan graphs) and the cache dependence (a server
    eviction between pool and dispatch costs a full from-scratch compile).
    Compiled executables accept host numpy args (placed automatically) and
    honor the original ``donate_argnums``.

    Items may be ``Lowered`` objects or zero-arg callables producing one.
    All callables are resolved (traced) BEFORE the pool starts: interleaving
    tracing with running compile threads was measured 3-4x slower overall on
    this 1-core host (GIL/scheduler contention starves the serial tracer),
    so trace-all-then-compile-all is the faster order.

    The watchdog is armed for the pool's duration and cancelled on every
    exit path; the deadline allows a fully serialized pool plus margin.
    ``per_item_budget`` sizes the deadline per graph: ~45s fits trajectory
    scans; full train-step graphs compile in minutes and need ~400s.
    """
    if not lowered:
        return []
    if workers is None:
        workers = int(os.environ.get("DTT_COMPILE_WORKERS", "8") or 8)
    t0 = time.perf_counter()

    def timed_compile(lw):
        c0 = time.perf_counter()
        compiled = lw.compile()
        return time.perf_counter() - c0, compiled

    arm_watchdog(max(600.0, per_item_budget * len(lowered)))
    try:
        resolved = [item() if callable(item) else item for item in lowered]
        trace_s = time.perf_counter() - t0
        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
            timed = list(pool.map(timed_compile, resolved))
        per = [t for t, _ in timed]
    finally:
        cancel_watchdog()
    if verbose:
        # compile sum ≈ compile wall ⇒ the backend serialized the compiles;
        # sum >> wall ⇒ they genuinely overlapped (varies run-to-run with
        # axon server load).
        wall = time.perf_counter() - t0
        print(
            f"[compile-pool] {label or 'compiled'}: {len(per)} executables "
            f"in {wall:.1f}s wall (trace {trace_s:.1f}s, compile wall "
            f"{wall - trace_s:.1f}s, compile sum {sum(per):.1f}s, "
            f"max {max(per):.1f}s, {workers} workers)"
        )
    if keep:
        return [c for _, c in timed]
    return per
