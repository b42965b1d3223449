"""Small runtime utilities: progress lines in the reference's
`[M::func::real*cpu]` shape (count.c:140-141, qv.c:104-106, sys.c) and
transient-device-fault classification for the retry paths.
"""

import sys
import time


def is_transient(e):
    """Heuristic for retryable device faults: the shared-tenant TPU
    occasionally surfaces INTERNAL/UNAVAILABLE errors from other
    tenants' load (observed and retried by bench.py since r1); compile
    or shape errors are NOT transient."""
    s = f"{type(e).__name__}: {e}"
    return any(t in s for t in
               ("INTERNAL", "Internal", "UNAVAILABLE", "Unavailable",
                "DEADLINE_EXCEEDED"))


def retry_transient(fn, redo=None, attempts=3):
    """Run `fn` (a device dispatch+fetch closure), retrying transient
    device faults; `redo` (optional) re-issues the dispatch before the
    next attempt.  Only safe for STATELESS reads — chained folds replay
    from preserved state instead (table._check_last_step)."""
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:
            if not is_transient(e) or a == attempts - 1:
                raise
            print(f"[M::yak_tpu] transient device fault, retrying "
                  f"({type(e).__name__})", file=sys.stderr)
            if redo is not None:
                redo()


class _Profiler:
    """YAK_TPU_PROFILE=<dir>: wrap a workload in a JAX profiler trace
    (the reference's observability surface is wall/CPU/RSS only,
    sys.c:9-43; this is the TPU-native upgrade — open the trace in
    TensorBoard / xprof)."""

    def __init__(self):
        import os
        self.dir = os.environ.get("YAK_TPU_PROFILE")

    def __enter__(self):
        if self.dir:
            import jax
            jax.profiler.start_trace(self.dir)
        return self

    def __exit__(self, *exc):
        if self.dir:
            import jax
            jax.profiler.stop_trace()
            print(f"[M::yak_tpu] profiler trace written to {self.dir}",
                  file=sys.stderr)
        return False


def maybe_profile():
    return _Profiler()


class Progress:
    """Reference-shaped per-chunk progress lines:
    `[M::<name>::<real>*<cpu/real>] <message>` (count.c:140-141)."""

    def __init__(self, name, enabled=True):
        self.name = name
        self.enabled = enabled
        self.t0 = time.time()
        self.c0 = time.process_time()

    def line(self, msg):
        if not self.enabled:
            return
        rt = time.time() - self.t0
        cpu = time.process_time() - self.c0
        print(f"[M::{self.name}::{rt:.3f}*{(cpu / rt if rt else 0):.2f}] "
              f"{msg}", file=sys.stderr)


def clear_compile_caches():
    """Release every live compiled executable the framework holds.

    The step builders memoize their jitted programs (functools.lru_cache
    in ops/countstep.py, ops/pallas_*.py; explicit dict caches for the
    mesh shard_map programs) so steady-state dispatch never re-traces.
    The flip side: a long-lived process that walks many distinct shapes
    (a multi-workload server, or the test suite) accumulates hundreds of
    live XLA executables, and the XLA:CPU client eventually SEGFAULTS
    loading the next one (measured on this jaxlib at ~110 suite tests —
    the crash lands in executable deserialization/JIT-load, with or
    without the persistent disk cache).  Call this between workloads to
    drop the framework's MODULE-LEVEL caches (lru step builders and
    *_CACHE dicts), jax's pjit caches, and the executables they pin;
    the persistent disk cache makes re-acquisition cheap.  Caveat:
    executables pinned by live objects (a _MeshCountDriver's _steps, a
    routed-group generator's step) stay alive until those objects are
    dropped — release long-lived drivers before clearing.
    """
    import gc
    import sys as _sys

    import jax

    for name, mod in list(_sys.modules.items()):
        if not name.startswith("yak_tpu") or mod is None:
            continue
        for aname, attr in list(vars(mod).items()):
            if callable(getattr(attr, "cache_clear", None)):
                attr.cache_clear()
            elif aname.endswith("_CACHE") and isinstance(attr, dict):
                attr.clear()
    jax.clear_caches()
    gc.collect()
