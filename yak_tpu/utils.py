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
