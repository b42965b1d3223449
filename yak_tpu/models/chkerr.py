"""Error-streak detection (chkerr.c): report runs of consecutive k-mers
with count < min_cnt longer than min_streak.

Reference per-position logic (chkerr.c:55-68): at each extracted k-mer
(end position i) with cnt < min_cnt, extend the streak if i == last+1,
else emit the previous streak (if > min_streak) and restart.  The emitted
row is `name  last+1-k-(streak-1)  last+1  streak`.

Here the table probes run on device (models/scan); the streak pass is a
vectorized run-length scan over the per-position value stream.
"""

import sys
from dataclasses import dataclass

import numpy as np

from yak_tpu.models.scan import scan_file, NO_KMER


@dataclass
class ChkerrOpts:
    min_cnt: int = 3
    min_streak: int = 5
    chunk_size: int = 1_000_000_000
    n_threads: int = 8


def main_chkerr(opt, table, seq_fn, out=None):
    out = out or sys.stdout
    k = table.k
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    for name, L, vals in scan_file(fn=seq_fn, table=table, chunk_size=chunk):
        # low positions: k-mer exists and count below threshold
        is_k = vals != NO_KMER
        low = is_k & (vals < opt.min_cnt)
        pos = np.nonzero(low)[0]
        if len(pos) == 0:
            continue
        # runs of consecutive positions (i == last + 1)
        breaks = np.nonzero(np.diff(pos) != 1)[0]
        run_starts = np.concatenate([[0], breaks + 1])
        run_ends = np.concatenate([breaks, [len(pos) - 1]])
        for s, e in zip(run_starts, run_ends):
            streak = int(e - s + 1)
            if streak > opt.min_streak:
                last = int(pos[e])
                out.write(f"{name}\t{last + 1 - k - (streak - 1)}\t"
                          f"{last + 1}\t{streak}\n")
