"""Spectrum inspection (inspect.c): single-table cumulative histogram and
two-table k-mer QV / sensitivity cross-tabulation.

Two-table note (SURVEY §2.1): the reference snapshot probes the second
table with the raw on-disk key (inspect.c:57), which almost always
misses because the shard-selecting low `pre` bits were stripped at dump
time.  Upstream documents two-table inspect as a working feature, so we
implement the corrected semantics: reconstruct the full hash
  hash = (key >> counter_bits) << l_pre | shard_ordinal
before the lookup (verified against `yak qv` equality in BASELINE.md).
"""

import sys

import jax.numpy as jnp
import numpy as np

from yak_tpu import YAK_N_COUNTS
from yak_tpu.io.yakfmt import restore_yak
from yak_tpu.models.qv import qv_solve, _cf
from yak_tpu.table import KmerTable


def main_inspect(fn1, fn2=None, max_cnt=20, fpr=0.00004, out=None):
    out = out or sys.stdout
    k1, pre1, hashes1, counts1 = restore_yak(fn1)
    tot = np.bincount(counts1, minlength=YAK_N_COUNTS).astype(np.int64)

    if fn2 is None:
        acc_tot = 0
        for i in range(YAK_N_COUNTS - 1, -1, -1):
            acc_tot += int(tot[i])
            if acc_tot == 0:
                continue
            out.write(f"HS\t{i}\t0\t{tot[i]}\t{acc_tot}\n")
        return

    ch = KmerTable.restore(fn2)
    hist = ch.hist()
    # cnt[cnt_in1][cnt_in2] cross-tabulation
    cnt = np.zeros((YAK_N_COUNTS, YAK_N_COUNTS), np.int64)
    chunk = 1 << 22
    for off in range(0, len(hashes1), chunk):
        h = jnp.asarray(hashes1[off:off + chunk], jnp.uint64)
        r = np.asarray(ch.lookup_hashes(h, jnp.ones(h.shape, bool)))
        c1 = np.maximum(r, 0)
        c0 = counts1[off:off + chunk]
        np.add.at(cnt, (c0, c1), 1)

    # SN rows: cumulative sensitivity of in2 at occurrence thresholds
    acc = cnt.copy()
    for j in range(YAK_N_COUNTS - 2, 0, -1):
        acc[:, j] += acc[:, j + 1]
    acc_cnt = np.zeros(YAK_N_COUNTS, np.int64)
    acc_tot = 0
    for i in range(YAK_N_COUNTS - 1, -1, -1):
        acc_tot += int(tot[i])
        if acc_tot == 0 or tot[i] == 0:
            continue
        row = [f"SN\t{i}\t{tot[i]}\t{hist[i]}"]
        for j in range(1, max_cnt + 1):
            acc_cnt[j] += acc[i, j]
            row.append(f"\t{acc_cnt[j] / acc_tot:.4f}")
        out.write("".join(row) + "\n")

    # QV rows per min-occurrence threshold, reusing the QV model
    acc2 = cnt.copy()
    for i in range(YAK_N_COUNTS - 2, -1, -1):
        acc2[i] += acc2[i + 1]
    for i in range(max_cnt, 0, -1):
        if tot[i] == 0:
            continue
        _, qs = qv_solve(hist, acc2[i], k1, fpr)
        out.write(f"QV\t{i}\t{qs.tot}\t{acc2[i, 0]}\t{_cf(qs.qv_raw)}\t"
                  f"{_cf(qs.qv)}\n")
