"""Spectrum inspection (inspect.c): single-table cumulative histogram and
two-table k-mer QV / sensitivity cross-tabulation.

Two-table note (SURVEY §2.1): the reference snapshot probes the second
table with the raw on-disk key (inspect.c:57), which almost always
misses because the shard-selecting low `pre` bits were stripped at dump
time.  Upstream documents two-table inspect as a working feature, so we
implement the corrected semantics: reconstruct the full hash
  hash = (key >> counter_bits) << l_pre | shard_ordinal
before the lookup (verified against `yak qv` equality in BASELINE.md).

Memory/streaming: the first dump is STREAMED in fixed-size batches
(io/yakfmt.open_yak_stream — the role of inspect.c:40-62's
shard-by-shard read), so host memory is O(batch) regardless of table
size; only the second table is device-resident.  Batches are padded to
one fixed shape so the sorted-join lookup compiles once.
"""

import sys

import jax.numpy as jnp
import numpy as np

from yak_tpu import YAK_N_COUNTS
from yak_tpu.io.yakfmt import open_yak_stream
from yak_tpu.models.qv import qv_solve, _cf
from yak_tpu.table import KmerTable

_BATCH = 1 << 22


def main_inspect(fn1, fn2=None, max_cnt=20, fpr=0.00004, out=None,
                 batch_keys=_BATCH):
    out = out or sys.stdout
    k1, pre1, batches = open_yak_stream(fn1, batch_keys)

    if fn2 is None:
        tot = np.zeros(YAK_N_COUNTS, np.int64)
        for _h, c in batches:
            tot += np.bincount(c, minlength=YAK_N_COUNTS)
        acc_tot = 0
        for i in range(YAK_N_COUNTS - 1, -1, -1):
            acc_tot += int(tot[i])
            if acc_tot == 0:
                continue
            out.write(f"HS\t{i}\t0\t{tot[i]}\t{acc_tot}\n")
        return

    ch = KmerTable.restore(fn2)
    hist = ch.hist()
    ch.flush()
    # Pallas merge-JOIN on TPU (table streamed once per batch, only the
    # batch sorted) behind the same gate as every other workload
    # (default ON on TPU; YAK_TPU_JOIN=0 disables,
    # YAK_TPU_JOIN_INTERPRET=1 exercises it on CPU).
    from yak_tpu.ops.countstep import join_enabled
    use_join, join_interp = join_enabled(ch.k)

    tot = np.zeros(YAK_N_COUNTS, np.int64)
    cnt = np.zeros((YAK_N_COUNTS, YAK_N_COUNTS), np.int64)
    for h_np, c0 in batches:
        tot += np.bincount(c0, minlength=YAK_N_COUNTS)
        n = len(h_np)
        if n < batch_keys:
            h_np = np.concatenate(
                [h_np, np.zeros(batch_keys - n, np.uint64)])
        valid = jnp.asarray(np.arange(batch_keys) < n)
        h = jnp.asarray(h_np, jnp.uint64)
        if use_join:
            from yak_tpu.ops.countstep import lookup_pallas
            r = np.asarray(lookup_pallas(ch.keys, ch.cnt, ch.size,
                                         h, valid,
                                         interpret=join_interp))[:n]
        else:
            r = np.asarray(ch.lookup_hashes(h, valid))[:n]
        c1 = np.maximum(r, 0)
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
