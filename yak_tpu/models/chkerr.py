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



@dataclass
class ChkerrOpts:
    min_cnt: int = 3
    min_streak: int = 5
    chunk_size: int = 1_000_000_000
    n_threads: int = 8


def main_chkerr(opt, table, seq_fn, out=None):
    """Device fold: run markers come back as sparse (lane, len) pairs
    (ops/countstep.get_chkerr_step); the host maps lanes to sequence
    positions via the record-piece meta and merges runs that span a
    chunk boundary (the halo makes piece windows seamless)."""
    import jax.numpy as jnp

    from yak_tpu.io.chunks import ChunkSource
    from yak_tpu.io.pack import pack_chunk_planes
    from yak_tpu.ops.countstep import (CHKERR_MAX_RUNS, get_chkerr_step,
                                       get_chkerr_join_post,
                                       get_chkerr_psort_mid, join_enabled,
                                       join_restore_vals, psort_enabled,
                                       qv_psort_pad, run_join_lookup,
                                       run_marker_psort)

    out = out or sys.stdout
    k = table.k
    table.flush()
    from yak_tpu.parallel.mesh import MeshTable
    if isinstance(table, MeshTable):
        return _main_chkerr_mesh(opt, table, seq_fn, out)
    use_join, jinterp = join_enabled(k)
    ps_use, ps_interp = psort_enabled(k <= 31)
    ps_post = use_join and (ps_use or ps_interp)
    itp = jinterp or ps_interp
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    M = chunk - k + 1
    fold = _ChkerrFold(opt, k, out)

    from yak_tpu.utils import retry_transient

    def make_dispatch(arg, planes_key, h):
        def dispatch():
            if ps_post:
                # full Pallas path: JOIN kernel -> bitonic order
                # restore -> marker extraction -> bitonic marker
                # compaction (no XLA full-lane sorts anywhere)
                ov, pay, vflat = run_join_lookup(
                    table, k, planes_key, arg, M, interpret=itp)
                vs = join_restore_vals(ov, pay, M, interpret=itp)
                key, payload, n = get_chkerr_psort_mid(
                    int(opt.min_cnt), M, qv_psort_pad(M))(vs, vflat)
                k_s, p_s = run_marker_psort(key, payload, CHKERR_MAX_RUNS,
                                            interpret=itp)
                h["o"] = (k_s, n, p_s)
                h["u32"] = True
                h["vs"] = (vs, vflat)
            elif use_join:
                import os
                ov, pay, vflat = run_join_lookup(
                    table, k, planes_key, arg, M, interpret=jinterp)
                if os.environ.get("YAK_TPU_MARK_COMPACT", "1") != "0":
                    # compaction variant: ONE streaming pallas_compact
                    # pass instead of _chkerr_reduce's full-lane u64
                    # marker sort (mirrors the trioeval mid)
                    from yak_tpu.ops.countstep import (
                        get_chkerr_mark_mid, run_mark_compact)
                    khi, pmark, n = get_chkerr_mark_mid(
                        k, int(opt.min_cnt), M)(ov, pay, vflat)
                    lanes_d, pay_d = run_mark_compact(
                        khi, pmark, CHKERR_MAX_RUNS, interpret=jinterp)
                    h["o"] = (lanes_d, n, pay_d)
                    h["u32"] = True
                else:
                    h["o"] = get_chkerr_join_post(
                        k, int(opt.min_cnt), M)(ov, pay, vflat)
            else:
                step = get_chkerr_step(k, int(opt.min_cnt),
                                       planes_L=planes_key)
                h["o"] = step(arg, table.keys, table.cnt, table.size)
        return dispatch

    def produce():
        """2-deep dispatch pipeline: chunk i's device work overlaps the
        host streak pass of chunk i-1 (kt_pipeline overlap shape)."""
        pending = []
        for packed in ChunkSource(seq_fn, chunk, k, with_meta="records"):
            if not len(packed.rec_gid):
                continue
            arg, planes_key = pack_chunk_planes(packed.codes, packed)
            h = {}
            dispatch = make_dispatch(arg, planes_key, h)
            dispatch()
            pending.append((packed, arg, planes_key, h, dispatch))
            if len(pending) >= 2:
                yield pending.pop(0)
        yield from pending

    for packed, arg, planes_key, h, dispatch in produce():
        nseq = len(packed.rec_gid)

        def fetch():
            # every d2h read inside the retry closure (advisor r2 #4:
            # a transient device fault at ANY fetch must replay)
            o = h["o"]
            n = int(o[1])
            if n > CHKERR_MAX_RUNS:
                return n, None, None
            if h.get("u32"):
                return n, np.asarray(o[0])[:n], np.asarray(o[2])[:n]
            return n, np.asarray(o[0])[:n], None

        n, key_np, pay_np = retry_transient(fetch, redo=dispatch)
        if n > CHKERR_MAX_RUNS:
            # marker overflow (low-coverage table vs a large input):
            # recover the per-lane low mask and find run ends on host —
            # same (lane, len) pairs, just a full value-stream transfer
            # instead of sparse markers
            if h.get("vs"):
                # restored values are already device-resident
                v, hs = retry_transient(
                    lambda: (np.asarray(h["vs"][0])[:M],
                             np.asarray(h["vs"][1]).reshape(-1)[:M]
                             .astype(bool)),
                    redo=dispatch)
                lanes, lens = _host_low_runs(hs & (v < opt.min_cnt))
            else:
                from yak_tpu.ops.countstep import get_scan_step
                sstep = get_scan_step(k, planes_L=planes_key)
                vals = retry_transient(
                    lambda: np.asarray(sstep(
                        arg, table.keys, table.cnt,
                        table.size)).reshape(-1))
                lanes, lens = _host_low_runs(
                    (vals > -2) & (vals < opt.min_cnt))
        elif h.get("u32"):
            lanes = key_np.astype(np.int64)
            lens = pay_np.astype(np.int64)
        else:
            lanes = (key_np >> np.uint64(24)).astype(np.int64)
            lens = (key_np & np.uint64((1 << 24) - 1)).astype(np.int64)

        fold.chunk(packed, lanes, lens, M)
    fold.finish()


def _host_low_runs(vals_low):
    """(lane, len) ends of low-count runs from a per-lane low mask —
    the host marker fallback when the sparse budget overflows."""
    lane = np.arange(len(vals_low), dtype=np.int64)
    last_high = np.maximum.accumulate(np.where(vals_low, -1, lane))
    is_end = vals_low & ~np.append(vals_low[1:], False)
    return lane[is_end], lane[is_end] - last_high[is_end]


class _ChkerrFold:
    """Host side of the chkerr device fold: maps marker lanes to
    sequence positions and merges runs spanning chunk boundaries;
    shared by the single-chip and mesh drivers (chkerr.c:55-68)."""

    def __init__(self, opt, k, out):
        self.opt, self.k, self.out = opt, k, out
        self.carry = None   # (name, gi, streak, end_pos) open run

    def emit(self, name, streak, endpos):
        if streak > self.opt.min_streak:
            k = self.k
            self.out.write(f"{name}\t{endpos + 1 - k - (streak - 1)}\t"
                           f"{endpos + 1}\t{streak}\n")

    def chunk(self, packed, lanes, lens, M):
        nseq = len(packed.rec_gid)
        n = len(lanes)
        starts = np.minimum(packed.rec_start, M)
        seg_of = np.searchsorted(starts, lanes, side="right") - 1
        continues = (int(packed.rec_off0[-1] + packed.rec_take[-1])
                     < int(packed.rec_len[-1]))
        ws0 = int(starts[0])
        # last window lane of the final piece (piece windows are
        # [start, start + take - k] inclusive)
        we = int(packed.rec_start[-1] + packed.rec_take[-1] - self.k)

        if self.carry is not None:
            name_c, gi_c, streak_c, end_c = self.carry
            self.carry = None
            if (n > 0 and int(seg_of[0]) == 0
                    and int(lanes[0] - lens[0] + 1) == ws0
                    and int(packed.rec_gid[0]) == gi_c):
                lens[0] += streak_c   # merged across the chunk boundary
            else:
                self.emit(name_c, streak_c, end_c)

        for i in range(n):
            j = int(seg_of[i])
            gi = int(packed.rec_gid[j])
            endpos = (int(lanes[i]) - int(starts[j])
                      + int(packed.rec_off0[j]) + self.k - 1)
            streak = int(lens[i])
            if continues and j == nseq - 1 and int(lanes[i]) == we:
                self.carry = (packed.seq_names[gi], gi, streak, endpos)
            else:
                self.emit(packed.seq_names[gi], streak, endpos)

    def finish(self):
        if self.carry is not None:
            name_c, _gi, streak_c, end_c = self.carry
            self.emit(name_c, streak_c, end_c)
            self.carry = None


def _main_chkerr_mesh(opt, table, seq_fn, out):
    """Mesh tables: fused group fold — routed group lookups + the
    vmapped sparse-marker reduction (ops/countstep._chkerr_reduce) on
    device, then the shared host streak fold.  Budget overflow for a
    chunk recomputes markers from that chunk's per-lane values (already
    device-resident from the routed lookup)."""
    import jax
    import jax.numpy as jnp

    from yak_tpu.ops.countstep import CHKERR_MAX_RUNS, _chkerr_reduce
    from yak_tpu.parallel.mesh import mesh_routed_groups

    k = table.k
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    M = chunk - k + 1
    fold = _ChkerrFold(opt, k, out)
    reducer = jax.jit(jax.vmap(
        lambda v, hs: _chkerr_reduce(v, hs, int(opt.min_cnt), M)))

    for group, vals, hasw in mesh_routed_groups(seq_fn, table, chunk):
        keys_d, n_d = reducer(vals, hasw)
        n_np = np.asarray(n_d)
        keys_np = np.asarray(keys_d)
        for i, packed in enumerate(group):
            n = int(n_np[i])
            if n > CHKERR_MAX_RUNS:
                v = np.asarray(vals[i]).reshape(-1)[:M]
                hs = np.asarray(hasw[i]).reshape(-1)[:M].astype(bool)
                lanes, lens = _host_low_runs(hs & (v < opt.min_cnt))
            else:
                ks = keys_np[i][:n]
                lanes = (ks >> np.uint64(24)).astype(np.int64)
                lens = (ks & np.uint64((1 << 24) - 1)).astype(np.int64)
            fold.chunk(packed, lanes, lens, M)
    fold.finish()
