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
    """Device fold: run markers come back as sparse (lane, len) pairs
    (ops/countstep.get_chkerr_step); the host maps lanes to sequence
    positions via the record-piece meta and merges runs that span a
    chunk boundary (the halo makes piece windows seamless)."""
    import jax.numpy as jnp

    from yak_tpu.io.chunks import ChunkSource
    from yak_tpu.io.pack import pack_chunk_planes
    from yak_tpu.ops.countstep import (CHKERR_MAX_RUNS, get_chkerr_step,
                                       get_chkerr_join_post,
                                       join_enabled, run_join_lookup)

    out = out or sys.stdout
    k = table.k
    table.flush()
    from yak_tpu.parallel.mesh import MeshTable
    if isinstance(table, MeshTable):
        return _main_chkerr_mesh(opt, table, seq_fn, out)
    use_join, jinterp = join_enabled(k)
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    M = chunk - k + 1
    carry = None       # (gi, streak, end_pos) open run at a piece end

    def emit(name, streak, endpos):
        if streak > opt.min_streak:
            out.write(f"{name}\t{endpos + 1 - k - (streak - 1)}\t"
                      f"{endpos + 1}\t{streak}\n")

    from yak_tpu.utils import retry_transient

    def make_dispatch(arg, planes_key, h):
        def dispatch():
            if use_join:
                ov, pay, vflat = run_join_lookup(
                    table, k, planes_key, arg, M, interpret=jinterp)
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
        n = retry_transient(lambda: int(h["o"][1]), redo=dispatch)
        key_d = h["o"][0]
        if n > CHKERR_MAX_RUNS:
            # marker overflow (low-coverage table vs a large input):
            # re-run this chunk through the per-position scan step and
            # find the run ends on host — same (lane, len) pairs, just
            # a full value-stream transfer instead of sparse markers
            from yak_tpu.ops.countstep import get_scan_step
            sstep = get_scan_step(k, planes_L=planes_key)
            vals = np.asarray(sstep(arg, table.keys, table.cnt,
                                    table.size)).reshape(-1)
            low = (vals > -2) & (vals < opt.min_cnt)
            lane = np.arange(len(low), dtype=np.int64)
            last_high = np.maximum.accumulate(np.where(low, -1, lane))
            is_end = low & ~np.append(low[1:], False)
            lanes = lane[is_end]
            lens = lanes - last_high[is_end]
            n = len(lanes)
        else:
            keys = np.asarray(key_d)[:n]
            lanes = (keys >> np.uint64(24)).astype(np.int64)
            lens = (keys & np.uint64((1 << 24) - 1)).astype(np.int64)
            n = len(keys)

        starts = np.minimum(packed.rec_start, M)
        seg_of = np.searchsorted(starts, lanes, side="right") - 1
        continues = (int(packed.rec_off0[-1] + packed.rec_take[-1])
                     < int(packed.rec_len[-1]))
        ws0 = int(starts[0])
        # last window lane of the final piece (piece windows are
        # [start, start + take - k] inclusive)
        we = int(packed.rec_start[-1] + packed.rec_take[-1] - k)

        if carry is not None:
            name_c, gi_c, streak_c, end_c = carry
            carry = None
            if (n > 0 and int(seg_of[0]) == 0
                    and int(lanes[0] - lens[0] + 1) == ws0
                    and int(packed.rec_gid[0]) == gi_c):
                lens[0] += streak_c     # merged across the chunk boundary
            else:
                emit(name_c, streak_c, end_c)

        for i in range(n):
            j = int(seg_of[i])
            gi = int(packed.rec_gid[j])
            endpos = (int(lanes[i]) - int(starts[j])
                      + int(packed.rec_off0[j]) + k - 1)
            streak = int(lens[i])
            if continues and j == nseq - 1 and int(lanes[i]) == we:
                carry = (packed.seq_names[gi], gi, streak, endpos)
            else:
                emit(packed.seq_names[gi], streak, endpos)
    if carry is not None:
        name_c, _gi, streak_c, end_c = carry
        emit(name_c, streak_c, end_c)


def _main_chkerr_mesh(opt, table, seq_fn, out):
    """Mesh tables: routed per-position scan (scan_file_mesh) + the
    host streak pass per sequence (chkerr.c:55-68 semantics)."""
    from yak_tpu.models.scan import scan_file_mesh

    k = table.k
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    for name, L, vals in scan_file_mesh(seq_fn, table, chunk):
        low = (vals != NO_KMER) & (vals < opt.min_cnt)
        if not low.any():
            continue
        lane = np.arange(len(low), dtype=np.int64)
        last_high = np.maximum.accumulate(np.where(low, -1, lane))
        is_end = low & ~np.append(low[1:], False)
        for endpos, streak in zip(lane[is_end],
                                  lane[is_end] - last_high[is_end]):
            if streak > opt.min_streak:
                out.write(f"{name}\t{endpos + 1 - k - (streak - 1)}\t"
                          f"{endpos + 1}\t{streak}\n")
