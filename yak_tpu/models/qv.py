"""Assembly/read QV estimation (qv.c) and the empirical QV model
(yak_qv_solve, qv.c:146-244 + the gjdn solver, 6gjdn.c).

The hot loop (per k-mer table probes) runs on device via models/scan;
the per-sequence gating and the microseconds-scale float64 model fit
stay on host (they need float64 and are negligible work — SURVEY §7).
"""

import math
import sys
from dataclasses import dataclass, field

import numpy as np

from yak_tpu import YAK_N_COUNTS
from yak_tpu.models.scan import scan_file, NO_KMER
from yak_tpu.utils import retry_transient

_Q = 4.3429448190325175  # 10 / ln 10


def _log(x):
    """IEEE log like C's: log(0) = -inf, log(<0) = nan, no exceptions."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.log(np.float64(x)))


def _solve_full_pivot(A, B):
    """Solve A x = B by Gauss-Jordan with full pivoting, the same pivot
    strategy as the reference's solver (6gjdn.c) so results — including
    inf/nan propagation on degenerate fits — follow the same arithmetic
    path.  A: (n, n), B: (n,); both modified in place; returns B (= x)."""
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    n = A.shape[0]
    col_swaps = []
    for k in range(n):
        sub = np.abs(A[k:, k:])
        # C's strict `t > d` never selects NaN entries and starts from 0.0
        sub_c = np.where(np.isnan(sub), -1.0, sub)
        flat = int(np.argmax(sub_c))  # first max, row-major, like the 2 loops
        pr, pc = k + flat // (n - k), k + flat % (n - k)
        d = max(float(sub_c[flat // (n - k), flat % (n - k)]), 0.0)
        if d + 1.0 == 1.0:
            # reference gjdn bails here but its caller ignores the return
            # value (qv.c:220) and keeps the partially transformed B
            print("ERROR: fail", file=sys.stderr)
            return B
        col_swaps.append(pc)
        if pc != k:
            A[:, [k, pc]] = A[:, [pc, k]]
        if pr != k:
            A[[k, pr], k:] = A[[pr, k], k:]
            B[[k, pr]] = B[[pr, k]]
        d = A[k, k]
        A[k, k + 1:] /= d
        B[k] /= d
        for j in range(k + 1, n):
            for i in range(n):
                if i != k:
                    A[i, j] -= A[i, k] * A[k, j]
        for i in range(n):
            if i != k:
                B[i] -= A[i, k] * B[k]
    for k in range(n - 1, -1, -1):
        if col_swaps[k] != k:
            B[[k, col_swaps[k]]] = B[[col_swaps[k], k]]
    return B


@dataclass
class QvOpts:
    """Defaults per yak_qopt_init (qv.c:137-144)."""
    print_each: bool = False
    print_err_kmer: bool = False
    min_len: int = 0
    n_threads: int = 4
    min_frac: float = 0.5
    fpr: float = 0.00004
    chunk_size: int = 1_000_000_000


@dataclass
class QStat:
    tot: int = 0
    qv_raw: float = -1.0
    qv: float = -1.0
    cov: float = 0.0
    err: float = 0.0
    fpr_lower: float = 0.0
    fpr_upper: float = 0.0
    adj_cnt: np.ndarray = field(
        default_factory=lambda: np.zeros(YAK_N_COUNTS))


def run_qv(opt, fn, table, out=None, scan=None):
    """Stream `fn` against `table`; returns the global occurrence-count
    vector cnt[1024] (yak_qv, qv.c:116-135).  SQ/EK lines go to `out`.

    Default paths: the fused device reduction — per-position values
    never leave the chip(s).  Single-chip tables use
    ops/countstep.get_qv_step; mesh-sharded tables use the grouped
    shard_map fold (parallel/mesh.build_qv_group_step).  The
    per-position scan path remains for -E (err-kmer positions)."""
    from yak_tpu.parallel.mesh import MeshTable

    is_mesh = isinstance(table, MeshTable)
    if scan is None:
        # single-chip: always the fused fold — k >= 32 rides the
        # hash_long extractors + the wide table lookup inside
        # get_qv_step (the reference ABORTS there, qv.c:43 assert;
        # we run it at fused speed).  The JOIN engages only for
        # k <= 31 inside _run_qv_fused.
        if not is_mesh:
            return _run_qv_fused(opt, fn, table, out or sys.stdout)
        if table.k < 32 and not opt.print_err_kmer:
            return _run_qv_fused_mesh(opt, fn, table, out or sys.stdout)
    if scan is None and is_mesh:
        from yak_tpu.models.scan import scan_file_mesh
        scan = scan_file_mesh
    return _run_qv_scan(opt, fn, table, out, scan)


def _sq_text(name, L, tot, non0, k):
    qv = -1.0
    if tot > 0:
        if non0 > 0:
            if tot > non0:
                qv = math.log(tot / non0) / k
                qv = -_Q * math.log(qv)
            else:
                qv = 99.0
        else:
            qv = 0.0
    return f"SQ\t{name}\t{L}\t{tot}\t{non0}\t{qv:.2f}\n"


def _sq_line(out, name, L, tot, non0, k):
    out.write(_sq_text(name, L, tot, non0, k))


def _qv_chunk_meta(packed, M, ns, carry_gi, min_len):
    """Build one chunk's device-fold meta row (ops/countstep._qv_reduce
    contract) plus host bookkeeping.

    Returns (meta i32[2*ns+6], info, new_carry_gi) where info =
    (nseq, g0, has_head, continues, head_end, j_inc) feeds the -p
    bookkeeping (_qv_sq_update) and new_carry_gi is the host mirror of
    the device carry identity."""
    nseq = len(packed.rec_gid)
    gis = packed.rec_gid
    g0, last_gi = int(gis[0]), int(gis[-1])
    # segment bounds: first window lane of each local segment
    starts = np.minimum(packed.rec_start, M)
    # does the last seq continue into the next chunk?
    continues = (int(packed.rec_off0[-1] + packed.rec_take[-1])
                 < int(packed.rec_len[-1]))
    has_head = carry_gi is not None
    if has_head:
        assert carry_gi == g0, "carry must resume the first seg"
    if has_head and continues and nseq == 1:
        head_end, inc_start, j_inc = 0, 0, 0   # middle piece
    else:
        head_end = (int(starts[1]) if nseq > 1 else M) if has_head \
            else 0
        inc_start = int(starts[-1]) if continues else M
        j_inc = nseq - 1 if continues else 0
    head_elig = (packed.seq_lens[carry_gi] >= min_len) \
        if has_head else True
    meta = np.full(2 * ns + 6, M, np.int32)
    meta[:nseq] = starts
    meta[ns + 1:2 * ns + 1] = 0
    meta[ns + 1:ns + 1 + nseq] = packed.rec_len >= min_len
    meta[2 * ns + 1:] = (head_end, inc_start, j_inc, int(head_elig),
                         int(continues))
    if has_head and continues and nseq == 1:
        new_carry = carry_gi                   # carry unchanged
    elif continues:
        new_carry = last_gi
    else:
        new_carry = None
    return meta, (nseq, g0, has_head, continues, head_end, j_inc), \
        new_carry


def _qv_pad_meta(M, ns):
    """Meta row for an all-pad group-fill chunk: a mid-style passthrough
    (head_end = 0, inc_start = 0, cont = 1) — a live carry passes
    through untouched (zero totals everywhere); with no carry it opens
    an empty one that the end of stream discards harmlessly."""
    meta = np.full(2 * ns + 6, M, np.int32)
    meta[ns + 1:2 * ns + 1] = 0
    meta[2 * ns + 1:] = (0, 0, 0, 0, 1)
    return meta


def _qv_out_update(packed, info, tot_np, non0_np, h_carry, blocks,
                   min_len, k, print_each, ek_txt=None, carry_ek=None):
    """Per-chunk output assembly: per completed sequence, its EK rows
    (-E) followed by its SQ row (-p), in input order (the reference's
    worker emits both inside one per-seq loop, qv.c:62-81);
    chunk-spanning pieces accumulate through h_carry / carry_ek."""
    nseq, g0, has_head, continues, head_end, j_inc = info
    gis = packed.rec_gid
    ek = ek_txt if ek_txt is not None else [""] * nseq
    if has_head and head_end == 0:      # middle piece
        h_carry[0] += int(tot_np[0])
        h_carry[1] += int(non0_np[0])
        if carry_ek is not None:
            carry_ek[0] += ek[0]
        return

    def emit(name, L, tot, non0, ektext):
        if L < min_len:
            return
        t = ektext
        if print_each:
            t += _sq_text(name, L, tot, non0, k)
        if t:
            blocks.append(t)

    if has_head:
        emit(packed.seq_names[g0], packed.seq_lens[g0],
             h_carry[0] + int(tot_np[0]),
             h_carry[1] + int(non0_np[0]),
             ((carry_ek[0] if carry_ek is not None else "") + ek[0]))
        h_carry[:] = [0, 0]
        if carry_ek is not None:
            carry_ek[0] = ""
    for j in range(1 if has_head else 0,
                   nseq - 1 if continues else nseq):
        gi = int(gis[j])
        emit(packed.seq_names[gi], packed.seq_lens[gi],
             int(tot_np[j]), int(non0_np[j]), ek[j])
    if continues:
        h_carry[:] = [int(tot_np[j_inc]), int(non0_np[j_inc])]
        if carry_ek is not None:
            carry_ek[0] += ek[j_inc]


def _run_qv_fused_mesh(opt, fn, mtable, out):
    """Mesh-sharded fused qv: groups of n_dev plane-packed chunks run
    the routed lookup + per-chunk reduction data-parallel inside
    shard_map, then the carry fold chains the group on device
    (parallel/mesh.build_qv_group_step) — one dispatch per GROUP and,
    without -p, zero per-group transfers beyond the route-overflow
    flag."""
    import jax.numpy as jnp

    from yak_tpu.io.chunks import ChunkSource
    from yak_tpu.ops.countstep import psort_enabled
    from yak_tpu.parallel.mesh import (_pack_group_planes,
                                       build_lookup_psort,
                                       build_qv_group_post,
                                       build_qv_group_step,
                                       default_route_cap)

    k = mtable.k
    n_dev = mtable.n_dev
    use_ps, ps_interp = psort_enabled(k <= 31)
    use_ps = use_ps or ps_interp
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    M = chunk - k + 1
    cnt_d = jnp.zeros(YAK_N_COUNTS, jnp.int64)
    c_tot = jnp.int32(-1)
    c_non0 = jnp.int32(0)
    c_hist = jnp.zeros(YAK_N_COUNTS, jnp.int64)
    carry_gi = None
    h_carry = [0, 0]
    blocks = []
    route = {"C": default_route_cap(M, n_dev)}
    steps = {}

    def flush_group(group):
        nonlocal cnt_d, c_tot, c_non0, c_hist, carry_gi
        if not group:
            return
        ns = max(1 << 12, 1 << int(
            max(max(len(p.rec_gid) for p in group) - 1, 1)).bit_length())
        metas, infos = [], []
        for p in group:
            meta, info, carry_gi = _qv_chunk_meta(p, M, ns, carry_gi,
                                                  opt.min_len)
            metas.append(meta)
            infos.append(info)
        while len(metas) < n_dev:
            metas.append(_qv_pad_meta(M, ns))
        import jax
        planes = jax.device_put(jnp.asarray(_pack_group_planes(
            group, chunk, n_dev)), mtable.sh)
        meta_d = jnp.asarray(np.stack(metas))
        while True:
            if use_ps:
                # psort engine: routed per-chip Pallas JOIN, then the
                # group reduction + carry chain in one post jit
                run = build_lookup_psort(mtable.mesh, k, chunk,
                                         route["C"])
                vals, hasw, ovf = run(planes, mtable.keys, mtable.cnt,
                                      mtable.size, interpret=ps_interp)
                if int(np.asarray(ovf).max()):
                    route["C"] = min(M, route["C"] * 2)
                    continue
                key = ("post", ns)
                if key not in steps:
                    steps[key] = build_qv_group_post(
                        mtable.mesh, k, ns, chunk,
                        min_frac=float(opt.min_frac))
                out7 = steps[key](vals, hasw, meta_d, cnt_d, c_tot,
                                  c_non0, c_hist)
                break
            key = (ns, route["C"], mtable.cap)
            if key not in steps:
                steps[key] = build_qv_group_step(
                    mtable.mesh, k, ns, chunk, route_cap=route["C"],
                    min_frac=float(opt.min_frac))
            out7 = steps[key](planes, meta_d, cnt_d, c_tot, c_non0,
                              c_hist, mtable.keys, mtable.cnt,
                              mtable.size)
            if not int(np.asarray(out7[6]).max()):
                break
            route["C"] = min(M, route["C"] * 2)   # replay, state intact
        cnt_d, c_tot, c_non0, c_hist, tot_d, non0_d = out7[:6]
        if opt.print_each:
            tot_np = np.asarray(tot_d)
            non0_np = np.asarray(non0_d)
            for i, (p, info) in enumerate(zip(group, infos)):
                _qv_out_update(p, info, tot_np[i], non0_np[i],
                               h_carry, blocks, opt.min_len, k,
                               opt.print_each)

    group = []
    for packed in ChunkSource(fn, chunk, k, with_meta="records"):
        if not len(packed.rec_gid):
            continue
        group.append(packed)
        if len(group) == n_dev:
            flush_group(group)
            group = []
    flush_group(group)
    out.write("".join(blocks))
    return np.asarray(cnt_d)


def _run_qv_fused(opt, fn, table, out):
    """Device-resident qv fold: the whole accumulation — per-seg
    reductions, min_frac gating, the spanning-sequence carry, and the
    global histogram — lives on device (ops/countstep.get_qv_step), so
    the default path has ZERO per-chunk transfers back and the chunk
    steps pipeline like the count path.  -p additionally fetches the
    per-seg scalars per chunk for the SQ lines."""
    import jax
    import jax.numpy as jnp

    from yak_tpu.io.chunks import ChunkSource
    from yak_tpu.io.pack import pack_chunk_planes
    from yak_tpu.ops import pallas_compact, pallas_merge
    from yak_tpu.ops.countstep import get_qv_join_post, get_qv_step

    import os
    import time as _time
    dbg = os.environ.get("YAK_TPU_QV_DEBUG")
    T = {"ingest": 0.0, "host": 0.0, "pack": 0.0, "dispatch": 0.0}

    k = table.k
    table.flush()
    # Pallas merge-path JOIN (default ON on TPU, YAK_TPU_JOIN=0 to
    # disable): the sorted table streams through the kernel once
    # instead of re-sorting with the batch.  Measured r2 on v5e with
    # varied inputs: 47ms/chunk device vs 115ms for the XLA sorted
    # join, 54-58M lookups/s end-to-end vs 36M (the r1 "3-dispatch
    # latency" penalty no longer reproduces with the split pre/post
    # jits).
    join_interp = os.environ.get("YAK_TPU_JOIN_INTERPRET", "0") == "1"
    use_join = k <= 31 and (join_interp or (
        pallas_compact.enabled() and jax.default_backend() == "tpu"
        and os.environ.get("YAK_TPU_JOIN", "1") != "0"))
    # chunk cap 2^23: measured r2, 2^24 join chunks LOSE (41-47M/s vs
    # 55-58M/s) — the batch sort's superlinear growth outweighs the
    # halved per-chunk dispatch latency
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    cnt_d = jnp.zeros(YAK_N_COUNTS, jnp.int64)
    c_tot = jnp.int32(-1)
    c_non0 = jnp.int32(0)
    c_hist = jnp.zeros(YAK_N_COUNTS, jnp.int64)
    carry_gi = None            # host mirror: which seq the carry is
    h_carry = [0, 0]           # host mirror of (tot, non0) for -p
    blocks = []                # per-seq output text, input order
    carry_ek = [""]            # EK rows of the chunk-spanning seq
    want_ek = bool(opt.print_err_kmer)
    from yak_tpu.utils import Progress
    prog = Progress("run_qv")

    _src_iter = iter(ChunkSource(fn, chunk, k, with_meta="records"))
    while True:
        _t0 = _time.time()
        try:
            packed = next(_src_iter)
        except StopIteration:
            break
        T["ingest"] += _time.time() - _t0
        _t0 = _time.time()
        M = chunk - k + 1
        nseq = len(packed.rec_gid)
        if not nseq:
            continue
        ns = max(1 << 12, 1 << int(max(nseq - 1, 1)).bit_length())
        meta, info, carry_gi = _qv_chunk_meta(packed, M, ns, carry_gi,
                                              opt.min_len)
        T["host"] += _time.time() - _t0
        _t0 = _time.time()
        arg, planes_key = pack_chunk_planes(packed.codes, packed)
        T["pack"] += _time.time() - _t0
        _t0 = _time.time()
        # seg-payload join post (YAK_TPU_QV_SEG=1): restores GROUPING
        # (one narrow u32 sort) instead of per-lane order.  Measured r2
        # on v5e: NO end-to-end win (0.91s vs 0.78s for the 48M-lookup
        # bench) — the post's cost is spread across many full-lane
        # passes, not the u64 restore sort — so default OFF; kept as a
        # correctness-tested alternative for future post work.
        use_seg = os.environ.get("YAK_TPU_QV_SEG", "0") == "1"
        # dispatch closes over the PRE-step fold state, so a transient
        # device fault at any of the per-chunk d2h fetches below can
        # re-dispatch and retry (retry_transient; the fold rebinds only
        # after the fetches succeed)
        st = (cnt_d, c_tot, c_non0, c_hist)
        h = {}

        def dispatch():
            if use_join and use_seg and not want_ek:
                from yak_tpu.ops.countstep import (get_qv_join_post_seg,
                                                   get_qv_join_pre_seg)
                Mw = chunk - k + 1
                meta_j = jnp.asarray(meta)
                pre = get_qv_join_pre_seg(k, planes_key, ns)
                *args8, pay = pre(arg, meta_j, table.keys, table.cnt,
                                  table.size)
                kout = pallas_merge.merge_reduce(
                    *args8, Na=table.cap, Nb=Mw, lookup=True,
                    interpret=join_interp)
                post = get_qv_join_post_seg(k, ns, Mw,
                                            min_frac=float(opt.min_frac))
                h["o"] = post(kout[2], pay, meta_j, *st)
            elif use_join:
                Mw = chunk - k + 1
                from yak_tpu.ops.countstep import (psort_enabled,
                                                   run_join_lookup,
                                                   run_qv_join_post_psort)
                ov, pay, vflat = run_join_lookup(
                    table, k, planes_key, arg, Mw,
                    interpret=join_interp)
                ps_use, ps_interp = psort_enabled(k <= 31)
                if (ps_use or ps_interp) and not want_ek:
                    # both post sorts (order restore + region
                    # histogram) in the bitonic kernels
                    h["o"] = run_qv_join_post_psort(
                        ov, pay, vflat, jnp.asarray(meta), st, ns, Mw,
                        min_frac=float(opt.min_frac),
                        interpret=join_interp or ps_interp)
                else:
                    post = get_qv_join_post(
                        k, ns, Mw, min_frac=float(opt.min_frac),
                        emit_ek=want_ek)
                    h["o"] = post(ov, pay, vflat, jnp.asarray(meta),
                                  *st)
            else:
                step = get_qv_step(k, ns, planes_L=planes_key,
                                   min_frac=float(opt.min_frac),
                                   emit_ek=want_ek)
                outs = step(arg, jnp.asarray(meta), *st,
                            table.keys, table.cnt, table.size)
                h["o"] = outs

        dispatch()
        if opt.print_each or want_ek:
            def fetch():
                o = h["o"]
                r = [np.asarray(o[4]), np.asarray(o[5])]
                if want_ek:
                    r += [int(np.asarray(o[7])), np.asarray(o[6])]
                return r

            fetched = retry_transient(fetch, redo=dispatch)
        outs = h["o"]
        cnt_d, c_tot, c_non0, c_hist, tot_d, non0_d = outs[:6]

        ek_txt = None
        if want_ek:
            # sparse 0-count markers -> per-seq EK rows (qv.c:62-64)
            from yak_tpu.ops.countstep import QV_MAX_EK, get_scan_step
            nz = fetched[2]
            if nz > QV_MAX_EK:
                sstep = get_scan_step(k, planes_L=planes_key)
                vals = retry_transient(
                    lambda: np.asarray(sstep(arg, table.keys, table.cnt,
                                             table.size))).reshape(-1)
                zl = np.flatnonzero((vals != -2) & (vals <= 0)
                                    ).astype(np.int64)
            else:
                zl = fetched[3][:nz].astype(np.int64)
            starts_np = np.minimum(packed.rec_start, M)
            zseg = np.searchsorted(starts_np, zl, side="right") - 1
            zb = np.concatenate(
                [np.searchsorted(zseg, np.arange(info[0])), [len(zl)]])
            ek_txt = []
            for j in range(info[0]):
                gi_j = int(packed.rec_gid[j])
                nm = packed.seq_names[gi_j]
                base = int(packed.rec_off0[j]) - int(starts_np[j])
                ek_txt.append("".join(
                    f"EK\t{nm}\t{int(l) + base}\n"
                    for l in zl[zb[j]:zb[j + 1]]))

        if opt.print_each or want_ek:
            # host mirror of totals (sync per chunk; -p/-E modes only)
            _qv_out_update(packed, info, fetched[0], fetched[1],
                           h_carry, blocks, opt.min_len, k,
                           opt.print_each, ek_txt=ek_txt,
                           carry_ek=carry_ek)

        # per-chunk progress in the reference shape (qv.c:104-106)
        prog.line(f"processed {nseq} sequences")
        T["dispatch"] += _time.time() - _t0
    out.write("".join(blocks))
    _t0 = _time.time()
    r = np.asarray(cnt_d)
    if dbg:
        T["final_sync"] = _time.time() - _t0
        print("[qv-debug]", {a: round(b, 2) for a, b in T.items()},
              file=sys.stderr)
    return r


def _run_qv_scan(opt, fn, table, out=None, scan=None):
    """Per-position scan path (SURVEY qv.c host loop)."""
    out = out or sys.stdout
    scan = scan or scan_file
    k = table.k
    # (the REFERENCE asserts k < 32 here, qv.c:43; our scan and fused
    # paths both handle k >= 32 through the hash_long extractors)
    cnt = np.zeros(YAK_N_COUNTS, np.int64)
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    for name, L, vals in scan(fn, table, chunk):
        if L < opt.min_len:
            continue
        has_kmer = vals != NO_KMER
        t = np.maximum(vals, 0)          # t < 0 -> 0 (qv.c:60)
        tot = int(np.count_nonzero(has_kmer))
        non0 = int(np.count_nonzero(t > 0))
        if opt.print_err_kmer:
            for i in np.nonzero(has_kmer & (t == 0))[0]:
                out.write(f"EK\t{name}\t{i + 1 - k}\n")
        if opt.print_each:
            qv = -1.0
            if tot > 0:
                if non0 > 0:
                    if tot > non0:
                        qv = math.log(tot / non0) / k
                        qv = -_Q * math.log(qv)
                    else:
                        qv = 99.0
                else:
                    qv = 0.0
            out.write(f"SQ\t{name}\t{L}\t{tot}\t{non0}\t{qv:.2f}\n")
        if non0 < tot * opt.min_frac:
            continue
        cnt += np.bincount(t[has_kmer], minlength=YAK_N_COUNTS)
    return cnt


def qv_solve(hist, cnt, kmer, fpr):
    """The empirical QV model (yak_qv_solve).

    hist: 1024-bin histogram of the read table; cnt: 1024-bin occurrence
    histogram of the evaluated sequence's k-mers.  Returns (ret, QStat);
    ret == -1 means the adjusted model was not computable (low coverage)
    and only qv_raw is meaningful.
    """
    hist = np.asarray(hist, np.int64)
    cnt = np.asarray(cnt, np.int64)
    n = YAK_N_COUNTS
    qs = QStat()
    qs.err = float(cnt[0])
    qs.tot = int(cnt.sum())
    qs.adj_cnt = cnt.astype(np.float64).copy()
    if qs.tot > 0 and qs.tot > cnt[0]:
        qs.qv_raw = -_Q * _log(_log(qs.tot / (qs.tot - cnt[0])) / kmer)

    # spectrum peak (first strict max over [2, 1022]) and valley before it
    max_c, max_cnt = -1, 0
    for c in range(2, n - 1):
        if cnt[c] > max_cnt:
            max_cnt, max_c = int(cnt[c]), c
    if max_c < 0:
        qs.fpr_upper = 1.0
        # degenerate input (no counted k-mer occurs twice): the
        # reference reads cnt[-1]/hist[-1] here (qv.c:165 with
        # max_c == -1, OOB) which lands on zeroed allocator memory on
        # this platform -> 0.0/0.0 -> x86 default QNaN, printed
        # "-nan"; reproduce the observable CV line exactly
        qs.cov = float("-nan")
        return -1, qs
    min_c, min_cnt = -1, max_cnt
    for c in range(2, max_c):
        if cnt[c] < min_cnt:
            min_cnt, min_c = int(cnt[c]), c
    qs.cov = cnt[max_c] / hist[max_c] if hist[max_c] else math.inf

    qs.fpr_upper = 1.0
    for c in range(2, max_c):
        denom = qs.cov * hist[c]
        e = cnt[c] / denom if denom else math.inf
        if e < qs.fpr_upper:
            qs.fpr_upper = e
    if fpr > qs.fpr_upper:
        fpr = qs.fpr_upper * 0.5

    qs.fpr_lower = 0.0
    if min_c > 2 and hist[2] > hist[min_c]:
        e = (cnt[2] - cnt[min_c]) / (qs.cov * (hist[2] - hist[min_c]))
        if e > qs.fpr_lower:
            qs.fpr_lower = e
    if fpr < qs.fpr_lower:
        fpr = qs.fpr_lower
    if qs.fpr_lower >= qs.fpr_upper:
        print("Warning: the FPR upper bound is smaller than the lower bound. "
              "Trust the lower bound.", file=sys.stderr)

    if max_c <= 4:
        return -1, qs
    n_ext = min(max_c - min_c + 1, 8)
    if n_ext < 3:
        return -1, qs

    # sampling-error adjustment in [min_c, max_c); cov == 0 or fpr == 1
    # must propagate nan/inf exactly as the C arithmetic does
    with np.errstate(divide="ignore", invalid="ignore"):
        for c in range(max_c - 1, min_c - 1, -1):
            err = (hist[c] - cnt[c] / qs.cov) / (1.0 - fpr)
            qs.adj_cnt[c] = max(cnt[c] - err * qs.cov * fpr, 0.0)

    # degree-2 polynomial fit of adjacent-count ratios (normal equations)
    x = np.arange(min_c, min_c + n_ext, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        y = (qs.adj_cnt[min_c + 1:min_c + n_ext + 1]
             / qs.adj_cnt[min_c:min_c + n_ext])
    powers = x[None, :] ** np.arange(5)[:, None]  # x^0..x^4 per point
    A = np.empty((3, 3))
    B = np.empty(3)
    with np.errstate(invalid="ignore"):
        for i in range(3):
            for j in range(i + 1):
                A[i, j] = A[j, i] = powers[i + j].sum()
            B[i] = (powers[i] * y).sum()
        coef = _solve_full_pivot(A, B)

        # extrapolate below min_c
        for c in range(min_c - 1, -1, -1):
            r = coef[0] + coef[1] * c + coef[2] * c * c
            if r < 1.01:  # NaN stays NaN, like the C comparison
                r = 1.01
            qs.adj_cnt[c] = qs.adj_cnt[c + 1] / r

    adj_sum = float(qs.adj_cnt.sum())
    if adj_sum <= qs.tot:
        qs.err = qs.tot - adj_sum
        qs.qv = -_Q * _log(_log(qs.tot / adj_sum) / kmer)
    else:
        print("WARNING: failed to estimate the calibrated QV", file=sys.stderr)
        qs.err = 0.0
        qs.qv = qs.qv_raw
    return 0, qs


def _cf(v, spec=".3f"):
    """printf-compatible float text (C prints NaN with its sign bit)."""
    if math.isnan(v):
        return "-nan" if math.copysign(1.0, v) < 0 else "nan"
    if math.isinf(v):
        return "-inf" if v < 0 else "inf"
    return f"{v:{spec}}"


QV_HEADER = (
    "CC\tCT  kmer_occurrence    short_read_kmer_count  raw_input_kmer_count  "
    "adjusted_input_kmer_count\n"
    "CC\tFR  fpr_lower_bound    fpr_upper_bound\n"
    "CC\tER  total_input_kmers  adjusted_error_kmers\n"
    "CC\tCV  coverage\n"
    "CC\tQV  raw_quality_value  adjusted_quality_value\n"
    "CC\n")


def main_qv(opt, table, seq_fn, out=None, scan=None):
    """The `qv` command body (main_qv, main.c:163-215)."""
    out = out or sys.stdout
    hist = table.hist()
    out.write(QV_HEADER)
    cnt = run_qv(opt, seq_fn, table, out=out, scan=scan)
    _, qs = qv_solve(hist, cnt, table.k, opt.fpr)
    for i in range(YAK_N_COUNTS - 1, -1, -1):
        out.write(f"CT\t{i}\t{hist[i]}\t{cnt[i]}\t{_cf(qs.adj_cnt[i])}\n")
    out.write(f"FR\t{_cf(qs.fpr_lower, '.3g')}\t{_cf(qs.fpr_upper, '.3g')}\n")
    out.write(f"ER\t{qs.tot}\t{_cf(qs.err)}\n")
    out.write(f"CV\t{_cf(qs.cov)}\n")
    out.write(f"QV\t{_cf(qs.qv_raw)}\t{_cf(qs.qv)}\n")
    return qs
