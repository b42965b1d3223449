"""Trio binning (triobin.c) and phasing evaluation (trioeval.c).

Both load pat/mat tables as 2-bit class flags (TRIOBIN1/2 load modes,
htab.c:449-461), stream the child sequences, and type each position:
  flag = table value (0 if absent); c1 = flag&3 (pat class), c2 = flag>>2&3
  type 1 (pat-strong) if c1==2 && c2==0; type 2 (mat-strong) if c2==2 && c1==0
then run streak logic over the per-position type array:
  triobin:  nonzero-type streaks >= k-4 accumulate sc[type-1] bases,
            then tb_classify -> p/m/a/0 (triobin.c:94-121)
  trioeval: nonzero-type streaks >= min_n sites become phase-block
            elements; count switch pairs and sites (trioeval.c:91-117)

Table probes run on device via models/scan; the per-sequence run-length
logic is vectorized NumPy on the value stream.
"""

import sys
from dataclasses import dataclass

import numpy as np

from yak_tpu import YAK_LOAD_TRIOBIN1, YAK_LOAD_TRIOBIN2
from yak_tpu.models.scan import scan_file, NO_KMER
from yak_tpu.table import KmerTable


@dataclass
class TrioOpts:
    min_cnt: int = 2
    mid_cnt: int = 5
    n_threads: int = 8
    ratio_thres: float = 0.33   # triobin -r
    min_n: int = 2              # trioeval -n
    print_diff: bool = False    # triobin -p
    print_err: bool = False     # trioeval -e
    print_frag: bool = True     # trioeval (off with -F)


def load_trio_tables(pat_fn, mat_fn, opt):
    ch = KmerTable.restore(pat_fn, mode=YAK_LOAD_TRIOBIN1,
                           min_cnt=opt.min_cnt, mid_cnt=opt.mid_cnt)
    ch = KmerTable.restore(mat_fn, mode=YAK_LOAD_TRIOBIN2,
                           min_cnt=opt.min_cnt, mid_cnt=opt.mid_cnt, into=ch)
    return ch


def _types_and_flags(vals):
    """Per-position flag and type arrays from the scan value stream."""
    is_k = vals != NO_KMER
    flag = np.where(is_k, np.maximum(vals, 0), 0).astype(np.int32)
    c1 = flag & 3
    c2 = (flag >> 2) & 3
    typ = np.zeros(len(vals), np.int32)
    typ[is_k & (c1 == 2) & (c2 == 0)] = 1
    typ[is_k & (c2 == 2) & (c1 == 0)] = 2
    return is_k, flag, typ


def tb_classify_vec(sc0, sc1, P, M, k, ratio_thres):
    """Vectorized tb_classify over per-contig arrays (same branch order
    and float arithmetic as the scalar port below)."""
    sc0 = sc0.astype(np.int64)
    sc1 = sc1.astype(np.int64)
    P = P.astype(np.int64)
    M = M.astype(np.int64)
    no_sc = (sc0 == 0) & (sc1 == 0)
    p1 = no_sc & (P != M) & (P >= k - 4 + M) & ((M <= 1) | (P * 0.05 > M))
    m1 = no_sc & (P != M) & (M >= k - 4 + P) & ((P <= 1) | (M * 0.05 > P))
    a2 = ~no_sc & (sc0 > k) & (sc1 > k)
    p2 = (~no_sc & (sc0 >= k - 4 + sc1) & (sc0 * 0.05 >= sc1)
          & (P * ratio_thres > M))
    m2 = (~no_sc & (sc1 >= k - 4 + sc0) & (sc1 * 0.05 >= sc0)
          & (M * ratio_thres > P))
    return np.select(
        [p1, m1, no_sc, a2, p2, m2],
        ["p", "m", "0", "a", "p", "m"], default="a")


def tb_classify(sc, c, k, ratio_thres):
    """Contig classification (tb_classify, triobin.c:103-121)."""
    P, M = c[0 << 2 | 2], c[2 << 2 | 0]
    if sc[0] == 0 and sc[1] == 0:
        if P == M:
            return "0"
        if P >= k - 4 + M and (M <= 1 or P * 0.05 > M):
            return "p"
        if M >= k - 4 + P and (P <= 1 or M * 0.05 > P):
            return "m"
        return "0"
    if sc[0] > k and sc[1] > k:
        return "a"
    if sc[0] >= k - 4 + sc[1] and sc[0] * 0.05 >= sc[1] and P * ratio_thres > M:
        return "p"
    if sc[1] >= k - 4 + sc[0] and sc[1] * 0.05 >= sc[0] and M * ratio_thres > P:
        return "m"
    return "a"


class _BatchedOut:
    """Reproduce the reference's output interleaving: per input batch
    (bseq_read of `batch_bases`), all worker-emitted rows print first
    (during kt_for), then the per-sequence summary rows (pipeline step 1
    loop) — triobin.c:136-148, trioeval.c:132-149."""

    def __init__(self, out, batch_bases):
        self.out = out
        self.batch_bases = batch_bases
        self.worker_rows = []
        self.summary_rows = []
        self.cum = 0

    def add(self, worker_text, summary_text, seq_len):
        self.worker_rows.append(worker_text)
        self.summary_rows.append(summary_text)
        self.cum += seq_len
        if self.cum >= self.batch_bases:
            self.flush()

    def flush(self):
        self.out.write("".join(self.worker_rows))
        self.out.write("".join(self.summary_rows))
        self.worker_rows, self.summary_rows, self.cum = [], [], 0


def main_triobin(opt, ch, seq_fn, out=None, chunk_cap=1 << 23,
                 batch_bases=200_000_000):
    out = out or sys.stdout
    return _main_triobin_fused(opt, ch, seq_fn, out, chunk_cap,
                               batch_bases)


def _emit_triobin_row(bo, opt, k, name, L, s, wtext=""):
    """s = [nk, c0, c1, c2, c4, c8, sc1, sc2] accumulated for one seq."""
    c = np.zeros(16, np.int64)
    c[[0, 1, 2, 4, 8]] = s[1:6]
    sc = [int(s[6]), int(s[7])]
    t = tb_classify(sc, c, k, opt.ratio_thres)
    bo.add(wtext, (f"{name}\t{t}\t{sc[0]}\t{sc[1]}\t{c[2]}\t{c[8]}\t"
                   f"{c[1]}\t{c[4]}\t{int(s[0])}\t{c[0]}\n"), L)


class _TriobinFold:
    """Host side of the triobin device fold: merges boundary streaks
    (and -p D rows) across chunk-spanning pieces and emits the report
    rows; shared by the single-chip and mesh drivers."""

    def __init__(self, opt, k, bo):
        self.opt, self.k, self.bo = opt, k, bo
        self.carry = None  # [gi, sums(8), open_typ, open_len, nm, L, dtxt]

    def _close(self, sums, typ, length):
        if typ > 0 and length >= self.k - 4:
            sums[5 + typ] += length

    def chunk(self, packed, S, scal4, d_txt, M):
        """One chunk's fetched outputs: S [nseq, 8] i64 per-seg sums,
        scal4 the boundary-run scalars, d_txt per-seg -p row text."""
        opt, k, bo, close = self.opt, self.k, self.bo, self._close
        nseq = len(packed.rec_gid)
        we = int(packed.rec_start[-1] + packed.rec_take[-1] - k)
        h_typ, h_len, t_typ, t_len = (int(x) for x in scal4)
        continues = (int(packed.rec_off0[-1] + packed.rec_take[-1])
                     < int(packed.rec_len[-1]))
        single = h_len == we + 1

        # boundary-run fixup for the first and last segments (scalar);
        # everything else is already complete in S
        g0 = int(packed.rec_gid[0])
        o_typ, o_len = 0, 0
        if self.carry is not None:
            assert self.carry[0] == g0
            S[0] += self.carry[1]
            o_typ, o_len = self.carry[2], self.carry[3]
            d_txt[0] = self.carry[6] + d_txt[0]
            self.carry = None
        open_out = None
        if single and nseq == 1:
            # head and tail are the same run spanning the piece
            if o_typ > 0 and o_typ == h_typ:
                run = (h_typ, o_len + h_len)
            else:
                close(S[0], o_typ, o_len)
                run = (h_typ, h_len)
            if continues:
                open_out = run
            else:
                close(S[0], *run)
        else:
            if o_typ > 0 and o_typ == h_typ:
                close(S[0], h_typ, o_len + h_len)
            else:
                close(S[0], o_typ, o_len)
                close(S[0], h_typ, h_len)
            if continues:
                open_out = (t_typ, t_len)
            else:
                close(S[-1], t_typ, t_len)
        if continues:
            gi_c = int(packed.rec_gid[-1])
            self.carry = [gi_c, S[-1],
                          open_out[0] if open_out else 0,
                          open_out[1] if open_out else 0,
                          packed.seq_names[gi_c],
                          int(packed.rec_len[-1]), d_txt[-1]]

        # vectorized classify + row formatting for all completed segs
        j_hi = nseq - 1 if continues else nseq
        if j_hi > 0:
            sub = S[:j_hi]
            t_arr = tb_classify_vec(sub[:, 6], sub[:, 7], sub[:, 3],
                                    sub[:, 5], k, opt.ratio_thres)
            names = [packed.seq_names[int(g)]
                     for g in packed.rec_gid[:j_hi]]
            cols = [c.tolist() for c in
                    (sub[:, 6], sub[:, 7], sub[:, 3], sub[:, 5],
                     sub[:, 2], sub[:, 4], sub[:, 0], sub[:, 1],
                     packed.rec_len[:j_hi])]
            rows = [f"{nm}\t{tv}\t{a}\t{b}\t{cP}\t{cM}\t{c1_}\t"
                    f"{c4_}\t{nk}\t{c0_}\n"
                    for nm, tv, a, b, cP, cM, c1_, c4_, nk, c0_, _L in
                    zip(names, t_arr, *cols)]
            bo.add("".join(d_txt[:j_hi]), "".join(rows),
                   int(np.sum(packed.rec_len[:j_hi])))

    def build_d_txt(self, packed, dlanes, dflag, M):
        """Per-segment -p D-row text from decoded difference markers."""
        k = self.k
        nseq = len(packed.rec_gid)
        starts_np = np.minimum(packed.rec_start, M)
        dseg = np.searchsorted(starts_np, dlanes, side="right") - 1
        dbnd = np.concatenate(
            [np.searchsorted(dseg, np.arange(nseq)), [len(dlanes)]])
        d_txt = []
        for j in range(nseq):
            nm = packed.seq_names[int(packed.rec_gid[j])]
            base = (int(packed.rec_off0[j]) - int(starts_np[j]) + k - 1)
            sl = slice(dbnd[j], dbnd[j + 1])
            d_txt.append("".join(
                f"D\t{nm}\t{int(l) + base}\t{f & 3}\t{f >> 2}\n"
                for l, f in zip(dlanes[sl], dflag[sl])))
        return d_txt

    def finish(self):
        if self.carry is not None:
            # unreachable with the current packer (a continuing record
            # always yields a following chunk), but emit the REAL name
            # and length if a future packer ends the stream mid-carry
            self._close(self.carry[1], self.carry[2], self.carry[3])
            _emit_triobin_row(self.bo, self.opt, self.k, self.carry[4],
                              self.carry[5], self.carry[1],
                              wtext=self.carry[6])
        self.bo.flush()


def _main_triobin_fused(opt, ch, seq_fn, out, chunk_cap, batch_bases):
    """Device fold (ops/countstep.get_triobin_step): all per-contig sums
    on device; boundary streaks merged across chunk-spanning pieces."""
    import jax.numpy as jnp

    from yak_tpu.io.chunks import ChunkSource
    from yak_tpu.io.pack import pack_chunk_planes
    from yak_tpu.ops.countstep import (TRIOBIN_MAX_DIFF,
                                       get_triobin_join_post,
                                       get_triobin_psort_mid,
                                       get_triobin_step, join_enabled,
                                       join_restore_vals, psort_enabled,
                                       qv_psort_pad, run_join_lookup,
                                       run_marker_psort1)
    from yak_tpu.parallel.mesh import MeshTable
    from yak_tpu.utils import retry_transient

    if isinstance(ch, MeshTable):
        return _main_triobin_fused_mesh(opt, ch, seq_fn, out, chunk_cap,
                                        batch_bases)
    k = ch.k
    ch.flush()
    use_join, jinterp = join_enabled(k)
    ps_use, ps_interp = psort_enabled(k <= 31)
    ps_post = use_join and (ps_use or ps_interp)
    itp = jinterp or ps_interp
    chunk = max(1 << 14, min(batch_bases, chunk_cap))
    chunk = -(-chunk // 1024) * 1024
    M = chunk - k + 1
    bo = _BatchedOut(out, batch_bases)
    emit_diff = bool(opt.print_diff)
    fold = _TriobinFold(opt, k, bo)

    def make_dispatch(arg, planes_key, meta, ns, h):
        def dispatch():
            if ps_post:
                # full Pallas path: JOIN kernel -> bitonic order
                # restore -> reductions jit (-p markers, if any, are
                # compacted by the bitonic sort, not lax.sort)
                ov, pay, vflat = run_join_lookup(
                    ch, k, planes_key, arg, M, interpret=itp)
                vs = join_restore_vals(ov, pay, M, interpret=itp)
                o = get_triobin_psort_mid(
                    k, ns, M, qv_psort_pad(M), emit_diff=emit_diff)(
                    vs, vflat, jnp.asarray(meta))
                if emit_diff:
                    dk_s = run_marker_psort1(o[2], TRIOBIN_MAX_DIFF,
                                             interpret=itp)
                    o = (o[0], o[1], dk_s, o[3])
                h["o"] = o
                h["u32"] = True
                h["vs"] = (vs, vflat)
            elif use_join:
                ov, pay, vflat = run_join_lookup(
                    ch, k, planes_key, arg, M, interpret=jinterp)
                h["o"] = get_triobin_join_post(
                    k, ns, M, emit_diff=emit_diff)(
                    ov, pay, vflat, jnp.asarray(meta))
            else:
                step = get_triobin_step(k, ns, planes_L=planes_key,
                                        emit_diff=emit_diff)
                h["o"] = step(arg, jnp.asarray(meta), ch.keys, ch.cnt,
                              ch.size)
        return dispatch

    def consume(item):
        packed, arg, planes_key, h, dispatch = item
        nseq = len(packed.rec_gid)
        # stateless per-chunk read: transient faults re-dispatch.  ALL
        # d2h fetches happen inside the retry closure — a fault at the
        # diff-marker read must re-dispatch too.
        def fetch():
            o = h["o"]
            r = [np.asarray(o[0]), np.asarray(o[1])]
            if emit_diff:
                r += [int(np.asarray(o[3])), np.asarray(o[2])]
            return r

        fetched = retry_transient(fetch, redo=dispatch)
        S, sc_np = fetched[0], fetched[1]
        S = S[:, :nseq].T.astype(np.int64)
        d_txt = [""] * nseq
        if emit_diff:
            nd = fetched[2]
            if nd > TRIOBIN_MAX_DIFF:
                # marker overflow: per-position fallback for this chunk
                if h.get("u32"):
                    # restored values are already device-resident
                    vs, vflat = h["vs"]
                    v_np = np.asarray(vs)[:M]
                    hs = np.asarray(vflat).reshape(-1)[:M].astype(bool)
                    flag2 = np.where(hs, np.maximum(v_np, 0),
                                     0).astype(np.int64)
                    dm = hs & ((flag2 & 3) != ((flag2 >> 2) & 3))
                else:
                    from yak_tpu.ops.countstep import get_scan_step
                    sstep = get_scan_step(k, planes_L=planes_key)
                    vals = np.asarray(sstep(arg, ch.keys, ch.cnt,
                                            ch.size)).reshape(-1)
                    is_k2, flag2, _ = _types_and_flags(vals)
                    dm = is_k2 & ((flag2 & 3) != ((flag2 >> 2) & 3))
                dlanes = np.flatnonzero(dm).astype(np.int64)
                dflag = (flag2[dm] & 15).astype(np.int64)
            elif h.get("u32"):
                dk = fetched[3][:nd]
                dlanes = (dk >> np.uint32(4)).astype(np.int64)
                dflag = (dk & np.uint32(15)).astype(np.int64)
            else:
                dk = fetched[3][:nd]
                dlanes = (dk >> np.uint64(4)).astype(np.int64)
                dflag = (dk & np.uint64(15)).astype(np.int64)
            d_txt = fold.build_d_txt(packed, dlanes, dflag, M)
        fold.chunk(packed, S, sc_np, d_txt, M)

    # 2-deep dispatch/consume pipeline: chunk i's device work overlaps
    # the host fold + d2h fetch of chunk i-1 (the role of kt_pipeline's
    # read/compute overlap, triobin.c:136; the fold itself is order-
    # preserving so consumption stays in input order)
    pending = []
    for packed in ChunkSource(seq_fn, chunk, k, with_meta="records"):
        nseq = len(packed.rec_gid)
        if not nseq:
            continue
        ns = max(1 << 12, 1 << int(max(nseq - 1, 1)).bit_length())
        meta = np.full(ns + 2, M, np.int32)
        meta[:nseq] = np.minimum(packed.rec_start, M)
        meta[-1] = int(packed.rec_start[-1] + packed.rec_take[-1] - k)
        arg, planes_key = pack_chunk_planes(packed.codes, packed)
        h = {}
        dispatch = make_dispatch(arg, planes_key, meta, ns, h)
        dispatch()
        pending.append((packed, arg, planes_key, h, dispatch))
        if len(pending) >= 2:
            consume(pending.pop(0))
    for item in pending:
        consume(item)
    fold.finish()


def _main_triobin_fused_mesh(opt, ch, seq_fn, out, chunk_cap,
                             batch_bases):
    """Mesh triobin: groups of n_dev plane-packed chunks run the routed
    lookup data-parallel (parallel/mesh.build_lookup_step), the
    per-chunk reductions vmap over the sharded value rows, and the host
    fold consumes the group's results in order — same output as the
    single-chip fold, one dispatch pair per GROUP."""
    import jax
    import jax.numpy as jnp

    from yak_tpu.io.chunks import ChunkSource
    from yak_tpu.ops.countstep import _triobin_reduce
    from yak_tpu.parallel.mesh import (_pack_group_planes,
                                       build_lookup_psort,
                                       build_lookup_step,
                                       default_route_cap)
    from yak_tpu.ops.countstep import psort_enabled

    k = ch.k
    n_dev = ch.n_dev
    emit_diff = bool(opt.print_diff)
    chunk = max(1 << 14, min(batch_bases, chunk_cap))
    chunk = -(-chunk // 1024) * 1024
    M = chunk - k + 1
    bo = _BatchedOut(out, batch_bases)
    fold = _TriobinFold(opt, k, bo)
    route = {"C": default_route_cap(M, n_dev), "step": None}
    use_ps, ps_interp = psort_enabled(k <= 31)
    use_ps = use_ps or ps_interp
    reducers = {}

    def reducer(ns):
        if ns not in reducers:
            reducers[ns] = jax.jit(jax.vmap(
                lambda v, hs, m: _triobin_reduce(
                    v, hs, m, k, M, emit_diff=emit_diff)))
        return reducers[ns]

    def flush_group(group):
        if not group:
            return
        ns = max(1 << 12, 1 << int(
            max(max(len(p.rec_gid) for p in group) - 1, 1)).bit_length())
        metas = []
        for pck in group:
            m = np.full(ns + 2, M, np.int32)
            nseq = len(pck.rec_gid)
            m[:nseq] = np.minimum(pck.rec_start, M)
            m[-1] = int(pck.rec_start[-1] + pck.rec_take[-1] - k)
            metas.append(m)
        while len(metas) < n_dev:
            metas.append(np.full(ns + 2, M, np.int32))
        planes = jax.device_put(jnp.asarray(_pack_group_planes(
            group, chunk, n_dev)), ch.sh)
        while True:
            if use_ps:
                run = build_lookup_psort(ch.mesh, k, chunk, route["C"])
                vals, hasw, ovf = run(planes, ch.keys, ch.cnt, ch.size,
                                      interpret=ps_interp)
            else:
                if route["step"] is None:
                    route["step"] = build_lookup_step(
                        ch.mesh, k, chunk, route_cap=route["C"])
                vals, hasw, ovf = route["step"](planes, ch.keys,
                                                ch.cnt, ch.size)
            if not int(np.asarray(ovf).max()):
                break
            route["C"] = min(M, route["C"] * 2)
            route["step"] = None
        outs = reducer(ns)(vals, hasw, jnp.asarray(np.stack(metas)))
        seg_np = np.asarray(outs[0])
        sc_np = np.asarray(outs[1])
        if emit_diff:
            dk_np = np.asarray(outs[2])
            dn_np = np.asarray(outs[3])
        for i, pck in enumerate(group):
            nseq = len(pck.rec_gid)
            S = seg_np[i][:, :nseq].T.astype(np.int64)
            d_txt = [""] * nseq
            if emit_diff:
                nd = int(dn_np[i])
                if nd > len(dk_np[i]):
                    # marker-budget overflow: recompute this chunk's
                    # diff rows from the full per-lane values (already
                    # on device from the routed lookup), mirroring the
                    # single-chip per-position fallback above
                    v_np = np.asarray(vals[i]).reshape(-1)[:M]
                    h_np = np.asarray(hasw[i]).reshape(-1)[:M]
                    fl = np.where(h_np, np.maximum(v_np, 0),
                                  0).astype(np.int32)
                    dm = h_np.astype(bool) & ((fl & 3) != ((fl >> 2) & 3))
                    dlanes = np.flatnonzero(dm).astype(np.int64)
                    dflag = (fl[dm] & 15).astype(np.int64)
                else:
                    dk = dk_np[i][:nd]
                    dlanes = (dk >> np.uint64(4)).astype(np.int64)
                    dflag = (dk & np.uint64(15)).astype(np.int64)
                d_txt = fold.build_d_txt(pck, dlanes, dflag, M)
            fold.chunk(pck, S, sc_np[i], d_txt, M)

    group = []
    for packed in ChunkSource(seq_fn, chunk, k, with_meta="records"):
        if not len(packed.rec_gid):
            continue
        group.append(packed)
        if len(group) == n_dev:
            flush_group(group)
            group = []
    flush_group(group)
    fold.finish()


TRIOEVAL_HEADER = (
    "C\tS  seqName     #patKmer  #matKmer  #pat-pat  #pat-mat  #mat-pat  "
    "#mat-mat  seqLen\n"
    "C\tF  seqName     type      startPos  endPos    count\n"
    "C\tW  #switchErr  denominator  switchErrRate\n"
    "C\tH  #hammingErr denominator  hammingErrRate\n"
    "C\tN  #totPatKmer #totMatKmer  errRate\n"
    "C\n")


class _TeSeq:
    """Per-sequence trioeval chain state: the exact per-qualifying-run
    body of te_worker (trioeval.c:91-117) — pair counts c[4], site
    counts d[2], the `last` phase link, fragment tracking (F rows), and
    error rows (E rows).  Positions are vals-array coordinates (the
    k-mer END base index), identical for the scan and fused paths."""

    __slots__ = ("name", "L", "opt", "k", "c", "d", "last",
                 "f_type", "f_st", "f_en", "f_cnt", "wrows")

    def __init__(self, name, L, opt, k):
        self.name, self.L, self.opt, self.k = name, L, opt, k
        self.c = [0, 0, 0, 0]
        self.d = [0, 0]
        self.last = 0
        self.f_type = self.f_st = self.f_en = self.f_cnt = 0
        self.wrows = []

    def run(self, st, ln, tv):
        """One qualifying run (tv > 0, ln >= min_n)."""
        n = (int(ln) + self.k - 1) // self.k
        cc = int(tv) - 1
        self.c[cc << 1 | cc] += n - 1
        self.d[cc] += n
        if self.last > 0:
            self.c[(self.last - 1) << 1 | cc] += 1
            if self.opt.print_err and self.last - 1 != cc:
                self.wrows.append(f"E\t{self.name}\t{st + ln}\t"
                                  f"{self.last}\t{cc + 1}\n")
        if self.f_type != tv:
            if self.f_type > 0 and self.opt.print_frag:
                self.wrows.append(
                    f"F\t{self.name}\t{self.f_type}\t{self.f_st}\t"
                    f"{self.f_en}\t{self.f_cnt}\n")
            self.f_type, self.f_st, self.f_cnt = \
                int(tv), int(st) + 1 - self.k, 0
        self.f_cnt += 1
        self.f_en = int(st + ln) + 1  # trioeval.c:109: f_en = i + 1
        self.last = int(tv)

    def finish(self, bo, glob):
        """Flush the open fragment, emit the S row, fold the global
        switch/hamming accumulators (trioeval.c:132-149, 195-209)."""
        if self.f_type > 0 and self.opt.print_frag:
            self.wrows.append(f"F\t{self.name}\t{self.f_type}\t"
                              f"{self.f_st}\t{self.f_en}\t{self.f_cnt}\n")
        c, d = self.c, self.d
        glob["n_par0"] += d[0]
        glob["n_par1"] += d[1]
        if d[0] + d[1] >= 2:
            glob["n_pair"] += c[0] + c[1] + c[2] + c[3]
            glob["n_switch"] += c[1] + c[2]
            glob["n_site"] += d[0] + d[1]
            glob["n_err"] += min(d[0], d[1])
        bo.add("".join(self.wrows),
               f"S\t{self.name}\t{d[0]}\t{d[1]}\t{c[0]}\t{c[1]}\t"
               f"{c[2]}\t{c[3]}\t{self.L}\n", self.L)


def main_trioeval(opt, ch, seq_fn, out=None, chunk_cap=1 << 23,
                  batch_bases=1_000_000_000):
    """Phase-block switch statistics (te_worker + summary,
    trioeval.c:91-117,195-209) via the fused device fold (sparse run
    markers, ops/countstep.get_trioeval_step; k >= 32 hashes via the
    yak_hash_long funnel)."""
    out = out or sys.stdout
    k = ch.k
    chunk = max(1 << 14, min(batch_bases, chunk_cap))
    chunk = -(-chunk // 1024) * 1024
    glob = {"n_pair": 0, "n_site": 0, "n_switch": 0, "n_err": 0,
            "n_par0": 0, "n_par1": 0}
    out.write(TRIOEVAL_HEADER)
    bo = _BatchedOut(out, batch_bases)
    from yak_tpu.parallel.mesh import MeshTable
    if isinstance(ch, MeshTable):
        _trioeval_fused_mesh(opt, ch, seq_fn, bo, glob, chunk)
    else:
        _trioeval_fused(opt, ch, seq_fn, bo, glob, chunk)
    bo.flush()
    n_switch, n_pair = glob["n_switch"], glob["n_pair"]
    n_err, n_site = glob["n_err"], glob["n_site"]
    n_par = [glob["n_par0"], glob["n_par1"]]
    out.write(f"W\t{n_switch}\t{n_pair}\t{_fdiv(n_switch, n_pair)}\n")
    out.write(f"H\t{n_err}\t{n_site}\t{_fdiv(n_err, n_site)}\n")
    out.write(f"N\t{n_par[0]}\t{n_par[1]}\t"
              f"{_fdiv(min(n_par[0], n_par[1]), n_par[0] + n_par[1])}\n")


def _trioeval_fused(opt, ch, seq_fn, bo, glob, chunk):
    """Device fold (ops/countstep.get_trioeval_step): per-position
    typing + run compression on device; the host replays the per-run
    chain over the sparse marker stream, merging boundary runs across
    chunk-spanning pieces (the halo makes piece windows seamless) and
    falling back to the per-position scan on marker-budget overflow."""
    import jax.numpy as jnp

    from yak_tpu.io.chunks import ChunkSource
    from yak_tpu.io.pack import pack_chunk_planes
    from yak_tpu.ops.countstep import (TRIOEVAL_MAX_RUNS,
                                       get_trioeval_join_post,
                                       get_trioeval_step, join_enabled,
                                       run_join_lookup)

    from yak_tpu.utils import retry_transient

    k = ch.k
    ch.flush()
    use_join, jinterp = join_enabled(k)
    from yak_tpu.ops.countstep import (get_trioeval_psort_mid,
                                       join_restore_vals, psort_enabled,
                                       qv_psort_pad, run_marker_psort)
    ps_use, ps_interp = psort_enabled(k <= 31)
    ps_post = use_join and (ps_use or ps_interp)
    itp = jinterp or ps_interp
    M = chunk - k + 1

    def make_dispatch(arg, planes_key, we, h):
        def dispatch():
            if ps_post:
                # full Pallas path: JOIN kernel -> bitonic order
                # restore -> marker extraction -> bitonic marker
                # compaction (no XLA full-lane sorts anywhere)
                ov, pay, vflat = run_join_lookup(
                    ch, k, planes_key, arg, M, interpret=itp)
                vs = join_restore_vals(ov, pay, M, interpret=itp)
                key, payload, n = get_trioeval_psort_mid(
                    int(opt.min_n), M, qv_psort_pad(M))(
                    vs, vflat, jnp.asarray([we], np.int32))
                k_s, p_s = run_marker_psort(key, payload,
                                            TRIOEVAL_MAX_RUNS,
                                            interpret=itp)
                h["o"] = (k_s, n, p_s)
                h["u32"] = True
                h["vs"] = (vs, vflat)
            elif use_join:
                import os
                ov, pay, vflat = run_join_lookup(
                    ch, k, planes_key, arg, M, interpret=jinterp)
                if os.environ.get("YAK_TPU_MARK_COMPACT", "1") != "0":
                    # compaction variant: marker planes out of the mid
                    # jit, ONE streaming pallas_compact pass instead of
                    # the full-lane u64 marker sort (the sort was the
                    # fattest trioeval-only slice: bench r5 trioeval
                    # 1.43s vs triobin 0.81s on identical lookups)
                    from yak_tpu.ops.countstep import (
                        get_trioeval_mark_mid, run_mark_compact)
                    khi, pmark, n = get_trioeval_mark_mid(
                        k, int(opt.min_n), M)(
                        ov, pay, vflat, jnp.asarray([we], np.int32))
                    lanes_d, pay_d = run_mark_compact(
                        khi, pmark, TRIOEVAL_MAX_RUNS, interpret=jinterp)
                    h["o"] = (lanes_d, n, pay_d)
                    h["u32"] = True
                else:
                    h["o"] = get_trioeval_join_post(
                        k, int(opt.min_n), M)(
                        ov, pay, vflat, jnp.asarray([we], np.int32))
            else:
                step = get_trioeval_step(k, int(opt.min_n),
                                         planes_L=planes_key)
                h["o"] = step(arg, jnp.asarray([we], np.int32),
                              ch.keys, ch.cnt, ch.size)
        return dispatch

    def produce(T=None):
        """Dispatch chunks as they parse; 2-deep so chunk i's device
        work overlaps the host chain replay of chunk i-1."""
        import time as _time
        pending = []
        for packed in ChunkSource(seq_fn, chunk, k, with_meta="records"):
            nseq = len(packed.rec_gid)
            if not nseq:
                continue
            we = int(packed.rec_start[-1] + packed.rec_take[-1] - k)
            arg, planes_key = pack_chunk_planes(packed.codes, packed)
            h = {}
            dispatch = make_dispatch(arg, planes_key, we, h)
            _t0 = _time.time()
            dispatch()
            if T is not None:
                T["dispatch"] = T.get("dispatch", 0.0) \
                    + (_time.time() - _t0)
            pending.append((packed, arg, planes_key, we, h, dispatch))
            if len(pending) >= 2:
                yield pending.pop(0)
        yield from pending

    import os as _os
    import time as _time
    dbg = _os.environ.get("YAK_TPU_TE_DEBUG")
    T = {"fetch": 0.0, "host": 0.0}
    fold = _TeChainFold(opt, k, bo, glob)
    for packed, arg, planes_key, we, h, dispatch in produce(T):
        _t0 = _time.time()
        def fetch():
            # every d2h read inside the retry closure (advisor r2 #4:
            # a transient device fault at ANY fetch must replay)
            o = h["o"]
            n = int(o[1])
            if n > TRIOEVAL_MAX_RUNS:
                return n, None, None
            if h.get("u32"):
                return n, np.asarray(o[0])[:n], np.asarray(o[2])[:n]
            return n, np.asarray(o[0])[:n], None

        n, key_np, pay_np = retry_transient(fetch, redo=dispatch)
        T["fetch"] += _time.time() - _t0
        _t0 = _time.time()
        if n > TRIOEVAL_MAX_RUNS:
            # marker overflow: per-position fallback for this chunk
            if h.get("vs"):
                # restored values are already device-resident
                v_np, hs = retry_transient(
                    lambda: (np.asarray(h["vs"][0])[:M],
                             np.asarray(h["vs"][1]).reshape(-1)[:M]
                             .astype(bool)),
                    redo=dispatch)
                fl = np.where(hs, np.maximum(v_np, 0), 0).astype(
                    np.int32)
                c1, c2 = fl & 3, (fl >> 2) & 3
                typ = np.zeros(M, np.int32)
                typ[hs & (c1 == 2) & (c2 == 0)] = 1
                typ[hs & (c2 == 2) & (c1 == 0)] = 2
            else:
                from yak_tpu.ops.countstep import get_scan_step
                sstep = get_scan_step(k, planes_L=planes_key)
                vals = retry_transient(
                    lambda: np.asarray(sstep(
                        arg, ch.keys, ch.cnt, ch.size)).reshape(-1))
                _, _, typ = _types_and_flags(vals)
            lanes, lens, typs = _host_te_markers(typ, we, opt.min_n)
        elif h.get("u32"):
            lanes = key_np.astype(np.int64)
            lens = (pay_np >> np.uint32(2)).astype(np.int64)
            typs = (pay_np & np.uint32(3)).astype(np.int64)
        else:
            lanes = (key_np >> np.uint64(26)).astype(np.int64)
            lens = ((key_np >> np.uint64(2))
                    & np.uint64((1 << 24) - 1)).astype(np.int64)
            typs = (key_np & np.uint64(3)).astype(np.int64)
        fold.chunk(packed, lanes, lens, typs, M, we)
        T["host"] += _time.time() - _t0
    fold.finish()
    if dbg:
        import sys as _sys
        print("[te-debug]", {a: round(b, 2) for a, b in T.items()},
              file=_sys.stderr)


def _trioeval_fused_mesh(opt, ch, seq_fn, bo, glob, chunk):
    """Mesh trioeval: routed group lookups (parallel/mesh.
    mesh_routed_groups) + the vmapped run-compression reduction
    (ops/countstep._trioeval_reduce) on device, feeding the shared host
    phase-chain fold — no per-position transfers (the fused fold the
    VERDICT asked for in place of scan_file_mesh)."""
    import jax
    import jax.numpy as jnp

    from yak_tpu.ops.countstep import TRIOEVAL_MAX_RUNS, _trioeval_reduce
    from yak_tpu.parallel.mesh import mesh_routed_groups

    k = ch.k
    M = chunk - k + 1
    fold = _TeChainFold(opt, k, bo, glob)
    reducer = jax.jit(jax.vmap(
        lambda v, hs, we1: _trioeval_reduce(v, hs, we1,
                                            int(opt.min_n), M)))

    for group, vals, hasw in mesh_routed_groups(seq_fn, ch, chunk):
        wes = [int(p.rec_start[-1] + p.rec_take[-1] - k) for p in group]
        we_d = np.full((ch.n_dev, 1), M, np.int32)
        we_d[:len(wes), 0] = wes
        keys_d, n_d = reducer(vals, hasw, jnp.asarray(we_d))
        n_np = np.asarray(n_d)
        keys_np = np.asarray(keys_d)
        for i, packed in enumerate(group):
            n = int(n_np[i])
            if n > TRIOEVAL_MAX_RUNS:
                v = np.asarray(vals[i]).reshape(-1)[:M]
                hs = np.asarray(hasw[i]).reshape(-1)[:M].astype(bool)
                flag = np.where(hs, np.maximum(v, 0), 0).astype(np.int32)
                c1, c2 = flag & 3, (flag >> 2) & 3
                typ = np.zeros(M, np.int32)
                typ[hs & (c1 == 2) & (c2 == 0)] = 1
                typ[hs & (c2 == 2) & (c1 == 0)] = 2
                lanes, lens, typs = _host_te_markers(typ, wes[i],
                                                     opt.min_n)
            else:
                ks = keys_np[i][:n]
                lanes = (ks >> np.uint64(26)).astype(np.int64)
                lens = ((ks >> np.uint64(2))
                        & np.uint64((1 << 24) - 1)).astype(np.int64)
                typs = (ks & np.uint64(3)).astype(np.int64)
            fold.chunk(packed, lanes, lens, typs, M, wes[i])
    fold.finish()


def _host_te_markers(typ, we, min_n):
    """The device step's sparse run markers recomputed on host from a
    per-lane type stream (budget-overflow fallback; same emit rule as
    ops/countstep._trioeval_reduce)."""
    lane = np.arange(len(typ), dtype=np.int64)
    startm = np.concatenate([[True], typ[1:] != typ[:-1]])
    run_start = np.maximum.accumulate(np.where(startm, lane, -1))
    runlen = lane - run_start + 1
    is_end = np.concatenate([typ[:-1] != typ[1:], [True]])
    emit = is_end & (typ > 0) & ((runlen >= min_n)
                                 | (run_start == 0)
                                 | (lane == we))
    return lane[emit], runlen[emit], typ[emit].astype(np.int64)


class _TeChainFold:
    """Host side of the trioeval device fold: maps sparse run markers
    to per-sequence runs, merges boundary runs across chunk-spanning
    pieces, and replays the phase chain (trioeval.c:91-117); shared by
    the single-chip and mesh drivers."""

    def __init__(self, opt, k, bo, glob):
        self.opt, self.k, self.bo, self.glob = opt, k, bo, glob
        self.carry = None  # (gi, _TeSeq, open_run (typ, len, end_pos))

    def chunk(self, packed, lanes, lens, typs, M, we):
        opt, k, bo, glob = self.opt, self.k, self.bo, self.glob
        carry = self.carry
        nseq = len(packed.rec_gid)
        starts = np.minimum(packed.rec_start, M)
        seg_of = np.searchsorted(starts, lanes, side="right") - 1
        continues = (int(packed.rec_off0[-1] + packed.rec_take[-1])
                     < int(packed.rec_len[-1]))

        bnd = np.concatenate([np.searchsorted(seg_of, np.arange(nseq)),
                              [len(lanes)]])
        for j in range(nseq):
            gi = int(packed.rec_gid[j])
            l_j = lanes[bnd[j]:bnd[j + 1]]
            n_j = lens[bnd[j]:bnd[j + 1]]
            t_j = typs[bnd[j]:bnd[j + 1]]
            # run start in vals-array coords (k-mer end base index)
            base = int(packed.rec_off0[j]) - int(starts[j]) + k - 1
            runs = [(int(l) + base - int(ln) + 1, int(ln), int(tv))
                    for l, ln, tv in zip(l_j, n_j, t_j)]
            if j == 0 and carry is not None:
                assert carry[0] == gi
                ts, open_run = carry[1], carry[2]
                carry = None
                if open_run is not None:
                    o_tv, o_ln, o_end = open_run
                    if runs and runs[0][0] == o_end + 1 \
                            and runs[0][2] == o_tv:
                        st0, ln0, tv0 = runs[0]
                        runs[0] = (st0 - o_ln, ln0 + o_ln, tv0)
                    else:
                        runs.insert(0, (o_end - o_ln + 1, o_ln, o_tv))
            else:
                ts = _TeSeq(packed.seq_names[gi],
                            int(packed.rec_len[j]), opt, k)
            tail_open = None
            if j == nseq - 1 and continues and runs \
                    and runs[-1][0] - base + runs[-1][1] - 1 == we:
                st_l, ln_l, tv_l = runs.pop()
                tail_open = (tv_l, ln_l, st_l + ln_l - 1)
            for st, ln, tv in runs:
                if ln >= opt.min_n:
                    ts.run(st, ln, tv)
            if j == nseq - 1 and continues:
                carry = (gi, ts, tail_open)
            else:
                ts.finish(bo, glob)
        self.carry = carry

    def finish(self):
        if self.carry is None:
            return
        opt, k, bo, glob = self.opt, self.k, self.bo, self.glob
        _gi, ts, open_run = self.carry
        self.carry = None
        if open_run is not None:
            o_tv, o_ln, o_end = open_run
            if o_ln >= opt.min_n:
                ts.run(o_end - o_ln + 1, o_ln, o_tv)
        ts.finish(bo, glob)


def _div(a, b):
    # C double division: 0/0 -> nan, x/0 -> inf; %.6f of nan prints below
    if b == 0:
        return float("nan") if a == 0 else float("inf")
    return a / b


def _fdiv(a, b):
    """%.6f of the C division — x86 0.0/0.0 is the NEGATIVE quiet NaN,
    which glibc printf renders as '-nan' (trioeval.c's W/H/N lines on
    empty denominators); Python's format drops the sign."""
    if b == 0 and a == 0:
        return "-nan"
    return f"{_div(a, b):.6f}"
