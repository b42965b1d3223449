"""KmerTable: the user-facing counting-table object.

Wraps the device-resident sorted-array table (ops/sorttable.py — see its
docstring for why sort-merge beats probing on TPU) plus the optional
Bloom prefilter (ops/bloom.py) with host-driven lifecycle: pad-extend
growth, `.yak` dump/restore (io/yakfmt.py) with the five load modes, and
the table-algebra operations of the reference
(shrink/setcnt/clear/merge/subtract/isec/getseq — htab.c:102-367).

Single-device implementation; the multi-chip path (parallel/mesh.py)
shards the same state over a jax Mesh by low hash bits.
"""

import sys

import jax.numpy as jnp
import numpy as np

from yak_tpu import YAK_MAX_COUNT, YAK_LOAD_ALL
from yak_tpu.ops import pallas_compact, pallas_merge
from yak_tpu.ops import sorttable as st
from yak_tpu.ops.countstep import (finalize_compacted, finalize_pmerge,
                                   get_count_step_pmerge,
                                   get_count_step_pmerge_planes,
                                   pmerge_overflow)
from yak_tpu.ops.bloom import make_bloom, bloom_insert
from yak_tpu.ops.hash import hash64_inv
from yak_tpu.io import yakfmt


def _log(msg):
    print(f"[M::yak_tpu] {msg}", file=sys.stderr)


class KmerTable:
    """Deferred-merge note: insert batches are accumulated on device and
    folded into the sorted table with ONE sort-merge once enough lanes
    are pending (an LSM-style compaction) — duplicates across the whole
    pending window coalesce in a single segmented reduction, so per-chunk
    cost drops from O(cap + B) to O(B log B) amortized.  Every read
    operation flushes first; saturating-count semantics are unaffected
    because min(c + m1 + m2, 1023) == min(min(c + m1, 1023) + m2, 1023)
    for per-occurrence increments."""

    def __init__(self, k, pre=10, cap_log2=16, bf_n_hash=4, bf_shift=0,
                 flush_lanes=None, cap_hinted=None, bf_exact=False):
        if pre < 10:
            raise ValueError("pre must be at least YAK_COUNTER_BITS (10)")
        self.k = k
        self.pre = pre
        # k<=31 canonical hashes fit in 62 bits -> single-key packed
        # sorts; k>=32 (yak_hash_long) uses all 64 bits (ops/sorttable)
        self._packable = k <= 31
        self.flush_lanes = flush_lanes  # None = max(2^23, cap)
        # explicit capacity hint (-K): skip the group-size growth prior
        self._cap_hinted = cap_log2 > 16 if cap_hinted is None else cap_hinted
        self.keys, self.cnt, self.size = st.make_table(1 << cap_log2)
        self._tot = 0         # host mirror of size (h->tot parity)
        self._pend = []       # deferred (h, add, valid) batches
        self._pend_codes = []  # deferred host code chunks (hot count path)
        self._pend_lanes = 0
        self._pend_create = True
        # one-step-late overflow bookkeeping for the fused code path:
        # (pre-step keys, cnt, size, bf, codes_group, overflow_flag)
        self._last_step = None
        # plane-resident table between pmerge folds: the raw merge-reduce
        # outputs (ohi, olo, ov, size11, nnew11); self.keys/cnt/size are
        # STALE while set and rebuilt lazily (_materialize) on reads
        self._plane_state = None
        self._group_g = None   # fixed chunks-per-group (stable step shape)
        self.bf = None
        self.bf_shift = bf_shift
        self.bf_n_hash = bf_n_hash
        # serial-exact Bloom gate (reference htab.c:57-70 bit-for-bit):
        # only the -X byte-exact dump path needs it — the default cheap
        # gate keeps the two-pass OUTPUT exact whenever both passes read
        # the same input (ops/countstep._gate_batch docstring)
        self.bf_exact = bf_exact
        if bf_shift > pre:
            # per-shard filter must hold at least one 512-bit block and at
            # most 2^64 bits, else yak_bf_init returns NULL and counting
            # runs ungated (bbf.c:9, htab.c:23-27)
            per_shard = bf_shift - pre
            if 9 <= per_shard <= 64 - 9:
                self.bf = make_bloom(bf_shift)

    @property
    def cap(self):
        return self.keys.shape[0]

    @property
    def tot(self):
        self.flush()
        self._tot = int(self.size)
        return self._tot

    def _ensure_capacity(self, need):
        if need <= self.cap:
            return
        new_cap = self.cap
        while new_cap < need:
            new_cap *= 2
        self.keys, self.cnt, self.size = st.grow(
            self.keys, self.cnt, self.size, new_cap)

    # -- hot path ---------------------------------------------------------

    def insert_codes(self, codes, create_new=True, planes=None,
                     periodic=None):
        """Queue one fixed-size flat base-code chunk (uint8, 4 = N/pad).

        The hot `count` path: chunks accumulate host-side and fold into
        the table in groups via ONE fused XLA program (extract + optional
        Bloom gate + sort-merge, ops/countstep.py) — one transfer + one
        dispatch per group.  All chunks of a table must share a length.

        Host-side bit-plane packing happens HERE, per chunk, so it
        overlaps the device's work on the previous fold; the fold only
        concatenates pre-packed planes.  `planes` (the native reader's
        pre-packed (plo, phi, pnn)) skips the packing; `periodic` skips
        the layout scan: a (R, w) tuple, or False for known-general.
        """
        if self._pend_create != create_new:
            self.flush()
            self._pend_create = create_new
        from yak_tpu.io.pack import (detect_periodic, pack_planes,
                                     pack_planes2)
        per = detect_periodic(codes) if periodic is None \
            else (periodic or None)
        if per is not None:
            plo, phi = (planes[0], planes[1]) if planes is not None \
                else pack_planes2(codes)
            self._pend_codes.append((codes, plo, phi, None, per))
        else:
            plo, phi, pnn = planes if planes is not None \
                else pack_planes(codes)
            self._pend_codes.append((codes, plo, phi, pnn, None))
        if self._group_g is None:
            lanes = max(codes.shape[0] - self.k + 1, 1)
            target = self.flush_lanes or max(1 << 23, self.cap)
            self._group_g = max(1, -(-target // lanes))
        if len(self._pend_codes) >= self._group_g:
            self._fold_codes()

    def _fold_codes(self):
        """Fold pending code chunks (padded to the fixed group size)."""
        from yak_tpu.ops.countstep import get_count_step

        if not self._pend_codes:
            return
        group = self._pend_codes
        self._pend_codes = []
        # pad to the next power of two <= the full group size: at most
        # log2(G) distinct step shapes ever compile, and a small final
        # group is not inflated to the full flush width
        g_full = self._group_g or len(group)
        g = min(g_full, 1 << max(len(group) - 1, 0).bit_length())
        # chunks arrive pre-packed from insert_codes as
        # (codes, plo, phi, pnn|None, (R, w)|None); the fold only
        # concatenates planes (2 bits/base periodic, 3 otherwise)
        from yak_tpu.io.pack import pack_planes
        L = group[0][0].shape[0]
        n_pad = g - len(group)
        pw = [e[4] for e in group]
        periodic = (all(p is not None for p in pw)
                    and len({p[0] for p in pw}) == 1)
        if periodic:
            R = pw[0][0]
            # all-pad fill chunks are trivially periodic with w=0
            wvec = np.array([p[1] for p in pw] + [0] * n_pad,
                            np.int32)
            zw = np.zeros((n_pad, group[0][1].shape[1]), np.uint32)
            plo = np.concatenate([e[1] for e in group] + [zw])
            phi = np.concatenate([e[2] for e in group] + [zw])
            codes = ((jnp.asarray(plo), jnp.asarray(phi),
                      jnp.asarray(wvec)), L)
            planes_L = ("periodic", L, R)
        else:
            pl3s = []
            for e in group:
                if e[3] is None:   # periodic chunk in a mixed group
                    pl3s.append(pack_planes(e[0]))
                else:
                    pl3s.append((e[1], e[2], e[3]))
            W = pl3s[0][0].shape[1]
            padw = np.zeros((n_pad, W), np.uint32)
            padn = np.full((n_pad, W), 0xFFFFFFFF, np.uint32)
            codes = (tuple(
                jnp.asarray(np.concatenate(
                    [p[j] for p in pl3s]
                    + [padn if j == 2 else padw]))
                for j in range(3)), L)
            planes_L = L
        self._check_last_step()  # one step late: previous fold settled
        # capacity prior (only without an explicit cap hint): a group of
        # L lanes creates at most L keys and typically ~L/2 distinct;
        # grow proactively so the first folds don't walk the doubling
        # ladder (each cap is a fresh XLA shape).  With a hint, trust it:
        # overflow replay doubles from there if the user undershot.
        chunk_len = group[0][0].shape[0]
        lanes = g * max(chunk_len - self.k + 1, 1)
        if not self._cap_hinted and self.cap * 2 < lanes:
            need = 1 << max((lanes // 2 - 1).bit_length(), 14)
            self._materialize()
            self.keys, self.cnt, self.size = st.grow(
                self.keys, self.cnt, self.size, need)
        bloom_cfg = None
        use_bf = self.bf is not None and self._pend_create
        if use_bf:
            bloom_cfg = (self.pre, self.bf_shift, self.bf_n_hash,
                         self.bf_exact)
            if self.bf_exact:
                self._warn_exact_gate(lanes)
        mode = self._pallas_mode(use_bf)
        if mode == "psort":
            from yak_tpu.ops.countstep import (
                get_count_presort_step, get_count_presort_step_planes)
            if self._plane_state is not None:
                step = get_count_presort_step_planes(
                    self.k, self.cap, planes_L=planes_L,
                    wide=not self._packable)
            else:
                step = get_count_presort_step(
                    self.k, planes_L=planes_L, wide=not self._packable)
        elif mode == "pmerge":
            if not self._packable:
                # wide k >= 32: the XLA u64 sort lives inside the step;
                # the Bloom gate (if any) runs on the sorted planes in
                # _run_step, so the step itself is bloom-free
                from yak_tpu.ops.countstep import (
                    get_count_wide_step, get_count_wide_step_planes)
                if self._plane_state is not None:
                    step = get_count_wide_step_planes(
                        self.k, self.cap, planes_L=planes_L)
                else:
                    step = get_count_wide_step(self.k,
                                               planes_L=planes_L)
            elif use_bf and not self.bf_exact:
                # cheap-gate -b pass 1: ONE packed in-jit XLA sort; the
                # gate + merge kernel run on the sorted planes in
                # _run_step (countstep.get_count_bloom_step) — the
                # serial-exact gate (-X) keeps the _gate_batch steps
                from yak_tpu.ops.countstep import (
                    get_count_bloom_step, get_count_bloom_step_planes)
                if self._plane_state is not None:
                    step = get_count_bloom_step_planes(
                        self.k, self.cap, planes_L=planes_L)
                else:
                    step = get_count_bloom_step(self.k,
                                                planes_L=planes_L)
            elif self._plane_state is not None:
                step = get_count_step_pmerge_planes(
                    self.k, self.cap, bloom_cfg, planes_L=planes_L)
            else:
                step = get_count_step_pmerge(self.k, bloom_cfg,
                                             planes_L=planes_L)
        else:
            self._materialize()
            step = get_count_step(self.k, self._pend_create, bloom_cfg,
                                  compact=mode != "compact",
                                  planes_L=planes_L)

        prev = ((self.keys, self.cnt, self.size, self.bf)
                if self._plane_state is None
                else ("planes", self._plane_state, self.bf))
        ovf = self._run_step(step, codes, prev, use_bf, mode)
        self._last_step = (prev, codes, ovf, step, use_bf, mode)

    def _warn_exact_gate(self, lanes):
        """Fail fast when the serial-exact gate (-X) cannot engage for
        this -b/-H/chunk configuration (the packed sort key would not
        fit 64 bits): without it the exact-dump cross-check would only
        surface the divergence AFTER a full count (io/exactdump.py)."""
        from yak_tpu.ops.bloom import exact_gate_fits

        # conservative bound on the flattened extraction size (the
        # r-major layout overshoots M = L-k+1 by < 32 lanes per chunk)
        bound = 2 * lanes + 4096
        if not exact_gate_fits(self.bf_shift, self.bf_n_hash, bound):
            raise ValueError(
                f"-X (byte-exact dump) cannot engage the serial-exact "
                f"Bloom gate for -b{self.bf_shift} -H{self.bf_n_hash} "
                f"with {lanes} lanes/fold: the packed (position, rank) "
                f"sort key exceeds 64 bits.  Use a smaller -b/-K or "
                f"drop -X (the default dump has identical content).")

    def _pallas_mode(self, use_bf):
        """Pick the merge engine for this fold.

        "pmerge": XLA batch sort + Pallas merge-reduce — the measured-
          fastest TPU default (r4) for k <= 31 (packed keys) AND
          k >= 32 (wide raw-u64 keys; one single-operand u64 sort
          inside the step jit + the wide merge kernel).
        "psort": Pallas bitonic batch sort (ops/pallas_sort) + in-
          dispatch merge-path search + Pallas merge-reduce — NO XLA
          sort anywhere in the fold; opt-in via YAK_TPU_PSORT=1
          (measured ~3x slower on v5e, see countstep.psort_enabled).
        "compact": XLA merge sort + Pallas streaming compactor.
        "xla": pure XLA (CPU tests, fallbacks).
        """
        import os

        # the serial-exact gate (-X, bf_exact) rides only the fused-step
        # gate (_gate_batch); the psort engine's gate post has no rank
        # plane (countstep.get_bloom_gate_post) — fail fast instead of
        # failing the exact-dump cross-check after a full count
        exact_bf = use_bf and self.bf_exact
        if exact_bf and (os.environ.get("YAK_TPU_PSORT") == "1"
                         or os.environ.get("YAK_TPU_ENGINE") == "psort"
                         or os.environ.get(
                             "YAK_TPU_PSORT_INTERPRET") == "1"):
            raise RuntimeError(
                "-X (byte-exact dump) requires the default engine's "
                "serial-exact Bloom gate; unset YAK_TPU_PSORT/"
                "YAK_TPU_ENGINE=psort or drop -X")
        if os.environ.get("YAK_TPU_PSORT_INTERPRET", "0") == "1":
            # test hook: bitonic sort + merge kernels in interpret mode
            # (covers the Bloom-gated and wide k>=32 psort paths too)
            self._interp = True
            return "psort"
        if os.environ.get("YAK_TPU_PMERGE_INTERPRET", "0") == "1":
            # test hook: run the full pmerge path with the Pallas kernel
            # in interpret mode (CPU engine-parity and replay tests;
            # covers the wide k >= 32 pmerge variant too)
            self._interp = True
            return "pmerge"
        self._interp = False
        forced = os.environ.get("YAK_TPU_ENGINE", "auto")
        if forced == "xla" or not pallas_compact.enabled():
            return "xla"
        import jax

        if jax.default_backend() != "tpu":
            return "xla"
        from yak_tpu.ops.countstep import psort_enabled, wide_smoke_ok

        if not self._packable:
            # k >= 32 wide path: raw 64-bit hash_long keys.  Default
            # (r4, measured-fastest): "pmerge" — ONE single-operand XLA
            # u64 sort inside the step jit + the wide merge kernel
            # (countstep.get_count_wide_step).  YAK_TPU_PSORT=1 (with
            # YAK_TPU_PSORT_WIDE) swaps the sort for the bitonic
            # kernels; YAK_TPU_WIDE=0 or a failed wide-kernel self-test
            # reverts to the multi-operand XLA sort-merge.
            if exact_bf:
                # the wide engines gate via the rank-less gate post —
                # -X at k >= 32 with -b runs the XLA sort-merge step,
                # whose _gate_batch carries the rank plane
                return "xla"
            if (os.environ.get("YAK_TPU_PSORT_WIDE", "1") != "0"
                    and psort_enabled(True)[0] and wide_smoke_ok()):
                return "psort"
            if (os.environ.get("YAK_TPU_WIDE", "1") != "0"
                    and wide_smoke_ok(xla_sort=True)):
                return "pmerge"
            return "xla"
        if forced in ("pmerge", "compact", "psort"):
            return forced
        # consult the gate (NOT the raw env): the first TPU consult
        # runs the one-time kernel self-test, so a Mosaic failure on
        # this toolchain degrades to the XLA engine instead of
        # crashing deep inside the fold (countstep._psort_smoke_ok)
        ok, _ = psort_enabled(self._packable)
        if use_bf:
            # Bloom-gated create pass on the bitonic engine (r4):
            # sort first, dedup + Bloom gate on the sorted stream
            # (countstep.get_bloom_gate_post), weighted merge.
            # YAK_TPU_PSORT_BLOOM=0 reverts to the r2 pmerge path.
            if (ok and not exact_bf
                    and os.environ.get("YAK_TPU_PSORT_BLOOM", "1") != "0"):
                return "psort"
            return "pmerge"
        # measured-fastest default (r4): XLA batch sort + Pallas
        # merge-reduce; the bitonic psort engine is opt-in
        # (YAK_TPU_PSORT=1 — see countstep.psort_enabled's finding)
        return "psort" if ok else "pmerge"

    def _run_step(self, step, codes, state, use_bf, mode):
        """Queue one fused fold against `state` (a (keys, cnt, size, bf)
        u64 snapshot or a ("planes", plane_state, bf) one); leaves the
        result in self.*; returns the device overflow flag."""
        if isinstance(state[0], str):   # ("planes", plane_state, bf)
            _, (ohi, olo, ov, size11, _nn), bf = state
            cap = self.cap
            targs = (ohi, olo, ov, size11)
        else:
            keys, cnt, size, bf = state
            cap = keys.shape[0]
            targs = (keys, cnt, size)
        if isinstance(codes, tuple):   # host-packed plane triple
            carg, L = codes
            G = carg[0].shape[0]
        else:
            carg, (G, L) = codes, codes.shape
        if mode in ("pmerge", "psort"):
            from yak_tpu.ops.kmers import rmajor_lanes
            B = G * (rmajor_lanes(L) if isinstance(codes, tuple)
                     else L - self.k + 1)
            interp = getattr(self, "_interp", False)
            if mode == "psort":
                # 4-dispatch split: extract pre-jit -> Pallas bitonic
                # sort (descending E out) -> in-dispatch diagonal
                # search + merge-reduce kernel -> (lazy) finalize.
                # With a Bloom filter, a gate dispatch runs between the
                # sort and the merge (dedup on the sorted stream + the
                # filter probe; the add weights ride the bw plane).
                from yak_tpu.ops import pallas_sort
                wide = not self._packable
                xhi, xlo, thi, tlo, tw, size_s = step(carg, *targs)
                if use_bf:
                    # Bloom path: the u64 gate dispatch must run
                    # between sort and merge (x64 on), so compose the
                    # split pieces (sort itself is one fused dispatch)
                    from yak_tpu.ops.countstep import get_bloom_gate_post
                    Ehi, Elo = pallas_sort.sort_planes(
                        xhi, xlo, neg_keys=True, interpret=interp)
                    gate = get_bloom_gate_post(
                        self.pre, self.bf_shift, self.bf_n_hash,
                        wide=wide)
                    bw, self.bf = gate(Ehi, Elo, bf)
                    out = pallas_merge.merge_reduce_presorted(
                        size_s, thi, tlo, tw, Ehi, Elo, bw=bw, Na=cap,
                        Nb=B, create=self._pend_create,
                        interpret=interp, wide=wide)
                elif pallas_sort._fused():
                    # hot path: sort + search + merge in ONE dispatch
                    out = pallas_merge.fold_sort_merge(
                        size_s, thi, tlo, tw, xhi, xlo, Na=cap, Nb=B,
                        create=self._pend_create, interpret=interp,
                        wide=wide)
                else:
                    Ehi, Elo = pallas_sort.sort_planes(
                        xhi, xlo, neg_keys=True, interpret=interp)
                    out = pallas_merge.merge_reduce_presorted(
                        size_s, thi, tlo, tw, Ehi, Elo, Na=cap, Nb=B,
                        create=self._pend_create, interpret=interp,
                        wide=wide)
            elif (not self._packable
                  or (use_bf and not self.bf_exact)):
                # presorted pmerge: the step already XLA-sorted the
                # key planes in-jit (wide k >= 32 raw hashes, or the
                # packed cheap-gate -b pass); the Bloom gate (if any)
                # and the merge kernel follow exactly as in the psort
                # branch
                wide = not self._packable
                Ehi, Elo, thi, tlo, tw, size_s = step(carg, *targs)
                bw = None
                if use_bf:
                    from yak_tpu.ops.countstep import run_bloom_gate_post
                    bw, self.bf = run_bloom_gate_post(
                        Ehi, Elo, bf, self.pre, self.bf_shift,
                        self.bf_n_hash, wide=wide, interpret=interp)
                out = pallas_merge.merge_reduce_presorted(
                    size_s, thi, tlo, tw, Ehi, Elo, bw=bw, Na=cap,
                    Nb=B, create=self._pend_create, interpret=interp,
                    wide=wide)
            else:
                if use_bf:
                    *prep, self.bf = step(carg, *targs, bf)
                else:
                    prep = step(carg, *targs)
                out = pallas_merge.merge_reduce(
                    *prep, Na=cap, Nb=B, create=self._pend_create,
                    interpret=interp)
            self._plane_state = out
            return pmerge_overflow(out[3], cap)
        args = (carg,) + targs + ((bf,) if use_bf else ())
        out = step(*args)
        if use_bf:
            *out, self.bf = out
        if mode == "compact":
            khi, klo, outV, self.size, _n, ovf = out
            khi, klo, outV = pallas_compact.compact_raw(khi, klo, outV)
            self.keys, self.cnt = finalize_compacted(
                khi, klo, outV, cap)
        else:
            self.keys, self.cnt, self.size, _n, ovf = out
        return ovf

    def _check_last_step(self):
        """Settle the previous fused fold: on overflow, grow the preserved
        pre-step table and replay (the step does not donate, so the old
        state is intact).  A transient device fault at the sync point
        (shared-tenant TPU INTERNAL errors) replays the same step from
        the preserved state too — the library-level promotion of
        bench.py's whole-pass retry."""
        from yak_tpu.utils import is_transient

        if self._last_step is None:
            return
        prev, codes, ovf, step, use_bf, mode = self._last_step
        self._last_step = None
        for attempt in range(3):
            try:
                bool(ovf)
                break
            except Exception as e:
                if not is_transient(e) or attempt == 2:
                    raise
                _log(f"transient device fault, replaying fold "
                     f"({type(e).__name__})")
                ovf = self._run_step(step, codes, prev, use_bf, mode)
        while bool(ovf):
            if isinstance(prev[0], str):
                # plane-form snapshot: rebuild u64 state, then grow and
                # replay through the u64-table step (overflow is rare —
                # the one-time materialize is off the hot path)
                _, ps, bf = prev
                keys, cnt, size, _n, _o = finalize_pmerge(
                    *ps, cap=self.cap, wide=not self._packable)
                step = self._u64_twin_step(step, use_bf, mode)
            else:
                keys, cnt, size, bf = prev
            keys, cnt, size = st.grow(keys, cnt, size, 2 * keys.shape[0])
            prev = (keys, cnt, size, bf)
            # the pmerge branch of _run_step leaves the result in
            # _plane_state and never touches self.keys — assign the
            # grown state HERE so self.cap reflects the new capacity
            # (finalize_pmerge/get_count_step_pmerge_planes read it)
            self.keys, self.cnt, self.size = keys, cnt, size
            self._plane_state = None
            ovf = self._run_step(step, codes, prev, use_bf, mode)

    def _u64_twin_step(self, step, use_bf, mode):
        """The u64-table variant of a cached plane-table pmerge step."""
        from yak_tpu.ops.countstep import (_STEP_CFG,
                                           get_count_presort_step)

        cfg = _STEP_CFG[step]
        if mode == "psort":
            k, _bc, planes_L, wide = cfg
            return get_count_presort_step(k, planes_L=planes_L,
                                          wide=wide)
        if len(cfg) == 4:   # presorted pmerge step (k, tag, planes_L, wide)
            from yak_tpu.ops.countstep import (get_count_bloom_step,
                                               get_count_wide_step)

            k, tag, planes_L, wide = cfg
            if tag == "bloom":
                return get_count_bloom_step(k, planes_L=planes_L)
            return get_count_wide_step(k, planes_L=planes_L)
        k, bloom_cfg, planes_L = cfg
        return get_count_step_pmerge(k, bloom_cfg, planes_L=planes_L)

    def insert_hashes(self, h, valid, create_new=True):
        """Count a raw (duplicate-bearing) hash batch into the table
        (deferred; folded in at the next flush).

        Reproduces yak_ch_insert_list (htab.c:51-78): Bloom-gated create
        on pass 1, increment-existing-only when create_new=False.
        """
        add = None
        if self.bf is not None and create_new:
            if self.bf_exact:
                # raw hash batches arrive in caller (= serial) order,
                # so the flat iota IS the serial rank here
                lane = jnp.arange(h.shape[0], dtype=jnp.int32)
                hs, starts, mult, rk = st.dedup(h, valid,
                                                packable=self._packable,
                                                rank=lane)
                self.bf, n_before = bloom_insert(
                    self.bf, hs, starts, rk, pre=self.pre,
                    n_shift=self.bf_shift, n_hashes=self.bf_n_hash,
                    rank_bound=h.shape[0])
            else:
                hs, starts, mult = st.dedup(h, valid,
                                            packable=self._packable)
                self.bf, n_before = bloom_insert(
                    self.bf, hs, starts, pre=self.pre,
                    n_shift=self.bf_shift, n_hashes=self.bf_n_hash)
            add = jnp.where(n_before == self.bf_n_hash, mult, mult - 1)
            h, valid = hs, starts & (add > 0)
        if add is None:
            add = jnp.ones(h.shape, jnp.int32)
        if create_new != self._pend_create:
            self.flush()
            self._pend_create = create_new
        self._pend.append((h, add, valid))
        self._pend_lanes += h.shape[0]
        if self._pend_lanes >= (self.flush_lanes or max(1 << 23, self.cap)):
            self.flush()

    def _materialize(self):
        """Rebuild the u64 (keys, cnt, size) table from the plane-resident
        merge-reduce output (one fused dispatch; a no-op otherwise)."""
        if self._plane_state is None:
            return
        ps, self._plane_state = self._plane_state, None
        self.keys, self.cnt, self.size, _n, _o = finalize_pmerge(
            *ps, cap=self.cap, wide=not self._packable)

    def flush(self):
        """Fold all pending inserts into the table and settle overflow."""
        self._fold_codes()
        self._check_last_step()
        self._materialize()
        if not self._pend:
            return
        h = jnp.concatenate([p[0] for p in self._pend])
        add = jnp.concatenate([p[1] for p in self._pend])
        valid = jnp.concatenate([p[2] for p in self._pend])
        self._pend, self._pend_lanes = [], 0
        if self._pend_create:
            self._ensure_capacity(self._tot + h.shape[0])
        self.keys, self.cnt, self.size, _, overflow = st.merge_batch(
            self.keys, self.cnt, self.size, h, add, valid,
            mode=st.ADD, create=self._pend_create,
            packable=self._packable)
        self._tot = int(self.size)

    def lookup_hashes(self, h, valid):
        """int32 counts per lane; -1 where absent (yak_ch_get)."""
        self.flush()
        return st.lookup(self.keys, self.cnt, self.size, h, valid,
                         packable=self._packable)

    # -- cold-path table ops ------------------------------------------------

    def items(self):
        """Host (hash u64[N], count i32[N]) of live entries (sorted)."""
        n = self.tot
        return (np.asarray(self.keys)[:n].copy(),
                np.asarray(self.cnt)[:n].copy())

    def hist(self):
        """1024-bin count histogram (yak_ch_hist)."""
        self.flush()
        return np.asarray(st.hist(self.cnt, self.size))

    def clear_counts(self):
        self.flush()
        self.cnt = st.map_counts(self.cnt, self.size, 0, 0)

    def set_counts(self, value):
        assert 0 <= value <= YAK_MAX_COUNT
        self.flush()
        self.cnt = st.map_counts(self.cnt, self.size, 1, value)

    def destroy_bf(self):
        self.bf = None

    def _set_pairs(self, h_np, c_np):
        """Replace contents with unique host (hash, count) pairs."""
        self._pend, self._pend_codes = [], []
        self._pend_lanes, self._last_step = 0, None
        self._plane_state = None
        order = np.argsort(h_np, kind="stable")
        h_np, c_np = h_np[order], c_np[order]
        n = len(h_np)
        cap = max(self.cap, 1 << 14)
        while cap < n:
            cap *= 2
        keys = np.zeros(cap, np.uint64)
        cnts = np.full(cap, -1, np.int32)
        keys[:n] = h_np
        cnts[:n] = c_np
        self.keys = jnp.asarray(keys)
        self.cnt = jnp.asarray(cnts)
        self.size = jnp.int32(n)
        self._pend, self._pend_lanes = [], 0
        self._tot = n

    def shrink(self, cmin, cmax):
        """Keep entries with count in [cmin, cmax] (yak_ch_shrink)."""
        cmax = cmax if cmin <= cmax <= YAK_MAX_COUNT else YAK_MAX_COUNT
        self.flush()
        keep = (self.cnt >= cmin) & (self.cnt <= cmax)
        self.keys, self.cnt, self.size = st.compact_where(
            self.keys, self.cnt, self.size, keep,
            packable=self._packable)
        self._tot = int(self.size)

    def merge(self, other, cmin, cmax):
        """Merge `other` as +1 presence votes for counts in [cmin, cmax]
        (yak_ch_merge, htab.c:241-285; used by cntasm)."""
        cmax = cmax if cmin <= cmax <= YAK_MAX_COUNT else YAK_MAX_COUNT
        self.flush()
        other.flush()
        lane = jnp.arange(other.cap, dtype=jnp.int32)
        sel = ((lane < other.size) & (other.cnt >= cmin)
               & (other.cnt <= cmax))
        self._ensure_capacity(self.tot + other.tot)
        ones = jnp.ones(other.cap, jnp.int32)
        self.keys, self.cnt, self.size, n_new, _ = st.merge_batch(
            self.keys, self.cnt, self.size, other.keys, ones, sel,
            mode=st.ADD, create=True, packable=self._packable)
        self._tot = int(self.size)

    def subtract(self, other):
        """Drop k-mers present in `other` (yak_ch_subtract)."""
        self._filter_by_membership(other, keep_present=False)

    def isec(self, other):
        """Keep only k-mers present in `other` (yak_ch_isec)."""
        self._filter_by_membership(other, keep_present=True)

    def _filter_by_membership(self, other, keep_present):
        assert self.k == other.k and self.pre == other.pre
        self.flush()
        other.flush()
        lane = jnp.arange(self.cap, dtype=jnp.int32)
        live = lane < self.size
        r = other.lookup_hashes(self.keys, live)
        present = r >= 0
        keep = present if keep_present else (~present & live)
        self.keys, self.cnt, self.size = st.compact_where(
            self.keys, self.cnt, self.size, keep,
            packable=self._packable)
        self._tot = int(self.size)

    def getseq(self):
        """All (k-mer u64, count) pairs with hashes inverted back to packed
        2-bit k-mers (yak_ch_getseq, htab.c:353-367); k <= 31 only."""
        assert self.k <= 31
        h_np, c_np = self.items()
        mask = np.uint64((1 << (2 * self.k)) - 1)
        km = hash64_inv(h_np, mask, ns=np)
        return km, c_np

    # -- I/O ---------------------------------------------------------------

    def dump(self, path):
        h_np, c_np = self.items()
        yakfmt.dump_yak(path, self.k, self.pre, h_np, c_np)
        _log(f"dumped the hash table to file '{path}'")

    @classmethod
    def restore(cls, path, mode=YAK_LOAD_ALL, min_cnt=0, mid_cnt=0, into=None):
        """Load a `.yak` file (yak_ch_restore_core semantics, incl. the
        flag-OR load modes for trio/sexchr)."""
        k, pre, hashes, counts = yakfmt.restore_yak(path)
        vals, keep = yakfmt.apply_load_mode(counts, mode, min_cnt, mid_cnt)
        hashes, vals = hashes[keep], vals[keep]
        if into is None:
            t = cls(k, pre)
            t._set_pairs(hashes, vals.astype(np.int32))
            return t
        t = into
        assert t.k == k and t.pre == pre
        t.flush()
        # preallocate the final capacity ONCE: growing by doubling per
        # chunk would compile a fresh merge program at every ladder step
        # (minutes each through the remote-compile tunnel)
        t._ensure_capacity(t.tot + len(hashes))
        chunk = 1 << 22
        for off in range(0, max(len(hashes), 1), chunk):
            h_np = hashes[off:off + chunk]
            a_np = vals[off:off + chunk]
            if len(h_np) == 0:
                break
            n = len(h_np)
            if n < chunk and off > 0:
                # pad the tail chunk to the full width (valid=False):
                # a second merge shape would be another slow compile
                h_np = np.concatenate(
                    [h_np, np.zeros(chunk - n, np.uint64)])
                a_np = np.concatenate(
                    [a_np, np.zeros(chunk - n, a_np.dtype)])
            valid = jnp.asarray(np.arange(len(h_np)) < n)
            h = jnp.asarray(h_np, jnp.uint64)
            a = jnp.asarray(a_np, jnp.int32)
            t.keys, t.cnt, t.size, n_new, _ = st.merge_batch(
                t.keys, t.cnt, t.size, h, a, valid, mode=st.OR,
                create=True, packable=t._packable)
            t._tot = int(t.size)
        return t
