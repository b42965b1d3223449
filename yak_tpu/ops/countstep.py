"""Fused count step: codes -> k-mer hashes -> table merge in ONE XLA
program.

Dispatch latency and HBM round-trips dominate the chunked count loop on
TPU (measured: extract-then-merge as separate calls costs ~2x the fused
pipeline).  This module compiles the whole per-group step — canonical
k-mer extraction over a [G, L] code block, optional Bloom gating, and
the sort-merge table fold — as one jitted function, so per-group host
work is a single transfer + dispatch.

The step does NOT donate the table arrays: the caller checks the
`overflow` flag one step late (pipelined, no sync stall) and can replay
the step against the preserved pre-merge state after growing the table
(table.py `KmerTable._fold_codes`).  Sort-based merges produce fresh
output buffers anyway, so forgoing donation costs allocator headroom,
not bandwidth.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from yak_tpu.ops import sorttable as st
from yak_tpu.ops.bloom import bloom_insert
from yak_tpu.ops.kmers import (_rmajor_index, extract_from_planes,
                               extract_from_planes_rm, extract_kmer_hashes,
                               extract_periodic, extract_periodic_rm)


def _extractor(k, planes_L, rmajor=False):
    """Extraction closure for the fused steps.

    planes_L=None: the step takes a u8 [G, L] code block.
    planes_L=L (int): the step takes a host-packed plane triple
    (plo, phi, pnn) u32 [G, W] (io/pack.pack_planes) — the h2d transfer
    carries 3 bits/base instead of 8 and the device skips plane packing.
    planes_L=("periodic", L, R): the step takes (plo, phi, wvec) —
    2 bits/base on the wire; validity recomputed from the periodic
    read layout (io/pack.detect_periodic, ops/kmers.extract_periodic).

    rmajor=True (count steps, plane inputs only): windows come back in
    the TPU-tile-friendly [G, 32, W-1] layout (ops/kmers._funnel_rm) —
    only valid when the caller sorts the lanes anyway.  k >= 32 always
    uses the natural-order extractors (the yak_hash_long funnel,
    ops/kmers._hash_long_from_planes).
    """
    rmajor = rmajor and k <= 31
    if planes_L is None:
        return lambda codes: extract_kmer_hashes(codes, k)
    if isinstance(planes_L, tuple):
        _, L, R = planes_L
        if rmajor:
            return lambda a: extract_periodic_rm(a[0], a[1], a[2], k, L, R)
        return lambda a: extract_periodic(a[0], a[1], a[2], k, L, R)
    if rmajor:
        return lambda pl3: extract_from_planes_rm(*pl3, k, planes_L)
    return lambda pl3: extract_from_planes(*pl3, k, planes_L)


def _serial_rank(h):
    """Per-lane serial-buffer rank, computed BEFORE flattening.

    The serial-exact Bloom gate (ops/bloom) breaks ties by each key's
    first-occurrence position in the chunk's serial buffer order
    (htab.c:57-70).  The r-major extraction's [B, 32, W-1] layout does
    NOT flatten to that order (window order != base order,
    kmers._funnel_rm), so the rank must be the base position
    b*per + (32q + r), not a flat iota over the flattened array."""
    if h.ndim == 3:
        _, R, Q = h.shape
        b = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
        return (b * (R * Q) + _rmajor_index(h.shape)).reshape(-1)
    return jax.lax.broadcasted_iota(jnp.int32, (h.size,), 0)


def _bloom_cfg_parse(bloom_cfg):
    """(pre, bf_shift, bf_n_hash[, exact]) -> 4-tuple with default
    exact=False (the cheap chunk-start gate; see _gate_batch)."""
    pre, bf_shift, bf_n_hash, *rest = bloom_cfg
    return pre, bf_shift, bf_n_hash, (rest[0] if rest else False)


def _gate_batch(h, valid, bf, pre, bf_shift, bf_n_hash, exact, *,
                packable=True):
    """Dedup an extracted hash batch and run the Bloom create gate
    (yak_ch_insert_list, htab.c:61-70).

    exact=False (the default): the gate sees the chunk-start filter
    state plus intra-key self hits — no rank sort operands, no serial
    replay machinery.  The two-pass `-b` OUTPUT (counts >= 2 after
    clear + recount + shrink, main.c:53-60) is exact regardless of
    which pass-1 singletons the gate admits when both passes read the
    same input (SURVEY §2.3); only the opt-in byte-exact dump path
    (-X, io/exactdump.py) — where pass 2 may read a different file —
    needs exact=True, the reference's bit-for-bit serial gate.

    Returns (hs, starts, add, bf') ready for the weighted merge:
    use valid = starts & (add > 0)."""
    hf, vf = h.reshape(-1), valid.reshape(-1)
    if exact:
        lane = _serial_rank(h)
        hs, starts, mult, rk = st.dedup(hf, vf, packable=packable,
                                        rank=lane)
        bf2, n_before = bloom_insert(bf, hs, starts, rk, pre=pre,
                                     n_shift=bf_shift,
                                     n_hashes=bf_n_hash,
                                     rank_bound=hf.shape[0])
    else:
        hs, starts, mult = st.dedup(hf, vf, packable=packable)
        bf2, n_before = bloom_insert(bf, hs, starts, pre=pre,
                                     n_shift=bf_shift,
                                     n_hashes=bf_n_hash)
    add = jnp.where(n_before == bf_n_hash, mult, mult - 1)
    return hs, starts, add, bf2


@lru_cache(maxsize=None)
def get_count_step(k, create, bloom_cfg=None, compact=True, planes_L=None):
    """Compiled fused step for static (k, create, bloom_cfg, planes_L).

    bloom_cfg: None or (pre, bf_shift, bf_n_hash).

    Returns step(codes, tkeys, tcnt, size[, bf]) ->
      (tkeys', tcnt', size', n_new, overflow[, bf']), where codes is a
    u8 [G, L] code block, or with planes_L=L a (plo, phi, pnn) plane
    triple (see _extractor).

    compact=False (k <= 31 only): the merged stream comes back as
    (khi, klo, outV, size, n_new, overflow[, bf']) u32 planes with
    dropped lanes marked, for the Pallas streaming compactor
    (ops/pallas_compact.py) — see table.KmerTable._fold_codes.
    """
    packable = k <= 31
    ext = _extractor(k, planes_L, rmajor=True)

    if bloom_cfg is None:

        @jax.jit
        def step(codes, tkeys, tcnt, size):
            h, valid = ext(codes)
            h, valid = h.reshape(-1), valid.reshape(-1)
            add = jnp.ones(h.shape, jnp.int32)
            return st.merge_batch_impl(tkeys, tcnt, size, h, add, valid,
                                       mode=st.ADD, create=create,
                                       packable=packable, compact=compact)

        return step

    pre, bf_shift, bf_n_hash, exact = _bloom_cfg_parse(bloom_cfg)

    @jax.jit
    def step_bf(codes, tkeys, tcnt, size, bf):
        h, valid = ext(codes)
        hs, starts, add, bf2 = _gate_batch(h, valid, bf, pre, bf_shift,
                                           bf_n_hash, exact,
                                           packable=packable)
        out = st.merge_batch_impl(tkeys, tcnt, size, hs, add,
                                  starts & (add > 0), mode=st.ADD,
                                  create=create, packable=packable,
                                  compact=compact)
        return out + (bf2,)

    return step_bf


def _pmerge_prep_planes_impl(ohi, olo, ov, size, cap, h, add, valid,
                             unit_adds=False):
    """_pmerge_prep_core against a PLANE-RESIDENT table: the previous
    fold's raw merge-reduce outputs (2-D u32/i32 planes holding packed
    hash<<1|stream keys) feed the next fold UNTOUCHED — the kernel
    clears the stream bit, masks lanes >= size, and tags table presence
    itself, so no table-side prep pass runs at all.  The u64 key array
    is only materialized on reads (table.KmerTable._materialize)."""
    return _pmerge_prep_core(ohi, olo, ov, size, cap, h, add, valid,
                             unit_adds, lo_has_stream_bit=True)


def _pmerge_prep_impl(tkeys, tcnt, size, h, add, valid, unit_adds=False):
    """Prep the Pallas merge-reduce kernel's inputs from a u64 table:
    one fused elementwise split of tkeys<<1 into hi/lo u32 planes (the
    packed total order: hash<<1 | stream, table stream = 0); counts pass
    through raw.  Runs inside the fused step jit (u64 allowed); the
    kernel runs in a separate 32-bit dispatch."""
    cap = tkeys.shape[0]
    shifted = tkeys << jnp.uint64(1)
    thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    return _pmerge_prep_core(thi, tlo, tcnt, size, cap, h, add, valid,
                             unit_adds, lo_has_stream_bit=False)


def _pmerge_prep_core(thi, tlo, tw, size, cap, h, add, valid, unit_adds,
                      lo_has_stream_bit, payload=None, lookup=False):
    """Shared prep: complement-sort the batch (descending keys with no
    flip pass), split to u32 planes, and run the merge-path diagonal
    search over (table planes, sorted batch).  Table planes pass through
    raw — all masking happens in-kernel (ops/pallas_merge V2 contract).

    lookup=True: INVALID query lanes get the distinct sub-INF key
    ...FFFD (they must still emit -1 at their original index; exact INF
    marks window pads the kernel drops); `payload` (the original lane
    index) sorts alongside and is returned as a 9th element for the
    order-restoring sort after the kernel.
    """
    from yak_tpu.ops.pallas_merge import T as _T, _WA

    B = h.shape[0]
    maxu64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    # packed total order: hash<<1 | stream (table=0, batch=1) — ties
    # impossible, so the kernel's value-order tile selection is exactly
    # the positional merge-path slice even with heavy key duplication.
    # Complement trick: sorting ~pk ascending IS pk descending — the
    # split pass below re-complements, so no flip pass ever runs.
    inval_xs = jnp.uint64(2) if lookup else jnp.uint64(0)
    xs = jnp.where(valid, ~((h << jnp.uint64(1)) | jnp.uint64(1)),
                   inval_xs)
    Bpad = max(-(-max(B, _WA) // 1024) * 1024, _WA)
    if Bpad != B:
        xs = jnp.concatenate([xs, jnp.zeros(Bpad - B, jnp.uint64)])
    pay = None
    if payload is not None:
        p_in = payload.astype(jnp.int32)
        if Bpad != B:
            p_in = jnp.concatenate(
                [p_in, jnp.full(Bpad - B, -1, jnp.int32)])
        xs, pay = jax.lax.sort((xs, p_in), num_keys=1, is_stable=False)
        bw = None
    elif unit_adds:
        (xs,) = jax.lax.sort((xs,), num_keys=1, is_stable=False)
        bw = None
    else:
        a_in = add.astype(jnp.int32)
        if Bpad != B:
            a_in = jnp.concatenate([a_in, jnp.zeros(Bpad - B, jnp.int32)])
        xs, bw = jax.lax.sort((xs, a_in), num_keys=1, is_stable=False)
    E = ~xs                       # descending packed keys, INF front pad
    bhi = (E >> jnp.uint64(32)).astype(jnp.uint32)
    blo = (E & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)

    # merge-path diagonal splits over the packed u64 keys; table values
    # gathered from the raw planes (masked beyond `size`, stream bit
    # cleared), batch values from the descending sorted stream
    lo_clear = jnp.uint64(0xFFFFFFFFFFFFFFFE) if lo_has_stream_bit \
        else maxu64
    thi_f = thi.reshape(-1)
    tlo_f = tlo.reshape(-1)

    def getA(m):
        mc = jnp.clip(m, 0, cap - 1)
        v = ((thi_f[mc].astype(jnp.uint64) << jnp.uint64(32))
             | tlo_f[mc].astype(jnp.uint64)) & lo_clear
        return jnp.where(m >= size, maxu64, v)

    grid = (cap + B) // _T + 1
    D = jnp.minimum(jnp.arange(grid, dtype=jnp.int64) * _T, cap + B)
    lo_b = jnp.maximum(jnp.int64(0), D - B)
    hi_b = jnp.minimum(D, jnp.int64(cap))
    iters = max(cap, 1).bit_length() + 1
    for _ in range(iters):
        m = (lo_b + hi_b) // 2
        Am = getA(m)
        Bj = D - m - 1
        # ascending batch index j lives at descending slot Bpad-1-j
        Bv = E[jnp.clip(jnp.int64(Bpad) - 1 - Bj, 0, Bpad - 1)]
        Bv = jnp.where(Bj < 0, jnp.uint64(0), Bv)
        Bv = jnp.where(Bj >= B, maxu64, Bv)
        pred = Am < Bv
        active = lo_b < hi_b
        lo_b = jnp.where(active & pred, m + 1, lo_b)
        hi_b = jnp.where(active & ~pred, m, hi_b)
    a_starts = lo_b.astype(jnp.int32)
    size_s = jnp.minimum(size, cap).reshape(1).astype(jnp.int32)
    if payload is not None:
        return a_starts, size_s, thi, tlo, tw, bhi, blo, bw, pay
    return a_starts, size_s, thi, tlo, tw, bhi, blo, bw


@lru_cache(maxsize=None)
def get_count_step_pmerge(k, bloom_cfg=None, planes_L=None):
    """Fused extract [+ Bloom gate] + batch sort + merge-reduce prep
    (k <= 31 only); the Pallas merge-reduce kernel consumes the outputs
    (create is a kernel-side flag)."""
    assert k <= 31
    ext = _extractor(k, planes_L, rmajor=True)

    if bloom_cfg is None:

        @jax.jit
        def step(codes, tkeys, tcnt, size):
            h, valid = ext(codes)
            h, valid = h.reshape(-1), valid.reshape(-1)
            add = jnp.ones(h.shape, jnp.int32)
            return _pmerge_prep_impl(tkeys, tcnt, size, h, add, valid,
                                     unit_adds=True)

        return step

    pre, bf_shift, bf_n_hash, exact = _bloom_cfg_parse(bloom_cfg)

    @jax.jit
    def step_bf(codes, tkeys, tcnt, size, bf):
        h, valid = ext(codes)
        hs, starts, add, bf2 = _gate_batch(h, valid, bf, pre, bf_shift,
                                           bf_n_hash, exact)
        out = _pmerge_prep_impl(tkeys, tcnt, size, hs, add,
                                starts & (add > 0))
        return out + (bf2,)

    return step_bf


# step function -> (k, bloom_cfg, planes_L): lets table.py recover the
# u64-table twin of a plane-table step for the rare overflow replay
_STEP_CFG = {}


@lru_cache(maxsize=None)
def get_count_step_pmerge_planes(k, cap, bloom_cfg=None, planes_L=None):
    """get_count_step_pmerge against a plane-resident table: the step
    takes the previous fold's raw merge-reduce outputs
    (ohi, olo, ov, size11) instead of (tkeys u64, tcnt, size) — see
    _pmerge_prep_planes_impl.  `cap` is the table capacity in lanes
    (static; the output planes are longer than cap)."""
    assert k <= 31
    ext = _extractor(k, planes_L, rmajor=True)

    if bloom_cfg is None:

        @jax.jit
        def step(codes, ohi, olo, ov, size11):
            h, valid = ext(codes)
            h, valid = h.reshape(-1), valid.reshape(-1)
            add = jnp.ones(h.shape, jnp.int32)
            size = jnp.minimum(size11[0, 0], cap)
            return _pmerge_prep_planes_impl(ohi, olo, ov, size, cap,
                                            h, add, valid, unit_adds=True)

        _STEP_CFG[step] = (k, bloom_cfg, planes_L)
        return step

    pre, bf_shift, bf_n_hash, exact = _bloom_cfg_parse(bloom_cfg)

    @jax.jit
    def step_bf(codes, ohi, olo, ov, size11, bf):
        h, valid = ext(codes)
        hs, starts, add, bf2 = _gate_batch(h, valid, bf, pre, bf_shift,
                                           bf_n_hash, exact)
        size = jnp.minimum(size11[0, 0], cap)
        out = _pmerge_prep_planes_impl(ohi, olo, ov, size, cap, hs, add,
                                       starts & (add > 0))
        return out + (bf2,)

    _STEP_CFG[step_bf] = (k, bloom_cfg, planes_L)
    return step_bf


def _xs_planes(h, valid, lookup=False, wide=False):
    """Complement-packed sort keys as UNSORTED u32 planes for the Pallas
    bitonic sort (ops/pallas_sort): same packed total order as
    _pmerge_prep_core's xs, padded to a power of two (>= 2^14, the merge
    kernel's minimum physical window).  Pads are 0x..00, which sort to
    the ascending front = the descending E's INF front pads after the
    sort's final complement (neg_keys=True).

    wide=True (k >= 32 full-width hash_long hashes, no room for the
    stream bit): xs = ~h, and any VALID hash equal to 0xFF..FF is
    clamped to 0xFF..FE so that exact-INF stays reserved for pads —
    the wide merge kernel's realness test (pallas_merge._make_kernel).
    The clamp merges two of 2^64 key values, noise far below the
    hash_long path's own collision rate (main.c:19-24)."""
    B = h.shape[0]
    if wide:
        xs = jnp.where(valid, ~h, jnp.uint64(0))
        xs = jnp.where(valid & (xs == jnp.uint64(0)), jnp.uint64(1), xs)
    else:
        inval = jnp.uint64(2) if lookup else jnp.uint64(0)
        xs = jnp.where(valid, ~((h << jnp.uint64(1)) | jnp.uint64(1)),
                       inval)
    Bpad = max(1 << 14, 1 << max(B - 1, 1).bit_length())
    if Bpad != B:
        xs = jnp.concatenate([xs, jnp.zeros(Bpad - B, jnp.uint64)])
    return ((xs >> jnp.uint64(32)).astype(jnp.uint32),
            (xs & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


def _xs_packed_sorted(h, valid):
    """Descending PACKED-key planes (hash<<1 | stream=1) via ONE
    single-operand XLA u64 sort — the gated (k <= 31) pmerge engine's
    sort, run inside the caller's fused step jit.  Same complement
    encoding as _xs_planes(wide=False) (invalid/pad xs = 0 -> exact-INF
    E at the descending front), so the plane contract matches
    pallas_sort.sort_planes(neg_keys=True) and the merge kernel /
    gate post consume it unchanged."""
    B = h.shape[0]
    xs = jnp.where(valid, ~((h << jnp.uint64(1)) | jnp.uint64(1)),
                   jnp.uint64(0))
    Bpad = max(1 << 14, 1 << max(B - 1, 1).bit_length())
    if Bpad != B:
        xs = jnp.concatenate([xs, jnp.zeros(Bpad - B, jnp.uint64)])
    (xs,) = jax.lax.sort((xs,), num_keys=1, is_stable=False)
    E = ~xs
    return ((E >> jnp.uint64(32)).astype(jnp.uint32),
            (E & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


def _xs_wide_sorted(h, valid):
    """Descending raw-hash planes via ONE single-operand XLA u64 sort —
    the wide (k >= 32) pmerge engine's sort, run inside the caller's
    fused step jit.  Same clamped complement encoding as
    _xs_planes(wide=True) (xs = ~h, invalid/pad = 0, valid 0 clamped
    to 1), same power-of-two pad, so the output plane contract is
    identical to pallas_sort.sort_planes(neg_keys=True) on the wide xs
    planes: descending raw hashes with exact-INF = pads + invalid
    lanes at the front."""
    B = h.shape[0]
    xs = jnp.where(valid, ~h, jnp.uint64(0))
    xs = jnp.where(valid & (xs == jnp.uint64(0)), jnp.uint64(1), xs)
    Bpad = max(1 << 14, 1 << max(B - 1, 1).bit_length())
    if Bpad != B:
        xs = jnp.concatenate([xs, jnp.zeros(Bpad - B, jnp.uint64)])
    (xs,) = jax.lax.sort((xs,), num_keys=1, is_stable=False)
    E = ~xs
    return ((E >> jnp.uint64(32)).astype(jnp.uint32),
            (E & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


@lru_cache(maxsize=None)
def get_bloom_gate_post(pre, bf_shift, bf_n_hash, shard_shift=0,
                        wide=False):
    """The Bloom-gated create protocol (htab.c:61-70) ON TOP of the
    Pallas-sorted batch — the psort engine's -b path (r3 VERDICT next
    #4: the author-recommended -b config never benefited from the
    bitonic engine because dedup needed its own XLA sort).

    Runs AFTER pallas_sort (descending E planes, INF = pads + invalid
    lanes): equal keys are already contiguous, so dedup is a
    neighbor-compare + cummax run-length — no sort.  Each distinct
    hash probes the Bloom filter once at its run-END lane; the per-run
    add weight (mult if all probed bits were set, else mult-1 — the
    first sighting feeds the filter, not the table) lands on that lane
    of the weight plane `bw`, and the merge-reduce kernel's segmented
    run sum spreads it over the run.  Runs whose total weight is 0 and
    that match no table entry are dropped by the kernel's create gate
    (pallas_merge keep = end & (has_tab | val > 0)), which is exactly
    `starts & (add > 0)` of the XLA path.

    Returns (bw i32 plane aligned with E, bf')."""

    @jax.jit
    def post(Ehi, Elo, bf):
        E = ((Ehi.astype(jnp.uint64) << jnp.uint64(32))
             | Elo.astype(jnp.uint64))
        inf = jnp.uint64(0xFFFFFFFFFFFFFFFF)
        valid = E != inf               # INF = window pads + invalid
        # packed key -> hash (strip the stream bit); wide keys are raw
        h = E if wide else E >> jnp.uint64(1)
        n = E.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        starts = jnp.concatenate(
            [jnp.ones((1,), bool), E[1:] != E[:-1]])
        ends = jnp.concatenate(
            [E[:-1] != E[1:], jnp.ones((1,), bool)]) & valid
        start_ix = jax.lax.cummax(jnp.where(starts, idx, 0))
        mult = idx - start_ix + 1      # at end lanes: the run length
        bf2, n_before = bloom_insert(bf, h, ends, pre=pre,
                                     n_shift=bf_shift,
                                     n_hashes=bf_n_hash,
                                     shard_shift=shard_shift)
        add = jnp.where(n_before == bf_n_hash, mult, mult - 1)
        bw = jnp.where(ends, add, 0).astype(jnp.int32)
        return bw, bf2

    return post


@lru_cache(maxsize=None)
def _gate_sent_a(pre, bf_shift, bf_n_hash, wide):
    """Phase A of the SENTINEL-MERGE Bloom gate post: dedup + probe
    (as get_bloom_gate_post) + the filter-update position sort with one
    SENTINEL item per filter word merged in.  After the sort, the data
    lanes between sentinel w and sentinel w+1 are exactly word w's
    probes, so each word's OR mask is the cumsum difference at adjacent
    sentinel lanes — the streaming compactor extracts the sentinels'
    cumsum values in word order and NO dense searchsorted runs at all
    (its 2^19-query binary search measured ~240ms/fold on v5e, the
    single fattest slice of the literal two-pass gate).

    Returns (bw, khi, cs): the merge weight plane, plus the compactor
    input planes (khi = word index at sentinel lanes / PAD elsewhere,
    cs = exclusive u32 bit-mask cumsum, wrapping — exact per-word by
    the unique-bits argument in ops/bloom)."""
    from yak_tpu.ops.bloom import probe_count, probe_geom

    nw = 1 << (bf_shift - 5)

    @jax.jit
    def post_a(Ehi, Elo, bf):
        E = ((Ehi.astype(jnp.uint64) << jnp.uint64(32))
             | Elo.astype(jnp.uint64))
        inf = jnp.uint64(0xFFFFFFFFFFFFFFFF)
        valid = E != inf
        h = E if wide else E >> jnp.uint64(1)
        n = E.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        starts = jnp.concatenate(
            [jnp.ones((1,), bool), E[1:] != E[:-1]])
        ends = jnp.concatenate(
            [E[:-1] != E[1:], jnp.ones((1,), bool)]) & valid
        start_ix = jax.lax.cummax(jnp.where(starts, idx, 0))
        mult = idx - start_ix + 1      # at end lanes: the run length
        base, zs = probe_geom(h, pre=pre, n_shift=bf_shift,
                              n_hashes=bf_n_hash)
        n_before, _ = probe_count(bf, base, zs, ends)
        add = jnp.where(n_before == bf_n_hash, mult, mult - 1)
        bw = jnp.where(ends, add, 0).astype(jnp.int32)
        # update items: data key = (pos<<1)|1, sentinel key = w<<6 —
        # sentinel w sorts after word w-1's data and before word w's
        base32 = base.astype(jnp.uint32)
        data = jnp.stack(
            [jnp.where(ends, ((base32 + zi) << jnp.uint32(1))
                       | jnp.uint32(1), jnp.uint32(0xFFFFFFFF))
             for zi in zs], axis=0).reshape(-1)
        sent = jnp.arange(nw + 1, dtype=jnp.uint32) << jnp.uint32(6)
        allk = jnp.concatenate([data, sent])
        (ks,) = jax.lax.sort((allk,), num_keys=1, is_stable=False)
        is_data = (ks & jnp.uint32(1)) == 1    # incl. 0xFFFFFFFF pads:
        prev = jnp.concatenate([ks[:1] ^ jnp.uint32(1), ks[:-1]])
        uniq = is_data & (ks != prev)          # pads sort after every
        m = jnp.where(uniq,                    # sentinel -> harmless
                      jnp.uint32(1) << ((ks >> jnp.uint32(1))
                                        & jnp.uint32(31)),
                      jnp.uint32(0))
        cs = jnp.cumsum(m) - m                 # exclusive, wrapping u32
        khi = jnp.where((ks & jnp.uint32(1)) == 0, ks >> jnp.uint32(6),
                        jnp.uint32(0x80000000))
        return bw, khi, jax.lax.bitcast_convert_type(cs, jnp.int32)

    return post_a


@lru_cache(maxsize=None)
def _gate_sent_b(nw):
    @jax.jit
    def post_b(bf, cvals):
        c = jax.lax.bitcast_convert_type(cvals.reshape(-1)[:nw + 1],
                                         jnp.uint32)
        return bf | (c[1:] - c[:-1])
    return post_b


def gate_sent_fits(bf_shift, n_hashes):
    """The sentinel-merge gate needs the (pos<<1|1) data key to fit
    u32 with 0xFFFFFFFF reserved, and a whole-filter sentinel array."""
    return bf_shift + 1 <= 31 and bf_shift <= 30


def run_bloom_gate_post(Ehi, Elo, bf, pre, bf_shift, bf_n_hash,
                        wide=False, interpret=False):
    """The single-chip gated fold's gate dispatch: the sentinel-merge
    two-phase post when it fits (default; YAK_TPU_BLOOM_SENTINEL=0
    reverts), else the one-jit searchsorted gate post."""
    import os

    if (gate_sent_fits(bf_shift, bf_n_hash)
            and os.environ.get("YAK_TPU_BLOOM_SENTINEL", "1") != "0"):
        nw = 1 << (bf_shift - 5)
        bw, khi, cs = _gate_sent_a(pre, bf_shift, bf_n_hash,
                                   wide)(Ehi, Elo, bf)
        _w, cvals = run_mark_compact(khi, cs, nw + 1,
                                     interpret=interpret)
        return bw, _gate_sent_b(nw)(bf, cvals)
    gate = get_bloom_gate_post(pre, bf_shift, bf_n_hash, wide=wide)
    return gate(Ehi, Elo, bf)


@lru_cache(maxsize=None)
def get_count_presort_step(k, planes_L=None, wide=False):
    """Pre-jit of the psort engine (u64 table): fused extract +
    complement-pack; the batch sort itself runs in the Pallas bitonic
    kernels (ops/pallas_sort) and the merge-path search moves into the
    merge dispatch (pallas_merge.merge_reduce_presorted), so this jit
    has no lax.sort at all.

    wide=True (k >= 32): keys travel as RAW 64-bit hash_long hashes —
    table planes split without the hash<<1|stream packing, batch keys
    clamped per _xs_planes; the wide merge kernel consumes them."""
    assert wide == (k > 31)
    ext = _extractor(k, planes_L, rmajor=True)

    @jax.jit
    def step(codes, tkeys, tcnt, size):
        h, valid = ext(codes)
        xhi, xlo = _xs_planes(h.reshape(-1), valid.reshape(-1),
                              wide=wide)
        shifted = tkeys if wide else tkeys << jnp.uint64(1)
        thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        size_s = jnp.minimum(size, tkeys.shape[0]).reshape(1).astype(
            jnp.int32)
        return xhi, xlo, thi, tlo, tcnt, size_s

    _STEP_CFG[step] = (k, None, planes_L, wide)
    return step


@lru_cache(maxsize=None)
def get_count_presort_step_planes(k, cap, planes_L=None, wide=False):
    """get_count_presort_step against a plane-resident table (previous
    fold's raw merge-reduce outputs pass through untouched; the kernel
    and the in-dispatch search both clear the stream bit — a no-op for
    wide keys, which carry no stream bit)."""
    assert wide == (k > 31)
    ext = _extractor(k, planes_L, rmajor=True)

    @jax.jit
    def step(codes, ohi, olo, ov, size11):
        h, valid = ext(codes)
        xhi, xlo = _xs_planes(h.reshape(-1), valid.reshape(-1),
                              wide=wide)
        size_s = jnp.minimum(size11[0, 0], cap).reshape(1).astype(
            jnp.int32)
        return xhi, xlo, ohi, olo, ov, size_s

    _STEP_CFG[step] = (k, None, planes_L, wide)
    return step


@lru_cache(maxsize=None)
def get_count_wide_step(k, planes_L=None):
    """Wide (k >= 32) pmerge pre-jit: fused extract + single-operand
    XLA u64 batch sort -> descending raw yak_hash_long planes; the wide
    Pallas merge-reduce kernel (pallas_merge.merge_reduce_presorted
    wide=True) consumes them.  The r4 default k >= 32 engine — the
    multi-operand XLA sort-merge it replaces paid ~2.6x the packed
    path's sort cost (r2 bench) plus full-lane XLA merge passes; here
    the sort is one u64 operand and the merge streams the table once
    through the kernel.  Reference semantics: count.c:45-60 (hash_long
    counting); the Bloom -b gate, when present, runs as a separate
    dispatch on the sorted planes (get_bloom_gate_post(wide=True))."""
    assert k > 31
    ext = _extractor(k, planes_L, rmajor=True)

    @jax.jit
    def step(codes, tkeys, tcnt, size):
        h, valid = ext(codes)
        Ehi, Elo = _xs_wide_sorted(h.reshape(-1), valid.reshape(-1))
        thi = (tkeys >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = (tkeys & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        size_s = jnp.minimum(size, tkeys.shape[0]).reshape(1).astype(
            jnp.int32)
        return Ehi, Elo, thi, tlo, tcnt, size_s

    _STEP_CFG[step] = (k, None, planes_L, True)
    return step


@lru_cache(maxsize=None)
def get_count_wide_step_planes(k, cap, planes_L=None):
    """get_count_wide_step against a plane-resident table (the previous
    fold's raw merge-reduce outputs pass through untouched; wide keys
    carry no stream bit so no clearing is needed anywhere)."""
    assert k > 31
    ext = _extractor(k, planes_L, rmajor=True)

    @jax.jit
    def step(codes, ohi, olo, ov, size11):
        h, valid = ext(codes)
        Ehi, Elo = _xs_wide_sorted(h.reshape(-1), valid.reshape(-1))
        size_s = jnp.minimum(size11[0, 0], cap).reshape(1).astype(
            jnp.int32)
        return Ehi, Elo, ohi, olo, ov, size_s

    _STEP_CFG[step] = (k, None, planes_L, True)
    return step


@lru_cache(maxsize=None)
def get_count_bloom_step(k, planes_L=None):
    """Gated (k <= 31, -b pass 1, cheap gate) pmerge pre-jit: fused
    extract + ONE single-operand packed u64 XLA sort -> descending
    packed planes.  The Bloom gate runs as a separate dispatch on the
    sorted stream (get_bloom_gate_post: neighbor-compare dedup, no
    second sort) and the merge kernel consumes the SAME planes with the
    gate's bw weight plane — replacing the r4 structure's three full-
    lane sorts per gated fold (dedup rank sort + prep sort + the exact
    gate's u64+payload sorts) with one.  The serial-exact gate (-X)
    keeps the old _gate_batch steps (table._fold_codes)."""
    assert k <= 31
    ext = _extractor(k, planes_L, rmajor=True)

    @jax.jit
    def step(codes, tkeys, tcnt, size):
        h, valid = ext(codes)
        Ehi, Elo = _xs_packed_sorted(h.reshape(-1), valid.reshape(-1))
        shifted = tkeys << jnp.uint64(1)
        thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        size_s = jnp.minimum(size, tkeys.shape[0]).reshape(1).astype(
            jnp.int32)
        return Ehi, Elo, thi, tlo, tcnt, size_s

    _STEP_CFG[step] = (k, "bloom", planes_L, False)
    return step


@lru_cache(maxsize=None)
def get_count_bloom_step_planes(k, cap, planes_L=None):
    """get_count_bloom_step against a plane-resident table: the previous
    fold's raw merge-reduce outputs pass through untouched (packed keys
    keep their stream bit — the kernel clears it, exactly as in
    _pmerge_prep_planes_impl)."""
    assert k <= 31
    ext = _extractor(k, planes_L, rmajor=True)

    @jax.jit
    def step(codes, ohi, olo, ov, size11):
        h, valid = ext(codes)
        Ehi, Elo = _xs_packed_sorted(h.reshape(-1), valid.reshape(-1))
        size_s = jnp.minimum(size11[0, 0], cap).reshape(1).astype(
            jnp.int32)
        return Ehi, Elo, ohi, olo, ov, size_s

    _STEP_CFG[step] = (k, "bloom", planes_L, False)
    return step


_PSORT_SMOKE = {"ok": None, "class": None, "err": None}


class _SmokeDataMismatch(RuntimeError):
    """The self-test sort RAN but produced wrong output (mis-lowering)."""


def _classify_smoke_failure(e):
    """Bucket a smoke-test failure so fallback logs (and bench JSON) can
    distinguish OUR bugs from backend limits (r3 VERDICT weak #6: a
    NameError in the pass-chain builder was silently swallowed as if it
    were a Mosaic rejection).

    - "python": an exception from plain-Python plumbing (NameError,
      TypeError, tracing-time shape errors...) — a framework bug; the
      fallback keeps production alive but this class should never ship.
    - "backend": the compiler/runtime refused or faulted (XlaRuntimeError,
      Mosaic lowering errors) — the fallback existing is the point.
    - "data": the kernel ran and returned WRONG data (silent
      mis-lowering) — also a backend class, reported distinctly because
      it is the scariest one."""
    if isinstance(e, _SmokeDataMismatch):
        return "data"
    mod = type(e).__module__ or ""
    if mod.startswith(("jax", "jaxlib")):
        return "backend"
    if mod == "builtins" and not isinstance(e, RuntimeError):
        return "python"
    return "backend"


def psort_status():
    """(engine, failure_class) for JSON tagging: "psort" when the gate
    is (or would be) open, else "pmerge" (the r4 default XLA-sort +
    Pallas-merge engine) plus the recorded failure class — so a
    recorded score can never be silently attributed to the wrong
    engine (r3 VERDICT weak #3)."""
    ok, _interp = psort_enabled(True)
    return ("psort" if ok else "pmerge"), _PSORT_SMOKE["class"]


def _psort_smoke_ok():
    """One-time hardware self-test for the bitonic sort kernels.

    The psort engine commits callers to a routed plane layout before any
    Pallas program compiles; if Mosaic rejects a kernel (or silently
    mis-lowers it) on this toolchain, every workload would crash — or
    worse, corrupt counts — deep inside the fold.  So the first TPU
    consult of the gate dispatches one small real sort (2^18 lanes:
    covers the windowed pass AND the cross-window exchange + tail
    kernels of one shape family) and checks it against the host sort.
    Any exception or mismatch poisons the gate for the process and the
    caller falls back to the XLA sort-merge engine (the measured r2
    path), with a warning.  YAK_TPU_PSORT_SMOKE=0 skips the test."""
    import os

    if _PSORT_SMOKE["ok"] is None:
        if os.environ.get("YAK_TPU_PSORT_SMOKE", "1") == "0":
            _PSORT_SMOKE["ok"] = True
            return True
        import sys

        import numpy as np

        from yak_tpu.ops import pallas_sort

        try:
            B = 1 << 18
            rng = np.random.default_rng(0xDA7A)
            hi = rng.integers(0, 1 << 32, B, dtype=np.uint64)
            lo = rng.integers(0, 1 << 32, B, dtype=np.uint64)
            val = rng.integers(0, 1 << 32, B, dtype=np.uint64)
            out = pallas_sort.sort_planes(
                jnp.asarray(hi, jnp.uint32), jnp.asarray(lo, jnp.uint32),
                jnp.asarray(val, jnp.uint32))
            got = np.stack([np.asarray(p, np.uint64) for p in out])
            order = np.argsort((hi << 32) | lo, kind="stable")
            want = np.stack([hi[order], lo[order], val[order]])
            if not np.array_equal(got, want):
                raise _SmokeDataMismatch(
                    "sorted output mismatch vs host sort")
            _PSORT_SMOKE["ok"] = True
        except Exception as e:  # noqa: BLE001 — any failure => fallback
            cls = _classify_smoke_failure(e)
            _PSORT_SMOKE["class"] = cls
            _PSORT_SMOKE["err"] = f"{type(e).__name__}: {e}"
            print(f"[W::psort] Pallas sort self-test failed "
                  f"[class={cls}] ({type(e).__name__}: {e}); falling "
                  f"back to the XLA sort-merge engine"
                  + ("" if cls != "python" else
                     " — THIS IS A FRAMEWORK BUG, not a backend limit"),
                  file=sys.stderr)
            _PSORT_SMOKE["ok"] = False
    return _PSORT_SMOKE["ok"]


_WIDE_SMOKE = {False: {"ok": None, "class": None, "err": None},
               True: {"ok": None, "class": None, "err": None}}


def wide_smoke_ok(xla_sort=False):
    """One-time hardware self-test for the WIDE (k >= 32 raw-u64-key)
    merge kernel — the _psort_smoke_ok pattern applied to the wide
    path: one small end-to-end fold (clamped xs planes -> sort -> wide
    merge -> finalize) checked against a host dict count.  Two
    variants, gated independently: xla_sort=False exercises the bitonic
    psort sort kernels (the YAK_TPU_PSORT=1 wide engine), xla_sort=True
    exercises the r4 default wide pmerge engine (single-operand XLA u64
    sort inside the step jit, _xs_wide_sorted).  Any failure poisons
    that variant's gate (classified like the sort gate) and k >= 32
    tables fall back to the next engine down (pmerge -> multi-operand
    XLA).  YAK_TPU_PSORT_SMOKE=0 skips."""
    import os

    s = _WIDE_SMOKE[xla_sort]
    if s["ok"] is None:
        if os.environ.get("YAK_TPU_PSORT_SMOKE", "1") == "0":
            s["ok"] = True
            return True
        import sys

        import numpy as np

        from yak_tpu.ops import pallas_merge, pallas_sort
        from yak_tpu.ops import sorttable as st_

        try:
            B = 1 << 14
            cap = 1 << 14
            rng = np.random.default_rng(0xD1DE)
            base = rng.integers(0, 1 << 64, 4096, dtype=np.uint64)
            base = np.where(base == np.uint64(0xFFFFFFFFFFFFFFFF),
                            base - np.uint64(1), base)
            h = rng.choice(base, B).astype(np.uint64)
            valid = rng.random(B) < 0.9
            tk, tc, sz = st_.make_table(cap)
            if xla_sort:
                Ehi, Elo = jax.jit(_xs_wide_sorted)(jnp.asarray(h),
                                                    jnp.asarray(valid))
            else:
                xhi, xlo = _xs_planes(jnp.asarray(h),
                                      jnp.asarray(valid), wide=True)
                Ehi, Elo = pallas_sort.sort_planes(xhi, xlo,
                                                   neg_keys=True)
            thi = (tk >> jnp.uint64(32)).astype(jnp.uint32)
            tlo = (tk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            size_s = jnp.zeros(1, jnp.int32)
            out = pallas_merge.merge_reduce_presorted(
                size_s, thi, tlo, tc, Ehi, Elo, Na=cap, Nb=B,
                create=True, wide=True)
            keys, cnt, size, _n, _o = finalize_pmerge(*out, cap=cap,
                                                      wide=True)
            n = int(size)
            got = dict(zip(np.asarray(keys)[:n].tolist(),
                           np.asarray(cnt)[:n].tolist()))
            want = {}
            for x in h[valid].tolist():
                want[x] = min(want.get(x, 0) + 1, 1023)
            if got != want:
                raise _SmokeDataMismatch(
                    "wide merge output mismatch vs host count")
            s["ok"] = True
        except Exception as e:  # noqa: BLE001 — any failure => fallback
            cls = _classify_smoke_failure(e)
            s["class"] = cls
            s["err"] = f"{type(e).__name__}: {e}"
            variant = "xla-sort" if xla_sort else "bitonic-sort"
            print(f"[W::psort] wide merge self-test ({variant}) failed "
                  f"[class={cls}] ({type(e).__name__}: {e}); k>=32 "
                  f"tables fall back to the next engine down"
                  + ("" if cls != "python" else
                     " — THIS IS A FRAMEWORK BUG, not a backend limit"),
                  file=sys.stderr)
            s["ok"] = False
    return s["ok"]


def psort_enabled(packable):
    """Gate for the Pallas bitonic-sort engine — default OFF as of r4
    (YAK_TPU_PSORT=1 enables); YAK_TPU_PSORT_INTERPRET=1 runs the sort
    and merge kernels in interpret mode (CPU tests).  On real TPU the
    first consult runs a one-time kernel self-test (_psort_smoke_ok)
    and the gate degrades to the XLA engine if the kernels misbehave.

    Why default-off (measured r4, v5e): a bitonic compare-exchange
    stage is VPU-BOUND, not HBM-bound — XLA's lax.sort runs its ~276
    all-HBM stages at ~0.28 ms each (2^24 u64 lanes) while our
    VMEM-windowed stages cost 0.26 ms (static rolls) / 0.65 ms
    (scalar-steered dynamic rolls), so keeping stages on-chip buys
    nothing: the full windowed sort measured 227 ms vs lax.sort's
    78 ms, and the psort count fold 210 ms/group vs the XLA-sort
    pmerge fold's 73 ms.  The r3 design premise ("the sort is HBM
    traffic") was wrong at 2 key planes.  The engine stays maintained
    and fully tested (interpret-mode CPU suite + hardware smoke gates)
    as the experimental path — it would win only where XLA sort is
    operand-bound (many payload planes) or on hardware with a wider
    VPU:HBM ratio."""
    import os

    if not packable:
        return False, False
    if os.environ.get("YAK_TPU_PSORT_INTERPRET", "0") == "1":
        return True, True
    if os.environ.get("YAK_TPU_PSORT", "0") != "1":
        return False, False
    from yak_tpu.ops import pallas_compact

    return (pallas_compact.enabled()
            and jax.default_backend() == "tpu"
            and _psort_smoke_ok()), False


@partial(jax.jit, static_argnames=("cap",))
def pmerge_overflow(size11, cap):
    """Tiny fused check: did the last merge exceed the table capacity."""
    return size11[0, 0] > cap


@partial(jax.jit, static_argnames=("cap", "wide"))
def finalize_pmerge(ohi, olo, ov, size11, nnew11, cap, wide=False):
    """One dispatch: merge-reduce outputs -> table state + flags.
    Emitted keys are the packed hash<<1|stream form — unshift (wide
    keys are raw 64-bit hashes, no shift)."""
    keys = ((ohi.reshape(-1)[:cap].astype(jnp.uint64) << jnp.uint64(32))
            | olo.reshape(-1)[:cap].astype(jnp.uint64))
    if not wide:
        keys = keys >> jnp.uint64(1)
    new_size = size11[0, 0]
    return (keys, ov.reshape(-1)[:cap],
            jnp.minimum(new_size, cap), nnew11[0, 0].astype(jnp.int64),
            new_size > cap)


@partial(jax.jit, static_argnames=("cap",))
def finalize_compacted(khi, klo, v, cap):
    """One dispatch: the Pallas compactor's 2-D padded planes -> table
    state (keys u64[cap], cnt i32[cap]).  Truncation to `cap` is safe —
    callers check the merge's overflow flag."""
    keys = ((khi.reshape(-1)[:cap].astype(jnp.uint64) << jnp.uint64(32))
            | klo.reshape(-1)[:cap].astype(jnp.uint64))
    return keys, v.reshape(-1)[:cap]


@jax.jit
def plookup_prep(tkeys, tcnt, size, h, valid):
    """Prep for the merge-JOIN kernel (pallas_merge lookup mode): split
    the sorted u64 table to raw planes, complement-sort the queries with
    their original index riding as payload."""
    cap = tkeys.shape[0]
    shifted = tkeys << jnp.uint64(1)
    thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (h.shape[0],), 0)
    return _pmerge_prep_core(thi, tlo, tcnt, size, cap, h, None, valid,
                             unit_adds=True, lo_has_stream_bit=False,
                             payload=idx, lookup=True)


@partial(jax.jit, static_argnames=("B",))
def plookup_post(ov, pay, B):
    """Join-kernel epilogue: the kernel emits one value per query lane
    in ascending-key order; `pay` holds the original indices in the
    DESCENDING sort order with the pad block at the front, so the
    ascending index stream is flip(pay[-B:]).  One single-key u64 sort
    of idx<<11|val+1 restores original order."""
    vals_asc = ov.reshape(-1)[:B]
    idx_asc = jnp.flip(pay[pay.shape[0] - B:])
    rk = ((idx_asc.astype(jnp.uint64) << jnp.uint64(11))
          | (vals_asc + 1).astype(jnp.uint64))
    (rk,) = jax.lax.sort((rk,), num_keys=1, is_stable=False)
    return (rk & jnp.uint64(0x7FF)).astype(jnp.int32) - 1


@jax.jit
def plookup_presort(tkeys, tcnt, size, h, valid):
    """plookup_prep for the Pallas bitonic sort path: UNSORTED query
    planes + payload plane (original lane index; pads = -1 sort to the
    ascending front with their 0x..00 keys) + raw table planes."""
    cap = tkeys.shape[0]
    shifted = tkeys << jnp.uint64(1)
    thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    xhi, xlo = _xs_planes(h, valid, lookup=True)
    B = h.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    pay = jnp.concatenate(
        [idx, jnp.full(xhi.shape[0] - B, -1, jnp.int32)])
    size_s = jnp.minimum(size, cap).reshape(1).astype(jnp.int32)
    return xhi, xlo, pay, thi, tlo, tcnt, size_s


def _join_psort_dispatch(prep_out, cap, Mw, interpret):
    """Shared sort+kernel phases of the presorted JOIN: bitonic-sort the
    query planes (payload riding along), then the merge-path kernel
    with the in-dispatch diagonal search."""
    from yak_tpu.ops import pallas_merge, pallas_sort

    xhi, xlo, pay0, thi, tlo, tw, size_s = prep_out
    Ehi, Elo, pay = pallas_sort.sort_planes(xhi, xlo, pay0,
                                            neg_keys=True,
                                            interpret=interpret)
    out = pallas_merge.merge_reduce_presorted(
        size_s, thi, tlo, tw, Ehi, Elo, Na=cap, Nb=Mw, lookup=True,
        interpret=interpret)
    return out[2], pay


def lookup_pallas(tkeys, tcnt, size, h, valid, interpret=False):
    """Per-lane table lookup via the Pallas merge-path JOIN: the sorted
    table is streamed ONCE against the sorted queries (no concat
    re-sort of table+batch).  Must be called OUTSIDE jit (the kernel
    dispatch flips the x64 flag).  Returns i32 counts, -1 absent, in
    original query order (yak_ch_get semantics, htab.c:80-100)."""
    from yak_tpu.ops import pallas_merge

    B = h.shape[0]
    cap = tkeys.shape[0]
    use_ps, ps_interp = psort_enabled(True)
    if use_ps or ps_interp:
        prep = plookup_presort(tkeys, tcnt, size, h, valid)
        ov, pay = _join_psort_dispatch(prep, cap, B,
                                       interpret or ps_interp)
        return plookup_post(ov, pay, B)
    *args8, pay = plookup_prep(tkeys, tcnt, size, h, valid)
    out = pallas_merge.merge_reduce(*args8, Na=cap, Nb=B,
                                    interpret=interpret, lookup=True)
    return plookup_post(out[2], pay, B)


QV_MAX_EK = 1 << 17


def _qv_ek_markers(vals, has, M):
    """Sparse 0-count k-mer positions for -E (qv.c:62-64: a window is an
    err-kmer when extracted but t == max(cnt, 0) == 0, i.e. absent OR
    count 0): ascending lane markers + true count (host falls back to a
    full value fetch for the chunk if the budget overflows)."""
    em = has & (vals <= 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    key = jnp.where(em, lane.astype(jnp.uint32),
                    jnp.uint32(0xFFFFFFFF))
    (key,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
    return key[:QV_MAX_EK], jnp.sum(em.astype(jnp.int32))


@lru_cache(maxsize=None)
def get_qv_step(k, ns, planes_L=None, min_frac=0.5, emit_ek=False):
    """Fused qv chunk step: lookup + the ENTIRE per-chunk reduction of
    yak_qv's worker (qv.c:34-88) on device, so only histograms and
    per-sequence scalars cross the wire (the per-position value stream
    never leaves the chip).

    Per chunk (one flat code buffer -> M windows):
      - per-segment tot (valid windows) and non0 (present k-mers) via
        cumsum differences at the ns segment bounds;
      - the min_frac gate per segment (f64, matching the reference's
        double compare, qv.c:83), ANDed with host-computed eligibility
        (min_len), expanded to lanes with one small scatter + cumsum;
      - the global occurrence histogram over lanes of gated COMPLETE
        segments, plus a separate histogram of the (single) chunk-tail
        segment that continues into the next chunk (region-coded sort +
        searchsorted, scatter-free) — the host carries that partial and
        gates it when the sequence completes.

    Returns (hist_gated i64[1024], hist_inc i64[1024], tot i32[ns],
    non0 i32[ns], tot_inc, non0_inc).
    """
    packable = k <= 31
    ext = _extractor(k, planes_L)

    @jax.jit
    def step(codes, meta, cnt, c_tot, c_non0, c_hist,
             tkeys, tcnt, size):
        # meta i32[2*ns+6]: bounds[ns+1], elig[ns], head_end, inc_start,
        # j_inc, head_elig, cont — ONE h2d transfer (small-array
        # transfers each cost a full tunnel roundtrip)
        h, valid = ext((codes[0], codes[1], codes[2]))
        M = h.shape[0] * h.shape[1]
        if packable:
            vals = st.lookup_qpacked(tkeys, tcnt, size, h.reshape(-1),
                                     valid.reshape(-1))
        else:
            vals = st.lookup_impl(tkeys, tcnt, size, h.reshape(-1),
                                  valid.reshape(-1), packable=False)
        r = _qv_reduce(vals, valid.reshape(-1), meta, cnt, c_tot,
                       c_non0, c_hist, ns, M, min_frac)
        if emit_ek:
            r = r + _qv_ek_markers(vals, valid.reshape(-1), M)
        return r

    return step


def _qv_chunk_stats(vals, has, meta, ns, M, min_frac):
    """The fold-state-free half of the qv reduction: per-segment sums and
    the three region histograms of ONE chunk.  Shared by the single-chip
    fused step (get_qv_step) and the mesh qv step, whose D chunks each
    run this data-parallel before the sequential _qv_fold_step chain."""
    bounds = meta[:ns + 1]
    elig = meta[ns + 1:2 * ns + 1] != 0
    head_end = meta[2 * ns + 1]
    inc_start = meta[2 * ns + 2]
    non0m = has & (vals > 0)
    z = jnp.zeros(1, jnp.int32)
    ch = jnp.concatenate([z, jnp.cumsum(has.astype(jnp.int32))])
    cn = jnp.concatenate([z, jnp.cumsum(non0m.astype(jnp.int32))])
    bc = jnp.clip(bounds, 0, M)           # i32[ns + 1]
    tot = ch[bc[1:]] - ch[bc[:-1]]
    non0 = cn[bc[1:]] - cn[bc[:-1]]
    gate = (non0.astype(jnp.float64)
            >= tot.astype(jnp.float64) * min_frac) & elig
    # expand the per-seg gate to lanes: one ns-sized scatter of the
    # gate deltas at segment starts, then a running sum
    gi = gate.astype(jnp.int32)
    gd = gi - jnp.concatenate([z, gi[:-1]])
    d = jnp.zeros(M + 1, jnp.int32).at[bc[:-1]].add(gd)
    gl = jnp.cumsum(d[:M]) > 0
    # region-coded histogram sort: [0,1024) gated-complete lanes,
    # [2048,3072) the tail segment continuing into the next chunk,
    # [3072,4096) the head segment continuing a carried sequence,
    # the rest dead (ungated / no-window lanes)
    t = jnp.clip(vals, 0, 1023)
    lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    key = jnp.where(~has, 8000,
                    jnp.where(lane < head_end, 3072 + t,
                              jnp.where(lane >= inc_start, 2048 + t,
                                        jnp.where(gl, t, 1500))))
    sk = jnp.sort(key)
    probes = jnp.concatenate([
        jnp.arange(1025, dtype=jnp.int32),
        jnp.arange(2048, 4097, dtype=jnp.int32)])
    edges = jnp.searchsorted(sk, probes)
    hg = jnp.diff(edges[:1025]).astype(jnp.int64)
    hi_ = jnp.diff(edges[1025:2050]).astype(jnp.int64)
    hh = jnp.diff(edges[2049:]).astype(jnp.int64)
    return hg, hi_, hh, tot, non0


def _qv_fold_step(state, meta, hg, hi_, hh, tot, non0, ns, min_frac):
    """One chunk's transition of the device-resident qv fold: settle the
    carried sequence against its completed totals (head region),
    accumulate the gated histogram, open the next carry from the tail
    region.  The middle-piece case (head_end == 0 while a carry is live)
    is encoded by the host as head_end = 0, inc_start = 0: hg/hh are
    then empty and everything lands in the tail carry below."""
    cnt, c_tot, c_non0, c_hist = state
    head_end = meta[2 * ns + 1]
    inc_start = meta[2 * ns + 2]
    j_inc = meta[2 * ns + 3]
    head_elig = meta[2 * ns + 4] != 0
    cont = meta[2 * ns + 5] != 0
    mid = (head_end == 0) & (inc_start == 0) & (c_tot >= 0)
    settle = (~mid) & (c_tot >= 0)
    tot_c = c_tot + jnp.where(mid, tot[j_inc], tot[0])
    non0_c = c_non0 + jnp.where(mid, non0[j_inc], non0[0])
    g_c = ~(non0_c.astype(jnp.float64)
            < tot_c.astype(jnp.float64) * min_frac) & head_elig
    cnt = cnt + hg + jnp.where(settle & g_c, c_hist + hh, 0)
    # the explicit host flag, NOT (inc_start < M): a record header
    # landing in the chunk's last k-1 cells yields a zero-window
    # tail piece with inc_start == M whose carry must still open
    # (with zero totals) so the next chunk's head settles against it
    new_active = cont | mid
    n_tot = jnp.where(mid, tot_c, tot[j_inc])
    n_non0 = jnp.where(mid, non0_c, non0[j_inc])
    n_hist = jnp.where(mid, c_hist + hi_, hi_)
    c_tot = jnp.where(new_active, n_tot, -1)
    c_non0 = jnp.where(new_active, n_non0, 0)
    c_hist = jnp.where(new_active, n_hist, 0)
    return cnt, c_tot, c_non0, c_hist


def _qv_reduce(vals, has, meta, cnt, c_tot, c_non0, c_hist, ns, M,
               min_frac):
    """The qv per-chunk reduction + device-resident fold (shared by the
    fused step and the Pallas-join post step); see get_qv_step."""
    hg, hi_, hh, tot, non0 = _qv_chunk_stats(vals, has, meta, ns, M,
                                             min_frac)
    cnt, c_tot, c_non0, c_hist = _qv_fold_step(
        (cnt, c_tot, c_non0, c_hist), meta, hg, hi_, hh, tot, non0,
        ns, min_frac)
    return cnt, c_tot, c_non0, c_hist, tot, non0


@lru_cache(maxsize=None)
def get_qv_join_pre(k, planes_L):
    """Pallas-join qv, phase 1 (one jit): extract + the join prep
    (plookup_prep) in a single program; also returns the flat window
    validity for the post phase."""
    ext = _extractor(k, planes_L)

    @jax.jit
    def pre(codes, tkeys, tcnt, size):
        h, valid = ext((codes[0], codes[1], codes[2]))
        hflat, vflat = h.reshape(-1), valid.reshape(-1)
        cap = tkeys.shape[0]
        shifted = tkeys << jnp.uint64(1)
        thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        idx = jax.lax.broadcasted_iota(jnp.int32, (hflat.shape[0],), 0)
        prep = _pmerge_prep_core(thi, tlo, tcnt, size, cap, hflat, None,
                                 vflat, unit_adds=True,
                                 lo_has_stream_bit=False, payload=idx,
                                 lookup=True)
        return prep + (vflat,)

    return pre


def qv_psort_pad(M):
    """Pow2 pad for the post-side bitonic sorts."""
    return max(1 << 14, 1 << max(M - 1, 1).bit_length())


@lru_cache(maxsize=None)
def get_qv_post_restore_pre(M, Bpad):
    """psort qv post, phase A (jit): JOIN-kernel outputs -> (original
    lane-index u32 key plane, raw value payload plane) for the bitonic
    restore sort (replacing plookup_post's full-lane u64 XLA sort).
    Pads key 0xFFFFFFFF sort to the tail."""

    @jax.jit
    def pre(ov, pay):
        vals_asc = ov.reshape(-1)[:M]
        idx_asc = jnp.flip(pay[pay.shape[0] - M:]).astype(jnp.uint32)
        if Bpad != M:
            idx_asc = jnp.concatenate(
                [idx_asc, jnp.full(Bpad - M, 0xFFFFFFFF, jnp.uint32)])
            vals_asc = jnp.concatenate(
                [vals_asc, jnp.zeros(Bpad - M, vals_asc.dtype)])
        return idx_asc, vals_asc

    return pre


@lru_cache(maxsize=None)
def get_qv_post_psort_mid(ns, M, Bpad, min_frac=0.5):
    """psort qv post, phase B (jit): restored values -> the per-seg
    sums + the region-coded histogram KEY plane (u32, pads 8000) for
    the second bitonic sort (_qv_chunk_stats' semantics with its
    full-lane XLA sort lifted out)."""

    @jax.jit
    def mid(val_sorted, valid, meta):
        # ov lanes already hold the final per-query value (-1 absent):
        # the kernel's lookup branch emits v - 1 (pallas_merge)
        vals = val_sorted[:M]
        has = valid.reshape(-1)
        bounds = meta[:ns + 1]
        elig = meta[ns + 1:2 * ns + 1] != 0
        head_end = meta[2 * ns + 1]
        inc_start = meta[2 * ns + 2]
        non0m = has & (vals > 0)
        z = jnp.zeros(1, jnp.int32)
        ch = jnp.concatenate([z, jnp.cumsum(has.astype(jnp.int32))])
        cn = jnp.concatenate([z, jnp.cumsum(non0m.astype(jnp.int32))])
        bc = jnp.clip(bounds, 0, M)
        tot = ch[bc[1:]] - ch[bc[:-1]]
        non0 = cn[bc[1:]] - cn[bc[:-1]]
        gate = (non0.astype(jnp.float64)
                >= tot.astype(jnp.float64) * min_frac) & elig
        gi = gate.astype(jnp.int32)
        gd = gi - jnp.concatenate([z, gi[:-1]])
        d = jnp.zeros(M + 1, jnp.int32).at[bc[:-1]].add(gd)
        gl = jnp.cumsum(d[:M]) > 0
        t = jnp.clip(vals, 0, 1023)
        lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
        key = jnp.where(~has, 8000,
                        jnp.where(lane < head_end, 3072 + t,
                                  jnp.where(lane >= inc_start, 2048 + t,
                                            jnp.where(gl, t, 1500))))
        key = key.astype(jnp.uint32)
        if Bpad != M:
            key = jnp.concatenate(
                [key, jnp.full(Bpad - M, 8000, jnp.uint32)])
        return key, tot, non0

    return mid


@lru_cache(maxsize=None)
def get_qv_post_psort_fin(ns, M, min_frac=0.5):
    """psort qv post, phase C (jit): sorted region keys -> histogram
    edges + the device-resident carry fold (_qv_fold_step)."""

    @jax.jit
    def fin(sk, meta, tot, non0, cnt, c_tot, c_non0, c_hist):
        probes = jnp.concatenate([
            jnp.arange(1025, dtype=jnp.uint32),
            jnp.arange(2048, 4097, dtype=jnp.uint32)])
        edges = jnp.searchsorted(sk, probes)
        hg = jnp.diff(edges[:1025]).astype(jnp.int64)
        hi_ = jnp.diff(edges[1025:2050]).astype(jnp.int64)
        hh = jnp.diff(edges[2049:]).astype(jnp.int64)
        cnt, c_tot, c_non0, c_hist = _qv_fold_step(
            (cnt, c_tot, c_non0, c_hist), meta, hg, hi_, hh, tot,
            non0, ns, min_frac)
        return cnt, c_tot, c_non0, c_hist, tot, non0

    return fin


def run_qv_join_post_psort(ov, pay, vflat, meta, st, ns, M,
                           min_frac=0.5, interpret=False):
    """Drive the split psort qv post: both of the old post's full-lane
    XLA sorts (order restore, region histogram) run in the bitonic
    kernels instead (VERDICT r2 weak #2: the post was the fattest
    lookup slice).  `st` = (cnt, c_tot, c_non0, c_hist)."""
    from yak_tpu.ops import pallas_sort

    Bpad = qv_psort_pad(M)
    key, valp = get_qv_post_restore_pre(M, Bpad)(ov, pay)
    _, val_sorted = pallas_sort.sort_planes32(key, valp,
                                              interpret=interpret)
    key2, tot, non0 = get_qv_post_psort_mid(ns, M, Bpad, min_frac)(
        val_sorted, vflat, meta)
    (sk,) = pallas_sort.sort_planes32(key2, interpret=interpret)
    return get_qv_post_psort_fin(ns, M, min_frac)(
        sk, meta, tot, non0, *st)


def join_restore_vals(ov, pay, M, interpret=False):
    """Shared psort restore phase for every JOIN post: kernel outputs
    -> lane-ordered per-query values via the bitonic key32 sort (in
    place of plookup_post's full-lane u64 XLA sort).  Returns the
    padded device plane; vals = plane[:M]."""
    from yak_tpu.ops import pallas_sort

    Bpad = qv_psort_pad(M)
    key, valp = get_qv_post_restore_pre(M, Bpad)(ov, pay)
    _, val_sorted = pallas_sort.sort_planes32(key, valp,
                                              interpret=interpret)
    return val_sorted


@lru_cache(maxsize=None)
def get_trioeval_psort_mid(min_n, M, Bpad):
    """trioeval psort post, phase B: restored values -> UNSORTED u32
    marker planes (key = lane or INF, payload = runlen<<2|typ) + count;
    the bitonic key32 sort then compacts emitted markers to the front
    in lane order (the old u64 marker sort's exact wire order)."""

    @jax.jit
    def mid(val_sorted, valid, we1):
        vals = val_sorted[:M]
        is_k = valid.reshape(-1)
        flag = jnp.where(is_k, jnp.maximum(vals, 0), 0)
        c1 = flag & 3
        c2 = (flag >> 2) & 3
        typ = jnp.where(is_k & (c1 == 2) & (c2 == 0), 1,
                        jnp.where(is_k & (c2 == 2) & (c1 == 0), 2, 0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
        prev = jnp.concatenate([jnp.full(1, -1, typ.dtype), typ[:-1]])
        startm = typ != prev
        run_start = jax.lax.cummax(jnp.where(startm, lane, -1))
        runlen = lane - run_start + 1
        nxt = jnp.concatenate([typ[1:], jnp.full(1, -1, typ.dtype)])
        is_end = typ != nxt
        we = we1[0]
        emit = is_end & (typ > 0) & ((runlen >= min_n)
                                     | (run_start == 0) | (lane == we))
        key = jnp.where(emit, lane.astype(jnp.uint32),
                        jnp.uint32(0xFFFFFFFF))
        payload = ((runlen.astype(jnp.uint32) << jnp.uint32(2))
                   | typ.astype(jnp.uint32))
        if Bpad != M:
            key = jnp.concatenate(
                [key, jnp.full(Bpad - M, 0xFFFFFFFF, jnp.uint32)])
            payload = jnp.concatenate(
                [payload, jnp.zeros(Bpad - M, jnp.uint32)])
        return key, payload, jnp.sum(emit.astype(jnp.int32))

    return mid


@lru_cache(maxsize=None)
def get_chkerr_psort_mid(min_cnt, M, Bpad):
    """chkerr psort post, phase B: restored values -> unsorted u32
    marker planes (key = run-end lane or INF, payload = run length)."""

    @jax.jit
    def mid(val_sorted, valid):
        vals = val_sorted[:M]
        has = valid.reshape(-1)
        low = has & (vals < min_cnt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
        last_high = jax.lax.cummax(jnp.where(low, -1, lane))
        runlen = lane - last_high
        nxt = jnp.concatenate([low[1:], jnp.zeros(1, bool)])
        is_end = low & ~nxt
        key = jnp.where(is_end, lane.astype(jnp.uint32),
                        jnp.uint32(0xFFFFFFFF))
        payload = runlen.astype(jnp.uint32)
        if Bpad != M:
            key = jnp.concatenate(
                [key, jnp.full(Bpad - M, 0xFFFFFFFF, jnp.uint32)])
            payload = jnp.concatenate(
                [payload, jnp.zeros(Bpad - M, jnp.uint32)])
        return key, payload, jnp.sum(is_end.astype(jnp.int32))

    return mid


@lru_cache(maxsize=None)
def get_marker_slice(MAX):
    """Tiny jit: sorted marker planes -> the budgeted wire slice."""

    @jax.jit
    def sl(key_s, pay_s):
        return key_s[:MAX], pay_s[:MAX]

    return sl


def run_marker_psort(key, payload, MAX, interpret=False):
    """Sort-compact unsorted u32 marker planes (key32 bitonic) and
    slice to the wire budget."""
    from yak_tpu.ops import pallas_sort

    k_s, p_s = pallas_sort.sort_planes32(key, payload,
                                         interpret=interpret)
    return get_marker_slice(MAX)(k_s, p_s)


@lru_cache(maxsize=None)
def get_marker_slice1(MAX):
    """Tiny jit: sorted key-only marker plane -> the wire slice."""

    @jax.jit
    def sl(key_s):
        return key_s[:MAX]

    return sl


def run_marker_psort1(key, MAX, interpret=False):
    """Key-only variant of run_marker_psort (markers whose key encodes
    the whole row, e.g. triobin's lane<<4|flag)."""
    from yak_tpu.ops import pallas_sort

    (k_s,) = pallas_sort.sort_planes32(key, interpret=interpret)
    return get_marker_slice1(MAX)(k_s)


@lru_cache(maxsize=None)
def get_sexchr_psort_mid(k, ns, M):
    """sexchr psort post: seg sums over the bitonic-restored values —
    the join post minus plookup_post's full-lane u64 XLA sort."""

    @jax.jit
    def mid(val_sorted, valid, bounds):
        return _sexchr_reduce(val_sorted[:M], valid, bounds, M)

    return mid


@lru_cache(maxsize=None)
def get_triobin_psort_mid(k, ns, M, Bpad, emit_diff=False):
    """triobin psort post: per-contig reductions over the
    bitonic-restored values; with emit_diff the -p markers come back as
    an UNSORTED u32 plane (lane<<4|flag, INF fill) + count for the
    bitonic marker compaction (run_marker_psort1)."""

    @jax.jit
    def mid(val_sorted, valid, meta):
        r = _triobin_reduce(val_sorted[:M], valid, meta, k, M,
                            emit_diff=emit_diff, raw_diff=True)
        if not emit_diff:
            return r
        outs, scalars, dkey, dn = r
        if Bpad != M:
            dkey = jnp.concatenate(
                [dkey, jnp.full(Bpad - M, 0xFFFFFFFF, jnp.uint32)])
        return outs, scalars, dkey, dn

    return mid


@lru_cache(maxsize=None)
def get_qv_join_post(k, ns, M, min_frac=0.5, emit_ek=False):
    """Pallas-join qv, phase 3 (one jit): restore query order from the
    kernel's dense value stream, then the shared reduction/fold."""

    @jax.jit
    def post(ov, pay, valid, meta, cnt, c_tot, c_non0, c_hist):
        vals = plookup_post(ov, pay, B=M)
        r = _qv_reduce(vals, valid, meta, cnt, c_tot, c_non0,
                       c_hist, ns, M, min_frac)
        if emit_ek:
            r = r + _qv_ek_markers(vals, valid, M)
        return r

    return post


# payload sentinel for INVALID query lanes in the seg-payload join:
# sorts every invalid lane's post key above all real (seg << 11 | v)
# keys (seg ids stay < 2^21 - 1; ns never exceeds 2^20)
SEG_INVALID = (1 << 21) - 1


def _seg_of_lane(bounds, ns, M):
    """Per-lane segment id from the qv-style bounds row (first window
    lane of each segment, clipped to M): one ns-sized scatter of ones at
    the interior bounds + a running sum — the same scatter-free
    expansion as the fused qv gate (no 2^23-wide gather)."""
    bc = jnp.clip(bounds[:ns + 1], 0, M)
    d = jnp.zeros(M + 1, jnp.int32).at[bc[1:]].add(1)
    return jnp.cumsum(d[:M])


@lru_cache(maxsize=None)
def get_qv_join_pre_seg(k, planes_L, ns):
    """Pallas-join phase 1 with a SEGMENT-ID payload (instead of the
    lane index): the post phase then restores *grouping* rather than
    order with one narrow u32 sort of seg<<11|val+1 — measured ~3x
    cheaper than the u64 idx<<11|val restore + 2^23-lane cumsums
    (the default qv/triobin/sexchr folds only ever consume per-segment
    sums and histograms, never per-lane order; -p/-E/chkerr/trioeval
    need true positions and keep the idx payload)."""
    ext = _extractor(k, planes_L)

    @jax.jit
    def pre(codes, bounds, tkeys, tcnt, size):
        h, valid = ext((codes[0], codes[1], codes[2]))
        hflat, vflat = h.reshape(-1), valid.reshape(-1)
        M = hflat.shape[0]
        cap = tkeys.shape[0]
        shifted = tkeys << jnp.uint64(1)
        thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        seg = _seg_of_lane(bounds, ns, M)
        pay = jnp.where(vflat, seg, SEG_INVALID)
        prep = _pmerge_prep_core(thi, tlo, tcnt, size, cap, hflat, None,
                                 vflat, unit_adds=True,
                                 lo_has_stream_bit=False, payload=pay,
                                 lookup=True)
        return prep

    return pre


def _seg_sorted_vals(ov, pay, B):
    """Shared seg-post epilogue head: align the kernel's ascending-key
    value stream with the seg payload and sort ONE u32 key
    seg<<11 | val+1 (val+1: absent -> 0, count c -> c+1 <= 1024; the
    invalid sentinel seg sorts to the tail).  Returns the sorted key."""
    vals_asc = ov.reshape(-1)[:B]
    seg_asc = jnp.flip(pay[pay.shape[0] - B:])
    k2 = ((seg_asc.astype(jnp.uint32) << jnp.uint32(11))
          | (vals_asc + 1).astype(jnp.uint32))
    (k2,) = jax.lax.sort((k2,), num_keys=1, is_stable=False)
    return k2


def _seg_edges(k2, ns):
    """Per-seg boundaries of the sorted seg<<11|v key: edge[j] = first
    lane of seg j; e2[j] = first lane of seg j with v >= 2 (count>0)."""
    sj = (jnp.arange(ns + 1, dtype=jnp.uint32) << jnp.uint32(11))
    ej = jnp.searchsorted(k2, sj).astype(jnp.int32)
    e2 = jnp.searchsorted(
        k2, sj[:-1] | jnp.uint32(2)).astype(jnp.int32)
    return ej, e2


def _seg_hist(k2, ej, j, n_bins=1024):
    """Occurrence histogram of ONE segment from the sorted key: bin 0
    counts v in {0,1} (absent and count-0, qv.c's max(cnt,0) clamp),
    bin t counts v == t+1."""
    base = (j.astype(jnp.uint32) << jnp.uint32(11))
    probes = base + jnp.arange(2, n_bins + 2, dtype=jnp.uint32)
    edges = jnp.searchsorted(k2, probes).astype(jnp.int64)
    start = ej[j].astype(jnp.int64)
    return jnp.diff(jnp.concatenate([start.reshape(1), edges]))


@lru_cache(maxsize=None)
def get_qv_join_post_seg(k, ns, M, min_frac=0.5):
    """Pallas-join qv phase 3, seg-payload variant: per-seg totals and
    the three region histograms via searchsorted probes over the sorted
    seg<<11|v key + ONE i32 sort for the gated global histogram —
    replaces the u64 order restore + 2^23-lane cumsum reduction
    (same outputs as get_qv_join_post without emit_ek)."""

    @jax.jit
    def post(ov, pay, meta, cnt, c_tot, c_non0, c_hist):
        k2 = _seg_sorted_vals(ov, pay, M)
        ej, e2 = _seg_edges(k2, ns)
        tot = ej[1:] - ej[:-1]
        non0 = ej[1:] - e2
        elig = meta[ns + 1:2 * ns + 1] != 0
        head_end = meta[2 * ns + 1]
        inc_start = meta[2 * ns + 2]
        j_inc = meta[2 * ns + 3]
        gate = (non0.astype(jnp.float64)
                >= tot.astype(jnp.float64) * min_frac) & elig
        # region semantics of the fused step's lane coding: the head
        # region [0, head_end) is exactly seg 0 (head_end = bounds[1]),
        # the tail region [inc_start, M) exactly seg j_inc
        has_head = head_end > 0
        has_inc = inc_start < M
        hh = jnp.where(has_head, _seg_hist(k2, ej, jnp.int32(0)), 0)
        hi_ = jnp.where(has_inc, _seg_hist(k2, ej, j_inc), 0)
        # gated-complete segs exclude the head and tail regions
        ji = jnp.arange(ns, dtype=jnp.int32)
        g_hg = gate & ~(has_head & (ji == 0)) & ~(has_inc & (ji == j_inc))
        # expand to lanes of the SORTED stream: gate deltas at the seg
        # start offsets (the trailing delta closes the last seg so the
        # invalid-sentinel tail stays ungated), running sum, histogram
        # via one narrow i32 sort
        gi = jnp.concatenate([g_hg.astype(jnp.int32),
                              jnp.zeros(1, jnp.int32)])
        gd = gi - jnp.concatenate([jnp.zeros(1, jnp.int32), gi[:-1]])
        d = jnp.zeros(M + 1, jnp.int32).at[ej].add(gd)
        glx = jnp.cumsum(d[:M]) > 0
        v1 = (k2 & jnp.uint32(0x7FF)).astype(jnp.int32)
        k3 = jnp.where(glx, v1, 2048)
        k3 = jnp.sort(k3)
        hedges = jnp.searchsorted(k3, jnp.arange(2, 1026, dtype=jnp.int32))
        hg = jnp.diff(jnp.concatenate(
            [jnp.zeros(1, jnp.int64), hedges.astype(jnp.int64)]))
        cnt, c_tot, c_non0, c_hist = _qv_fold_step(
            (cnt, c_tot, c_non0, c_hist), meta, hg, hi_, hh, tot, non0,
            ns, min_frac)
        return cnt, c_tot, c_non0, c_hist, tot, non0

    return post


def join_enabled(k):
    """Shared gate for the Pallas merge-JOIN lookup engine (table
    streamed once per chunk instead of re-sorted with the batch):
    default ON on TPU, YAK_TPU_JOIN=0 disables,
    YAK_TPU_JOIN_INTERPRET=1 forces interpret mode (CPU tests).
    Returns (use_join, interpret)."""
    import os

    if k > 31:
        return False, False
    if os.environ.get("YAK_TPU_JOIN_INTERPRET", "0") == "1":
        return True, True
    import jax

    from yak_tpu.ops import pallas_compact
    use = (pallas_compact.enabled() and jax.default_backend() == "tpu"
           and os.environ.get("YAK_TPU_JOIN", "1") != "0")
    return use, False


@lru_cache(maxsize=None)
def get_qv_join_presort(k, planes_L):
    """get_qv_join_pre for the Pallas bitonic sort path: extract +
    unsorted query/payload planes + raw table planes (the sort and the
    diagonal search run in the later dispatches)."""
    ext = _extractor(k, planes_L)

    @jax.jit
    def pre(codes, tkeys, tcnt, size):
        h, valid = ext((codes[0], codes[1], codes[2]))
        hflat, vflat = h.reshape(-1), valid.reshape(-1)
        prep = plookup_presort(tkeys, tcnt, size, hflat, vflat)
        return prep + (vflat,)

    return pre


def run_join_lookup(table, k, planes_key, arg, Mw, interpret=False):
    """Drive the split-dispatch join: pre-jit (extract + prep) ->
    [Pallas bitonic query sort ->] Pallas merge-path JOIN kernel ->
    returns (ov, pay, vflat) for a workload-specific post-jit
    (plookup_post + reduce).  The query sort runs in the bitonic
    kernels (ops/pallas_sort) when the psort engine is opted in
    (YAK_TPU_PSORT=1; the r4 default is the XLA query sort, which
    measured faster on v5e — see psort_enabled)."""
    from yak_tpu.ops import pallas_merge

    use_ps, ps_interp = psort_enabled(k <= 31)
    if use_ps or ps_interp:
        pre = get_qv_join_presort(k, planes_key)
        *prep, vflat = pre(arg, table.keys, table.cnt, table.size)
        ov, pay = _join_psort_dispatch(tuple(prep), table.cap, Mw,
                                       interpret or ps_interp)
        return ov, pay, vflat
    pre = get_qv_join_pre(k, planes_key)
    *args8, pay, vflat = pre(arg, table.keys, table.cnt, table.size)
    out = pallas_merge.merge_reduce(*args8, Na=table.cap, Nb=Mw,
                                    lookup=True, interpret=interpret)
    return out[2], pay, vflat


def _sexchr_reduce(vals, has, bounds, M):
    """sc_worker's per-segment sums (sexchr.c:61-71)."""
    flag = jnp.where(has, jnp.maximum(vals, 0), 0)
    bc = jnp.clip(bounds, 0, M)

    def seg_sum(mask):
        cs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(mask.astype(jnp.int32))])
        return cs[bc[1:]] - cs[bc[:-1]]

    return (seg_sum(has), seg_sum(flag > 0),
            seg_sum(flag == 1), seg_sum(flag == 2))


@lru_cache(maxsize=None)
def get_sexchr_step(k, ns, planes_L=None):
    """Fused sexchr chunk step (sc_worker, sexchr.c:61-71): lookup +
    per-segment sums of (#k-mers, #flag>0, #flag==1, #flag==2) — four
    cumsum differences at the segment bounds; only ns-sized vectors
    cross the wire."""
    packable = k <= 31
    ext = _extractor(k, planes_L)

    @jax.jit
    def step(codes, bounds, tkeys, tcnt, size):
        h, valid = ext((codes[0], codes[1], codes[2]))
        M = h.shape[0] * h.shape[1]
        if packable:
            vals = st.lookup_qpacked(tkeys, tcnt, size, h.reshape(-1),
                                     valid.reshape(-1))
        else:
            vals = st.lookup_impl(tkeys, tcnt, size, h.reshape(-1),
                                  valid.reshape(-1), packable=False)
        return _sexchr_reduce(vals, valid.reshape(-1), bounds, M)

    return step


@lru_cache(maxsize=None)
def get_sexchr_join_post(k, ns, M):
    @jax.jit
    def post(ov, pay, valid, bounds):
        vals = plookup_post(ov, pay, B=M)
        return _sexchr_reduce(vals, valid, bounds, M)

    return post


TRIOBIN_MAX_DIFF = 1 << 18


def _triobin_reduce(vals, is_k, meta, k, M, emit_diff=False,
                    raw_diff=False):
    """tb_worker's per-contig reductions (triobin.c:41-101) over the
    per-window value stream; see get_triobin_step.

    emit_diff: additionally extract the -p rows (positions where the
    pat and mat classes differ, triobin.c:89-92) as sparse
    (lane << 4 | flag) markers + count, chkerr-style.  raw_diff skips
    the in-jit XLA sort and returns the UNSORTED u32 marker plane
    instead (the psort post compacts it in the bitonic kernel)."""
    bounds = meta[:-1]
    we = meta[-1]
    flag = jnp.where(is_k, jnp.maximum(vals, 0), 0)
    c1 = flag & 3
    c2 = (flag >> 2) & 3
    typ = jnp.where(is_k & (c1 == 2) & (c2 == 0), 1,
                    jnp.where(is_k & (c2 == 2) & (c1 == 0), 2, 0))

    lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    prev = jnp.concatenate([jnp.full(1, -1, typ.dtype), typ[:-1]])
    startm = typ != prev
    run_start = jax.lax.cummax(jnp.where(startm, lane, -1))
    runlen = lane - run_start + 1
    nxt = jnp.concatenate([typ[1:], jnp.full(1, -1, typ.dtype)])
    is_end = typ != nxt
    interior = (run_start > 0) & (lane < we)
    strk = is_end & (typ > 0) & (runlen >= k - 4) & interior

    bc = jnp.clip(bounds, 0, M)

    def seg_sum(x):
        cs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(x.astype(jnp.int32))])
        return cs[bc[1:]] - cs[bc[:-1]]

    outs = [seg_sum(is_k)]
    for v in (0, 1, 2, 4, 8):
        outs.append(seg_sum(is_k & (flag == v)))
    for t in (1, 2):
        outs.append(seg_sum(jnp.where(strk & (typ == t), runlen, 0)))

    # boundary runs (always excluded above; the host re-adds them,
    # merged across pieces where a sequence spans chunks).  Pure
    # reductions — no argmax / dynamic single-element gathers.
    head_len = jnp.sum((run_start == 0).astype(jnp.int32))
    at_we = (lane == we)
    tail_typ = jnp.sum(jnp.where(at_we, typ, 0))
    tail_len = jnp.sum(jnp.where(at_we, runlen, 0))
    scalars = jnp.stack([typ[0], head_len, tail_typ, tail_len])
    if not emit_diff:
        return jnp.stack(outs), scalars
    dm = is_k & (c1 != c2)
    dn = jnp.sum(dm.astype(jnp.int32))
    # mask to the 4 class bits: a non-trio table's larger values must
    # not bleed into the lane field (the reference reads flag&3 and
    # flag>>2&3 regardless, triobin.c:89-92)
    if raw_diff:
        dkey32 = jnp.where(dm,
                           (lane.astype(jnp.uint32) << jnp.uint32(4))
                           | (flag & 15).astype(jnp.uint32),
                           jnp.uint32(0xFFFFFFFF))
        return jnp.stack(outs), scalars, dkey32, dn
    dkey = jnp.where(dm,
                     (lane.astype(jnp.uint64) << jnp.uint64(4))
                     | (flag & 15).astype(jnp.uint64),
                     jnp.uint64(0xFFFFFFFFFFFFFFFF))
    (dkey,) = jax.lax.sort((dkey,), num_keys=1, is_stable=False)
    return jnp.stack(outs), scalars, dkey[:TRIOBIN_MAX_DIFF], dn


@lru_cache(maxsize=None)
def get_triobin_step(k, ns, planes_L=None, emit_diff=False):
    """Fused triobin chunk step (tb_worker, triobin.c:41-101): lookup +
    hap-mer typing + ALL per-contig reductions on device:

      per segment: #k-mers, the flag-combo counts the classifier and
      report need (c[0], c[1], c[2], c[4], c[8]), and sc[2] = summed
      lengths of type-1/2 streaks >= k-4 — eight cumsum differences.

    Streaks touching the chunk's first window (lane 0) or the last
    window of the final piece (`we`) are EXCLUDED from the device sc
    sums and returned as (head_typ, head_len, tail_typ, tail_len)
    scalars instead: the host merges them across chunk-spanning pieces
    (the halo makes piece windows seamless) and applies the >= k-4
    threshold to the merged lengths.
    """
    packable = k <= 31
    ext = _extractor(k, planes_L)

    @jax.jit
    def step(codes, meta, tkeys, tcnt, size):
        # meta i32[ns+2]: bounds[ns+1] then we — ONE h2d transfer; the
        # result is ONE i32[8*ns+4] buffer — one d2h roundtrip (each
        # small-array transfer costs a full tunnel roundtrip)
        h, valid = ext((codes[0], codes[1], codes[2]))
        M = h.shape[0] * h.shape[1]
        if packable:
            vals = st.lookup_qpacked(tkeys, tcnt, size, h.reshape(-1),
                                     valid.reshape(-1))
        else:
            vals = st.lookup_impl(tkeys, tcnt, size, h.reshape(-1),
                                  valid.reshape(-1), packable=False)
        return _triobin_reduce(vals, valid.reshape(-1), meta, k, M,
                               emit_diff=emit_diff)

    return step


@lru_cache(maxsize=None)
def get_triobin_join_post(k, ns, M, emit_diff=False):
    @jax.jit
    def post(ov, pay, valid, meta):
        vals = plookup_post(ov, pay, B=M)
        return _triobin_reduce(vals, valid, meta, k, M,
                               emit_diff=emit_diff)

    return post


TRIOEVAL_MAX_RUNS = 1 << 17


@lru_cache(maxsize=None)
def get_trioeval_step(k, min_n, planes_L=None):
    """Fused trioeval chunk step (te_worker, trioeval.c:91-117): lookup
    + hap-mer typing + run-length compression on device.  Emits the
    sparse stream of type>0 runs that can matter to the phase-block
    chain — qualifying runs (len >= min_n) plus chunk-boundary runs
    (lane-0 head, `we` tail) of any length — as packed
    (lane << 26 | len << 2 | typ) markers sorted to the front, plus the
    true marker count.  The host replays the per-run chain
    (models/trio._TeSeq) over ~#hap-run events instead of M positions,
    merging boundary runs across chunk-spanning pieces; it falls back
    to the per-position scan for a chunk whose markers overflow the
    budget."""
    packable = k <= 31
    ext = _extractor(k, planes_L)

    @jax.jit
    def step(codes, we1, tkeys, tcnt, size):
        h, valid = ext((codes[0], codes[1], codes[2]))
        M = h.shape[0] * h.shape[1]
        if packable:
            vals = st.lookup_qpacked(tkeys, tcnt, size, h.reshape(-1),
                                     valid.reshape(-1))
        else:
            vals = st.lookup_impl(tkeys, tcnt, size, h.reshape(-1),
                                  valid.reshape(-1), packable=False)
        return _trioeval_reduce(vals, valid.reshape(-1), we1, min_n, M)

    return step


def _te_emit(vals, is_k, we1, min_n, M):
    """te_worker's run typing + marker selection (shared by the
    sort-based and compaction-based extractions): returns
    (emit, lane, runlen, typ)."""
    flag = jnp.where(is_k, jnp.maximum(vals, 0), 0)
    c1 = flag & 3
    c2 = (flag >> 2) & 3
    typ = jnp.where(is_k & (c1 == 2) & (c2 == 0), 1,
                    jnp.where(is_k & (c2 == 2) & (c1 == 0), 2, 0))
    lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    prev = jnp.concatenate([jnp.full(1, -1, typ.dtype), typ[:-1]])
    startm = typ != prev
    run_start = jax.lax.cummax(jnp.where(startm, lane, -1))
    runlen = lane - run_start + 1
    nxt = jnp.concatenate([typ[1:], jnp.full(1, -1, typ.dtype)])
    is_end = typ != nxt
    we = we1[0]
    emit = is_end & (typ > 0) & ((runlen >= min_n)
                                 | (run_start == 0) | (lane == we))
    return emit, lane, runlen, typ


def _trioeval_reduce(vals, is_k, we1, min_n, M):
    """te_worker's run compression (see get_trioeval_step)."""
    emit, lane, runlen, typ = _te_emit(vals, is_k, we1, min_n, M)
    key = jnp.where(emit,
                    (lane.astype(jnp.uint64) << jnp.uint64(26))
                    | (runlen.astype(jnp.uint64) << jnp.uint64(2))
                    | typ.astype(jnp.uint64),
                    jnp.uint64(0xFFFFFFFFFFFFFFFF))
    (key,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
    n = jnp.sum(emit.astype(jnp.int32))
    return key[:TRIOEVAL_MAX_RUNS], n


@lru_cache(maxsize=None)
def get_trioeval_join_post(k, min_n, M):
    @jax.jit
    def post(ov, pay, valid, we1):
        vals = plookup_post(ov, pay, B=M)
        return _trioeval_reduce(vals, valid, we1, min_n, M)

    return post


@lru_cache(maxsize=None)
def get_trioeval_mark_mid(k, min_n, M):
    """Pallas-join trioeval, compaction variant: restore lane order +
    run typing + marker PLANES (lane key u32, len<<2|typ payload) for
    the streaming compactor (ops/pallas_compact) — one HBM pass
    replaces _trioeval_reduce's full-lane u64 marker sort.  Dropped
    lanes carry the compactor's PAD marker (khi bit 31)."""

    @jax.jit
    def mid(ov, pay, valid, we1):
        vals = plookup_post(ov, pay, B=M)
        emit, lane, runlen, typ = _te_emit(vals, valid, we1, min_n, M)
        khi = jnp.where(emit, lane.astype(jnp.uint32),
                        jnp.uint32(0x80000000))
        p = ((runlen.astype(jnp.int32) << 2) | typ.astype(jnp.int32))
        n = jnp.sum(emit.astype(jnp.int32))
        return khi, p, n

    return mid


@lru_cache(maxsize=None)
def get_chkerr_mark_mid(k, min_cnt, M):
    """Pallas-join chkerr, compaction variant of _chkerr_reduce: marker
    planes (lane key u32, runlen payload) for the streaming
    compactor."""

    @jax.jit
    def mid(ov, pay, valid):
        vals = plookup_post(ov, pay, B=M)
        low = valid & (vals < min_cnt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
        last_high = jax.lax.cummax(jnp.where(low, -1, lane))
        runlen = lane - last_high
        nxt = jnp.concatenate([low[1:], jnp.zeros(1, bool)])
        is_end = low & ~nxt
        khi = jnp.where(is_end, lane.astype(jnp.uint32),
                        jnp.uint32(0x80000000))
        n = jnp.sum(is_end.astype(jnp.int32))
        return khi, runlen, n

    return mid


@lru_cache(maxsize=None)
def get_mark_slice_post(maxr):
    """Slice the compactor's padded output planes to the marker budget
    INSIDE a jit (fetching a slice of a big device array would drag the
    whole parent buffer over the tunnel wire)."""

    @jax.jit
    def post(ohi, opay):
        return ohi.reshape(-1)[:maxr], opay.reshape(-1)[:maxr]

    return post


def run_mark_compact(khi, pay, maxr, interpret=False):
    """Streaming marker compaction: (khi u32 lane-or-PAD, pay i32) ->
    (lanes u32[maxr], pay i32[maxr]) device arrays, kept lanes packed
    to the front in lane order.  Must be called OUTSIDE jit
    (pallas_compact flips the x64 flag)."""
    from yak_tpu.ops import pallas_compact

    ohi, _olo, opay = pallas_compact.compact_raw(
        khi, khi, pay, interpret=interpret)
    return get_mark_slice_post(maxr)(ohi, opay)


CHKERR_MAX_RUNS = 1 << 17


@lru_cache(maxsize=None)
def get_chkerr_step(k, min_cnt, planes_L=None):
    """Fused chkerr chunk step (chkerr.c:55-68): lookup + low-count run
    detection on device.  A lane is `low` when its window is valid and
    the count is below min_cnt (absent = -1 counts as low); runs of
    consecutive low lanes end where the next lane is not low.  Run ends
    are extracted sparsely: packed (lane << 24 | len) markers sort to
    the front and only the first CHKERR_MAX_RUNS cross the wire, plus
    the true marker count (host falls back if it overflows).
    """
    packable = k <= 31
    ext = _extractor(k, planes_L)

    @jax.jit
    def step(codes, tkeys, tcnt, size):
        h, valid = ext((codes[0], codes[1], codes[2]))
        M = h.shape[0] * h.shape[1]
        if packable:
            vals = st.lookup_qpacked(tkeys, tcnt, size, h.reshape(-1),
                                     valid.reshape(-1))
        else:
            vals = st.lookup_impl(tkeys, tcnt, size, h.reshape(-1),
                                  valid.reshape(-1), packable=False)
        return _chkerr_reduce(vals, valid.reshape(-1), min_cnt, M)

    return step


def _chkerr_reduce(vals, has, min_cnt, M):
    """Low-count run-end extraction (see get_chkerr_step)."""
    low = has & (vals < min_cnt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    last_high = jax.lax.cummax(jnp.where(low, -1, lane))
    runlen = lane - last_high
    nxt = jnp.concatenate([low[1:], jnp.zeros(1, bool)])
    is_end = low & ~nxt
    key = jnp.where(is_end,
                    (lane.astype(jnp.uint64) << jnp.uint64(24))
                    | runlen.astype(jnp.uint64),
                    jnp.uint64(0xFFFFFFFFFFFFFFFF))
    (key,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
    n = jnp.sum(is_end.astype(jnp.int32))
    return key[:CHKERR_MAX_RUNS], n


@lru_cache(maxsize=None)
def get_chkerr_join_post(k, min_cnt, M):
    @jax.jit
    def post(ov, pay, valid):
        vals = plookup_post(ov, pay, B=M)
        return _chkerr_reduce(vals, valid, min_cnt, M)

    return post


@lru_cache(maxsize=None)
def get_scan_step(k, planes_L=None):
    """Fused lookup step for the scan-side workloads (qv/trio/sexchr/
    chkerr): codes -> per-window int16 value stream in one XLA program.

    value = table count/flags (fits i16: counts <= 1023, flags <= 15),
    -1 where the k-mer is absent (yak_ch_get), -2 (scan.NO_KMER) where
    the window has an N.  Folding the has-window mask into the value
    stream halves the d2h transfer (one i16 plane instead of i32+bool);
    planes_L (k <= 31) additionally takes host-packed (plo, phi, pnn)
    planes instead of u8 codes — 3 bits/base h2d.
    """
    packable = k <= 31
    ext = _extractor(k, planes_L)

    @jax.jit
    def step(codes, tkeys, tcnt, size):
        h, valid = ext(codes)
        G, M = h.shape
        if packable:
            vals = st.lookup_qpacked(tkeys, tcnt, size, h.reshape(-1),
                                     valid.reshape(-1))
        else:
            vals = st.lookup_impl(tkeys, tcnt, size, h.reshape(-1),
                                  valid.reshape(-1), packable=False)
        vals = jnp.where(valid.reshape(-1), vals, -2)
        return vals.reshape(G, M).astype(jnp.int16)

    return step
