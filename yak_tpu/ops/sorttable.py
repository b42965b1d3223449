"""TPU-native counting table: sorted-array state, sort-merge updates.

Measured on TPU v5e: XLA sort moves billions of u64/s while scatter
manages ~7M/s and gather ~46M/s.  Any open-addressing scheme pays one
scatter + several gathers per key; a sorted-array table pays only sorts
and streaming scans — zero random HBM access.  So the table is a
*sorted* dense array of (hash, count) and every batch op is a sort-merge
join.  Semantics are exactly the reference's (htab.c): saturating 10-bit
counts, flag-OR load modes, create vs update-only; only the layout
changed (sorted array vs khashl slots), which has no behavioral surface
beyond dump key order (documented in io/yakfmt.py).

Compile-time design (TPU specific, measured on this toolchain): XLA sort
compile cost grows steeply with the number of sort *operands*, and
`associative_scan` builds O(log n)-level graphs that take minutes to
compile at 2^20+ lanes, while `cumsum`/`cummax` compile in seconds and
run at memory speed.  Therefore every hot op here:

  * sorts with ONE key and minimal payload, packing the pad/tag flags
    around the hash — a k<=31 canonical hash fits in 2k <= 62 bits, so
    the packed sort key is `pad<<63 | hash<<1 | tag`: pad (invalid /
    beyond-size) lanes sort last, equal hashes stay adjacent, and the
    low tag bit puts the table entry first within its run;
  * replaces segmented scans with cumsum-difference reductions: keys are
    contiguous runs after sorting, per-run totals are differences of an
    inclusive prefix sum read at run ends, and "prefix before my run"
    propagates with a single cummax over the (monotone, non-negative)
    prefix masked to run-end lanes.

k in [32, 63] hashes (yak_hash_long) use all 64 bits, so those tables
fall back to multi-operand sorts (`packable=False`) — the path the
reference itself documents as inexact and slow (main.c:50-52).

Growth needs no rehash: pad-extend the arrays (host-side concat).
"""

from functools import partial

import jax
import jax.numpy as jnp

from yak_tpu import YAK_COUNTER_BITS, YAK_MAX_COUNT

ADD = 0  # cnt = min(table + sum(batch), max_count)
OR = 1   # cnt = table | batch (batch keys must be unique within a call)

_PAD = jnp.uint64(1 << 63)   # packed bit 63: invalid/beyond-size lane
_TAG = jnp.uint64(1)         # packed bit 0: batch/query (table = 0)
_ONE = jnp.uint64(1)
# field split of the combined i64 prefix: bits [0,40) value sum,
# bits [40,63) table-entry count (sums stay < 2^40 / 2^23 by size bounds)
_FSHIFT = jnp.int64(40)
_FMASK = jnp.int64((1 << 40) - 1)


def make_table(cap):
    return (jnp.zeros(cap, jnp.uint64), jnp.full(cap, -1, jnp.int32),
            jnp.int32(0))


def _shift1(x, fill):
    """x shifted right by one lane, `fill` in lane 0."""
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def _run_marks(key, real):
    """(start, end) lane masks of the key runs inside the real prefix."""
    n = key.shape[0]
    first = jnp.concatenate([jnp.ones(1, bool), jnp.zeros(n - 1, bool)])
    newkey = first | (key != _shift1(key, 0))
    start = real & newkey
    nxt_new = jnp.concatenate([newkey[1:], jnp.ones(1, bool)])
    nxt_real = jnp.concatenate([real[1:], jnp.zeros(1, bool)])
    end = real & (nxt_new | ~nxt_real)
    return start, end, newkey


def _run_totals(W, end):
    """Per-run totals of non-negative i64 W at run-end lanes.

    P = cumsum(W) is monotone non-negative; the prefix just before each
    run is the P value at the previous run end, propagated by cummax
    over P masked to end lanes (0-sentinel is exact because P >= 0).
    """
    P = jnp.cumsum(W)
    Q = jax.lax.cummax(jnp.where(end, P, jnp.int64(0)))
    return P - _shift1(Q, jnp.int64(0))


def merge_batch_impl(tkeys, tcnt, size, h, add, valid, *, mode=ADD,
                     create=True, max_count=YAK_MAX_COUNT, packable=True,
                     compact=True):
    """Merge a (possibly duplicate-bearing) batch into the table.
    (Pure body — call inside an enclosing jit, e.g. ops/countstep.py.)

    Returns (tkeys, tcnt, size, n_new, overflow): n_new = newly created
    distinct keys (int64); overflow True if the merged size exceeded cap
    (results then truncated — caller must grow and retry).

    OR mode requires batch keys unique within the call (true for the
    only caller, `.yak` restore: dump files hold unique hashes).

    packable=False (k >= 32 full-width hashes): pad/tag become extra
    sort operands instead of spare key bits.

    compact=False (packable only): skip the in-XLA compaction sort and
    return (khi u32[N], klo u32[N], outV i32[N], new_size, n_new,
    overflow) — the full-width merged stream with dropped lanes marked
    by khi bit 31, for the Pallas streaming compactor
    (ops/pallas_compact.py) to close up outside this jit.
    """
    cap = tkeys.shape[0]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    V = jnp.concatenate([tcnt, add.astype(jnp.int32)])
    if packable:
        pt = jnp.where(lane_t < size, tkeys << _ONE, _PAD)
        pb = (h << _ONE) | _TAG | jnp.where(valid, jnp.uint64(0), _PAD)
        K = jnp.concatenate([pt, pb])
        K, V = jax.lax.sort((K, V), num_keys=1, is_stable=False)
        real = K < _PAD
        key = (K & ~_PAD) >> _ONE
        is_table = real & ((K & _TAG) == 0)
    else:
        B = h.shape[0]
        pad = jnp.concatenate([(lane_t >= size), ~valid]).astype(jnp.uint8)
        tag = jnp.concatenate(
            [jnp.zeros(cap, jnp.uint8), jnp.ones(B, jnp.uint8)])
        key = jnp.concatenate([tkeys, h])
        pad, key, tag, V = jax.lax.sort((pad, key, tag, V), num_keys=3, is_stable=False)
        real = pad == 0
        is_table = real & (tag == 0)
    start, end, newkey = _run_marks(key, real)

    Vm = jnp.where(real, V, 0).astype(jnp.int64)
    W = Vm | (is_table.astype(jnp.int64) << _FSHIFT)
    tot = _run_totals(W, end)
    has_table = (tot >> _FSHIFT) > 0
    if mode == ADD:
        outV = jnp.minimum(tot & _FMASK, max_count).astype(jnp.int32)
    else:  # OR: runs have <= 1 table and <= 1 batch lane
        outV = jnp.where(newkey, V, _shift1(V, 0) | V)

    created = end & ~has_table
    if create:
        keep = end
        n_new = jnp.sum(created, dtype=jnp.int64)
    else:
        keep = end & has_table
        n_new = jnp.int64(0)

    new_size = jnp.sum(keep, dtype=jnp.int32)
    overflow = new_size > cap

    if not compact:
        assert packable
        Kc = jnp.where(keep, key, key | _PAD)
        khi = (Kc >> jnp.uint64(32)).astype(jnp.uint32)
        klo = (Kc & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        return khi, klo, outV, jnp.minimum(new_size, cap), n_new, overflow

    # compaction: kept lanes first, ascending key order preserved
    if packable:
        Kc = jnp.where(keep, key, key | _PAD)
        Kc, Vc = jax.lax.sort((Kc, outV), num_keys=1, is_stable=False)
        Kc = Kc[:cap] & ~_PAD
        Vc = Vc[:cap]
    else:
        drop = (~keep).astype(jnp.uint8)
        _, Kc, Vc = jax.lax.sort((drop, key, outV), num_keys=2, is_stable=False)
        Kc, Vc = Kc[:cap], Vc[:cap]
    return Kc, Vc, jnp.minimum(new_size, cap), n_new, overflow


merge_batch = partial(jax.jit,
                      static_argnames=("mode", "create", "max_count",
                                       "packable", "compact"),
                      donate_argnums=(0, 1))(merge_batch_impl)


def lookup_qpacked(tkeys, tcnt, size, h, valid):
    """lookup_impl, packable-only, with HALF the sort payload traffic:
    the join sort carries ONE i32 payload that is the count for table
    lanes and the original lane index for query lanes, and the restore
    is a SINGLE-KEY u64 sort of (idx << 11 | result+1) — counts/flags
    always fit 11 bits (<= YAK_MAX_COUNT).  2-op + 1-op sorts instead
    of lookup_impl's 3-op + 2-op."""
    cap = tkeys.shape[0]
    B = h.shape[0]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    pt = jnp.where(lane_t < size, tkeys << _ONE, _PAD)
    pq = (h << _ONE) | _TAG | jnp.where(valid, jnp.uint64(0), _PAD)
    P = jnp.concatenate([
        tcnt, jax.lax.broadcasted_iota(jnp.int32, (B,), 0)])
    K, P = jax.lax.sort((jnp.concatenate([pt, pq]), P), num_keys=1,
                        is_stable=False)
    real = K < _PAD
    key = (K & ~_PAD) >> _ONE
    is_table = real & ((K & _TAG) == 0)
    start, _end, _ = _run_marks(key, real)
    run_id = jnp.cumsum(start.astype(jnp.int32)).astype(jnp.int64)
    G = jnp.where(is_table, (run_id << 11) | (P.astype(jnp.int64) + 1),
                  jnp.int64(0))
    Gm = jax.lax.cummax(G)
    # query-ness by the tag bit alone: INVALID query lanes (PAD set)
    # must still restore to their original index with res = -1
    is_q = (K & _TAG) != 0
    hit = real & is_q & ((Gm >> 11) == run_id)
    res = jnp.where(hit, (Gm & 0x7FF).astype(jnp.int32) - 1, -1)
    # single-key restore: query lanes ascend by original index with the
    # result riding in the low 11 bits; table lanes sort to the tail
    rk = jnp.where(is_q,
                   (P.astype(jnp.uint64) << jnp.uint64(11))
                   | (res + 1).astype(jnp.uint64),
                   jnp.uint64(0xFFFFFFFFFFFFFFFF))
    (rk,) = jax.lax.sort((rk,), num_keys=1, is_stable=False)
    return (rk[:B] & jnp.uint64(0x7FF)).astype(jnp.int32) - 1


def lookup_impl(tkeys, tcnt, size, h, valid, *, packable=True):
    """int32 count per query lane; -1 when absent/invalid (yak_ch_get).
    (Pure body — call inside an enclosing jit, e.g. ops/countstep.py.)"""
    cap = tkeys.shape[0]
    B = h.shape[0]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    V = jnp.concatenate([tcnt, jnp.full(B, -1, jnp.int32)])
    idx = jnp.concatenate([
        jnp.full(cap, B, jnp.int32),
        jax.lax.broadcasted_iota(jnp.int32, (B,), 0)])
    if packable:
        pt = jnp.where(lane_t < size, tkeys << _ONE, _PAD)
        pq = (h << _ONE) | _TAG | jnp.where(valid, jnp.uint64(0), _PAD)
        K = jnp.concatenate([pt, pq])
        K, V, idx = jax.lax.sort((K, V, idx), num_keys=1, is_stable=False)
        real = K < _PAD
        key = (K & ~_PAD) >> _ONE
        is_table = real & ((K & _TAG) == 0)
    else:
        pad = jnp.concatenate([(lane_t >= size), ~valid]).astype(jnp.uint8)
        tag = jnp.concatenate(
            [jnp.zeros(cap, jnp.uint8), jnp.ones(B, jnp.uint8)])
        key = jnp.concatenate([tkeys, h])
        pad, key, tag, V, idx = jax.lax.sort((pad, key, tag, V, idx),
                                             num_keys=3, is_stable=False)
        real = pad == 0
        is_table = real & (tag == 0)
    start, _end, _ = _run_marks(key, real)

    # propagate the run's table count (the run's FIRST lane, tag order) to
    # every query lane of the same run: cummax over (run_id << 11 | V+1)
    # records the latest table record; a lane hits iff the run ids match.
    run_id = jnp.cumsum(start.astype(jnp.int32)).astype(jnp.int64)
    G = jnp.where(is_table, (run_id << 11) | (V.astype(jnp.int64) + 1),
                  jnp.int64(0))
    Gm = jax.lax.cummax(G)
    hit = real & ((Gm >> 11) == run_id)
    res = jnp.where(hit, (Gm & 0x7FF).astype(jnp.int32) - 1, -1)
    # restore original query order (table lanes carry idx=B, sliced off)
    _, res_q = jax.lax.sort((idx, res), num_keys=1, is_stable=False)
    return res_q[:B]


lookup = partial(jax.jit, static_argnames=("packable",))(lookup_impl)


@jax.jit
def hist(tcnt, size):
    """1024-bin histogram over live entries, scatter-free."""
    lane = jax.lax.broadcasted_iota(jnp.int32, tcnt.shape, 0)
    c = jnp.where(lane < size, tcnt & YAK_MAX_COUNT, 1 << YAK_COUNTER_BITS)
    sc = jnp.sort(c)
    edges = jnp.searchsorted(sc, jnp.arange((1 << YAK_COUNTER_BITS) + 1))
    return jnp.diff(edges).astype(jnp.int64)


@jax.jit
def map_counts(tcnt, size, fn_id, value):
    """Elementwise count transforms on live entries.
    fn_id 0: clear to 0 (yak_ch_clear); 1: set to value (yak_ch_setcnt)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, tcnt.shape, 0)
    live = lane < size
    new = jnp.where(fn_id == 0, 0, value)
    return jnp.where(live, new, tcnt)


@partial(jax.jit, static_argnames=("packable",))
def compact_where(tkeys, tcnt, size, keep, *, packable=True):
    """Keep live entries where `keep`; returns (tkeys, tcnt, new_size).
    The ascending key order is preserved (used by shrink/subtract/isec)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, tkeys.shape, 0)
    k = keep & (lane < size)
    if packable:
        Kc = jnp.where(k, tkeys, tkeys | _PAD)
        Kc, Vc = jax.lax.sort((Kc, tcnt), num_keys=1, is_stable=False)
        Kc = Kc & ~_PAD
    else:
        drop = (~k).astype(jnp.uint8)
        _, Kc, Vc = jax.lax.sort((drop, tkeys, tcnt), num_keys=2, is_stable=False)
    return Kc, Vc, jnp.sum(k, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("packable",))
def dedup(h, valid, *, packable=True, rank=None):
    """Sort a hash batch and coalesce duplicates (for the Bloom gate,
    which needs per-unique-key multiplicities *before* the table merge).

    Returns (hs, starts, mult): hashes sorted with invalid lanes last,
    run-start mask, and the run's multiplicity (defined at start lanes).
    Run length = distance to the next run start (reverse cummin).

    rank (optional i32): serial-order tags (the reference's per-chunk
    buffer order, htab.c:57-70).  When given, it rides the sort as a
    secondary key, so each run's START lane carries the run minimum —
    the key's FIRST-occurrence rank, which the serial-exact Bloom gate
    needs (ops/bloom.bloom_insert) — and a fourth output returns it.
    """
    n = h.shape[0]
    if packable:
        Kb = h | jnp.where(valid, jnp.uint64(0), _PAD)
        if rank is None:
            (hs,) = jax.lax.sort((Kb,), num_keys=1, is_stable=False)
            rk = None
        else:
            hs, rk = jax.lax.sort((Kb, rank), num_keys=2,
                                  is_stable=False)
        vs = hs < _PAD
        hs = hs & ~_PAD
    else:
        inv = (~valid).astype(jnp.uint8)
        if rank is None:
            inv_s, hs = jax.lax.sort((inv, h), num_keys=2,
                                     is_stable=False)
            rk = None
        else:
            inv_s, hs, rk = jax.lax.sort((inv, h, rank), num_keys=3,
                                         is_stable=False)
        vs = inv_s == 0
    starts, _, _ = _run_marks(hs, vs)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    spos = jnp.where(starts, lane, n)
    nxt = jnp.concatenate(
        [jax.lax.cummin(spos, reverse=True)[1:], jnp.full(1, n, jnp.int32)])
    total_valid = jnp.sum(vs, dtype=jnp.int32)
    mult = jnp.minimum(nxt, total_valid) - lane
    if rank is None:
        return hs, starts, mult
    return hs, starts, mult, rk


def grow(tkeys, tcnt, size, new_cap):
    """Pad-extend to a bigger capacity (no rehash needed)."""
    cap = tkeys.shape[0]
    assert new_cap >= cap
    return (jnp.concatenate([tkeys, jnp.zeros(new_cap - cap, jnp.uint64)]),
            jnp.concatenate([tcnt, jnp.full(new_cap - cap, -1, jnp.int32)]),
            size)
