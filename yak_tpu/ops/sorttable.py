"""TPU-native counting table, sort-merge edition.

Measured on TPU v5e: XLA sort moves ~550M u64/s while scatter manages
~7M/s and gather ~46M/s.  Any open-addressing scheme pays one scatter +
several gathers per key; a sorted-array table pays only sorts and scans.
So the table is a *sorted* dense array of (hash, count) and every batch
operation is a sort-merge join — zero random HBM access:

  state     tkeys: uint64[cap] (ascending in [0, size)), tcnt: int32[cap],
            size: int32 scalar (device)
  insert    concat(table, batch) -> sort by (pad, key, tag) -> segmented
            reduce per key run (sum / or / last, by mode) -> keep run
            ends -> compaction sort -> new table.  Within-batch
            duplicates coalesce in the same reduction, so the separate
            dedup pass of the probing design disappears.
  lookup    sort-join: queries tagged after table entries with equal
            keys; a segmented copy-first scan propagates the table count
            to every query lane; a final sort by original index restores
            order.
  hist      sort the 10-bit count field + searchsorted boundary diff.

Semantics are exactly the reference's (htab.c): saturating 10-bit
counts, flag-OR load modes, create vs update-only; only the *layout*
changed (sorted array vs khashl slots), which has no behavioral surface
beyond dump key order (documented in io/yakfmt.py — and sorted order is
what we already write).

Growth needs no rehash: pad-extend the arrays (host-side concat).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yak_tpu import YAK_COUNTER_BITS, YAK_MAX_COUNT

ADD = 0  # cnt = min(table + sum(batch), max_count)
OR = 1   # cnt = table | OR(batch)
SET = 2  # cnt = last batch value (batch keys must be unique)


def make_table(cap):
    return (jnp.zeros(cap, jnp.uint64), jnp.full(cap, -1, jnp.int32),
            jnp.int32(0))


def _seg_scan(vals, starts, op):
    """Segmented inclusive scan: segments begin where starts is True."""
    def combine(a, b):
        af, av = a
        bf, bv = b
        if op == "sum":
            v = jnp.where(bf, bv, av + bv)
        elif op == "or":
            v = jnp.where(bf, bv, av | bv)
        else:  # "first": propagate the first value of the segment
            v = jnp.where(bf, bv, av)
        return af | bf, v
    _, out = jax.lax.associative_scan(combine, (starts, vals))
    return out


@partial(jax.jit, static_argnames=("mode", "create", "max_count"),
         donate_argnums=(0, 1))
def merge_batch(tkeys, tcnt, size, h, add, valid, *, mode=ADD, create=True,
                max_count=YAK_MAX_COUNT):
    """Merge a (possibly duplicate-bearing) batch into the table.

    Returns (tkeys, tcnt, size, n_new, overflow): n_new = newly created
    distinct keys (int64); overflow True if the merged size exceeded cap
    (results then truncated — caller must grow and retry).
    """
    cap = tkeys.shape[0]
    B = h.shape[0]
    N = cap + B
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    pad = jnp.concatenate([(lane_t >= size), ~valid]).astype(jnp.uint8)
    K = jnp.concatenate([tkeys, h])
    tag = jnp.concatenate([jnp.zeros(cap, jnp.uint8), jnp.ones(B, jnp.uint8)])
    V = jnp.concatenate([tcnt, add.astype(jnp.int32)])
    pad, K, tag, V = jax.lax.sort((pad, K, tag, V), num_keys=3)

    real = pad == 0
    prev_K = jnp.concatenate([K[:1], K[:-1]])
    first = jnp.concatenate([jnp.ones(1, bool), jnp.zeros(N - 1, bool)])
    newkey = first | (K != prev_K)
    start = real & newkey
    # run end: last real lane of a key run (pads sort after all real lanes)
    nxt_new = jnp.concatenate([newkey[1:], jnp.ones(1, bool)])
    nxt_real = jnp.concatenate([real[1:], jnp.zeros(1, bool)])
    end = real & (nxt_new | ~nxt_real)

    is_table = (tag == 0) & real
    has_table = _seg_scan(is_table.astype(jnp.int32), start, "or")
    if mode == ADD:
        total = _seg_scan(V, start, "sum")
        outV = jnp.minimum(total, max_count)
    elif mode == OR:
        outV = _seg_scan(V, start, "or")  # table count | batch flags
    else:  # SET: run end lane is the batch lane (tag sorts after table)
        outV = V

    created = end & (has_table == 0)
    if create:
        keep = end
        n_new = jnp.sum(created, dtype=jnp.int64)
    else:
        keep = end & (has_table == 1)
        n_new = jnp.int64(0)

    new_size = jnp.sum(keep, dtype=jnp.int32)
    overflow = new_size > cap

    # compaction: kept lanes first, ascending key order preserved
    drop = (~keep).astype(jnp.uint8)
    _, K2, V2 = jax.lax.sort((drop, K, outV), num_keys=2)
    return K2[:cap], V2[:cap], jnp.minimum(new_size, cap), n_new, overflow


@jax.jit
def lookup(tkeys, tcnt, size, h, valid):
    """int32 count per query lane; -1 when absent/invalid (yak_ch_get)."""
    cap = tkeys.shape[0]
    B = h.shape[0]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    pad = jnp.concatenate([(lane_t >= size), ~valid]).astype(jnp.uint8)
    K = jnp.concatenate([tkeys, h])
    tag = jnp.concatenate([jnp.zeros(cap, jnp.uint8), jnp.ones(B, jnp.uint8)])
    V = jnp.concatenate([tcnt, jnp.full(B, -1, jnp.int32)])
    idx = jnp.concatenate([
        jnp.full(cap, B, jnp.int32),
        jax.lax.broadcasted_iota(jnp.int32, (B,), 0)])
    pad, K, tag, V, idx = jax.lax.sort((pad, K, tag, V, idx), num_keys=3)

    N = cap + B
    real = pad == 0
    prev_K = jnp.concatenate([K[:1], K[:-1]])
    first = jnp.concatenate([jnp.ones(1, bool), jnp.zeros(N - 1, bool)])
    start = real & (first | (K != prev_K))
    res = _seg_scan(V, start | ~real, "first")
    # restore original query order; invalid lanes got pad=1 -> res
    # position: sort by idx (queries 0..B-1 first, table lanes idx=B)
    res = jnp.where(real, res, -1)
    _, res_q = jax.lax.sort((idx, res), num_keys=1)
    return res_q[:B]


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


@jax.jit
def compact_where(tkeys, tcnt, size, keep):
    """Keep live entries where `keep`; returns (tkeys, tcnt, new_size).
    The sorted order is preserved (used by shrink/subtract/isec)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, tkeys.shape, 0)
    live = lane < size
    k = keep & live
    drop = (~k).astype(jnp.uint8)
    _, K2, V2 = jax.lax.sort((drop, tkeys, tcnt), num_keys=2)
    return K2, V2, jnp.sum(k, dtype=jnp.int32)


@jax.jit
def dedup(h, valid):
    """Sort a hash batch and coalesce duplicates (for the Bloom gate,
    which needs per-unique-key multiplicities *before* the table merge).

    Returns (hs, starts, mult): hashes sorted with invalid lanes last,
    run-start mask, and the run's multiplicity (defined at start lanes).
    Scatter/gather-free: run length = distance to the next run start,
    via a reverse min-scan.
    """
    n = h.shape[0]
    inv = (~valid).astype(jnp.uint8)
    inv_s, hs = jax.lax.sort((inv, h), num_keys=2)
    vs = inv_s == 0
    prev = jnp.concatenate([hs[:1], hs[:-1]])
    first = jnp.concatenate([jnp.ones(1, bool), jnp.zeros(n - 1, bool)])
    starts = vs & (first | (hs != prev))
    lane = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    spos = jnp.where(starts, lane, n)
    # next start strictly after lane i: reverse inclusive min-scan, shifted
    rmin = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(spos)))
    nxt = jnp.concatenate([rmin[1:], jnp.full(1, n, jnp.int32)])
    total_valid = jnp.sum(vs, dtype=jnp.int32)
    mult = jnp.minimum(nxt, total_valid) - lane
    return hs, starts, mult


def grow(tkeys, tcnt, size, new_cap):
    """Pad-extend to a bigger capacity (no rehash needed)."""
    cap = tkeys.shape[0]
    assert new_cap >= cap
    return (jnp.concatenate([tkeys, jnp.zeros(new_cap - cap, jnp.uint64)]),
            jnp.concatenate([tcnt, jnp.full(new_cap - cap, -1, jnp.int32)]),
            size)
