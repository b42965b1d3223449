"""TPU-native counting hash table.

The reference stores k-mers in 2^pre independent khashl open-addressing
sets, one owner thread per shard (htab.c).  Serial pointer-chasing probes
don't map to a vector machine, so this design replaces them with a
*batch-functional* open-addressing table:

- State is two flat HBM arrays: ``keys: uint64[cap]`` (the full masked
  hash) and ``cnt: int32[cap]`` (-1 = empty slot; the low
  YAK_COUNTER_BITS hold the saturating count / flag bits, exactly the
  semantics of the low bits of the reference's in-table key,
  htab.c:9-11,66-69).
- A batch of hashes is sorted and run-length deduplicated on device
  (duplicates *must* coalesce before a saturating add — the reference
  gets this for free by serial probing).
- Unique keys then probe in lockstep rounds: gather the probed slots,
  classify (match / empty / collision), resolve empty-slot races with a
  scatter-min *claim* by lane index, scatter the winners, and advance
  the losers.  Expected rounds = O(1/(1-load)); all rounds are full-width
  VPU/HBM operations with static shapes.

Capacity is fixed per table and grown by an amortized host-driven rebuild
at 2x (khashl's in-place kick-out rehash has no vector equivalent and no
behavioral surface — only the *set* of (k-mer, count) pairs matters).

Every table op of the reference is expressed on top of two primitives:
``update`` (modes add/or/set x create/update-only) and ``lookup``:
  insert_list -> update(add, create)        (htab.c:51-78)
  pass-2 increment -> update(add, no-create)(htab.c:71-75)
  get -> lookup                              (htab.c:93-100)
  clear/setcnt -> elementwise on cnt         (htab.c:116-130,214-235)
  hist -> bincount on cnt                    (htab.c:136-169)
  shrink/subtract/isec/merge -> filter + rebuild (htab.c:175-347)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yak_tpu import YAK_COUNTER_BITS, YAK_MAX_COUNT

_FIB64 = jnp.uint64(0x9E3779B97F4A7C15)

# update modes
ADD = 0  # cnt = min(cnt + add, max_count)   [saturating occurrence count]
OR = 1   # cnt |= add                         [flag bits for trio/sexchr loads]
SET = 2  # cnt = add                          [rebuilds, restore]


def make_table(cap_log2, dtype=jnp.uint64):
    """Allocate an empty table with 2^cap_log2 slots."""
    cap = 1 << cap_log2
    return jnp.zeros(cap, dtype), jnp.full(cap, -1, jnp.int32)


def _slot0(h, cap_log2):
    """Initial probe slot: Fibonacci multiplicative hash on the full key."""
    return ((h * _FIB64) >> jnp.uint64(64 - cap_log2)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("backward",))
def dedup(h, valid, backward=False):
    """Sort a hash batch and coalesce duplicates.

    Returns (hs, starts, add):
      hs: uint64[N] hashes sorted with invalid lanes last,
      starts: bool[N] marking the first lane of each unique valid hash,
      add: int32[N] multiplicity of the run (defined at start lanes).
    """
    n = h.shape[0]
    inv = (~valid).astype(jnp.uint8)
    inv_s, hs = jax.lax.sort((inv, h), num_keys=2)
    vs = inv_s == 0
    prev = jnp.concatenate([hs[:1], hs[:-1]])
    first = jnp.concatenate([jnp.ones((1,), bool), jnp.zeros((n - 1,), bool)])
    starts = vs & (first | (hs != prev))
    run_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    mult = jnp.zeros(n, jnp.int32).at[jnp.where(vs, run_id, n)].add(1, mode="drop")
    add = mult[jnp.clip(run_id, 0, n - 1)]
    return hs, starts, add


@partial(jax.jit, static_argnames=("cap_log2", "mode", "create", "max_count"))
def update(keys, cnt, h, add, active, *, cap_log2, mode=ADD, create=True,
           max_count=YAK_MAX_COUNT):
    """Apply a batch of unique (hash, add) updates to the table.

    Args:
      keys, cnt: table state.
      h: uint64[N] unique hashes (no duplicates among active lanes).
      add: int32[N] operand (multiplicity for ADD, flags for OR, value for SET).
      active: bool[N] lanes to apply.
      mode: ADD | OR | SET.
      create: insert missing keys (False = update existing only, as in the
        Bloom pass-2 / recount path, htab.c:71-75).

    Returns (keys, cnt, n_new, n_pend):
      n_new: newly created entries (int64);
      n_pend: lanes that could not be placed within `cap` probe rounds
        (nonzero only if the table overflowed; callers must pre-size the
        table so this stays 0 — see KmerTable._ensure_capacity).
    """
    n = h.shape[0]
    cap = keys.shape[0]
    capmask = jnp.int32(cap - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    base = _slot0(h, cap_log2)

    def apply_op(old):
        if mode == ADD:
            return jnp.minimum(old + add, max_count)
        if mode == OR:
            return old | add
        return add

    def cond(state):
        done, rounds = state[3], state[5]
        return jnp.any(active & ~done) & (rounds < cap)

    def body(state):
        keys, cnt, n_new, done, toff, rounds = state
        live = active & ~done
        slot = (base + toff) & capmask
        ks = keys[slot]
        cs = cnt[slot]
        empty = cs < 0
        match = live & ~empty & (ks == h)
        vacant = live & empty

        if create:
            claim = jnp.full(cap, n, jnp.int32).at[
                jnp.where(vacant, slot, cap)
            ].min(lane, mode="drop")
            winner = vacant & (claim[slot] == lane)
            widx = jnp.where(winner, slot, cap)
            created = jnp.minimum(add, max_count) if mode == ADD else add
            keys = keys.at[widx].set(h, mode="drop")
            cnt = cnt.at[widx].set(created, mode="drop")
            n_new = n_new + jnp.sum(winner, dtype=jnp.int64)
            newly_done = match | winner
        else:
            newly_done = match | vacant  # missing key: silently done

        midx = jnp.where(match, slot, cap)
        cnt = cnt.at[midx].set(apply_op(cs), mode="drop")
        done = done | newly_done
        toff = jnp.where(live & ~newly_done, toff + 1, toff)
        return keys, cnt, n_new, done, toff, rounds + 1

    state = (keys, cnt, jnp.int64(0), ~active, jnp.zeros(n, jnp.int32),
             jnp.int32(0))
    keys, cnt, n_new, done, _, _ = jax.lax.while_loop(cond, body, state)
    n_pend = jnp.sum(active & ~done, dtype=jnp.int64)
    return keys, cnt, n_new, n_pend


@partial(jax.jit, static_argnames=("cap_log2",))
def lookup(keys, cnt, h, valid, *, cap_log2):
    """Probe a batch of hashes; returns int32[N] counts, -1 when absent.

    Mirrors yak_ch_get (htab.c:93-100): the returned value is the full
    low-bit field (count or flags)."""
    n = h.shape[0]
    cap = keys.shape[0]
    capmask = jnp.int32(cap - 1)
    base = _slot0(h, cap_log2)

    def cond(state):
        done, _, _ = state
        return jnp.any(~done)

    def body(state):
        done, res, toff = state
        slot = (base + toff) & capmask
        ks = keys[slot]
        cs = cnt[slot]
        empty = cs < 0
        match = ~done & ~empty & (ks == h)
        res = jnp.where(match, cs, res)
        done = done | match | (~done & empty)
        toff = jnp.where(done, toff, toff + 1)
        return done, res, toff

    done0 = ~valid
    res0 = jnp.full(n, -1, jnp.int32)
    _, res, _ = jax.lax.while_loop(cond, body, (done0, res0, jnp.zeros(n, jnp.int32)))
    return res


@jax.jit
def hist(cnt):
    """1024-bin histogram over occupied slots (yak_ch_hist, htab.c:136-169)."""
    occ = cnt >= 0
    bins = jnp.where(occ, cnt & YAK_MAX_COUNT, 1 << YAK_COUNTER_BITS)
    return jnp.zeros(1 << YAK_COUNTER_BITS, jnp.int64).at[bins].add(1, mode="drop")


@jax.jit
def clear_counts(cnt):
    """Zero all counts, keep membership (yak_ch_clear, htab.c:116-130)."""
    return jnp.where(cnt >= 0, 0, cnt)


@jax.jit
def set_counts(cnt, value):
    """Set every occupied entry's count (yak_ch_setcnt, htab.c:214-235)."""
    return jnp.where(cnt >= 0, value, cnt)


@jax.jit
def size(cnt):
    return jnp.sum((cnt >= 0).astype(jnp.int64))


# ---------------------------------------------------------------------------
# Batched insert of a raw (not yet deduplicated) hash stream.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cap_log2", "create"))
def count_into(keys, cnt, h, valid, *, cap_log2, create=True):
    """Count a raw hash batch into the table (dedup + saturating add).

    The composition used by the count pipeline step 3 (count.c:129-143).
    Returns (keys, cnt, n_new, n_pend).
    """
    hs, starts, add = dedup(h, valid)
    return update(keys, cnt, hs, add, starts, cap_log2=cap_log2,
                  mode=ADD, create=create)


# ---------------------------------------------------------------------------
# Host-side (cold-path) helpers: extraction and rebuild.
# ---------------------------------------------------------------------------

def occupied_np(keys, cnt):
    """Pull (hash, count) pairs of occupied slots to host as NumPy arrays."""
    k_np = np.asarray(keys)
    c_np = np.asarray(cnt)
    occ = c_np >= 0
    return k_np[occ], c_np[occ]


def build_from_pairs(h_np, c_np, cap_log2=None, min_cap_log2=10):
    """Build a fresh device table from host (hash, count) pairs.

    Used by shrink/subtract/isec/merge/restore rebuilds.  Keys must be
    unique.  Returns (keys, cnt, cap_log2).
    """
    n = len(h_np)
    if cap_log2 is None:
        cap_log2 = max(min_cap_log2, int(np.ceil(np.log2(max(n, 1) / 0.65 + 1))))
    keys, cnt = make_table(cap_log2)
    if n:
        keys, cnt = insert_pairs(keys, cnt, h_np, c_np, cap_log2=cap_log2)
    return keys, cnt, cap_log2


def insert_pairs(keys, cnt, h_np, c_np, *, cap_log2, mode=SET,
                 chunk=1 << 22):
    """Stream unique host pairs into a device table in fixed-size chunks."""
    n = len(h_np)
    for off in range(0, n, chunk):
        h = jnp.asarray(h_np[off : off + chunk], jnp.uint64)
        a = jnp.asarray(c_np[off : off + chunk], jnp.int32)
        m = h.shape[0]
        if m < chunk and n > chunk:
            h = jnp.pad(h, (0, chunk - m))
            a = jnp.pad(a, (0, chunk - m))
        active = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) < m
        keys, cnt, _, n_pend = update(keys, cnt, h, a, active,
                                      cap_log2=cap_log2, mode=mode, create=True)
        if int(n_pend):
            raise RuntimeError("table overflow during insert_pairs "
                               "(capacity not pre-sized)")
    return keys, cnt


def grow_if_needed(keys, cnt, cap_log2, load_limit=0.7):
    """Host-driven amortized growth: rebuild at 2x when past load_limit."""
    sz = int(size(cnt))
    cap = 1 << cap_log2
    if sz <= load_limit * cap:
        return keys, cnt, cap_log2
    new_log2 = cap_log2
    while sz > load_limit * (1 << new_log2):
        new_log2 += 1
    h_np, c_np = occupied_np(keys, cnt)
    nk, nc = make_table(new_log2)
    nk, nc = insert_pairs(nk, nc, h_np, c_np, cap_log2=new_log2)
    return nk, nc, new_log2
