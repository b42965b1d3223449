"""KmerTable: the user-facing counting-table object.

Wraps the device-resident functional table (ops/hashtable.py) plus the
optional Bloom prefilter (ops/bloom.py) with host-driven lifecycle:
amortized growth, `.yak` dump/restore (io/yakfmt.py) with the five load
modes, and the table-algebra operations of the reference
(shrink/setcnt/clear/merge/subtract/isec/getseq — htab.c:102-367).

Single-device implementation; the multi-chip path (parallel/mesh.py)
shards the same state over a jax Mesh by low hash bits.
"""

import sys

import jax.numpy as jnp
import numpy as np

from yak_tpu import (YAK_MAX_COUNT, YAK_LOAD_ALL)
from yak_tpu.ops import hashtable as ht
from yak_tpu.ops.bloom import make_bloom, bloom_insert
from yak_tpu.ops.hash import hash64_inv
from yak_tpu.io import yakfmt


def _log(msg):
    print(f"[M::yak_tpu] {msg}", file=sys.stderr)


class KmerTable:
    def __init__(self, k, pre=10, cap_log2=16, bf_n_hash=4, bf_shift=0):
        if pre < 10:
            raise ValueError("pre must be at least YAK_COUNTER_BITS (10)")
        self.k = k
        self.pre = pre
        self.cap_log2 = cap_log2
        self.keys, self.cnt = ht.make_table(cap_log2)
        self.tot = 0          # distinct entries (h->tot parity)
        self.bf = None
        self.bf_shift = bf_shift
        self.bf_n_hash = bf_n_hash
        if bf_shift > pre:
            # per-shard filter must hold at least one 512-bit block and at
            # most 2^64 bits, else yak_bf_init returns NULL and counting
            # runs ungated (bbf.c:9, htab.c:23-27)
            per_shard = bf_shift - pre
            if 9 <= per_shard <= 64 - 9:
                self.bf = make_bloom(bf_shift)

    # -- hot path ---------------------------------------------------------

    def insert_hashes(self, h, valid, create_new=True):
        """Count a raw (duplicate-bearing) hash batch into the table.

        Reproduces yak_ch_insert_list (htab.c:51-78): Bloom-gated create
        on pass 1, increment-existing-only when create_new=False.
        Returns the number of newly created distinct k-mers.
        """
        hs, starts, add = ht.dedup(h, valid)
        if self.bf is not None and create_new:
            self.bf, n_before = bloom_insert(
                self.bf, hs, starts, pre=self.pre, n_shift=self.bf_shift,
                n_hashes=self.bf_n_hash)
            add = jnp.where(n_before == self.bf_n_hash, add, add - 1)
            starts = starts & (add > 0)
        if create_new:
            # the batch can create at most sum(starts) new entries; pre-size
            # so the probe loop can always terminate (no in-loop growth)
            self._ensure_capacity(self.tot + int(jnp.sum(starts)))
        self.keys, self.cnt, n_new, n_pend = ht.update(
            self.keys, self.cnt, hs, add, starts,
            cap_log2=self.cap_log2, mode=ht.ADD, create=create_new)
        assert int(n_pend) == 0
        self.tot += int(n_new)
        return int(n_new)

    def lookup_hashes(self, h, valid):
        """int32 counts per lane; -1 where absent (yak_ch_get)."""
        return ht.lookup(self.keys, self.cnt, h, valid, cap_log2=self.cap_log2)

    def _ensure_capacity(self, n_entries, load_limit=0.72):
        """Amortized host-driven growth (replaces khashl's kick-out rehash)."""
        if n_entries <= load_limit * (1 << self.cap_log2):
            return
        new_log2 = self.cap_log2
        while n_entries > load_limit * (1 << new_log2):
            new_log2 += 1
        h_np, c_np = self.items()
        self.keys, self.cnt = ht.make_table(new_log2)
        self.cap_log2 = new_log2
        self.keys, self.cnt = ht.insert_pairs(
            self.keys, self.cnt, h_np, c_np, cap_log2=new_log2)
        _log(f"grew table to 2^{self.cap_log2} slots ({len(h_np)} entries)")

    # -- cold-path table ops ------------------------------------------------

    def items(self):
        """Host (hash u64[N], count i32[N]) of occupied entries."""
        return ht.occupied_np(self.keys, self.cnt)

    def hist(self):
        """1024-bin count histogram (yak_ch_hist)."""
        return np.asarray(ht.hist(self.cnt))

    def clear_counts(self):
        self.cnt = ht.clear_counts(self.cnt)

    def set_counts(self, value):
        assert 0 <= value <= YAK_MAX_COUNT
        self.cnt = ht.set_counts(self.cnt, value)

    def destroy_bf(self):
        self.bf = None

    def _rebuild(self, h_np, c_np):
        self.keys, self.cnt, self.cap_log2 = ht.build_from_pairs(h_np, c_np)
        self.tot = len(h_np)

    def shrink(self, cmin, cmax, tighten=True):
        """Keep entries with count in [cmin, cmax] (yak_ch_shrink)."""
        cmax = cmax if cmin <= cmax <= YAK_MAX_COUNT else YAK_MAX_COUNT
        h_np, c_np = self.items()
        sel = (c_np >= cmin) & (c_np <= cmax)
        self._rebuild(h_np[sel], c_np[sel])

    def merge(self, other, cmin, cmax):
        """Merge `other` as +1 presence votes for counts in [cmin, cmax]
        (yak_ch_merge, htab.c:241-285; used by cntasm)."""
        cmax = cmax if cmin <= cmax <= YAK_MAX_COUNT else YAK_MAX_COUNT
        h_np, c_np = other.items()
        sel = (c_np >= cmin) & (c_np <= cmax)
        h_sel = h_np[sel]
        # unique keys: straight saturating-add update, create with count 1
        chunk = 1 << 22
        for off in range(0, len(h_sel), chunk):
            h = jnp.asarray(h_sel[off:off + chunk], jnp.uint64)
            ones = jnp.ones(h.shape, jnp.int32)
            active = jnp.ones(h.shape, bool)
            self._ensure_capacity(self.tot + h.shape[0])
            self.keys, self.cnt, n_new, n_pend = ht.update(
                self.keys, self.cnt, h, ones, active,
                cap_log2=self.cap_log2, mode=ht.ADD, create=True)
            assert int(n_pend) == 0
            self.tot += int(n_new)

    def subtract(self, other):
        """Drop k-mers present in `other` (yak_ch_subtract)."""
        self._filter_by_membership(other, keep_present=False)

    def isec(self, other):
        """Keep only k-mers present in `other` (yak_ch_isec)."""
        self._filter_by_membership(other, keep_present=True)

    def _filter_by_membership(self, other, keep_present):
        assert self.k == other.k and self.pre == other.pre
        h_np, c_np = self.items()
        present = np.zeros(len(h_np), bool)
        chunk = 1 << 22
        for off in range(0, len(h_np), chunk):
            h = jnp.asarray(h_np[off:off + chunk], jnp.uint64)
            r = other.lookup_hashes(h, jnp.ones(h.shape, bool))
            present[off:off + chunk] = np.asarray(r) >= 0
        sel = present if keep_present else ~present
        self._rebuild(h_np[sel], c_np[sel])

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
            t._rebuild(hashes, vals)
            return t
        t = into
        assert t.k == k and t.pre == pre
        chunk = 1 << 22
        for off in range(0, len(hashes), chunk):
            h = jnp.asarray(hashes[off:off + chunk], jnp.uint64)
            a = jnp.asarray(vals[off:off + chunk], jnp.int32)
            active = jnp.ones(h.shape, bool)
            t._ensure_capacity(t.tot + h.shape[0])
            t.keys, t.cnt, n_new, n_pend = ht.update(
                t.keys, t.cnt, h, a, active,
                cap_log2=t.cap_log2, mode=ht.OR, create=True)
            assert int(n_pend) == 0
            t.tot += int(n_new)
        return t
