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
from yak_tpu.ops.kmers import extract_kmer_hashes


@lru_cache(maxsize=None)
def get_count_step(k, create, bloom_cfg=None, compact=True):
    """Compiled fused step for static (k, create, bloom_cfg).

    bloom_cfg: None or (pre, bf_shift, bf_n_hash).

    Returns step(codes[G, L] u8, tkeys, tcnt, size[, bf]) ->
      (tkeys', tcnt', size', n_new, overflow[, bf']).

    compact=False (k <= 31 only): the merged stream comes back as
    (khi, klo, outV, size, n_new, overflow[, bf']) u32 planes with
    dropped lanes marked, for the Pallas streaming compactor
    (ops/pallas_compact.py) — see table.KmerTable._fold_codes.
    """
    packable = k <= 31

    if bloom_cfg is None:

        @jax.jit
        def step(codes, tkeys, tcnt, size):
            h, valid = extract_kmer_hashes(codes, k)
            h, valid = h.reshape(-1), valid.reshape(-1)
            add = jnp.ones(h.shape, jnp.int32)
            return st.merge_batch_impl(tkeys, tcnt, size, h, add, valid,
                                       mode=st.ADD, create=create,
                                       packable=packable, compact=compact)

        return step

    pre, bf_shift, bf_n_hash = bloom_cfg

    @jax.jit
    def step_bf(codes, tkeys, tcnt, size, bf):
        # Bloom-gated create pass (yak_ch_insert_list, htab.c:61-70)
        h, valid = extract_kmer_hashes(codes, k)
        h, valid = h.reshape(-1), valid.reshape(-1)
        hs, starts, mult = st.dedup(h, valid, packable=packable)
        bf2, n_before = bloom_insert(bf, hs, starts, pre=pre,
                                     n_shift=bf_shift, n_hashes=bf_n_hash)
        add = jnp.where(n_before == bf_n_hash, mult, mult - 1)
        out = st.merge_batch_impl(tkeys, tcnt, size, hs, add,
                                  starts & (add > 0), mode=st.ADD,
                                  create=create, packable=packable,
                                  compact=compact)
        return out + (bf2,)

    return step_bf


@partial(jax.jit, static_argnames=("cap",))
def finalize_compacted(khi, klo, v, cap):
    """One dispatch: the Pallas compactor's 2-D padded planes -> table
    state (keys u64[cap], cnt i32[cap]).  Truncation to `cap` is safe —
    callers check the merge's overflow flag."""
    keys = ((khi.reshape(-1)[:cap].astype(jnp.uint64) << jnp.uint64(32))
            | klo.reshape(-1)[:cap].astype(jnp.uint64))
    return keys, v.reshape(-1)[:cap]


@lru_cache(maxsize=None)
def get_scan_step(k):
    """Fused lookup step for the scan-side workloads (qv/trio/sexchr/
    chkerr): codes [G, L] -> per-window (value, has_window) in one XLA
    program.  value = table count/flags, -1 where the k-mer is absent
    (yak_ch_get); has_window False where the window has an N."""
    packable = k <= 31

    @jax.jit
    def step(codes, tkeys, tcnt, size):
        h, valid = extract_kmer_hashes(codes, k)
        G, M = h.shape
        vals = st.lookup_impl(tkeys, tcnt, size, h.reshape(-1),
                              valid.reshape(-1), packable=packable)
        return vals.reshape(G, M), valid

    return step
