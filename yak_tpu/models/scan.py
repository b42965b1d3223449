"""Shared lookup-side scanner.

Every lookup workload of the reference (qv.c, triobin.c, trioeval.c,
sexchr.c, chkerr.c) has the same hot loop: stream sequences, extract
canonical k-mer hashes, probe the table, then run small per-sequence
logic over the per-position count/flag stream.

Here the hot part (extract + probe) runs on device over fixed-shape flat
chunks; the per-position value stream is reassembled per sequence on
host.  `scan_file` yields (name, length, vals) per sequence where
vals[i] is the table value of the k-mer *ending* at base i:

  NO_KMER (-2)  no k-mer ends here (window has an N / i < k-1)
  MISSING (-1)  k-mer extracted but absent from the table
  >= 0          the table's low-bit field (count or flags)

which is exactly the information the reference's per-position loops
consume (flag = get(); if (flag < 0) flag = 0 — trio/sexchr; cnt <
min_cnt — chkerr; t — qv).
"""

import numpy as np
import jax.numpy as jnp

from yak_tpu.io.chunks import ChunkSource

NO_KMER = -2
MISSING = -1


def scan_file(fn, table, chunk_size, on_progress=None):
    """Yield (name, seq_len, vals int32[seq_len]) per sequence, in order."""
    k = table.k
    live = {}   # sid -> [name, length, vals]
    done_until = -1

    def emit_complete(upto):
        """Yield all live sequences with sid < upto (they can't grow)."""
        nonlocal done_until
        for sid in sorted(live):
            if sid < upto:
                name, L, vals = live.pop(sid)
                yield name, L, vals
        done_until = upto - 1

    from yak_tpu.ops.countstep import get_scan_step

    table.flush()
    step = get_scan_step(k)
    for packed in ChunkSource(fn, chunk_size, k, with_meta=True):
        codes = jnp.asarray(packed.codes)[None, :]
        t, valid = step(codes, table.keys, table.cnt, table.size)
        t_np = np.asarray(t[0])
        valid_np = np.asarray(valid[0])
        M = t_np.shape[0]
        sid_np = packed.seq_id[:M]
        pos_np = packed.pos[:M]

        for sid, name in packed.seq_names.items():
            if sid not in live:
                live[sid] = [name, packed.seq_lens[sid],
                             np.full(packed.seq_lens[sid], NO_KMER, np.int32)]
        if packed.seq_names:
            min_sid = min(packed.seq_names)
            yield from emit_complete(min_sid)

        sel = valid_np & (sid_np >= 0)
        sids = sid_np[sel]
        ends = pos_np[sel] + (k - 1)
        vals = t_np[sel]
        # sids ascend within a chunk (pack order): fill per-run slices
        uniq, starts = np.unique(sids, return_index=True)
        bounds = np.append(starts, len(sids))
        for u, l, r in zip(uniq, bounds[:-1], bounds[1:]):
            live[u][2][ends[l:r]] = vals[l:r]
        if on_progress is not None:
            on_progress(len(packed.seq_names))

    yield from emit_complete(1 << 62)
