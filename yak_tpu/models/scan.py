"""Shared lookup-side scanner.

Every lookup workload of the reference (qv.c, triobin.c, trioeval.c,
sexchr.c, chkerr.c) has the same hot loop: stream sequences, extract
canonical k-mer hashes, probe the table, then run small per-sequence
logic over the per-position count/flag stream.

The hot part (extract + probe) runs on device as ONE fused XLA program
per chunk (ops/countstep.get_scan_step), or sharded over a mesh with
all_to_all hash routing (parallel/mesh.build_lookup_step); the
per-position value stream is reassembled per sequence on host.
`scan_file` / `scan_file_mesh` yield (name, length, vals) per sequence
where vals[i] is the table value of the k-mer *ending* at base i:

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


def _scan_impl(fn, k, chunk_size, provider, group_size, on_progress=None):
    """Drive the chunk stream through `provider` (a function mapping a
    list of PackedChunks to per-chunk value arrays with NO_KMER already
    folded in) and reassemble per-sequence value streams in order."""
    live = {}   # sid -> [name, length, vals]

    def emit_complete(upto):
        for sid in sorted(live):
            if sid < upto:
                name, L, vals = live.pop(sid)
                yield name, L, vals

    def handle(packed, t_np):
        M = t_np.shape[0]
        sid_np = packed.seq_id[:M]
        pos_np = packed.pos[:M]
        for sid, name in packed.seq_names.items():
            if sid not in live:
                live[sid] = [name, packed.seq_lens[sid],
                             np.full(packed.seq_lens[sid], NO_KMER,
                                     np.int32)]
        sel = (t_np != NO_KMER) & (sid_np >= 0)
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

    batch = []
    for packed in ChunkSource(fn, chunk_size, k, with_meta=True):
        batch.append(packed)
        if len(batch) < group_size:
            continue
        for p, t_np in zip(batch, provider(batch)):
            if p.seq_names:
                yield from emit_complete(min(p.seq_names))
            handle(p, t_np)
        batch = []
    if batch:
        for p, t_np in zip(batch, provider(batch)):
            if p.seq_names:
                yield from emit_complete(min(p.seq_names))
            handle(p, t_np)
    yield from emit_complete(1 << 62)


def scan_seg_sums(fn, table, chunk_size, step_builder, n_out,
                  extra_args=(), join_post_builder=None,
                  psort_mid_builder=None):
    """Shared driver for device-side per-segment reductions (sexchr and
    friends): stream record-meta chunks, run `step_builder(k, ns,
    planes_L)`'s step per chunk, accumulate the n_out per-seg sum
    vectors across chunk-spanning pieces, and yield
    (name, seq_len, sums tuple of ints) per sequence in input order.
    With join_post_builder(k, ns, M), the lookup runs through the
    Pallas merge-JOIN engine when enabled (countstep.join_enabled)."""
    import jax.numpy as jnp

    from yak_tpu.io.pack import pack_chunk_planes
    from yak_tpu.ops.countstep import (join_enabled, join_restore_vals,
                                       psort_enabled, run_join_lookup)

    from yak_tpu.utils import retry_transient

    k = table.k
    table.flush()
    use_join, jinterp = join_enabled(k)
    use_join = use_join and join_post_builder is not None
    ps_use, ps_interp = psort_enabled(k <= 31)
    ps_post = (use_join and psort_mid_builder is not None
               and (ps_use or ps_interp))
    itp = jinterp or ps_interp
    chunk = -(-max(1 << 14, int(chunk_size)) // 1024) * 1024
    M = chunk - k + 1
    def make_dispatch(arg, planes_key, bounds, ns, h):
        def dispatch():
            if ps_post:
                # JOIN kernel -> bitonic order restore -> seg-sum jit
                # (no XLA full-lane sorts)
                ov, pay, vflat = run_join_lookup(
                    table, k, planes_key, arg, M, interpret=itp)
                vs = join_restore_vals(ov, pay, M, interpret=itp)
                h["o"] = psort_mid_builder(k, ns, M)(
                    vs, vflat, jnp.asarray(bounds), *extra_args)
            elif use_join:
                ov, pay, vflat = run_join_lookup(
                    table, k, planes_key, arg, M, interpret=jinterp)
                h["o"] = join_post_builder(k, ns, M)(
                    ov, pay, vflat, jnp.asarray(bounds), *extra_args)
            else:
                step = step_builder(k, ns, planes_L=planes_key)
                h["o"] = step(arg, jnp.asarray(bounds), *extra_args,
                              table.keys, table.cnt, table.size)
        return dispatch

    def produce():
        """2-deep dispatch pipeline (kt_pipeline overlap shape)."""
        pending = []
        for packed in ChunkSource(fn, chunk, k, with_meta="records"):
            nseq = len(packed.rec_gid)
            if not nseq:
                continue
            ns = max(1 << 12, 1 << int(max(nseq - 1, 1)).bit_length())
            bounds = np.full(ns + 1, M, np.int32)
            bounds[:nseq] = np.minimum(packed.rec_start, M)
            arg, planes_key = pack_chunk_planes(packed.codes, packed)
            h = {}
            dispatch = make_dispatch(arg, planes_key, bounds, ns, h)
            dispatch()
            pending.append((packed, h, dispatch))
            if len(pending) >= 2:
                yield pending.pop(0)
        yield from pending

    yield from _fold_seg_sums(
        (packed,
         retry_transient(
             lambda h=h, p=packed: [np.asarray(o)[:len(p.rec_gid)]
                                    for o in h["o"][:n_out]],
             redo=dispatch))
        for packed, h, dispatch in produce())


def _fold_seg_sums(stream):
    """Fold (packed, per-seq sums arrays) pairs into
    (name, seq_len, sums) rows, merging chunk-spanning pieces — shared
    by the single-chip and mesh seg-sum drivers."""
    carry = None
    for packed, outs in stream:
        nseq = len(packed.rec_gid)
        continues = (int(packed.rec_off0[-1] + packed.rec_take[-1])
                     < int(packed.rec_len[-1]))
        for j in range(nseq):
            gi = int(packed.rec_gid[j])
            sums = [int(o[j]) for o in outs]
            if j == 0 and carry is not None:
                assert carry[0] == gi
                sums = [a + b for a, b in zip(carry[1], sums)]
                carry = None
            if j == nseq - 1 and continues:
                carry = [gi, sums, packed.seq_names[gi],
                         int(packed.rec_len[j])]
            else:
                yield (packed.seq_names[gi], int(packed.rec_len[j]),
                       tuple(sums))
    if carry is not None:
        yield (carry[2], carry[3], tuple(carry[1]))


def scan_seg_sums_mesh(fn, mtable, chunk_size, reducer_core, n_out):
    """Mesh analogue of scan_seg_sums: groups of D chunks through the
    routed mesh lookup (parallel/mesh.mesh_routed_groups), then a
    vmapped per-chunk segment reduction — the fused fold the VERDICT
    asked for in place of the per-position scan_file_mesh transfers.
    `reducer_core(vals, has, bounds, M)` must return n_out per-seg sum
    vectors (e.g. ops/countstep._sexchr_reduce)."""
    import jax
    import jax.numpy as jnp

    from yak_tpu.parallel.mesh import mesh_routed_groups

    k = mtable.k
    chunk = -(-max(1 << 14, int(chunk_size)) // 1024) * 1024
    M = chunk - k + 1
    reducers = {}

    def reducer(ns):
        if ns not in reducers:
            reducers[ns] = jax.jit(jax.vmap(
                lambda v, hs, b: reducer_core(v, hs, b, M)))
        return reducers[ns]

    def stream():
        for group, vals, hasw in mesh_routed_groups(fn, mtable, chunk):
            ns = max(1 << 12, 1 << int(
                max(max(len(p.rec_gid) for p in group) - 1,
                    1)).bit_length())
            bounds = np.full((mtable.n_dev, ns + 1), M, np.int32)
            for i, p in enumerate(group):
                bounds[i, :len(p.rec_gid)] = np.minimum(p.rec_start, M)
            outs = reducer(ns)(vals, hasw, jnp.asarray(bounds))
            outs_np = [np.asarray(o) for o in outs[:n_out]]
            for i, p in enumerate(group):
                yield p, [o[i][:len(p.rec_gid)] for o in outs_np]

    yield from _fold_seg_sums(stream())


def scan_file(fn, table, chunk_size, on_progress=None):
    """Yield (name, seq_len, vals int32[seq_len]) per sequence, in order
    (single-table, one fused dispatch per chunk; k <= 31 ships 3
    bits/base host-packed planes and receives one i16 value stream)."""
    from yak_tpu.io.pack import pack_chunk_planes
    from yak_tpu.ops.countstep import get_scan_step

    table.flush()

    def provider(batch):
        out = []
        for packed in batch:
            arg, planes_key = pack_chunk_planes(packed.codes, packed)
            step = get_scan_step(table.k, planes_L=planes_key)
            t = step(arg, table.keys, table.cnt, table.size)
            out.append(np.asarray(t[0]).astype(np.int32))
        return out

    yield from _scan_impl(fn, table.k, chunk_size, provider, 1, on_progress)


def scan_file_mesh(fn, mtable, chunk_size, on_progress=None):
    """Mesh-sharded scan: plane-packed chunks are dealt to the chips
    data-parallel, each hash is routed to its owner chip over ICI, and
    the values come back in original lane order
    (parallel/mesh.build_lookup_step).  Route-capacity overflow retries
    the group with the capacity doubled (fresh compile, rare)."""
    import jax
    from yak_tpu.parallel.mesh import (_pack_group_planes,
                                       build_lookup_step,
                                       default_route_cap)

    mesh = mtable.mesh
    n_dev = mesh.devices.size
    k = mtable.k
    chunk = -(-max(1 << 14, int(chunk_size)) // 1024) * 1024
    M = chunk - k + 1
    state = {"C": default_route_cap(M, n_dev), "step": None}

    def provider(batch):
        group = [p.codes for p in batch]
        planes = jax.device_put(
            jnp.asarray(_pack_group_planes(group, chunk, n_dev)),
            mtable.sh)
        while True:
            if state["step"] is None:
                state["step"] = build_lookup_step(mesh, k, chunk,
                                                  route_cap=state["C"])
            vals, hasw, ovf = state["step"](planes, mtable.keys,
                                            mtable.cnt, mtable.size)
            if not int(np.asarray(ovf).max()):
                break
            state["C"] = min(M, state["C"] * 2)
            state["step"] = None
        v_np, h_np = np.asarray(vals), np.asarray(hasw)
        return [np.where(h_np[i], v_np[i], NO_KMER).astype(np.int32)
                for i in range(len(batch))]

    yield from _scan_impl(fn, k, chunk, provider, n_dev, on_progress)
