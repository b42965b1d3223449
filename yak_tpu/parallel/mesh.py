"""Multi-chip scaling: mesh-sharded tables + all-to-all hash routing.

The reference's scale-out seam is its radix partition: every k-mer is
routed by low hash bits to one of 2^pre disjoint sub-tables, one owner
thread per shard (count.c:17-26, htab.c:53-56; SURVEY §2.3.3).  The
TPU-native generalization: a 1-D `jax.sharding.Mesh` over N chips, where
chip d owns the hash subspace {h : h & (N-1) == d} — a refinement
compatible with the `pre`-bit shard layout (pre >= log2 N), so per-shard
dump contents are chip-count-invariant.

One count step, inside shard_map:
  1. each chip extracts canonical k-mer hashes from its local chunk's
     host-packed bit planes (3 bits/base on the wire, the same ingest
     as the single-chip hot path — io/pack.pack_planes);
  2. hashes are bucketed by owner chip and exchanged with ONE
     lax.all_to_all over ICI.  The per-(src,dst) capacity is TUNED
     (~4x the mean load, default_route_cap) instead of the safe-but-
     memory-hostile M; overflow is flagged and the driver replays the
     group against the preserved pre-step state with doubled capacity;
  3. each chip optionally gates its received hashes through its OWN
     blocked-Bloom slice (the per-shard filters of htab.c:23-27 mapped
     onto per-chip slices — ops/bloom.bloom_insert shard_shift), then
     sort-merges them into its sorted HBM table slice (ops/sorttable) —
     no cross-chip races by construction, exactly the "one owner per
     shard" discipline of the reference, so N-chip output == 1-chip
     output bit-for-bit (incl. Bloom, when batch windows align).

Table growth follows the single-chip one-step-late protocol
(table.KmerTable._check_last_step): steps never donate, the driver
checks the overflow flags one group late and replays the preserved
group after pad-extending every chip's slice.

The lookup side routes each query hash to its owner, probes the local
slice, and routes values back (build_lookup_step); the fused qv fold
(build_qv_group_step) runs the whole per-chunk reduction of
ops/countstep._qv_chunk_stats data-parallel inside shard_map, then
chains the D chunk results through the sequential carry fold
(_qv_fold_step) with one lax.scan — per-group, not per-chunk, host
round-trips.

Engine note: the non-Bloom count fold runs the SAME per-chip Pallas
engine as a single chip — _MeshCountDriver._dispatch_psort splits each
group into a sharded x64 pre-jit (extract + route + complement
planes, build_mesh_presort_step), the shard_mapped bitonic sort
(pallas_sort.sort_planes_mesh), and the shard_mapped diagonal search +
merge-reduce kernel (pallas_merge.merge_reduce_presorted_mesh), with
the x64 flag flipped around the kernel dispatches exactly like
table._run_step.  Merge outputs chain as per-chip plane-state across
groups and materialize once at fold end (mesh_finalize_psort).  The
Bloom pass (dedup/gate reshapes the batch in-step) keeps the packed
single-key XLA sort-merge (ops/sorttable.merge_batch_impl).

Histograms and QV count vectors reduce with psum / post-shard_map scans
(generalizing the per-thread reductions at htab.c:164-167, qv.c:128-133).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from yak_tpu.ops import sorttable as st
from yak_tpu.ops.bloom import bloom_insert
from yak_tpu.ops.kmers import extract_from_planes, planes_words


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if n & (n - 1):
        raise ValueError("mesh size must be a power of two (hash routing)")
    return Mesh(np.array(devices[:n]), ("d",))


def default_route_cap(M, n_dev):
    """Per-(src,dst) all_to_all capacity: ~4x the mean per-destination
    load (hash-uniform routing concentrates like M/n_dev +- sqrt), so
    send/recv buffers are ~4M/n_dev lanes instead of the safe bound M
    (which at the production chunk and 8 chips is ~0.5 GB per buffer).
    Overflow is detected and replayed with doubled capacity."""
    if n_dev == 1:
        return M
    return min(M, -(-(4 * M // n_dev + 1024) // 1024) * 1024)


def _pack_group_planes(chunks, chunk, n_dev):
    """Host: assemble a group's [D, 3, W] u32 plane block (3 bits/base
    on the wire); missing chunks pad all-N.  Items may be PackedChunks
    — planes PRE-PACKED by the native reader thread (fastx.cpp
    pack_planes) are reused directly, so the mesh ingest shares the
    single-chip hot path's zero-Python-packing wire (VERDICT r2
    missing #4); flat u8 code arrays fall back to the Python packer."""
    from yak_tpu.io.pack import pack_planes

    W = planes_words(chunk)
    out = np.empty((n_dev, 3, W), np.uint32)
    for i, c in enumerate(chunks):
        pl3 = getattr(c, "planes", None)
        if pl3 is not None:
            out[i, 0] = pl3[0].reshape(-1)
            out[i, 1] = pl3[1].reshape(-1)
            out[i, 2] = pl3[2].reshape(-1)
        else:
            codes = getattr(c, "codes", c)
            plo, phi, pnn = pack_planes(codes)
            out[i, 0], out[i, 1], out[i, 2] = plo[0], phi[0], pnn[0]
    for i in range(len(chunks), n_dev):
        out[i, 0] = 0
        out[i, 1] = 0
        out[i, 2] = 0xFFFFFFFF
    return out


def _route(h, valid, n_dev, C, payload=None, send_payload=False):
    """Bucket hashes by owner chip (low log2(n_dev) bits) and exchange
    with one tiled all_to_all.  Returns (recv_h, recv_v, overflow) and,
    with payload, the metadata needed to route values back
    (_route_back): the sorted original indices and slot map.

    send_payload=True additionally DELIVERS the i32 payload to the
    owner chip (a third all_to_all plane) — the Bloom pass ships each
    lane's serial rank this way so the per-chip gate stays exact under
    the reference's buffer order (ops/bloom docstring); the last tuple
    element is then (ok, slot, recv_payload)."""
    M = h.shape[0]
    owner = jnp.where(
        valid, (h & jnp.uint64(n_dev - 1)).astype(jnp.uint32),
        jnp.uint32(n_dev))
    lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    if payload is not None:
        owner_s, h_s, pay_s = jax.lax.sort((owner, h, payload),
                                           num_keys=1, is_stable=False)
    else:
        owner_s, h_s = jax.lax.sort((owner, h), num_keys=1,
                                    is_stable=False)
        pay_s = None
    is_first = jnp.concatenate(
        [jnp.ones(1, bool), owner_s[1:] != owner_s[:-1]])
    bucket_start = jax.lax.cummax(jnp.where(is_first, lane, -1))
    rank = lane - bucket_start
    ok = (owner_s < n_dev) & (rank < C)
    overflow = jnp.sum((owner_s < n_dev) & (rank >= C), dtype=jnp.int32)
    slot = jnp.where(ok, owner_s.astype(jnp.int32) * C + rank, n_dev * C)
    send_h = jnp.zeros(n_dev * C, jnp.uint64).at[slot].set(
        h_s, mode="drop")
    send_v = jnp.zeros(n_dev * C, bool).at[slot].set(ok, mode="drop")
    recv_h = jax.lax.all_to_all(send_h.reshape(n_dev, C), "d",
                                split_axis=0, concat_axis=0,
                                tiled=True).reshape(-1)
    recv_v = jax.lax.all_to_all(send_v.reshape(n_dev, C), "d",
                                split_axis=0, concat_axis=0,
                                tiled=True).reshape(-1)
    if send_payload:
        send_p = jnp.zeros(n_dev * C, pay_s.dtype).at[slot].set(
            pay_s, mode="drop")
        recv_p = jax.lax.all_to_all(send_p.reshape(n_dev, C), "d",
                                    split_axis=0, concat_axis=0,
                                    tiled=True).reshape(-1)
        return recv_h, recv_v, overflow, (ok, slot, recv_p)
    return recv_h, recv_v, overflow, (ok, slot, pay_s)


def _route_back(vals, ok, slot, pay_s, n_dev, C):
    """Return routed per-query values to original lane order."""
    back = jax.lax.all_to_all(vals.reshape(n_dev, C), "d",
                              split_axis=0, concat_axis=0,
                              tiled=True).reshape(-1)
    v_sorted = jnp.where(ok, back[jnp.minimum(slot, n_dev * C - 1)], -1)
    _, v_orig = jax.lax.sort((pay_s, v_sorted), num_keys=1,
                             is_stable=False)
    return v_orig


class MeshTable:
    """A counting table sharded over a 1-D mesh: chip d owns hashes with
    h & (N-1) == d.  keys/cnt/size have a leading device axis on 'd';
    bf (optional) is the per-chip blocked-Bloom slice."""

    def __init__(self, mesh, k, pre=10, cap_log2=16, bf_shift=0,
                 bf_n_hash=4, bf_exact=False):
        self.mesh = mesh
        self.k = k
        self.pre = pre
        n = mesh.devices.size
        self.n_dev = n
        self.nlog = n.bit_length() - 1
        if pre < self.nlog:
            raise ValueError("pre must be >= log2(n_devices)")
        self.sh = NamedSharding(mesh, P("d"))
        capd = 1 << cap_log2
        # jit-with-out-shardings creates the sharded state without a
        # host-side global array — required in multi-host mode (no
        # process addresses the whole mesh) and equivalent on one host
        zeros = jax.jit(
            lambda: (jnp.zeros((n, capd), jnp.uint64),
                     jnp.full((n, capd), -1, jnp.int32),
                     jnp.zeros((n,), jnp.int32)),
            out_shardings=(self.sh,) * 3)
        self.keys, self.cnt, self.size = zeros()
        self.tot = 0
        self.bf = None
        self.bf_shift = bf_shift
        self.bf_n_hash = bf_n_hash
        self.bf_exact = bf_exact   # serial-exact gate (-X; see table.py)
        if bf_shift > pre and 9 <= bf_shift - pre <= 64 - 9:
            # per-chip slice: 2^(bf_shift - log2 N) bits (bbf.c:9 bounds
            # checked against the full filter, htab.c:23-27)
            self.bf = jax.jit(
                lambda: jnp.zeros((n, 1 << (bf_shift - self.nlog - 5)),
                                  jnp.uint32),
                out_shardings=self.sh)()

    @classmethod
    def from_items(cls, mesh, k, pre, hashes, counts):
        """Build a sharded table from host (hash, value) pairs — the
        mesh-side restore (trio/sexchr flag tables on a mesh; single
        process: multi-host loads would ship per-host rows instead)."""
        n = mesh.devices.size
        hashes = np.asarray(hashes, np.uint64)
        counts = np.asarray(counts, np.int64)
        owner = (hashes & np.uint64(n - 1)).astype(np.int64)
        sizes = np.bincount(owner, minlength=n)
        capd = 1 << max(int(sizes.max() - 1).bit_length(), 14)
        keys = np.zeros((n, capd), np.uint64)
        cnt = np.full((n, capd), -1, np.int32)
        for d in range(n):
            sel = owner == d
            hd = np.sort(hashes[sel])
            order = np.argsort(hashes[sel], kind="stable")
            keys[d, :sizes[d]] = hd
            cnt[d, :sizes[d]] = counts[sel][order]
        t = cls(mesh, k, pre, cap_log2=int(capd).bit_length() - 1)
        t.keys = jax.device_put(jnp.asarray(keys), t.sh)
        t.cnt = jax.device_put(jnp.asarray(cnt), t.sh)
        t.size = jax.device_put(jnp.asarray(sizes.astype(np.int32)),
                                t.sh)
        t.tot = int(sizes.sum())
        return t

    @property
    def cap(self):
        """Per-device slots."""
        return self.keys.shape[1]

    def flush(self):
        """KmerTable-API compat (mesh steps fold eagerly per group)."""

    def destroy_bf(self):
        self.bf = None

    def grow(self, new_capd):
        """Pad-extend every chip's slice (no rehash; sorted layout)."""
        capd = self.cap
        assert new_capd >= capd
        if new_capd == capd:
            return
        n = self.n_dev
        ext = jax.jit(
            lambda k, c: (
                jnp.concatenate(
                    [k, jnp.zeros((n, new_capd - capd), jnp.uint64)],
                    axis=1),
                jnp.concatenate(
                    [c, jnp.full((n, new_capd - capd), -1, jnp.int32)],
                    axis=1)),
            out_shardings=(self.sh, self.sh))
        self.keys, self.cnt = ext(self.keys, self.cnt)

    def clear_counts(self):
        """Zero live counts on every chip (yak_ch_clear, htab.c:116-130)."""
        def local(cnt, size):
            return st.map_counts(cnt.reshape(-1), size.reshape(()),
                                 0, 0)[None]

        f = shard_map(local, mesh=self.mesh, in_specs=(P("d"), P("d")),
                      out_specs=P("d"), check_vma=False)
        self.cnt = jax.jit(f)(self.cnt, self.size)

    def shrink(self, cmin, cmax):
        """Keep entries with count in [cmin, cmax] on every chip
        (yak_ch_shrink, htab.c:175-208)."""
        packable = self.k <= 31

        def local(keys, cnt, size):
            c = cnt.reshape(-1)
            k2, c2, s2 = st.compact_where(
                keys.reshape(-1), c, size.reshape(()),
                (c >= cmin) & (c <= cmax), packable=packable)
            return k2[None], c2[None], s2[None]

        f = shard_map(local, mesh=self.mesh,
                      in_specs=(P("d"), P("d"), P("d")),
                      out_specs=(P("d"),) * 3, check_vma=False)

        @jax.jit
        def run(k, c, s):
            k2, c2, s2 = f(k, c, s)
            return k2, c2, s2, jnp.sum(s2)   # replicated total

        self.keys, self.cnt, self.size, tot = run(
            self.keys, self.cnt, self.size)
        self.tot = int(tot)

    def items(self):
        """Host (hash, count) pairs over all shards.  In multi-host
        mode the table is first replicated so every process sees the
        full set (final gathers ride DCN — SURVEY §5)."""
        keys, cnt, size = self.keys, self.cnt, self.size
        if jax.process_count() > 1:
            rep = NamedSharding(self.mesh, P())
            keys, cnt, size = jax.jit(
                lambda k, c, s: (k, c, s),
                out_shardings=(rep, rep, rep))(keys, cnt, size)
        k_np = np.asarray(keys)
        c_np = np.asarray(cnt)
        s_np = np.asarray(size)
        hs, cs = [], []
        for d in range(self.n_dev):
            hs.append(k_np[d, :s_np[d]])
            cs.append(c_np[d, :s_np[d]])
        return np.concatenate(hs), np.concatenate(cs)

    def hist(self):
        h = np.zeros(1 << 10, np.int64)
        _, c = self.items()
        np.add.at(h, c & ((1 << 10) - 1), 1)
        return h

    def dump(self, path):
        from yak_tpu.io import yakfmt

        h_np, c_np = self.items()
        yakfmt.dump_yak(path, self.k, self.pre, h_np, c_np)


def build_count_step(mesh, k, capd, chunk, route_cap=None,
                     create_new=True, bloom_cfg=None):
    """Compile the sharded count step (plane ingest).

    Args (static): capd = per-device table slots; chunk = flat code
    buffer length per device; route_cap = per-(src,dst) exchange
    capacity (default default_route_cap); bloom_cfg = None or
    (pre, bf_shift, bf_n_hash) — per-chip Bloom gating on pass 1.

    Returns step(planes[D, 3, W], keys[D, capd], cnt[D, capd], size[D]
                 [, bf[D, bfw]])
      -> (keys, cnt, size, n_new[D], route_overflow[D],
          table_overflow[D][, bf']).
    """
    n_dev = mesh.devices.size
    nlog = n_dev.bit_length() - 1
    M = chunk - k + 1
    C = route_cap or default_route_cap(M, n_dev)
    packable = k <= 31

    exact = False
    if bloom_cfg is not None:
        from yak_tpu.ops.countstep import _bloom_cfg_parse
        pre, bf_shift, bf_n_hash, exact = _bloom_cfg_parse(bloom_cfg)

    def local_step(planes, keys, cnt, size, *bf_opt):
        plo = planes[0, 0][None]
        phi = planes[0, 1][None]
        pnn = planes[0, 2][None]
        h, valid = extract_from_planes(plo, phi, pnn, k, chunk)
        h, valid = h.reshape(-1), valid.reshape(-1)
        lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
        rank = lane
        if n_dev > 1:
            recv_h, recv_v, overflow, meta = _route(
                h, valid, n_dev, C,
                payload=lane if exact else None,
                send_payload=exact)
            if exact:
                # serial rank across the step's D chunks: chunk s (one
                # per source chip, in file order) precedes chunk s+1,
                # so rank = src * M + original lane in the src chunk —
                # the same order the single-chip fold walks them
                src = (jax.lax.broadcasted_iota(
                    jnp.int32, recv_h.shape, 0) // C)
                rank = src * M + meta[2]
        else:
            recv_h, recv_v, overflow = h, valid, jnp.int32(0)
        outs_bf = ()
        if bloom_cfg is not None:
            if exact:
                hs, starts, mult, rk = st.dedup(
                    recv_h, recv_v, packable=packable, rank=rank)
                bf2, n_before = bloom_insert(
                    bf_opt[0].reshape(-1), hs, starts, rk, pre=pre,
                    n_shift=bf_shift, n_hashes=bf_n_hash,
                    shard_shift=nlog, rank_bound=n_dev * M)
            else:
                # default cheap gate: chunk-start state + self hits —
                # no rank payload rides the route, no rank sort
                # operands (ops/countstep._gate_batch semantics)
                hs, starts, mult = st.dedup(recv_h, recv_v,
                                            packable=packable)
                bf2, n_before = bloom_insert(
                    bf_opt[0].reshape(-1), hs, starts, pre=pre,
                    n_shift=bf_shift, n_hashes=bf_n_hash,
                    shard_shift=nlog)
            add = jnp.where(n_before == bf_n_hash, mult, mult - 1)
            use_h, use_add = hs, add
            use_v = starts & (add > 0)
            outs_bf = (bf2[None],)
        else:
            use_h, use_v = recv_h, recv_v
            use_add = jnp.ones(use_h.shape, jnp.int32)
        keys2, cnt2, size2, n_new, toverflow = st.merge_batch_impl(
            keys.reshape(-1), cnt.reshape(-1), size.reshape(()),
            use_h, use_add, use_v, mode=st.ADD, create=create_new,
            packable=packable)
        return (keys2[None, :], cnt2[None, :], size2[None], n_new[None],
                overflow[None], toverflow[None]) + outs_bf

    n_in = 5 if bloom_cfg is not None else 4
    n_out = 7 if bloom_cfg is not None else 6
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("d"),) * n_in,
        out_specs=(P("d"),) * n_out,
        check_vma=False)
    return jax.jit(step)


def build_lookup_step(mesh, k, chunk, route_cap=None):
    """Compile the sharded scan step (the lookup-side workloads):
    data-parallel extract from host-packed planes -> all_to_all route
    each hash to its owner chip -> local sorted-table lookup ->
    all_to_all the values back -> restore original lane order.

    Returns step(planes[D, 3, W], keys[D, capd], cnt[D, capd], size[D])
      -> (vals[D, M] int32 (-1 = absent), has_window[D, M] bool,
          route_overflow[D]).
    """
    n_dev = mesh.devices.size
    M = chunk - k + 1
    C = route_cap or default_route_cap(M, n_dev)
    packable = k <= 31

    def local_step(planes, keys, cnt, size):
        plo = planes[0, 0][None]
        phi = planes[0, 1][None]
        pnn = planes[0, 2][None]
        h, valid = extract_from_planes(plo, phi, pnn, k, chunk)
        h, valid = h.reshape(-1), valid.reshape(-1)
        if n_dev == 1:
            vals = st.lookup_impl(keys.reshape(-1), cnt.reshape(-1),
                                  size.reshape(()), h, valid,
                                  packable=packable)
            return (vals[None, :], valid[None, :],
                    jnp.zeros(1, jnp.int32))
        idx = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
        recv_h, recv_v, overflow, (ok, slot, idx_s) = _route(
            h, valid, n_dev, C, payload=idx)
        vals = st.lookup_impl(keys.reshape(-1), cnt.reshape(-1),
                              size.reshape(()), recv_h, recv_v,
                              packable=packable)
        v_orig = _route_back(vals, ok, slot, idx_s, n_dev, C)
        return (v_orig[None, :], valid[None, :], overflow[None])

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P("d")),
        out_specs=(P("d"), P("d"), P("d")),
        check_vma=False)
    return jax.jit(step)


def build_qv_group_step(mesh, k, ns, chunk, route_cap=None,
                        min_frac=0.5):
    """Compile the fused mesh qv group step: D chunks' lookups +
    per-chunk reductions run data-parallel inside shard_map
    (ops/countstep._qv_chunk_stats), then the sequential carry fold
    chains the D results with one lax.scan (_qv_fold_step) — the whole
    group costs one dispatch and no per-chunk transfers.

    Returns step(planes[D, 3, W], meta[D, 2*ns+6], cnt[1024] i64,
                 c_tot, c_non0, c_hist[1024] i64,
                 keys[D, capd], cntt[D, capd], size[D])
      -> (cnt', c_tot', c_non0', c_hist', tot[D, ns], non0[D, ns],
          route_overflow[D]).
    """
    from yak_tpu.ops.countstep import _qv_chunk_stats, _qv_fold_step

    n_dev = mesh.devices.size
    M = chunk - k + 1
    C = route_cap or default_route_cap(M, n_dev)
    packable = k <= 31

    def local_step(planes, meta, keys, cnt, size):
        plo = planes[0, 0][None]
        phi = planes[0, 1][None]
        pnn = planes[0, 2][None]
        h, valid = extract_from_planes(plo, phi, pnn, k, chunk)
        h, valid = h.reshape(-1), valid.reshape(-1)
        if n_dev == 1:
            vals = st.lookup_impl(keys.reshape(-1), cnt.reshape(-1),
                                  size.reshape(()), h, valid,
                                  packable=packable)
            overflow = jnp.int32(0)
        else:
            idx = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
            recv_h, recv_v, overflow, (ok, slot, idx_s) = _route(
                h, valid, n_dev, C, payload=idx)
            routed = st.lookup_impl(keys.reshape(-1), cnt.reshape(-1),
                                    size.reshape(()), recv_h, recv_v,
                                    packable=packable)
            vals = _route_back(routed, ok, slot, idx_s, n_dev, C)
        hg, hi_, hh, tot, non0 = _qv_chunk_stats(
            vals, valid, meta.reshape(-1), ns, M, min_frac)
        return (hg[None], hi_[None], hh[None], tot[None], non0[None],
                overflow[None])

    inner = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("d"),) * 5,
        out_specs=(P("d"),) * 6,
        check_vma=False)

    @jax.jit
    def step(planes, meta, cnt0, c_tot, c_non0, c_hist, keys, cntt,
             size):
        hg, hi_, hh, tot, non0, r_ovf = inner(planes, meta, keys, cntt,
                                              size)

        def body(carry, xs):
            meta_j, hg_j, hi_j, hh_j, tot_j, non0_j = xs
            return _qv_fold_step(carry, meta_j, hg_j, hi_j, hh_j,
                                 tot_j, non0_j, ns, min_frac), None

        (cnt1, ct, cn, chh), _ = jax.lax.scan(
            body, (cnt0, c_tot, c_non0, c_hist),
            (meta, hg, hi_, hh, tot, non0))
        return cnt1, ct, cn, chh, tot, non0, r_ovf

    return step


def _psort_pad(B):
    """Padded batch lanes for the per-chip bitonic sort (power of two,
    >= the merge kernel's minimum physical window) — the same pad rule
    as the single-chip posts, by construction."""
    from yak_tpu.ops.countstep import qv_psort_pad

    return qv_psort_pad(B)


def build_mesh_presort_step(mesh, k, capd, chunk, route_cap,
                            from_planes=False, state_rows=None,
                            wide=False):
    """x64 pre-jit of the mesh psort/wide-pmerge engines (the per-chip
    twin of countstep.get_count_presort_step / get_count_wide_step):
    data-parallel extract from the plane block, all_to_all hash routing
    to owner chips, then each chip's received stream packed as
    complement-key u32 planes for the per-chip merge-reduce dispatch.

    wide=False (packed k <= 31): UNSORTED planes — the Pallas bitonic
    sort runs as its own shard_mapped dispatch between this step and
    the merge.  wide=True (k >= 32 raw hash_long keys): the per-chip
    single-operand XLA u64 sort runs INSIDE this jit (the r4 wide
    pmerge engine), so the output planes are already descending-E.

    from_planes=False: step(planes, keys, cnt, size) additionally
    splits the u64 table slice to raw (shifted for packed keys) planes
    -> (xhi, xlo, thi, tlo, tw, size11, route_ovf), all [D, ...].
    from_planes=True: the table stays in the previous merge's raw
    plane-state (driver passes it straight to the merge dispatch), so
    the step is table-free: step(planes) -> (xhi, xlo, route_ovf)."""
    n_dev = mesh.devices.size
    M = chunk - k + 1
    C = route_cap
    B = n_dev * C
    Bpad = _psort_pad(B)

    def xs_of(recv_h, recv_v):
        if wide:
            xs = jnp.where(recv_v, ~recv_h, jnp.uint64(0))
            xs = jnp.where(recv_v & (xs == jnp.uint64(0)),
                           jnp.uint64(1), xs)
        else:
            xs = jnp.where(recv_v,
                           ~((recv_h << jnp.uint64(1)) | jnp.uint64(1)),
                           jnp.uint64(0))
        if Bpad != B:
            xs = jnp.concatenate(
                [xs, jnp.zeros(Bpad - B, jnp.uint64)])
        if wide:
            # wide pmerge: sort per chip here; re-complement to the
            # descending-E plane contract (countstep._xs_wide_sorted)
            (xs,) = jax.lax.sort((xs,), num_keys=1, is_stable=False)
            xs = ~xs
        return ((xs >> jnp.uint64(32)).astype(jnp.uint32),
                (xs & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))

    def extract_route(planes):
        plo = planes[0, 0][None]
        phi = planes[0, 1][None]
        pnn = planes[0, 2][None]
        h, valid = extract_from_planes(plo, phi, pnn, k, chunk)
        h, valid = h.reshape(-1), valid.reshape(-1)
        if n_dev > 1:
            recv_h, recv_v, ovf, _ = _route(h, valid, n_dev, C)
        else:
            recv_h, recv_v, ovf = h[:C], valid[:C], jnp.int32(0)
        return recv_h, recv_v, ovf

    if from_planes:

        def local(planes):
            recv_h, recv_v, ovf = extract_route(planes)
            xhi, xlo = xs_of(recv_h, recv_v)
            return xhi[None], xlo[None], ovf[None]

        step = shard_map(local, mesh=mesh, in_specs=(P("d"),),
                         out_specs=(P("d"),) * 3, check_vma=False)
        return jax.jit(step)

    # the merge kernel DMAs fixed (T+A)-lane windows, so the physical
    # table planes must be at least that long even when capd is tiny
    # (lanes >= size are masked in-kernel; pads are never read as live)
    from yak_tpu.ops.pallas_merge import _WA
    tpad = max(capd, _WA) - capd

    def local(planes, keys, cnt, size):
        recv_h, recv_v, ovf = extract_route(planes)
        xhi, xlo = xs_of(recv_h, recv_v)
        shifted = keys.reshape(-1) if wide \
            else keys.reshape(-1) << jnp.uint64(1)
        thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        tw = cnt.reshape(-1)
        if tpad:
            thi = jnp.concatenate([thi, jnp.zeros(tpad, jnp.uint32)])
            tlo = jnp.concatenate([tlo, jnp.zeros(tpad, jnp.uint32)])
            tw = jnp.concatenate([tw, jnp.zeros(tpad, jnp.int32)])
        size11 = jnp.minimum(size.reshape(()), capd).reshape(
            1, 1).astype(jnp.int32)
        return (xhi[None], xlo[None], thi[None], tlo[None],
                tw[None], size11[None], ovf[None])

    step = shard_map(local, mesh=mesh, in_specs=(P("d"),) * 4,
                     out_specs=(P("d"),) * 7, check_vma=False)
    return jax.jit(step)


_LOOKUP_PSORT_CACHE = {}


def build_lookup_psort(mesh, k, chunk, route_cap):
    """The routed mesh lookup on the per-chip Pallas merge-JOIN (the
    lookup twin of the psort count engine): a sharded x64 pre-jit
    (extract + all_to_all route + complement query planes + join
    payload + raw table planes), the shard_mapped bitonic sort, the
    shard_mapped JOIN kernel, and a sharded post-jit (per-chip order
    restore -> all_to_all the values back -> original lane order).

    Returns run(planes, keys, cnt, size) ->
      (vals[D, M] i32, has[D, M] bool, route_ovf[D]) — the
    build_lookup_step contract."""
    n_dev = mesh.devices.size
    M = chunk - k + 1
    C = route_cap
    B = n_dev * C if n_dev > 1 else M
    Bpad = _psort_pad(B)

    key = (id(mesh), k, chunk, C)
    if key in _LOOKUP_PSORT_CACHE:
        return _LOOKUP_PSORT_CACHE[key]

    def pre_local(planes, keys, cnt, size):
        plo = planes[0, 0][None]
        phi = planes[0, 1][None]
        pnn = planes[0, 2][None]
        h, valid = extract_from_planes(plo, phi, pnn, k, chunk)
        h, valid = h.reshape(-1), valid.reshape(-1)
        if n_dev > 1:
            idx = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
            recv_h, recv_v, ovf, (ok, slot, idx_s) = _route(
                h, valid, n_dev, C, payload=idx)
        else:
            recv_h, recv_v, ovf = h, valid, jnp.int32(0)
            ok = valid
            slot = jnp.zeros(M, jnp.int32)
            idx_s = jnp.zeros(M, jnp.int32)
        # complement query planes + join payload (recv-lane index)
        xs = jnp.where(recv_v,
                       ~((recv_h << jnp.uint64(1)) | jnp.uint64(1)),
                       jnp.uint64(2))
        pay = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
        if Bpad != B:
            xs = jnp.concatenate([xs, jnp.zeros(Bpad - B, jnp.uint64)])
            pay = jnp.concatenate(
                [pay, jnp.full(Bpad - B, -1, jnp.int32)])
        xhi = (xs >> jnp.uint64(32)).astype(jnp.uint32)
        xlo = (xs & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        kk = keys.reshape(-1)
        shifted = kk << jnp.uint64(1)
        thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        tw = cnt.reshape(-1)
        from yak_tpu.ops.pallas_merge import _WA
        tpad = max(kk.shape[0], _WA) - kk.shape[0]
        if tpad:
            thi = jnp.concatenate([thi, jnp.zeros(tpad, jnp.uint32)])
            tlo = jnp.concatenate([tlo, jnp.zeros(tpad, jnp.uint32)])
            tw = jnp.concatenate([tw, jnp.zeros(tpad, jnp.int32)])
        size11 = jnp.minimum(size.reshape(()),
                             kk.shape[0]).reshape(1, 1).astype(jnp.int32)
        return (xhi[None], xlo[None], pay[None], thi[None], tlo[None],
                tw[None], size11[None], valid[None], ok[None],
                slot[None], idx_s[None], ovf[None])

    pre = jax.jit(shard_map(
        pre_local, mesh=mesh, in_specs=(P("d"),) * 4,
        out_specs=(P("d"),) * 12, check_vma=False))

    # post, split around two per-chip bitonic restore sorts (the mesh
    # twin of countstep.join_restore_vals — no XLA full-lane sorts):
    # P1 emits (recv-lane key, value) planes from the kernel outputs,
    # S1 restores recv order, P2 all_to_alls the values home and emits
    # (original-lane key, value) planes, S2 restores query order.
    BP1 = Bpad                # the S1 restore sort pads like the batch
    BP2 = _psort_pad(M)       # the S2 restore sort pads the M lanes

    def post_pre_local(ov, pay):
        vals_asc = ov[0].reshape(-1)[:B]
        idx_asc = jnp.flip(pay[0][pay.shape[1] - B:])
        rkey = idx_asc.astype(jnp.uint32)   # pads (-1) -> 0xFFFFFFFF
        rval = vals_asc.astype(jnp.int32)
        if BP1 != B:
            rkey = jnp.concatenate(
                [rkey, jnp.full(BP1 - B, 0xFFFFFFFF, jnp.uint32)])
            rval = jnp.concatenate([rval, jnp.zeros(BP1 - B, jnp.int32)])
        return rkey[None], rval[None]

    post_pre = jax.jit(shard_map(
        post_pre_local, mesh=mesh, in_specs=(P("d"),) * 2,
        out_specs=(P("d"),) * 2, check_vma=False))

    def post_mid_local(v_rest, ok, slot, idx_s):
        vals_recv = v_rest[0][:B]
        back = jax.lax.all_to_all(vals_recv.reshape(n_dev, C), "d",
                                  split_axis=0, concat_axis=0,
                                  tiled=True).reshape(-1)
        v_sorted = jnp.where(ok[0], back[jnp.minimum(slot[0], B - 1)],
                             -1)
        key2 = idx_s[0].astype(jnp.uint32)
        if BP2 != M:
            key2 = jnp.concatenate(
                [key2, jnp.full(BP2 - M, 0xFFFFFFFF, jnp.uint32)])
            v_sorted = jnp.concatenate(
                [v_sorted, jnp.zeros(BP2 - M, jnp.int32)])
        return key2[None], v_sorted[None]

    post_mid = jax.jit(shard_map(
        post_mid_local, mesh=mesh, in_specs=(P("d"),) * 4,
        out_specs=(P("d"),) * 2, check_vma=False))

    def post_fin_local(v_orig):
        return v_orig[0][:M][None]

    post_fin = jax.jit(shard_map(
        post_fin_local, mesh=mesh, in_specs=(P("d"),),
        out_specs=P("d"), check_vma=False))

    def run(planes, keys, cnt, size, interpret=False):
        from yak_tpu.ops import pallas_merge, pallas_sort

        (xhi, xlo, pay0, thi, tlo, tw, size11, valid, ok, slot,
         idx_s, ovf) = pre(planes, keys, cnt, size)
        Ehi, Elo, pay = pallas_sort.sort_planes_mesh(
            mesh, xhi, xlo, pay0, neg_keys=True, interpret=interpret)
        capd = keys.shape[1]
        out = pallas_merge.merge_reduce_presorted_mesh(
            mesh, size11, thi, tlo, tw, Ehi, Elo,
            Na=capd, Nb=B, create=True, interpret=interpret,
            lookup=True)
        rkey, rval = post_pre(out[2], pay)
        _, v_rest = pallas_sort.sort_planes32_mesh(
            mesh, rkey, rval, interpret=interpret)
        if n_dev > 1:
            key2, v_s = post_mid(v_rest, ok, slot, idx_s)
            _, v_orig = pallas_sort.sort_planes32_mesh(
                mesh, key2, v_s, interpret=interpret)
            vals = post_fin(v_orig)
        else:
            vals = post_fin(v_rest)
        return vals, valid, ovf

    _LOOKUP_PSORT_CACHE[key] = run
    return run


def mesh_finalize_psort(mesh, capd, wide=False):
    """x64 jit: per-chip merge plane-state -> u64 table state (the mesh
    twin of countstep.finalize_pmerge).  wide keys carry no stream bit,
    so no shift-out."""
    def local(ohi, olo, ov, size11):
        keys = ((ohi.reshape(-1)[:capd].astype(jnp.uint64)
                 << jnp.uint64(32))
                | olo.reshape(-1)[:capd].astype(jnp.uint64))
        if not wide:
            keys = keys >> jnp.uint64(1)
        sz = jnp.minimum(size11.reshape(()), capd).astype(jnp.int32)
        return keys[None], ov.reshape(-1)[:capd][None], sz[None]

    step = shard_map(local, mesh=mesh, in_specs=(P("d"),) * 4,
                     out_specs=(P("d"),) * 3, check_vma=False)
    return jax.jit(step)


def mesh_routed_groups(fn, mtable, chunk, k=None):
    """Stream record-meta chunks through the routed mesh lookup in
    groups of up to D: yields (group, vals, hasw) where group is the
    list of PackedChunks and vals/hasw are the [D, M] per-lane lookup
    results (device-resident; callers apply their own vmapped
    reductions).  Route-capacity overflow doubles C and replays the
    group — lookups are stateless, so no snapshot is needed.  Shared by
    the fused mesh triobin/trioeval/sexchr/chkerr folds (the mesh
    analogue of the per-workload 2-deep dispatch pipelines; reference
    seam: one owner thread per radix shard, count.c:17-26)."""
    from yak_tpu.io.chunks import ChunkSource

    if k is None:
        k = mtable.k
    n_dev = mtable.n_dev
    M = chunk - k + 1
    route = {"C": default_route_cap(M, n_dev), "step": None}
    from yak_tpu.ops.countstep import psort_enabled
    use_ps, ps_interp = psort_enabled(k <= 31)
    use_ps = use_ps or ps_interp

    def flush_group(group):
        planes = jax.device_put(jnp.asarray(_pack_group_planes(
            group, chunk, n_dev)), mtable.sh)
        while True:
            if use_ps:
                run = build_lookup_psort(mtable.mesh, k, chunk,
                                         route["C"])
                vals, hasw, ovf = run(planes, mtable.keys, mtable.cnt,
                                      mtable.size, interpret=ps_interp)
            else:
                if route["step"] is None:
                    route["step"] = build_lookup_step(
                        mtable.mesh, k, chunk, route_cap=route["C"])
                vals, hasw, ovf = route["step"](planes, mtable.keys,
                                                mtable.cnt, mtable.size)
            if not int(np.asarray(ovf).max()):
                return vals, hasw
            route["C"] = min(M, route["C"] * 2)
            route["step"] = None

    group = []
    for packed in ChunkSource(fn, chunk, k, with_meta="records"):
        if not len(packed.rec_gid):
            continue
        group.append(packed)
        if len(group) == n_dev:
            vals, hasw = flush_group(group)
            yield group, vals, hasw
            group = []
    if group:
        vals, hasw = flush_group(group)
        yield group, vals, hasw


def build_qv_group_post(mesh, k, ns, chunk, min_frac=0.5):
    """The reduction + carry-chain half of build_qv_group_step, for the
    psort engine: the routed per-chip Pallas JOIN produces (vals, has)
    in its own dispatches (build_lookup_psort), and this jit runs the
    per-chunk qv reductions data-parallel plus the sequential group
    carry fold."""
    from yak_tpu.ops.countstep import _qv_chunk_stats, _qv_fold_step

    M = chunk - k + 1

    def local(vals, hasw, meta):
        hg, hi_, hh, tot, non0 = _qv_chunk_stats(
            vals.reshape(-1), hasw.reshape(-1), meta.reshape(-1), ns,
            M, min_frac)
        return hg[None], hi_[None], hh[None], tot[None], non0[None]

    inner = shard_map(local, mesh=mesh, in_specs=(P("d"),) * 3,
                      out_specs=(P("d"),) * 5, check_vma=False)

    @jax.jit
    def step(vals, hasw, meta, cnt0, c_tot, c_non0, c_hist):
        hg, hi_, hh, tot, non0 = inner(vals, hasw, meta)

        def body(carry, xs):
            meta_j, hg_j, hi_j, hh_j, tot_j, non0_j = xs
            return _qv_fold_step(carry, meta_j, hg_j, hi_j, hh_j,
                                 tot_j, non0_j, ns, min_frac), None

        (cnt1, ct, cn, chh), _ = jax.lax.scan(
            body, (cnt0, c_tot, c_non0, c_hist),
            (meta, hg, hi_, hh, tot, non0))
        return cnt1, ct, cn, chh, tot, non0

    return step


class _MeshCountDriver:
    """Group-folding driver with the one-step-late overflow protocol:
    steps never donate; the route/table overflow flags of group i are
    checked just before dispatching group i+1, and on overflow the
    preserved pre-step state is grown (table) or the exchange capacity
    doubled (route) and the SAME group replayed (count.c's radix buffers
    never overflow because they are unbounded host vectors; here the
    fixed-capacity exchange needs the retry loop)."""

    def __init__(self, table, chunk, create_new=True, use_bloom=False,
                 put=None):
        self.t = table
        self.chunk = chunk
        self.create_new = create_new
        # put: host [D, 3, W] plane block -> device array over the
        # table's mesh.  The default covers the single-process mesh;
        # multihost passes _HostSlice.make_global (each process ships
        # only its addressable rows).
        self._put = put or (lambda rows: jax.device_put(
            jnp.asarray(rows), table.sh))
        self.M = chunk - table.k + 1
        self.C = default_route_cap(self.M, table.n_dev)
        self.bloom_cfg = None
        if use_bloom and table.bf is not None:
            self.bloom_cfg = (table.pre, table.bf_shift, table.bf_n_hash,
                              getattr(table, "bf_exact", False))
        self._steps = {}
        self._last = None
        # engine (table._pallas_mode semantics): per-chip Pallas
        # bitonic sort + merge-reduce under shard_map when opted in
        # (packed keys); for wide k >= 32 the r4 default per-chip
        # engine is wide pmerge — in-jit XLA u64 sort + the wide merge
        # kernel (build_mesh_presort_step(wide=True)); XLA sort-merge
        # otherwise (incl. every Bloom-gated mesh fold)
        import os

        from yak_tpu.ops.countstep import psort_enabled, wide_smoke_ok
        use_ps, ps_interp = psort_enabled(table.k <= 31)
        self.psort = (use_ps or ps_interp) and self.bloom_cfg is None
        self._interp = ps_interp
        self.wide = False
        if table.k > 31 and self.bloom_cfg is None:
            if os.environ.get("YAK_TPU_PMERGE_INTERPRET", "0") == "1":
                self.psort, self.wide, self._interp = True, True, True
            elif (jax.default_backend() == "tpu"
                    and os.environ.get("YAK_TPU_WIDE", "1") != "0"
                    and wide_smoke_ok(xla_sort=True)):
                self.psort, self.wide = True, True
        self._pstate = None       # chained per-chip merge plane-state

    def _step(self):
        key = (self.t.cap, self.C)
        if key not in self._steps:
            self._steps[key] = build_count_step(
                self.t.mesh, self.t.k, self.t.cap, self.chunk,
                route_cap=self.C, create_new=self.create_new,
                bloom_cfg=self.bloom_cfg)
        return self._steps[key]

    def _pre_step(self, from_planes):
        key = ("pre", self.t.cap, self.C, from_planes)
        if key not in self._steps:
            self._steps[key] = build_mesh_presort_step(
                self.t.mesh, self.t.k, self.t.cap, self.chunk, self.C,
                from_planes=from_planes, wide=self.wide)
        return self._steps[key]

    def _dispatch(self, planes_d):
        if self.psort:
            return self._dispatch_psort(planes_d)
        t = self.t
        prev = (t.keys, t.cnt, t.size, t.bf)
        args = (planes_d, t.keys, t.cnt, t.size)
        if self.bloom_cfg is not None:
            out = self._step()(*args, t.bf)
            t.keys, t.cnt, t.size, n_new, r_ovf, t_ovf, t.bf = out
        else:
            t.keys, t.cnt, t.size, n_new, r_ovf, t_ovf = \
                self._step()(*args)
        self._last = (prev, planes_d, r_ovf, t_ovf)

    def _dispatch_psort(self, planes_d):
        """Per-chip dispatch split mirroring table._run_step's psort /
        wide-pmerge engines: sharded pre-jit (extract + route +
        complement planes) -> per-chip Pallas bitonic sort (packed
        keys; wide planes leave the pre-jit already XLA-sorted) ->
        per-chip diagonal search + merge-reduce kernel (all under
        shard_map)."""
        from yak_tpu.ops import pallas_merge, pallas_sort

        t = self.t
        B = t.n_dev * self.C
        if self._pstate is None:
            prev = ("u64", t.keys, t.cnt, t.size)
            out7 = self._pre_step(False)(planes_d, t.keys, t.cnt,
                                         t.size)
            xhi, xlo, thi, tlo, tw, size11, r_ovf = out7
        else:
            prev = ("planes", self._pstate)
            xhi, xlo, r_ovf = self._pre_step(True)(planes_d)
            thi, tlo, tw, size11 = self._pstate[:4]
        if self.wide:
            Ehi, Elo = xhi, xlo
        else:
            Ehi, Elo = pallas_sort.sort_planes_mesh(
                t.mesh, xhi, xlo, neg_keys=True,
                interpret=self._interp)
        out = pallas_merge.merge_reduce_presorted_mesh(
            t.mesh, size11, thi, tlo, tw, Ehi, Elo, Na=t.cap, Nb=B,
            create=self.create_new, interpret=self._interp,
            wide=self.wide)
        self._pstate = out
        self._last = (prev, planes_d, r_ovf, out[3])

    def _restore(self, prev):
        t = self.t
        if self.psort:
            if prev[0] == "u64":
                t.keys, t.cnt, t.size = prev[1], prev[2], prev[3]
                self._pstate = None
            else:
                self._pstate = prev[1]
        else:
            t.keys, t.cnt, t.size, t.bf = prev

    def _materialize(self):
        """Settle the chained plane-state back into the u64 mesh table
        (one sharded dispatch; called at fold end and before growth)."""
        if self._pstate is None:
            return
        t = self.t
        fin = self._steps.get(("fin", t.cap))
        if fin is None:
            fin = mesh_finalize_psort(t.mesh, t.cap, wide=self.wide)
            self._steps[("fin", t.cap)] = fin
        t.keys, t.cnt, t.size = fin(*self._pstate[:4])
        self._pstate = None

    def _flags(self, r_ovf, t_ovf):
        """(route_ovf, table_ovf, tot) as host ints via ONE jitted
        global reduction with replicated outputs — every process of a
        multi-host mesh fetches identical scalars (the lockstep
        invariant), and the single-process mesh gets its three control
        scalars in one dispatch instead of three fetches."""
        if self.psort:
            fn = self._steps.get("flags_ps")
            if fn is None:
                @jax.jit
                def fn(r, s, cap):
                    s = s.reshape(-1)
                    # int64 sum: per-chip sizes fit int32 but the
                    # cross-chip total of a pod does not
                    return (jnp.max(r), jnp.max(s),
                            jnp.sum(jnp.minimum(s, cap)
                                    .astype(jnp.int64)))
                self._steps["flags_ps"] = fn
            r, smax, tot = fn(r_ovf, t_ovf, np.int32(self.t.cap))
            return int(r), int(smax) > self.t.cap, int(tot)
        fn = self._steps.get("flags")
        if fn is None:
            @jax.jit
            def fn(r, tvf, sizes):
                return (jnp.max(r), jnp.max(tvf),
                        jnp.sum(sizes.astype(jnp.int64)))
            self._steps["flags"] = fn
        r, tv, tot = fn(r_ovf, t_ovf, self.t.size)
        return int(r), bool(tv), int(tot)

    def push_group(self, code_chunks):
        self.settle()
        planes = _pack_group_planes(code_chunks, self.chunk,
                                    self.t.n_dev)
        self._dispatch(self._put(planes))

    def settle(self, final=False):
        if self._last is None:
            if final:
                self._materialize()
            return
        prev, planes_d, r_ovf, t_ovf = self._last
        self._last = None
        while True:
            r, tv, tot = self._flags(r_ovf, t_ovf)
            if not r and not tv:
                self.t.tot = tot
                if final:
                    self._materialize()
                return
            # restore the preserved pre-step state, adjust, replay
            t = self.t
            self._restore(prev)
            if r:
                self.C = min(self.M, self.C * 2)
            if tv:
                self._materialize()   # growth needs the u64 form
                t.grow(t.cap * 2)
            # the replay snapshot comes from _dispatch's own prev
            self._dispatch(planes_d)
            prev, planes_d, r_ovf, t_ovf = self._last
            self._last = None


def count_file_mesh(fn, opt, mesh, cap_log2=None, table=None,
                    create_new=None):
    """Count one file into a MeshTable (data-parallel ingest: the host
    packer deals plane-packed chunks round-robin to the chips).

    table=None -> create a fresh table (create-new mode, Bloom-gated if
    opt.bf_shift is set); otherwise increment-existing-only (pass 2 /
    recount, htab.c:71-75) unless create_new is overridden."""
    from yak_tpu.io.chunks import ChunkSource

    n_dev = mesh.devices.size
    cap_log2 = cap_log2 or opt.cap_log2
    if table is None:
        table = MeshTable(mesh, opt.k, opt.pre, cap_log2,
                          bf_shift=opt.bf_shift,
                          bf_n_hash=opt.bf_n_hash,
                          bf_exact=getattr(opt, "exact", False))
        create = True if create_new is None else create_new
    else:
        create = False if create_new is None else create_new
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    drv = _MeshCountDriver(table, chunk, create_new=create,
                           use_bloom=create)

    group = []
    for packed in ChunkSource(fn, chunk, opt.k, min_len=opt.k,
                              with_meta=False):
        group.append(packed)
        if len(group) == n_dev:
            drv.push_group(group)
            group = []
    if group:
        drv.push_group(group)
    drv.settle(final=True)
    return table


def count_mesh(files, opt, mesh, cap_log2=None):
    """Full `yak count` on a mesh including the `-b` two-pass protocol
    (main.c:53-60): Bloom-gated pass 1; destroy BF, zero counts; pass 2
    increments existing keys; shrink to counts >= 2.  Same-file inputs
    take the exact single-pass shortcut (models/count.count)."""
    import os

    from yak_tpu.models.count import _same_stream
    second0 = files[1] if len(files) >= 2 else files[0]
    if (opt.bf_shift > 0 and _same_stream(files[0], second0)
            and not os.environ.get("YAK_TPU_BLOOM_TWO_PASS")):
        from dataclasses import replace
        table = count_file_mesh(files[0], replace(opt, bf_shift=0),
                                mesh, cap_log2=cap_log2)
        table.shrink(2, 1023)
        return table
    table = count_file_mesh(files[0], opt, mesh, cap_log2=cap_log2)
    if opt.bf_shift > 0 and table.bf is not None:
        table.destroy_bf()
        table.clear_counts()
        second = files[1] if len(files) >= 2 else files[0]
        count_file_mesh(second, opt, mesh, table=table)
        table.shrink(2, 1023)
    return table
