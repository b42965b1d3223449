"""Multi-chip scaling: mesh-sharded tables + all-to-all hash routing.

The reference's scale-out seam is its radix partition: every k-mer is
routed by low hash bits to one of 2^pre disjoint sub-tables, one owner
thread per shard (count.c:17-26, htab.c:53-56; SURVEY §2.3.3).  The
TPU-native generalization: a 1-D `jax.sharding.Mesh` over N chips, where
chip d owns the hash subspace {h : h & (N-1) == d} — a refinement
compatible with the `pre`-bit shard layout (pre >= log2 N), so per-shard
dump contents are chip-count-invariant.

One count step, inside shard_map:
  1. each chip extracts canonical k-mer hashes from its local flat code
     chunk (pure VPU bit-ops — data parallel ingest);
  2. hashes are bucketed by owner chip and exchanged with ONE
     lax.all_to_all over ICI (fixed per-destination capacity, overflow
     flagged for host retry);
  3. each chip sort-merges the received hashes into its own sorted HBM
     table slice (ops/sorttable.py) — no cross-chip races by
     construction, exactly the "one owner per shard" discipline of the
     reference, so N-chip output == 1-chip output bit-for-bit.

The owner-bucketing itself is sort-based (sort by owner, rank within
bucket from a running offset), keeping the whole step scatter-light.

Histograms and QV count vectors reduce with psum (generalizing the
per-thread reductions at htab.c:164-167, qv.c:128-133).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from yak_tpu.ops import sorttable as st
from yak_tpu.ops.kmers import extract_kmer_hashes


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if n & (n - 1):
        raise ValueError("mesh size must be a power of two (hash routing)")
    return Mesh(np.array(devices[:n]), ("d",))


class MeshTable:
    """A counting table sharded over a 1-D mesh: chip d owns hashes with
    h & (N-1) == d.  keys/cnt/size have a leading device axis on 'd'."""

    def __init__(self, mesh, k, pre=10, cap_log2=16):
        self.mesh = mesh
        self.k = k
        self.pre = pre
        self.cap_log2 = cap_log2  # per-device slots (log2)
        n = mesh.devices.size
        self.n_dev = n
        sh = NamedSharding(mesh, P("d"))
        self.keys = jax.device_put(
            jnp.zeros((n, 1 << cap_log2), jnp.uint64), sh)
        self.cnt = jax.device_put(
            jnp.full((n, 1 << cap_log2), -1, jnp.int32), sh)
        self.size = jax.device_put(jnp.zeros((n,), jnp.int32), sh)
        self.tot = 0

    def items(self):
        """Host (hash, count) pairs over all shards."""
        k_np = np.asarray(self.keys)
        c_np = np.asarray(self.cnt)
        s_np = np.asarray(self.size)
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


def build_count_step(mesh, k, cap_log2, chunk, route_cap=None,
                     create_new=True):
    """Compile the sharded count step.

    Args (static): chunk = per-device flat code buffer length;
    route_cap = per-(src,dst) exchange capacity (defaults to the safe
    bound = windows per chunk, which cannot overflow).

    Returns step(codes[D, chunk], keys[D, capd], cnt[D, capd], size[D])
      -> (keys, cnt, size, n_new[D], route_overflow[D], table_overflow[D]).
    """
    n_dev = mesh.devices.size
    M = chunk - k + 1
    C = route_cap or M  # safe default: no overflow possible

    def local_step(codes, keys, cnt, size):
        # codes: [1, chunk]; keys/cnt: [1, capd]; size: [1]
        h, valid = extract_kmer_hashes(codes, k)
        h, valid = h.reshape(-1), valid.reshape(-1)
        if n_dev > 1:
            owner = jnp.where(
                valid, (h & jnp.uint64(n_dev - 1)).astype(jnp.uint32),
                jnp.uint32(n_dev))
            owner_s, h_s = jax.lax.sort((owner, h), num_keys=1, is_stable=False)
            # rank within bucket = lane - first lane of the bucket
            lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
            is_first = jnp.concatenate(
                [jnp.ones(1, bool), owner_s[1:] != owner_s[:-1]])
            bucket_start = jax.lax.cummax(jnp.where(is_first, lane, -1))
            rank = lane - bucket_start
            ok = (owner_s < n_dev) & (rank < C)
            overflow = jnp.sum((owner_s < n_dev) & (rank >= C),
                               dtype=jnp.int32)
            slot = jnp.where(ok, owner_s.astype(jnp.int32) * C + rank,
                             n_dev * C)
            send_h = jnp.zeros(n_dev * C, jnp.uint64).at[slot].set(
                h_s, mode="drop")
            send_v = jnp.zeros(n_dev * C, bool).at[slot].set(
                ok, mode="drop")
            recv_h = jax.lax.all_to_all(send_h.reshape(n_dev, C), "d",
                                        split_axis=0, concat_axis=0,
                                        tiled=True).reshape(-1)
            recv_v = jax.lax.all_to_all(send_v.reshape(n_dev, C), "d",
                                        split_axis=0, concat_axis=0,
                                        tiled=True).reshape(-1)
        else:
            recv_h, recv_v = h, valid
            overflow = jnp.int32(0)
        add = jnp.ones(recv_h.shape, jnp.int32)
        keys2, cnt2, size2, n_new, toverflow = st.merge_batch(
            keys.reshape(-1), cnt.reshape(-1), size.reshape(()),
            recv_h, add, recv_v, mode=st.ADD, create=create_new,
            packable=k <= 31)
        return (keys2[None, :], cnt2[None, :], size2[None], n_new[None],
                overflow[None], toverflow[None])

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P("d")),
        out_specs=(P("d"),) * 6,
        check_rep=False)
    return jax.jit(step, donate_argnums=(1, 2))


def build_lookup_step(mesh, k, chunk, route_cap=None):
    """Compile the sharded scan step (the lookup-side workloads):
    data-parallel extract -> all_to_all route each hash to its owner
    chip -> local sorted-table lookup -> all_to_all the values back ->
    restore original lane order.

    Returns step(codes[D, chunk], keys[D, capd], cnt[D, capd], size[D])
      -> (vals[D, M] int32 (-1 = absent), has_window[D, M] bool,
          route_overflow[D]).
    """
    n_dev = mesh.devices.size
    M = chunk - k + 1
    C = route_cap or M

    def local_step(codes, keys, cnt, size):
        h, valid = extract_kmer_hashes(codes, k)
        h, valid = h.reshape(-1), valid.reshape(-1)
        if n_dev == 1:
            vals = st.lookup_impl(keys.reshape(-1), cnt.reshape(-1),
                                  size.reshape(()), h, valid,
                                  packable=k <= 31)
            return (vals[None, :], valid[None, :], jnp.zeros(1, jnp.int32))

        owner = jnp.where(
            valid, (h & jnp.uint64(n_dev - 1)).astype(jnp.uint32),
            jnp.uint32(n_dev))
        idx = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
        owner_s, h_s, idx_s = jax.lax.sort((owner, h, idx), num_keys=1, is_stable=False)
        lane = jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
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
        vals = st.lookup_impl(keys.reshape(-1), cnt.reshape(-1),
                              size.reshape(()), recv_h, recv_v,
                              packable=k <= 31)
        back = jax.lax.all_to_all(vals.reshape(n_dev, C), "d",
                                  split_axis=0, concat_axis=0,
                                  tiled=True).reshape(-1)
        # sorted lane -> its routed value; unsort to original lane order
        v_sorted = jnp.where(ok, back[jnp.minimum(slot, n_dev * C - 1)], -1)
        _, v_orig = jax.lax.sort((idx_s, v_sorted), num_keys=1, is_stable=False)
        return (v_orig[None, :], valid[None, :], overflow[None])

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P("d")),
        out_specs=(P("d"), P("d"), P("d")),
        check_rep=False)
    return jax.jit(step)


def count_file_mesh(fn, opt, mesh, cap_log2=None):
    """Count one file into a fresh MeshTable (data-parallel ingest:
    the host packer deals flat chunks round-robin to the chips)."""
    from yak_tpu.io.chunks import ChunkSource

    n_dev = mesh.devices.size
    cap_log2 = cap_log2 or opt.cap_log2
    table = MeshTable(mesh, opt.k, opt.pre, cap_log2)
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    step = build_count_step(mesh, opt.k, cap_log2, chunk)
    sh = NamedSharding(mesh, P("d"))

    group = []
    for packed in ChunkSource(fn, chunk, opt.k, min_len=opt.k,
                              with_meta=False):
        group.append(packed.codes)
        if len(group) == n_dev:
            table = _apply(step, table, group, sh)
            group = []
    if group:
        while len(group) < n_dev:
            group.append(np.full(chunk, 4, np.uint8))
        table = _apply(step, table, group, sh)
    return table


def _apply(step, table, group, sh):
    codes = jax.device_put(np.stack(group), sh)
    keys, cnt, size, n_new, r_ovf, t_ovf = step(codes, table.keys, table.cnt,
                                                table.size)
    if int(jnp.max(r_ovf)):
        raise RuntimeError("all_to_all route capacity overflow")
    if bool(jnp.max(t_ovf)):
        raise RuntimeError("per-device table overflow (raise cap_log2)")
    table.keys, table.cnt, table.size = keys, cnt, size
    table.tot += int(np.asarray(n_new).sum())
    return table
