"""Multi-host scaling: jax.distributed + per-host data-parallel ingest
(SURVEY §5 "distributed communication backend").

The single-host mesh (parallel/mesh.py) generalizes unchanged: the SAME
shard_map count step runs SPMD over a GLOBAL mesh spanning every
process's devices — chip d still owns hash subspace {h : h & (N-1) == d}
and the all_to_all radix exchange rides ICI within a slice / DCN across
hosts, exactly as the blueprint prescribes (htab.c:53-56's shard
partition scaled out).

Ingest is data-parallel per host (the reference's analogue: one reader
thread feeding all workers, count.c:88-110, becomes one reader PER
host): every host streams the same input from shared storage with the
identical deterministic packer, keeps only the group rows of its OWN
local devices, and assembles the global [D, 3, W] plane batch with
jax.make_array_from_single_device_arrays.  All control decisions
(growth, route capacity, group count) derive from fully-REPLICATED
overflow flags (psum'd inside the jit), so every process takes the same
branch — lockstep by construction, no out-of-band coordination.

Tested with real multi-process workers over a loopback coordinator
(tests/test_multihost.py): N-process output == single-process output
byte-for-byte.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from yak_tpu.parallel.mesh import (MeshTable, _pack_group_planes,
                                   build_count_step, default_route_cap,
                                   make_mesh)


def init_multihost(coordinator_address, num_processes, process_id,
                   platform=None):
    """Initialize jax.distributed (idempotent-ish helper).  On TPU pods
    the three arguments are auto-detected and may be None."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh():
    """1-D mesh over every device of every process."""
    return make_mesh(devices=jax.devices())


def _wrap_global(step):
    """Wrap a build_count_step program so its control outputs come back
    fully replicated: every process fetches the same flag scalars and
    takes the same growth/retry branch."""

    @jax.jit
    def g(planes, keys, cnt, size, *bf):
        out = step(planes, keys, cnt, size, *bf)
        keys2, cnt2, size2, n_new, r_ovf, t_ovf = out[:6]
        rest = out[6:]
        return (keys2, cnt2, size2, jnp.sum(n_new),
                jnp.max(r_ovf), jnp.max(t_ovf)) + rest

    return g


class _HostSlice:
    """Local-device bookkeeping for assembling global plane batches."""

    def __init__(self, mesh):
        self.mesh = mesh
        devs = list(mesh.devices.reshape(-1))
        self.n_global = len(devs)
        self.local = [(i, d) for i, d in enumerate(devs)
                      if d.process_index == jax.process_index()]
        self.sh = NamedSharding(mesh, P("d"))

    def make_global(self, rows_np):
        """rows_np: full [D, ...] host batch (every host computes the
        same one); ship only this host's rows."""
        shards = [jax.device_put(jnp.asarray(rows_np[i:i + 1]), d)
                  for i, d in self.local]
        return jax.make_array_from_single_device_arrays(
            rows_np.shape, self.sh, shards)


def count_file_multihost(fn, opt, mesh=None, cap_log2=None, table=None,
                         create_new=None):
    """Count one file over a multi-host global mesh.

    Every host streams `fn` (shared storage) through the deterministic
    packer; chunk i of a group feeds global device i.  Returns the
    sharded MeshTable (use .items()/.dump() on any process — the final
    gather replicates over DCN)."""
    from yak_tpu.io.chunks import ChunkSource

    mesh = mesh or global_mesh()
    n_dev = mesh.devices.size
    cap_log2 = cap_log2 or opt.cap_log2
    if table is None:
        table = MeshTable(mesh, opt.k, opt.pre, cap_log2,
                          bf_shift=opt.bf_shift,
                          bf_n_hash=opt.bf_n_hash)
        create = True if create_new is None else create_new
    else:
        create = False if create_new is None else create_new
    chunk = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    chunk = -(-chunk // 1024) * 1024
    M = chunk - opt.k + 1
    hs = _HostSlice(mesh)
    bloom_cfg = None
    if create and table.bf is not None:
        bloom_cfg = (table.pre, table.bf_shift, table.bf_n_hash)

    state = {"C": default_route_cap(M, n_dev), "steps": {}}

    def get_step():
        key = (table.cap, state["C"])
        if key not in state["steps"]:
            raw = build_count_step(mesh, opt.k, table.cap, chunk,
                                   route_cap=state["C"],
                                   create_new=create,
                                   bloom_cfg=bloom_cfg)
            state["steps"][key] = _wrap_global(raw)
        return state["steps"][key]

    def run_group(code_chunks):
        planes = _pack_group_planes(code_chunks, chunk, n_dev)
        planes_g = hs.make_global(planes)
        while True:
            prev = (table.keys, table.cnt, table.size, table.bf)
            args = (planes_g, table.keys, table.cnt, table.size)
            if bloom_cfg is not None:
                out = get_step()(*args, table.bf)
                (table.keys, table.cnt, table.size, n_new, r_ovf,
                 t_ovf, table.bf) = out
            else:
                (table.keys, table.cnt, table.size, n_new, r_ovf,
                 t_ovf) = get_step()(*args)
            # replicated scalars: identical on every process
            r = int(r_ovf)
            tv = bool(t_ovf)
            if not r and not tv:
                table.tot += int(n_new)
                return
            table.keys, table.cnt, table.size, table.bf = prev
            if r:
                state["C"] = min(M, state["C"] * 2)
            if tv:
                table.grow(table.cap * 2)

    group = []
    for packed in ChunkSource(fn, chunk, opt.k, min_len=opt.k,
                              with_meta=False):
        group.append(packed.codes)
        if len(group) == n_dev:
            run_group(group)
            group = []
    if group:
        run_group(group)
    return table
