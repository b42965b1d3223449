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


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from yak_tpu.parallel.mesh import (MeshTable, _MeshCountDriver,
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
    hs = _HostSlice(mesh)
    # The single-host group driver runs unchanged over the global mesh:
    # the psort engine's per-chip Pallas dispatches and the XLA
    # fallback are both plain SPMD programs, control flags come back as
    # replicated scalars (_MeshCountDriver._flags), and the only
    # multihost-specific piece is shipping each process's OWN plane
    # rows (hs.make_global).
    drv = _MeshCountDriver(table, chunk, create_new=create,
                           use_bloom=create, put=hs.make_global)

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
