"""Multi-host test worker: one process of an N-process CPU 'pod'.

Usage: python mh_worker.py <coordinator> <nprocs> <pid> <reads.fa> <out.npz>
Counts the reads over the global mesh (per-host DP ingest) and, on
process 0, writes the gathered (hash, count) pairs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))           # repo root (yak_tpu package)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    coord, nprocs, pid, reads_fa, out_npz = sys.argv[1:6]
    # distributed init must precede anything that touches the backend
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nprocs),
                               process_id=int(pid))
    from yak_tpu.parallel.multihost import (count_file_multihost,
                                            global_mesh)

    assert jax.process_count() == int(nprocs)
    mesh = global_mesh()

    from yak_tpu.models.count import CountOpts
    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=10,
                    bf_shift=int(os.environ.get("MH_BF_SHIFT", "0")))
    table = count_file_multihost(reads_fa, opt, mesh)
    if opt.bf_shift:
        table.destroy_bf()
        table.clear_counts()
        count_file_multihost(reads_fa, opt, mesh, table=table)
        table.shrink(2, 1023)
    h, c = table.items()          # replicated gather
    o = np.argsort(h)
    if int(pid) == 0:
        np.savez(out_npz, h=h[o], c=c[o], cap=table.cap)
    print(f"[mh_worker {pid}] done: {len(h)} keys, cap {table.cap}",
          flush=True)


if __name__ == "__main__":
    main()
