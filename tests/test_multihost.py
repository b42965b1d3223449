"""Multi-host tests: REAL multi-process workers (jax.distributed over a
loopback coordinator, 2 processes x 4 virtual CPU devices = one 8-device
global mesh) must reproduce the single-process result byte-for-byte —
the SURVEY §5 multi-host seam (per-host DP ingest + global radix
exchange) exercised end to end, including table growth from a tiny
initial capacity (the replicated-flag lockstep)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import util


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_workers(nprocs, reads, out, env_extra=None):
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra or {})
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(nprocs), str(i),
         str(reads), str(out)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(nprocs)]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o.decode())
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"


@pytest.mark.parametrize("bf_shift,psort", [(0, False), (20, False),
                                            (0, True)],
                         ids=["xla", "bloom", "psort"])
def test_two_process_count_equals_single(tmp_path, bf_shift, psort):
    rng = np.random.default_rng(21)
    genome = util.make_genome(rng, 20_000)
    reads = util.mutate_reads(rng, genome, 600, 120, err=0.005,
                              n_rate=0.002)
    util.to_fasta(tmp_path / "reads.fa", reads)

    out = tmp_path / "mh.npz"
    env = {"MH_BF_SHIFT": str(bf_shift)}
    if psort:
        # the per-chip Pallas engine (bitonic sort + merge-reduce) over
        # the 2-process global mesh, kernels in interpret mode
        env["YAK_TPU_PSORT_INTERPRET"] = "1"
    _run_workers(2, tmp_path / "reads.fa", out, env_extra=env)
    got = np.load(out)
    # growth really ran: cap_log2=10 cannot hold ~15k distinct keys
    assert int(got["cap"]) > (1 << 10)

    from yak_tpu.models.count import CountOpts, count_file
    single = count_file(str(tmp_path / "reads.fa"),
                        CountOpts(k=17, chunk_size=1 << 14, cap_log2=12))
    if bf_shift:
        # exact counts >= 2 (the -b protocol's final output)
        single.shrink(2, 1023)
    h, c = single.items()
    o = np.argsort(h)
    np.testing.assert_array_equal(got["h"], h[o])
    np.testing.assert_array_equal(got["c"], c[o])
