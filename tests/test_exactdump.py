"""Byte-exact `.yak` dump parity (io/exactdump.py + native/khlayout.cpp).

Closes the BASELINE "exact .yak-table parity" north star: with `-X` the
dump reproduces the reference's khashl slot order byte-for-byte
(htab.c:373-394, khashl.h put/resize layout), for plain counts, the -b
two-pass protocol, and k>=32 hash_long tables.  The exact path also
cross-checks the host replay against the device table, so each test
doubles as an independent host-vs-framework end-to-end validation.
"""
import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

import util
from util import (have_oracle, run_oracle, make_genome, mutate_reads,
                  to_fasta, to_fastq)

pytestmark = pytest.mark.skipif(not have_oracle(),
                                reason="reference oracle not built")

needs_native = pytest.mark.skipif(
    os.environ.get("YAK_TPU_NO_NATIVE") == "1",
    reason="native lib disabled")


def _our_cli(args):
    from yak_tpu import cli
    rc = cli.main(args)
    assert rc in (0, None), rc


def _assert_bytes_equal(ours, ref):
    a, b = open(ours, "rb").read(), open(ref, "rb").read()
    assert a == b, (f"dump differs: {len(a)} vs {len(b)} bytes, first "
                    f"diff at {next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), min(len(a), len(b)))}")


@pytest.fixture(scope="module")
def reads_fa(tmp_path_factory):
    d = tmp_path_factory.mktemp("exactdump")
    rng = np.random.default_rng(77)
    genome = make_genome(rng, 30000)
    reads = list(mutate_reads(rng, genome, 1200, 110, err=0.01,
                              n_rate=0.01))
    # a few short (< k) records exercise the `l < k` skip (count.c:94)
    reads += [reads[0][:9], reads[1][:31]]
    fa = str(d / "reads.fa")
    to_fasta(fa, reads, line_len=61)
    reads2 = mutate_reads(rng, genome, 900, 95, err=0.02)
    fq = str(d / "reads2.fq.gz")
    to_fastq(str(d / "reads2.fq"), reads2)
    with open(str(d / "reads2.fq"), "rb") as f, gzip.open(fq, "wb") as g:
        g.write(f.read())
    return d, fa, fq


@needs_native
def test_exact_dump_plain_k17(reads_fa):
    d, fa, _ = reads_fa
    ref, ours = str(d / "p_ref.yak"), str(d / "p_ours.yak")
    run_oracle(["count", "-k17", "-K71331", "-o", ref, fa])
    _our_cli(["count", "-k17", "-X", "-o", ours, fa])
    _assert_bytes_equal(ours, ref)


@needs_native
def test_exact_dump_gz_fastq_env_gate(reads_fa, monkeypatch):
    d, _, fq = reads_fa
    ref, ours = str(d / "q_ref.yak"), str(d / "q_ours.yak")
    run_oracle(["count", "-k19", "-o", ref, fq])
    monkeypatch.setenv("YAK_TPU_EXACT_DUMP", "1")
    _our_cli(["count", "-k19", "-o", ours, fq])
    _assert_bytes_equal(ours, ref)


@needs_native
@pytest.mark.parametrize("bshift", [
    20,   # real gating: per-shard 2^10-bit filters, DENSE — cross-key
          # same-chunk false positives flip pass-1 membership, which the
          # serial-exact device gate (ops/bloom rank path) reproduces
    18,   # per-shard shift 8 < YAK_BLK_SHIFT: yak_bf_init returns NULL,
          # both passes run ungated (bbf.c:9) — the protocol still
          # clears + re-counts + shrinks
])
def test_exact_dump_bloom_two_pass(reads_fa, bshift):
    d, fa, fq = reads_fa
    ref = str(d / f"b{bshift}_ref.yak")
    ours = str(d / f"b{bshift}_ours.yak")
    run_oracle(["count", f"-b{bshift}", "-k17", "-o", ref, fa, fq])
    _our_cli(["count", f"-b{bshift}", "-k17", "-X", "-o", ours, fa, fq])
    _assert_bytes_equal(ours, ref)


@needs_native
def test_exact_dump_bloom_gz_first(reads_fa):
    """Two-file -b -X with the GZIPPED FASTQ as the pass-1 stream (the
    serial-exact gate rides the gz ingest path)."""
    d, fa, fq = reads_fa
    ref, ours = str(d / "bg_ref.yak"), str(d / "bg_ours.yak")
    run_oracle(["count", "-b20", "-k19", "-o", ref, fq, fa])
    _our_cli(["count", "-b20", "-k19", "-X", "-o", ours, fq, fa])
    _assert_bytes_equal(ours, ref)


@needs_native
def test_exact_dump_k33_wide(reads_fa):
    d, fa, _ = reads_fa
    ref, ours = str(d / "w_ref.yak"), str(d / "w_ours.yak")
    run_oracle(["count", "-k33", "-o", ref, fa])
    _our_cli(["count", "-k33", "-X", "-o", ours, fa])
    _assert_bytes_equal(ours, ref)


@needs_native
def test_exact_dump_cross_check_catches_mismatch(reads_fa):
    """The exact path must refuse to write when the replayed files do
    not match the table (wrong provenance must raise, not mis-dump)."""
    d, fa, fq = reads_fa
    from yak_tpu.models.count import count_file, CountOpts
    from yak_tpu.io.exactdump import dump_yak_exact
    t = count_file(fa, CountOpts(k=17, chunk_size=50000))
    with pytest.raises(ValueError, match="cross-check"):
        dump_yak_exact(str(d / "x.yak"), t, [fq])


@needs_native
def test_default_dump_same_content_different_bytes(reads_fa):
    """Sanity: the default (sorted) dump holds identical content —
    reference `yak print` rows match — even though bytes differ."""
    d, fa, _ = reads_fa
    ref, ours = str(d / "p_ref.yak"), str(d / "s_ours.yak")
    if not os.path.exists(ref):
        run_oracle(["count", "-k17", "-K71331", "-o", ref, fa])
    _our_cli(["count", "-k17", "-o", ours, fa])
    assert (util.oracle_print_counts(ours)
            == util.oracle_print_counts(ref))
