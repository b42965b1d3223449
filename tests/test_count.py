"""Oracle differential tests for the count family (SURVEY §4: the
reference binary is the test oracle)."""

import gzip
import shutil

import numpy as np
import pytest

import util
from util import (make_genome, mutate_reads, to_fasta, to_fastq,
                  run_oracle, oracle_print_counts, kmer_to_string)

pytestmark = pytest.mark.skipif(not util.have_oracle(),
                                reason="reference oracle not built")


@pytest.fixture(scope="session")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("count")
    rng = np.random.default_rng(42)
    g = make_genome(rng, 20000)
    reads = mutate_reads(rng, g, 500, 120, err=0.005, n_rate=0.002)
    to_fasta(d / "reads.fa", reads)
    to_fastq(d / "reads.fq", reads)
    with open(d / "reads.fq", "rb") as fi, gzip.open(d / "reads.fq.gz", "wb") as fo:
        shutil.copyfileobj(fi, fo)
    seqs = [g[:3000], np.full(50, 4, np.int8), g[3000:3010], g[3000:4000]]
    to_fasta(d / "mixed.fa", seqs, line_len=60)
    return d


def _our_counts(fn, k, chunk=50000, bf_shift=0, second=None):
    from yak_tpu.models.count import count_file, CountOpts, count
    opt = CountOpts(k=k, chunk_size=chunk, cap_log2=12, bf_shift=bf_shift)
    if bf_shift:
        t = count([str(fn)] + ([str(second)] if second else []), opt)
    else:
        t = count_file(str(fn), opt)
    km, c = t.getseq()
    return {kmer_to_string(x, k): int(v) for x, v in zip(km, c)}, t


def _oracle_counts(args, out):
    run_oracle(list(args) + ["-o", str(out)])
    return oracle_print_counts(str(out))


@pytest.mark.parametrize("k", [17, 31])
def test_count_parity(data, k):
    ref = _oracle_counts(["count", f"-k{k}", "-K50000", data / "reads.fa"],
                         data / f"ref{k}.yak")
    ours, _ = _our_counts(data / "reads.fa", k)
    assert ours == ref


def test_count_gz_fastq(data):
    ref = _oracle_counts(["count", "-k21", "-K50000", data / "reads.fq.gz"],
                         data / "gz.yak")
    ours, _ = _our_counts(data / "reads.fq.gz", 21)
    assert ours == ref


def test_count_multiline_short_n(data):
    ref = _oracle_counts(["count", "-k31", "-K9000", data / "mixed.fa"],
                         data / "ml.yak")
    ours, _ = _our_counts(data / "mixed.fa", 31, chunk=9000)
    assert ours == ref


def test_halo_split_invariance(data):
    a, _ = _our_counts(data / "mixed.fa", 31, chunk=16384)
    b, _ = _our_counts(data / "mixed.fa", 31, chunk=300000)
    assert a == b


def test_long_k_parity(data):
    """k in [32,63] uses the inexact hash_long path (count.c:45-60)."""
    k = 33
    run_oracle(["count", f"-k{k}", "-K50000", "-o", str(data / "k33.yak"),
                data / "reads.fa"])
    from yak_tpu.models.count import count_file, CountOpts
    t = count_file(str(data / "reads.fa"), CountOpts(k=k, chunk_size=50000,
                                                     cap_log2=12))
    # print requires k<=31; compare histograms + dump set equality instead
    import yak_tpu.io.yakfmt as yakfmt
    t.dump(str(data / "k33_ours.yak"))
    _, _, h_ref, c_ref = yakfmt.restore_yak(str(data / "k33.yak"))
    _, _, h_our, c_our = yakfmt.restore_yak(str(data / "k33_ours.yak"))
    ref = dict(zip(h_ref.tolist(), c_ref.tolist()))
    our = dict(zip(h_our.tolist(), c_our.tolist()))
    assert our == ref


def test_long_k_parity_psort(data, monkeypatch):
    """k=33 on the wide psort engine (interpret mode): raw 64-bit keys
    through the bitonic sort + wide merge kernel vs the oracle."""
    monkeypatch.setenv("YAK_TPU_PSORT_INTERPRET", "1")
    k = 33
    run_oracle(["count", f"-k{k}", "-K50000", "-o",
                str(data / "k33ps.yak"), data / "reads.fa"])
    from yak_tpu.models.count import count_file, CountOpts
    t = count_file(str(data / "reads.fa"),
                   CountOpts(k=k, chunk_size=50000, cap_log2=12))
    import yak_tpu.io.yakfmt as yakfmt
    t.dump(str(data / "k33ps_ours.yak"))
    _, _, h_ref, c_ref = yakfmt.restore_yak(str(data / "k33ps.yak"))
    _, _, h_our, c_our = yakfmt.restore_yak(str(data / "k33ps_ours.yak"))
    assert (dict(zip(h_our.tolist(), c_our.tolist()))
            == dict(zip(h_ref.tolist(), c_ref.tolist())))


def test_long_k_parity_wide_pmerge(data, monkeypatch):
    """k=33 on the r4 default wide pmerge engine (interpret mode): raw
    64-bit keys via the in-jit XLA u64 sort + the wide merge kernel
    (countstep.get_count_wide_step) vs the oracle — incl. the overflow
    replay (cap_log2=12 undershoots, so the fold grows and replays
    through the wide u64-twin step)."""
    monkeypatch.setenv("YAK_TPU_PMERGE_INTERPRET", "1")
    k = 33
    run_oracle(["count", f"-k{k}", "-K50000", "-o",
                str(data / "k33wp.yak"), data / "reads.fa"])
    from yak_tpu.models.count import count_file, CountOpts
    t = count_file(str(data / "reads.fa"),
                   CountOpts(k=k, chunk_size=50000, cap_log2=12))
    import yak_tpu.io.yakfmt as yakfmt
    t.dump(str(data / "k33wp_ours.yak"))
    _, _, h_ref, c_ref = yakfmt.restore_yak(str(data / "k33wp.yak"))
    _, _, h_our, c_our = yakfmt.restore_yak(str(data / "k33wp_ours.yak"))
    assert (dict(zip(h_our.tolist(), c_our.tolist()))
            == dict(zip(h_ref.tolist(), c_ref.tolist())))


def test_long_k_bloom_wide_pmerge(data, monkeypatch):
    """k=33 -b two-pass on the wide pmerge engine: the Bloom gate runs
    as a separate dispatch on the XLA-sorted planes
    (get_bloom_gate_post(wide=True)) — parity vs the oracle."""
    monkeypatch.setenv("YAK_TPU_PMERGE_INTERPRET", "1")
    monkeypatch.setenv("YAK_TPU_BLOOM_TWO_PASS", "1")  # exercise the gate
    k = 33
    run_oracle(["count", "-b18", f"-k{k}", "-K50000", "-o",
                str(data / "k33wb.yak"), data / "reads.fa"])
    from yak_tpu.models.count import count, CountOpts
    t = count([str(data / "reads.fa")],
              CountOpts(k=k, chunk_size=50000, cap_log2=12, bf_shift=18))
    import yak_tpu.io.yakfmt as yakfmt
    t.dump(str(data / "k33wb_ours.yak"))
    _, _, h_ref, c_ref = yakfmt.restore_yak(str(data / "k33wb.yak"))
    _, _, h_our, c_our = yakfmt.restore_yak(str(data / "k33wb_ours.yak"))
    assert (dict(zip(h_our.tolist(), c_our.tolist()))
            == dict(zip(h_ref.tolist(), c_ref.tolist())))


def test_dump_restore_interop(data):
    ref = _oracle_counts(["count", "-k17", "-K50000", data / "reads.fa"],
                         data / "int_ref.yak")
    ours, t = _our_counts(data / "reads.fa", 17)
    t.dump(str(data / "int_ours.yak"))
    # oracle reads our dump
    assert oracle_print_counts(str(data / "int_ours.yak")) == ref
    # we read the oracle's dump
    from yak_tpu.table import KmerTable
    t2 = KmerTable.restore(str(data / "int_ref.yak"))
    km, c = t2.getseq()
    assert {kmer_to_string(x, 17): int(v) for x, v in zip(km, c)} == ref


@pytest.mark.parametrize("bshift", [18, 20])
@pytest.mark.parametrize("protocol", [False, True])
def test_bloom_two_pass(data, bshift, protocol, monkeypatch):
    # b18 with pre=10: per-shard filter < one block -> yak_bf_init NULL,
    # ungated two-pass (bbf.c:9); b20: real Bloom gating.
    # protocol=False: same-file inputs take the exact single-pass
    # shortcut (models/count.count); True forces the literal two-pass.
    if protocol:
        monkeypatch.setenv("YAK_TPU_BLOOM_TWO_PASS", "1")
    ref = _oracle_counts(["count", "-k21", f"-b{bshift}", "-K50000",
                          data / "reads.fa", data / "reads.fa"],
                         data / f"bf{bshift}_ref.yak")
    ours, _ = _our_counts(data / "reads.fa", 21, bf_shift=bshift,
                          second=data / "reads.fa")
    assert ours == ref


def test_bloom_two_pass_pmerge(data, monkeypatch):
    """The -b protocol end-to-end on the cheap-gate pmerge engine
    (interpret mode): ONE in-jit packed XLA sort + Bloom gate post on
    the sorted stream + bw-weighted merge kernel
    (countstep.get_count_bloom_step) vs the oracle."""
    monkeypatch.setenv("YAK_TPU_PMERGE_INTERPRET", "1")
    monkeypatch.setenv("YAK_TPU_BLOOM_TWO_PASS", "1")  # exercise the gate
    ref = _oracle_counts(["count", "-k21", "-b20", "-K50000",
                          data / "reads.fa", data / "reads.fa"],
                         data / "bfpm_ref.yak")
    ours, _ = _our_counts(data / "reads.fa", 21, bf_shift=20,
                          second=data / "reads.fa")
    assert ours == ref


def test_bloom_two_pass_psort(data, monkeypatch):
    """The -b protocol end-to-end on the psort engine (interpret mode):
    sort-first dedup + Bloom gate + weighted merge vs the oracle."""
    monkeypatch.setenv("YAK_TPU_PSORT_INTERPRET", "1")
    monkeypatch.setenv("YAK_TPU_BLOOM_TWO_PASS", "1")  # exercise the gate
    ref = _oracle_counts(["count", "-k21", "-b20", "-K50000",
                          data / "reads.fa", data / "reads.fa"],
                         data / "bfps_ref.yak")
    ours, _ = _our_counts(data / "reads.fa", 21, bf_shift=20,
                          second=data / "reads.fa")
    assert ours == ref


def test_recount(data):
    run_oracle(["count", "-k17", "-K50000", "-o", str(data / "rc_base.yak"),
                data / "reads.fa"])
    run_oracle(["recount", "-o", str(data / "rc_ref.yak"),
                data / "rc_base.yak", data / "mixed.fa"])
    from yak_tpu.table import KmerTable
    from yak_tpu.models.count import recount
    t = KmerTable.restore(str(data / "rc_base.yak"))
    recount(str(data / "mixed.fa"), t)
    t.dump(str(data / "rc_ours.yak"))
    assert (oracle_print_counts(str(data / "rc_ours.yak"))
            == oracle_print_counts(str(data / "rc_ref.yak")))
