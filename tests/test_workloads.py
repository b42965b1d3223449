"""Oracle differential tests for the lookup-side workloads: exact stdout
parity against the reference binary (single-threaded for deterministic
row order; the reference's worker printf order is thread-interleaved)."""

import io
import os
import shutil
import subprocess
from contextlib import redirect_stdout

import numpy as np
import pytest

import util
from util import make_genome, mutate_reads, to_fasta, run_oracle

pytestmark = pytest.mark.skipif(not util.have_oracle(),
                                reason="reference oracle not built")

FIXED_ORACLE = os.path.join(os.path.dirname(__file__), ".oracle",
                            "yak-fixed-inspect")


def ours(args):
    from yak_tpu.cli import main as cli
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli([str(a) for a in args])
    assert rc == 0
    return buf.getvalue()


@pytest.fixture(scope="session")
def trio(tmp_path_factory):
    """Synthetic trio: two parental haplotypes + child contigs."""
    d = tmp_path_factory.mktemp("trio")
    rng = np.random.default_rng(11)
    base = make_genome(rng, 40000)
    pat, mat = base.copy(), base.copy()
    for hap in (pat, mat):
        idx = rng.choice(len(base), 150, replace=False)
        hap[idx] = (hap[idx] + rng.integers(1, 4, 150)) % 4
    to_fasta(d / "pat_reads.fa", mutate_reads(rng, pat, 8000, 100, err=0.002))
    to_fasta(d / "mat_reads.fa", mutate_reads(rng, mat, 8000, 100, err=0.002))
    child = [pat[:15000], mat[15000:30000],
             np.concatenate([pat[30000:35000], mat[35000:40000]])]
    to_fasta(d / "child.fa", child, names=["ctgP", "ctgM", "ctgX"])
    run_oracle(["count", "-k21", "-K2000000", "-o", d / "pat.yak",
                d / "pat_reads.fa"])
    run_oracle(["count", "-k21", "-K2000000", "-o", d / "mat.yak",
                d / "mat_reads.fa"])
    return d


@pytest.fixture(scope="session")
def qvdata(tmp_path_factory):
    d = tmp_path_factory.mktemp("qv")
    rng = np.random.default_rng(5)
    g = make_genome(rng, 100000)
    to_fasta(d / "sr.fa", mutate_reads(rng, g, 25000, 120, err=0.01))
    asm = g.copy()
    errpos = rng.choice(len(g), 40, replace=False)
    asm[errpos] = (asm[errpos] + 1) % 4
    to_fasta(d / "asm.fa", [asm], names=["ctg1"])
    # mix: long spanning contigs interleaved with short seqs (some of
    # them junk that fails the min_frac gate, some shorter than k)
    junk = make_genome(rng, 400)
    mix = [asm[:50000], junk[:300], asm[50000:],
           np.asarray(g[:15], np.int8), junk[300:],
           asm[20000:90000]]
    to_fasta(d / "mix.fa", mix,
             names=["c1", "junkA", "c2", "tiny", "junkB", "c3"])
    run_oracle(["count", "-k21", "-K5000000", "-o", d / "sr.yak", d / "sr.fa"])
    return d


def test_qv_assembly(qvdata):
    ref = run_oracle(["qv", qvdata / "sr.yak", qvdata / "asm.fa"])
    assert ours(["qv", qvdata / "sr.yak", qvdata / "asm.fa"]) == ref


def test_qv_reads_print_each(qvdata):
    ref = run_oracle(["qv", "-p", "-t1", qvdata / "sr.yak", qvdata / "sr.fa"])
    assert ours(["qv", "-p", qvdata / "sr.yak", qvdata / "sr.fa"]) == ref


def test_qv_chunk_spanning_carry(qvdata):
    """Tiny -K forces the 100kb contig across many chunks: exercises the
    fused path's head/tail region carry (a spanning seq must be gated on
    its COMPLETED totals, not per chunk)."""
    ref = run_oracle(["qv", qvdata / "sr.yak", qvdata / "asm.fa"])
    assert ours(["qv", "-K20000", qvdata / "sr.yak",
                 qvdata / "asm.fa"]) == ref


def test_qv_chunk_spanning_carry_print_each(qvdata):
    """Spanning + -p: SQ totals accumulate across chunk pieces, and mixed
    short seqs around the spans keep their per-chunk gating."""
    ref = run_oracle(["qv", "-p", "-t1", qvdata / "sr.yak",
                      qvdata / "mix.fa"])
    assert ours(["qv", "-p", "-K20000", qvdata / "sr.yak",
                 qvdata / "mix.fa"]) == ref


def test_qv_err_kmers_min_len(qvdata):
    ref = run_oracle(["qv", "-E", "-t1", "-l", "110", qvdata / "sr.yak",
                      qvdata / "asm.fa"])
    assert ours(["qv", "-E", "-l", "110", qvdata / "sr.yak",
                 qvdata / "asm.fa"]) == ref


def test_qv_err_kmers_spanning_and_print_each(qvdata):
    """-E through the fused fold: EK rows of chunk-spanning contigs stay
    contiguous and, with -p, interleave with the SQ rows per sequence
    exactly as the reference worker emits them (qv.c:62-81)."""
    ref = run_oracle(["qv", "-E", "-t1", qvdata / "sr.yak",
                      qvdata / "mix.fa"])
    assert ours(["qv", "-E", "-K20000", qvdata / "sr.yak",
                 qvdata / "mix.fa"]) == ref
    ref = run_oracle(["qv", "-E", "-p", "-t1", qvdata / "sr.yak",
                      qvdata / "mix.fa"])
    assert ours(["qv", "-E", "-p", "-K20000", qvdata / "sr.yak",
                 qvdata / "mix.fa"]) == ref


@pytest.fixture(scope="session")
def ztake(tmp_path_factory):
    """A record header landing in a chunk's last k-1 cells: at -K16384
    with k=21, seqA fills cells [0,16370) plus its separator, leaving 13
    (< k) free cells — seqB's first piece in that chunk takes ZERO bases
    and opens a zero-window carry (round-1 regression: the fused qv fold
    deactivated the carry and dropped seqB's whole histogram)."""
    d = tmp_path_factory.mktemp("ztake")
    rng = np.random.default_rng(77)
    g = make_genome(rng, 40000)
    to_fasta(d / "reads.fa", mutate_reads(rng, g, 8000, 100, err=0.005))
    to_fasta(d / "z.fa", [g[:16370], g[16370:30000]], names=["sA", "sB"])
    run_oracle(["count", "-k21", "-K2000000", "-o", d / "t.yak",
                d / "reads.fa"])
    return d


def test_qv_zero_take_record(ztake):
    ref = run_oracle(["qv", ztake / "t.yak", ztake / "z.fa"])
    assert ours(["qv", "-K16384", ztake / "t.yak", ztake / "z.fa"]) == ref


def test_qv_zero_take_record_print_each(ztake):
    ref = run_oracle(["qv", "-p", "-t1", ztake / "t.yak", ztake / "z.fa"])
    assert ours(["qv", "-p", "-K16384", ztake / "t.yak",
                 ztake / "z.fa"]) == ref


def test_qv_join_print_each_interpret(trio, monkeypatch):
    """The Pallas merge-JOIN qv path combined with -p (round-1
    regression: the kernel result shadowed the output stream and -p
    crashed).  Runs the kernel in interpret mode on CPU."""
    monkeypatch.setenv("YAK_TPU_JOIN_INTERPRET", "1")
    ref = run_oracle(["qv", "-p", "-t1", trio / "pat.yak",
                      trio / "child.fa"])
    assert ours(["qv", "-p", "-K16384", trio / "pat.yak",
                 trio / "child.fa"]) == ref


def test_qv_join_seg_interpret(trio, monkeypatch):
    """Plain qv through the SEG-payload join post (grouping restore via
    one narrow sort, ops/countstep.get_qv_join_post_seg) in interpret
    mode: tiny -K forces chunk-spanning sequences, exercising the
    head/inc/mid region-to-segment mapping."""
    monkeypatch.setenv("YAK_TPU_JOIN_INTERPRET", "1")
    monkeypatch.setenv("YAK_TPU_QV_SEG", "1")
    ref = run_oracle(["qv", trio / "pat.yak", trio / "child.fa"])
    assert ours(["qv", "-K16384", trio / "pat.yak",
                 trio / "child.fa"]) == ref
    # a different chunk size shifts which segments span the boundary
    assert ours(["qv", "-K20480", trio / "pat.yak",
                 trio / "child.fa"]) == ref


def test_chkerr_marker_overflow_fallback(trio, monkeypatch):
    """When a chunk's low-count run markers exceed the device budget the
    driver must fall back to the per-position scan for that chunk, not
    die (chkerr.c degrades the same way: it always sees every run)."""
    from yak_tpu.ops import countstep
    ref = run_oracle(["chkerr", "-t1", trio / "pat.yak", trio / "child.fa"])
    countstep.get_chkerr_step.cache_clear()
    monkeypatch.setattr(countstep, "CHKERR_MAX_RUNS", 1)
    try:
        assert ours(["chkerr", "-K16384", trio / "pat.yak",
                     trio / "child.fa"]) == ref
    finally:
        countstep.get_chkerr_step.cache_clear()


def test_inspect_single(trio):
    ref = run_oracle(["inspect", trio / "pat.yak"])
    assert ours(["inspect", trio / "pat.yak"]) == ref


def test_inspect_two_table(trio):
    """Two-table inspect vs the PATCHED oracle: the snapshot's raw-key
    probe defect (inspect.c:57) is documented in SURVEY §2.1; upstream
    semantics require the reconstructed hash."""
    if not os.path.exists(FIXED_ORACLE):
        pytest.skip("patched oracle not built")
    r = subprocess.run([FIXED_ORACLE, "inspect", str(trio / "pat.yak"),
                        str(trio / "mat.yak")], capture_output=True,
                       check=True)
    assert ours(["inspect", trio / "pat.yak", trio / "mat.yak"]) == \
        r.stdout.decode()


def test_triobin(trio):
    ref = run_oracle(["triobin", "-t1", "-p", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    assert ours(["triobin", "-p", trio / "pat.yak", trio / "mat.yak",
                 trio / "child.fa"]) == ref
    # -p with tiny -K: D rows of chunk-spanning contigs stay contiguous
    assert ours(["triobin", "-p", "-K16000", trio / "pat.yak",
                 trio / "mat.yak", trio / "child.fa"]) == ref


def test_triobin_fused_and_spanning(trio):
    """Without -p the device fold runs; tiny -K forces the contigs
    across chunks so boundary streaks must merge across the halo."""
    ref = run_oracle(["triobin", "-t1", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    args = ["triobin", trio / "pat.yak", trio / "mat.yak", trio / "child.fa"]
    assert ours(args) == ref
    assert ours(args[:1] + ["-K16000"] + args[1:]) == ref


def test_trioeval(trio):
    ref = run_oracle(["trioeval", "-t1", "-e", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    assert ours(["trioeval", "-e", trio / "pat.yak", trio / "mat.yak",
                 trio / "child.fa"]) == ref


def test_trioeval_spanning(trio):
    """Tiny -K forces contigs across chunks: phase runs and the
    last/fragment chain must merge across the halo boundary."""
    ref = run_oracle(["trioeval", "-t1", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    assert ours(["trioeval", "-K16000", trio / "pat.yak",
                 trio / "mat.yak", trio / "child.fa"]) == ref


def test_trioeval_marker_overflow_fallback(trio, monkeypatch):
    """Marker-budget overflow falls back to the per-position scan for
    that chunk with identical output."""
    from yak_tpu.ops import countstep
    ref = run_oracle(["trioeval", "-t1", "-e", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    countstep.get_trioeval_step.cache_clear()
    monkeypatch.setattr(countstep, "TRIOEVAL_MAX_RUNS", 1)
    try:
        assert ours(["trioeval", "-e", trio / "pat.yak", trio / "mat.yak",
                     trio / "child.fa"]) == ref
    finally:
        countstep.get_trioeval_step.cache_clear()


def test_chkerr(trio):
    ref = run_oracle(["chkerr", "-t1", trio / "pat.yak", trio / "child.fa"])
    assert ours(["chkerr", trio / "pat.yak", trio / "child.fa"]) == ref
    # tiny -K: contigs span chunks; low-count runs merge across the halo
    assert ours(["chkerr", "-K16000", trio / "pat.yak",
                 trio / "child.fa"]) == ref


def test_sexchr_and_groupxy(tmp_path):
    rng = np.random.default_rng(23)
    chrY, chrX, par = (make_genome(rng, 8000), make_genome(rng, 12000),
                       make_genome(rng, 3000))
    for n, s in [("chrY", chrY), ("chrX", chrX), ("par", par)]:
        to_fasta(tmp_path / f"{n}.fa", [s])
        run_oracle(["count", "-k21", "-K1000000", "-o",
                    tmp_path / f"{n}.yak", tmp_path / f"{n}.fa"])
    auto = make_genome(rng, 10000)
    to_fasta(tmp_path / "hap1.fa",
             [np.concatenate([chrY[:6000], par[:1500]]), auto[:5000]],
             names=["h1c1", "h1c2"])
    to_fasta(tmp_path / "hap2.fa",
             [np.concatenate([chrX[:9000], par[1500:]]), auto[5000:]],
             names=["h2c1", "h2c2"])
    args = ["sexchr", "-t1", tmp_path / "chrY.yak", tmp_path / "chrX.yak",
            tmp_path / "par.yak", tmp_path / "hap1.fa", tmp_path / "hap2.fa"]
    ref = run_oracle(args)
    u = ours(args)
    assert u == ref
    # tiny -K forces contigs across chunks: the per-seg sum carry
    assert ours(["sexchr", "-K16000"] + args[2:]) == ref
    (tmp_path / "cnt.txt").write_text(u)
    perl = shutil.which("perl")
    if perl:
        rp = subprocess.run(
            [perl, "/root/reference/groupxy.pl", str(tmp_path / "cnt.txt")],
            capture_output=True, check=True).stdout.decode()
        assert ours(["groupxy", tmp_path / "cnt.txt"]) == rp


def test_algebra(trio, tmp_path):
    from util import oracle_print_counts
    run_oracle(["subtract", "-o", tmp_path / "s_ref.yak", trio / "pat.yak",
                trio / "mat.yak"])
    ours(["subtract", "-o", tmp_path / "s_our.yak", trio / "pat.yak",
          trio / "mat.yak"])
    assert (oracle_print_counts(str(tmp_path / "s_ref.yak"))
            == oracle_print_counts(str(tmp_path / "s_our.yak")))
    run_oracle(["isec", "-o", tmp_path / "i_ref.yak", trio / "pat.yak",
                trio / "mat.yak"])
    ours(["isec", "-o", tmp_path / "i_our.yak", trio / "pat.yak",
          trio / "mat.yak"])
    assert (oracle_print_counts(str(tmp_path / "i_ref.yak"))
            == oracle_print_counts(str(tmp_path / "i_our.yak")))


def test_cntasm(trio, tmp_path):
    from util import oracle_print_counts
    run_oracle(["cntasm", "-k21", "-K2000000", "-o", tmp_path / "c_ref.yak",
                trio / "pat_reads.fa", trio / "mat_reads.fa"])
    ours(["cntasm", "-k21", "-K2000000", "-o", tmp_path / "c_our.yak",
          trio / "pat_reads.fa", trio / "mat_reads.fa"])
    assert (oracle_print_counts(str(tmp_path / "c_ref.yak"))
            == oracle_print_counts(str(tmp_path / "c_our.yak")))


def test_print_c(trio):
    ref = run_oracle(["print", "-c", trio / "pat.yak"])
    u = ours(["print", "-c", trio / "pat.yak"])
    assert sorted(u.splitlines()) == sorted(ref.splitlines())


def test_inspect_streaming_memory(tmp_path):
    """Two-table inspect must STREAM the first dump (inspect.c:40-62):
    host peak allocation stays far below the first file's key payload."""
    import io as _io
    import tracemalloc

    from yak_tpu.io import yakfmt
    from yak_tpu.models.inspect import main_inspect

    rng = np.random.default_rng(3)
    n = 16_000_000                       # 128 MB of keys on disk
    hashes = rng.integers(0, 1 << 52, size=n, dtype=np.uint64)
    counts = rng.integers(1, 100, size=n).astype(np.int64)
    big = tmp_path / "big.yak"
    yakfmt.dump_yak(str(big), 21, 10, hashes, counts)
    small = tmp_path / "small.yak"
    yakfmt.dump_yak(str(small), 21, 10, hashes[:1000], counts[:1000])
    del hashes, counts

    tracemalloc.start()
    main_inspect(str(big), str(small), out=_io.StringIO(),
                 batch_keys=1 << 18)
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert peak < 48 << 20, f"host peak {peak >> 20} MB for a 128 MB dump"


@pytest.fixture(scope="session")
def trio33(tmp_path_factory):
    """k=33 trio tables: the yak_hash_long path (inexact by design)
    through every fused lookup workload."""
    d = tmp_path_factory.mktemp("trio33")
    rng = np.random.default_rng(19)
    base = make_genome(rng, 20000)
    pat, mat = base.copy(), base.copy()
    for hap in (pat, mat):
        idx = rng.choice(len(base), 80, replace=False)
        hap[idx] = (hap[idx] + rng.integers(1, 4, 80)) % 4
    to_fasta(d / "pat_reads.fa", mutate_reads(rng, pat, 4000, 100, err=0.002))
    to_fasta(d / "mat_reads.fa", mutate_reads(rng, mat, 4000, 100, err=0.002))
    child = [pat[:8000], mat[8000:16000],
             np.concatenate([pat[16000:18000], mat[18000:20000]])]
    to_fasta(d / "child.fa", child, names=["ctgP", "ctgM", "ctgX"])
    run_oracle(["count", "-k33", "-K1000000", "-o", d / "pat.yak",
                d / "pat_reads.fa"])
    run_oracle(["count", "-k33", "-K1000000", "-o", d / "mat.yak",
                d / "mat_reads.fa"])
    return d


def test_triobin_long_k(trio33):
    ref = run_oracle(["triobin", "-t1", trio33 / "pat.yak",
                      trio33 / "mat.yak", trio33 / "child.fa"])
    args = ["triobin", trio33 / "pat.yak", trio33 / "mat.yak",
            trio33 / "child.fa"]
    assert ours(args) == ref
    assert ours(args[:1] + ["-K16000"] + args[1:]) == ref


def test_trioeval_long_k(trio33):
    ref = run_oracle(["trioeval", "-t1", "-e", trio33 / "pat.yak",
                      trio33 / "mat.yak", trio33 / "child.fa"])
    assert ours(["trioeval", "-e", trio33 / "pat.yak", trio33 / "mat.yak",
                 trio33 / "child.fa"]) == ref


def test_qv_long_k(trio33):
    """k=33 qv rides the fused device fold (hash_long extract + wide
    table lookup in get_qv_step) — the reference ASSERTS k < 32
    (qv.c:43), so parity is fused-vs-scan: identical SQ rows and
    cnt vector to the per-position scan path."""
    import io as _io
    from yak_tpu.models.qv import run_qv, QvOpts
    from yak_tpu.models.scan import scan_file
    from yak_tpu.table import KmerTable

    t = KmerTable.restore(str(trio33 / "pat.yak"))
    o1, o2 = _io.StringIO(), _io.StringIO()
    opt = QvOpts(chunk_size=16000, print_each=True)
    cnt_f = run_qv(opt, str(trio33 / "child.fa"), t, out=o1)
    cnt_s = run_qv(opt, str(trio33 / "child.fa"), t, out=o2,
                   scan=scan_file)
    assert o1.getvalue() == o2.getvalue() != ""
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_s))


def test_chkerr_long_k(trio33):
    ref = run_oracle(["chkerr", "-t1", trio33 / "pat.yak",
                      trio33 / "child.fa"])
    assert ours(["chkerr", trio33 / "pat.yak",
                 trio33 / "child.fa"]) == ref


def test_join_folds_interpret(trio, tmp_path, monkeypatch):
    """The Pallas merge-JOIN engine through the triobin/trioeval/chkerr
    folds (interpret mode on CPU): identical stdout to the oracle."""
    monkeypatch.setenv("YAK_TPU_JOIN_INTERPRET", "1")
    ref = run_oracle(["triobin", "-t1", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    assert ours(["triobin", "-K16000", trio / "pat.yak", trio / "mat.yak",
                 trio / "child.fa"]) == ref
    ref = run_oracle(["trioeval", "-t1", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    assert ours(["trioeval", "-K16000", trio / "pat.yak", trio / "mat.yak",
                 trio / "child.fa"]) == ref
    ref = run_oracle(["chkerr", "-t1", trio / "pat.yak", trio / "child.fa"])
    assert ours(["chkerr", "-K16384", trio / "pat.yak",
                 trio / "child.fa"]) == ref


def test_inspect_two_table_join_interpret(trio, monkeypatch):
    """Two-table inspect now shares countstep.join_enabled (default-on
    JOIN on TPU; interpret hook exercises the kernel path on CPU)."""
    if not os.path.exists(FIXED_ORACLE):
        pytest.skip("patched oracle not built")
    monkeypatch.setenv("YAK_TPU_JOIN_INTERPRET", "1")
    r = subprocess.run([FIXED_ORACLE, "inspect", str(trio / "pat.yak"),
                        str(trio / "mat.yak")], capture_output=True,
                       check=True)
    assert ours(["inspect", trio / "pat.yak", trio / "mat.yak"]) == \
        r.stdout.decode()


def test_cntasm_pre_resize_flag(trio, tmp_path):
    """-r (pre-resize before merging, main.c:98): accepted, and the
    merged table is identical — capacity reservation is inherent to the
    sorted-array merge (table.merge's _ensure_capacity)."""
    from util import oracle_print_counts
    run_oracle(["cntasm", "-k21", "-r", "-K2000000", "-o",
                tmp_path / "r_ref.yak",
                trio / "pat_reads.fa", trio / "mat_reads.fa"])
    ours(["cntasm", "-k21", "-r", "-K2000000", "-o", tmp_path / "r_our.yak",
          trio / "pat_reads.fa", trio / "mat_reads.fa"])
    assert (oracle_print_counts(str(tmp_path / "r_ref.yak"))
            == oracle_print_counts(str(tmp_path / "r_our.yak")))


def test_join_folds_psort_interpret(trio, monkeypatch):
    """The presorted JOIN (Pallas bitonic query sort + in-dispatch
    diagonal search) through qv/triobin/chkerr/trioeval + the bitonic
    join posts (order restore + marker compaction with zero XLA
    full-lane sorts): identical stdout to the oracle, interpret mode
    on CPU."""
    monkeypatch.setenv("YAK_TPU_JOIN_INTERPRET", "1")
    monkeypatch.setenv("YAK_TPU_PSORT_INTERPRET", "1")
    ref = run_oracle(["qv", "-t1", "-p", trio / "pat.yak",
                      trio / "child.fa"])
    assert ours(["qv", "-p", "-K16000", trio / "pat.yak",
                 trio / "child.fa"]) == ref
    ref = run_oracle(["triobin", "-t1", "-p", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    assert ours(["triobin", "-p", "-K16000", trio / "pat.yak",
                 trio / "mat.yak", trio / "child.fa"]) == ref
    ref = run_oracle(["chkerr", "-t1", trio / "pat.yak", trio / "child.fa"])
    assert ours(["chkerr", "-K16384", trio / "pat.yak",
                 trio / "child.fa"]) == ref
    ref = run_oracle(["trioeval", "-t1", trio / "pat.yak",
                      trio / "mat.yak", trio / "child.fa"])
    assert ours(["trioeval", "-K16000", trio / "pat.yak", trio / "mat.yak",
                 trio / "child.fa"]) == ref


def test_sexchr_psort_interpret(tmp_path, monkeypatch):
    """sexchr through the psort join post (bitonic order restore +
    seg-sum jit): identical stdout to the oracle."""
    monkeypatch.setenv("YAK_TPU_JOIN_INTERPRET", "1")
    monkeypatch.setenv("YAK_TPU_PSORT_INTERPRET", "1")
    rng = np.random.default_rng(29)
    chrY, chrX, par = (make_genome(rng, 8000), make_genome(rng, 12000),
                       make_genome(rng, 3000))
    for n, s in [("chrY", chrY), ("chrX", chrX), ("par", par)]:
        to_fasta(tmp_path / f"{n}.fa", [s])
        run_oracle(["count", "-k21", "-K1000000", "-o",
                    tmp_path / f"{n}.yak", tmp_path / f"{n}.fa"])
    auto = make_genome(rng, 10000)
    to_fasta(tmp_path / "hap1.fa",
             [np.concatenate([chrY[:6000], par[:1500]]), auto[:5000]],
             names=["h1c1", "h1c2"])
    to_fasta(tmp_path / "hap2.fa",
             [np.concatenate([chrX[:9000], par[1500:]]), auto[5000:]],
             names=["h2c1", "h2c2"])
    args = ["sexchr", "-t1", tmp_path / "chrY.yak", tmp_path / "chrX.yak",
            tmp_path / "par.yak", tmp_path / "hap1.fa", tmp_path / "hap2.fa"]
    ref = run_oracle(args)
    assert ours(["sexchr", "-K16000"] + args[2:]) == ref
