"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY §2.3.4 generalized): N-chip output must equal
1-chip output exactly — the all_to_all hash routing gives each chip a
disjoint hash subspace, so the union of per-chip tables is the same
(hash, count) set regardless of topology, and the positional-shard .yak
dump is byte-identical.  This holds for the Bloom-gated pass too (the
per-chip filter slices hold bit-identical per-shard contents when batch
windows align) and for the fused qv fold (whose carry chain is
sequential regardless of which chip reduced each chunk).
"""

import io

import numpy as np
import pytest

import jax

import util
from yak_tpu.models.count import CountOpts, count, count_file
from yak_tpu.parallel.mesh import (make_mesh, count_file_mesh, count_mesh,
                                   MeshTable)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh")
    rng = np.random.default_rng(11)
    genome = util.make_genome(rng, 20_000)
    reads = util.mutate_reads(rng, genome, 600, 120, err=0.005, n_rate=0.002)
    util.to_fasta(d / "reads.fa", reads)
    return d


@pytest.mark.parametrize("n_dev", [2, 8])
def test_mesh_equals_single_chip(data, n_dev, tmp_path):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(n_dev)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh,
                              cap_log2=14)

    h1, c1 = single.items()
    h2, c2 = sharded.items()
    o1, o2 = np.argsort(h1), np.argsort(h2)
    np.testing.assert_array_equal(h1[o1], h2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])

    # dumps byte-identical
    from yak_tpu.io import yakfmt
    p1, p2 = tmp_path / "a.yak", tmp_path / "b.yak"
    single.dump(str(p1))
    yakfmt.dump_yak(str(p2), opt.k, opt.pre, h2, c2)
    assert p1.read_bytes() == p2.read_bytes()


def test_mesh_wide_k_equals_single_chip(data):
    """k=33 (wide raw-u64 hash_long keys) on the mesh: the all_to_all
    routing and per-chip merge must give the same (hash, count) set as
    a single chip — the low-bit owner split works on full-width hashes
    exactly as on packed ones (count.c:45-60 semantics)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    opt = CountOpts(k=33, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh,
                              cap_log2=14)
    h1, c1 = single.items()
    h2, c2 = sharded.items()
    o1, o2 = np.argsort(h1), np.argsort(h2)
    np.testing.assert_array_equal(h1[o1], h2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])


def test_mesh_histogram_matches(data):
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh, cap_log2=14)
    np.testing.assert_array_equal(single.hist(), sharded.hist())


def test_mesh_bloom_two_pass_equals_single(data):
    """The full -b protocol on the mesh (per-chip Bloom slices, clear,
    pass-2 increment-only, shrink) == single-chip == exact counts >= 2.
    flush_lanes aligns the single-chip fold group to n_dev chunks so
    even the Bloom gating batches see identical key windows."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    n_dev = 4
    chunk = 1 << 14
    opt = CountOpts(k=17, chunk_size=chunk, cap_log2=12, bf_shift=20)
    files = [str(data / "reads.fa")]

    from yak_tpu.table import KmerTable
    single = KmerTable(opt.k, opt.pre, cap_log2=opt.cap_log2,
                       bf_n_hash=opt.bf_n_hash, bf_shift=opt.bf_shift,
                       flush_lanes=n_dev * (chunk - opt.k + 1))
    assert single.bf is not None
    from yak_tpu.io.chunks import ChunkSource
    for packed in ChunkSource(files[0], chunk, opt.k, min_len=opt.k,
                              with_meta=False):
        single.insert_codes(packed.codes)
    single.destroy_bf()
    single.clear_counts()
    for packed in ChunkSource(files[0], chunk, opt.k, min_len=opt.k,
                              with_meta=False):
        single.insert_codes(packed.codes, create_new=False)
    single.shrink(2, 1023)

    import os
    mesh = make_mesh(n_dev)
    os.environ["YAK_TPU_BLOOM_TWO_PASS"] = "1"  # exercise the gate
    try:
        sharded = count_mesh(files, opt, mesh, cap_log2=14)
    finally:
        del os.environ["YAK_TPU_BLOOM_TWO_PASS"]
    assert sharded.bf is None      # destroyed after pass 1

    h1, c1 = single.items()
    h2, c2 = sharded.items()
    o1, o2 = np.argsort(h1), np.argsort(h2)
    np.testing.assert_array_equal(h1[o1], h2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])

    # and equal to the exact spectrum restricted to counts >= 2
    exact = count_file(str(data / "reads.fa"),
                       CountOpts(k=17, chunk_size=chunk, cap_log2=12))
    exact.shrink(2, 1023)
    h3, c3 = exact.items()
    o3 = np.argsort(h3)
    np.testing.assert_array_equal(h1[o1], h3[o3])
    np.testing.assert_array_equal(c1[o1], c3[o3])


def test_mesh_growth_replay(data):
    """A deliberately tiny per-chip capacity must grow via the
    one-step-late replay, not raise, and still match single-chip."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh,
                              cap_log2=10)
    assert sharded.cap > (1 << 10)      # grew
    h1, c1 = single.items()
    h2, c2 = sharded.items()
    o1, o2 = np.argsort(h1), np.argsort(h2)
    np.testing.assert_array_equal(h1[o1], h2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])


def test_mesh_route_capacity_retry(data):
    """A deliberately tiny all_to_all capacity must double-and-replay
    (preserved pre-step state), not raise or corrupt."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from yak_tpu.parallel import mesh as meshmod

    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)

    orig = meshmod.default_route_cap
    meshmod.default_route_cap = lambda M, n: 128   # way too small
    try:
        sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh,
                                  cap_log2=14)
    finally:
        meshmod.default_route_cap = orig
    h1, c1 = single.items()
    h2, c2 = sharded.items()
    o1, o2 = np.argsort(h1), np.argsort(h2)
    np.testing.assert_array_equal(h1[o1], h2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])


def test_dryrun_entrypoints():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_mesh_lookup_matches_single(data):
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    from yak_tpu.parallel.mesh import (_pack_group_planes,
                                       build_lookup_step)

    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(8)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh, cap_log2=14)

    chunk = 2048
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 5, size=(8, chunk)).astype(np.uint8)
    codes = np.where(rng.random(codes.shape) < 0.95, codes % 4, 4
                     ).astype(np.uint8)

    step = build_lookup_step(mesh, opt.k, chunk)
    planes = jax.device_put(
        jax.numpy.asarray(_pack_group_planes(list(codes), chunk, 8)),
        sharded.sh)
    vals, hasw, ovf = step(planes, sharded.keys, sharded.cnt, sharded.size)
    assert int(np.asarray(ovf).max()) == 0

    from yak_tpu.ops.kmers import extract_kmer_hashes
    h, valid = extract_kmer_hashes(jax.numpy.asarray(codes), opt.k)
    want = single.lookup_hashes(h.reshape(-1), valid.reshape(-1))
    np.testing.assert_array_equal(
        np.asarray(vals).reshape(-1), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(hasw), np.asarray(valid))


def test_mesh_qv_matches_single(data, tmp_path):
    """Full qv report via the mesh-sharded scanner == single-table qv."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from yak_tpu.models.qv import QvOpts, main_qv
    from yak_tpu.models.scan import scan_file_mesh

    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh, cap_log2=14)

    rng = np.random.default_rng(9)
    asm = util.make_genome(rng, 4000)
    util.to_fasta(tmp_path / "asm.fa", [asm])

    qopt = QvOpts(print_each=True, chunk_size=1 << 14)
    a, b = io.StringIO(), io.StringIO()
    main_qv(qopt, single, str(tmp_path / "asm.fa"), out=a)
    main_qv(qopt, sharded, str(tmp_path / "asm.fa"), out=b,
            scan=scan_file_mesh)
    assert a.getvalue() == b.getvalue()


def test_mesh_qv_fused_matches_single(data, tmp_path):
    """The fused mesh qv fold (grouped shard_map reduction + device
    carry chain) == the single-chip fused qv, including -p SQ rows and
    chunk-spanning sequences that cross GROUP boundaries."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from yak_tpu.models.qv import QvOpts, main_qv

    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh, cap_log2=14)

    rng = np.random.default_rng(9)
    g = util.make_genome(rng, 120_000)    # spans many 16k chunks
    junk = util.make_genome(rng, 400)
    util.to_fasta(tmp_path / "asm.fa",
                  [g[:60_000], junk, g[60_000:], g[:300]],
                  names=["c1", "junk", "c2", "tiny"])

    for qopt in (QvOpts(chunk_size=1 << 14),
                 QvOpts(print_each=True, chunk_size=1 << 14)):
        a, b = io.StringIO(), io.StringIO()
        main_qv(qopt, single, str(tmp_path / "asm.fa"), out=a)
        main_qv(qopt, sharded, str(tmp_path / "asm.fa"), out=b)
        assert a.getvalue() == b.getvalue()


def test_mesh_triobin_matches_single(data, tmp_path):
    """The mesh triobin fold (routed group lookups + vmapped per-chunk
    reductions) == the single-chip fused triobin, incl. -p D rows and
    contigs spanning chunk AND group boundaries."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from yak_tpu.models.trio import TrioOpts, main_triobin
    from yak_tpu.table import KmerTable

    rng = np.random.default_rng(31)
    base = util.make_genome(rng, 30_000)
    pat, mat = base.copy(), base.copy()
    for hap in (pat, mat):
        idx = rng.choice(len(base), 120, replace=False)
        hap[idx] = (hap[idx] + rng.integers(1, 4, 120)) % 4
    child = [pat[:12_000], mat[12_000:24_000], base[24_000:]]
    util.to_fasta(tmp_path / "child.fa", child, names=["cP", "cM", "cB"])

    # synthesize a 4-bit flag table directly (TRIOBIN-load semantics)
    single = KmerTable(17)
    hs = np.unique(np.concatenate([
        np.random.default_rng(7).integers(0, 1 << 34, 50_000,
                                          dtype=np.uint64)]))
    from yak_tpu.ops.kmers import extract_kmer_hashes
    import jax.numpy as jnp
    hp, vp = extract_kmer_hashes(jnp.asarray(pat[None, :], jnp.uint8), 17)
    hm, vm = extract_kmer_hashes(jnp.asarray(mat[None, :], jnp.uint8), 17)
    hp = np.asarray(hp).reshape(-1)
    hm = np.asarray(hm).reshape(-1)
    flags = {}
    for h in hp:
        flags[int(h)] = flags.get(int(h), 0) | 2       # pat-strong
    for h in hm:
        flags[int(h)] = flags.get(int(h), 0) | 8       # mat-strong
    h_np = np.fromiter(flags.keys(), np.uint64, len(flags))
    c_np = np.fromiter(flags.values(), np.int64, len(flags))
    o = np.argsort(h_np)
    single._set_pairs(h_np[o], c_np[o].astype(np.int32))

    from yak_tpu.parallel.mesh import MeshTable
    mesh = make_mesh(4)
    sharded = MeshTable.from_items(mesh, 17, 10, h_np[o], c_np[o])

    import io as _io
    for args in ({"print_diff": False}, {"print_diff": True}):
        opt = TrioOpts(**args)
        a, b = _io.StringIO(), _io.StringIO()
        main_triobin(opt, single, str(tmp_path / "child.fa"), out=a,
                     chunk_cap=1 << 14)
        main_triobin(opt, sharded, str(tmp_path / "child.fa"), out=b,
                     chunk_cap=1 << 14)
        assert a.getvalue() == b.getvalue()
        assert a.getvalue()      # non-empty


def test_mesh_trioeval_sexchr_chkerr_match_single(data, tmp_path):
    """trioeval/sexchr/chkerr accept MeshTables (routed per-position
    scan) with output identical to the single-table paths."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from yak_tpu.models.chkerr import ChkerrOpts, main_chkerr
    from yak_tpu.models.sexchr import SexchrOpts, main_sexchr
    from yak_tpu.models.trio import TrioOpts, main_trioeval
    from yak_tpu.table import KmerTable

    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    h, c = single.items()
    sharded = MeshTable.from_items(mesh, 17, 10, h, c)

    rng = np.random.default_rng(41)
    g = util.make_genome(rng, 25_000)
    util.to_fasta(tmp_path / "asm.fa", [g[:12_000], g[12_000:]],
                  names=["a1", "a2"])

    for fn, kwargs in ((main_trioeval, {"chunk_cap": 1 << 14}),
                       (main_chkerr, {})):
        a, b = io.StringIO(), io.StringIO()
        o = TrioOpts() if fn is main_trioeval else \
            ChkerrOpts(chunk_size=1 << 14)
        fn(o, single, str(tmp_path / "asm.fa"), out=a, **kwargs)
        fn(o, sharded, str(tmp_path / "asm.fa"), out=b, **kwargs)
        assert a.getvalue() == b.getvalue()

    o = SexchrOpts(chunk_size=1 << 14)
    a, b = io.StringIO(), io.StringIO()
    main_sexchr(o, single, [str(tmp_path / "asm.fa")], out=a)
    main_sexchr(o, sharded, [str(tmp_path / "asm.fa")], out=b)
    assert a.getvalue() == b.getvalue()


def test_mesh_lookup_psort_matches_single(data, tmp_path, monkeypatch):
    """The routed mesh lookup on the per-chip Pallas JOIN with the
    bitonic post (build_lookup_psort: restore sort -> all_to_all home
    -> second restore sort, zero XLA full-lane sorts): mesh
    trioeval/chkerr/qv outputs identical to the single-table paths."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    monkeypatch.setenv("YAK_TPU_PSORT_INTERPRET", "1")
    from yak_tpu.models.chkerr import ChkerrOpts, main_chkerr
    from yak_tpu.models.qv import QvOpts, main_qv
    from yak_tpu.models.trio import TrioOpts, main_trioeval

    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    h, c = single.items()
    sharded = MeshTable.from_items(mesh, 17, 10, h, c)

    rng = np.random.default_rng(43)
    g = util.make_genome(rng, 25_000)
    util.to_fasta(tmp_path / "asm.fa", [g[:12_000], g[12_000:]],
                  names=["a1", "a2"])

    for fn, o, kwargs in (
            (main_trioeval, TrioOpts(), {"chunk_cap": 1 << 14}),
            (main_chkerr, ChkerrOpts(chunk_size=1 << 14), {}),
            (main_qv, QvOpts(chunk_size=1 << 14), {})):
        a, b = io.StringIO(), io.StringIO()
        fn(o, single, str(tmp_path / "asm.fa"), out=a, **kwargs)
        fn(o, sharded, str(tmp_path / "asm.fa"), out=b, **kwargs)
        assert a.getvalue() == b.getvalue(), fn.__name__


def test_mesh_route_capacity_retry_psort(data, tmp_path, monkeypatch):
    """The double-and-replay route-overflow protocol under the PSORT
    engine, for both the count fold (preserved plane-state restore) and
    the routed lookup (mesh_routed_groups doubling its capacity):
    results must match the single-chip paths exactly."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from yak_tpu.models.qv import QvOpts, main_qv
    from yak_tpu.parallel import mesh as meshmod

    monkeypatch.setenv("YAK_TPU_PSORT_INTERPRET", "1")
    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)

    rng = np.random.default_rng(47)
    g = util.make_genome(rng, 20_000)
    util.to_fasta(tmp_path / "asm.fa", [g], names=["a1"])

    orig = meshmod.default_route_cap
    # deterministically too small (each source routes ~14k valid lanes
    # > 4 x 2048, so overflow-and-replay MUST trigger) but not absurdly
    # so: every capacity step compiles a fresh psort shape family, so
    # each halving of the start value adds ~6 interpret-mode builds
    meshmod.default_route_cap = lambda M, n: 2048
    try:
        sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh,
                                  cap_log2=14)
        a, b = io.StringIO(), io.StringIO()
        main_qv(QvOpts(chunk_size=1 << 14), single,
                str(tmp_path / "asm.fa"), out=a)
        main_qv(QvOpts(chunk_size=1 << 14), sharded,
                str(tmp_path / "asm.fa"), out=b)
    finally:
        meshmod.default_route_cap = orig
    h1, c1 = single.items()
    h2, c2 = sharded.items()
    o1, o2 = np.argsort(h1), np.argsort(h2)
    np.testing.assert_array_equal(h1[o1], h2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])
    assert a.getvalue() == b.getvalue()


def test_mesh_triobin_diff_overflow_fallback(data, tmp_path):
    """-p D-marker budget overflow on a mesh degrades to the
    per-lane-values host fallback for the chunk (advisor r2: it used to
    hard-fail with RuntimeError), with identical output."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from yak_tpu.models.trio import TrioOpts, main_triobin
    from yak_tpu.ops import countstep
    from yak_tpu.ops.kmers import extract_kmer_hashes
    from yak_tpu.parallel.mesh import MeshTable
    from yak_tpu.table import KmerTable
    import jax.numpy as jnp
    import io as _io

    rng = np.random.default_rng(77)
    base = util.make_genome(rng, 12_000)
    pat, mat = base.copy(), base.copy()
    for hap in (pat, mat):
        idx = rng.choice(len(base), 60, replace=False)
        hap[idx] = (hap[idx] + rng.integers(1, 4, 60)) % 4
    util.to_fasta(tmp_path / "c2.fa", [pat[:6000], mat[6000:]],
                  names=["cP", "cM"])
    single = KmerTable(17)
    hp, _ = extract_kmer_hashes(jnp.asarray(pat[None, :], jnp.uint8), 17)
    hm, _ = extract_kmer_hashes(jnp.asarray(mat[None, :], jnp.uint8), 17)
    flags = {}
    for h in np.asarray(hp).reshape(-1):
        flags[int(h)] = flags.get(int(h), 0) | 2
    for h in np.asarray(hm).reshape(-1):
        flags[int(h)] = flags.get(int(h), 0) | 8
    h_np = np.fromiter(flags.keys(), np.uint64, len(flags))
    c_np = np.fromiter(flags.values(), np.int64, len(flags))
    o = np.argsort(h_np)
    single._set_pairs(h_np[o], c_np[o].astype(np.int32))
    mesh = make_mesh(4)
    sharded = MeshTable.from_items(mesh, 17, 10, h_np[o], c_np[o])

    opt = TrioOpts(print_diff=True)
    a = _io.StringIO()
    main_triobin(opt, single, str(tmp_path / "c2.fa"), out=a,
                 chunk_cap=1 << 14)
    orig = countstep.TRIOBIN_MAX_DIFF
    try:
        countstep.TRIOBIN_MAX_DIFF = 1    # force overflow in the reducer
        b = _io.StringIO()
        main_triobin(opt, sharded, str(tmp_path / "c2.fa"), out=b,
                     chunk_cap=1 << 14)
    finally:
        countstep.TRIOBIN_MAX_DIFF = orig
    assert a.getvalue() == b.getvalue()
    assert "D\t" in a.getvalue()


def test_cli_auto_mesh(data, tmp_path, monkeypatch):
    """YAK_TPU_MESH=1 routes CLI count/qv/triobin through the mesh
    (the auto-mesh surface; on real multi-chip backends this is the
    default) with oracle-identical output."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    if not util.have_oracle():
        pytest.skip("oracle not built")
    import subprocess
    from contextlib import redirect_stdout
    from yak_tpu.cli import main as cli

    def ours(args):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli([str(a) for a in args])
        assert rc == 0
        return buf.getvalue()

    monkeypatch.setenv("YAK_TPU_MESH", "1")
    rng = np.random.default_rng(9)
    g = util.make_genome(rng, 20_000)
    util.to_fasta(tmp_path / "r.fa",
                  util.mutate_reads(rng, g, 2000, 100, err=0.002))
    util.to_fasta(tmp_path / "a.fa", [g], names=["ctg"])
    util.run_oracle(["count", "-k21", "-K40000", "-o",
                     tmp_path / "ref.yak", tmp_path / "r.fa"])
    ours(["count", "-k21", "-K40000", "-o", tmp_path / "our.yak",
          tmp_path / "r.fa"])
    assert (util.oracle_print_counts(str(tmp_path / "ref.yak"))
            == util.oracle_print_counts(str(tmp_path / "our.yak")))
    ref = subprocess.run([util.ORACLE, "qv", "-t1",
                          str(tmp_path / "ref.yak"),
                          str(tmp_path / "a.fa")],
                         capture_output=True, check=True).stdout.decode()
    assert ours(["qv", "-K40000", tmp_path / "ref.yak",
                 tmp_path / "a.fa"]) == ref


def test_mesh_psort_engine_equals_single(data, tmp_path, monkeypatch):
    """The per-chip Pallas engine on the mesh (sharded presort pre-jit
    -> shard_mapped bitonic sort -> shard_mapped diagonal search +
    merge-reduce kernel, interpret mode): table identical to the
    single-chip count, dump byte-identical (one engine, sharded)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    monkeypatch.setenv("YAK_TPU_PSORT_INTERPRET", "1")
    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh,
                              cap_log2=14)
    h1, c1 = single.items()
    h2, c2 = sharded.items()
    o1, o2 = np.argsort(h1), np.argsort(h2)
    np.testing.assert_array_equal(h1[o1], h2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])
    from yak_tpu.io import yakfmt
    p1, p2 = tmp_path / "a.yak", tmp_path / "b.yak"
    single.dump(str(p1))
    yakfmt.dump_yak(str(p2), opt.k, opt.pre, h2, c2)
    assert p1.read_bytes() == p2.read_bytes()
