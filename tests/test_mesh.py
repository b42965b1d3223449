"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY §2.3.4 generalized): N-chip output must equal
1-chip output exactly — the all_to_all hash routing gives each chip a
disjoint hash subspace, so the union of per-chip tables is the same
(hash, count) set regardless of topology, and the positional-shard .yak
dump is byte-identical.
"""

import numpy as np
import pytest

import jax

import util
from yak_tpu.models.count import CountOpts, count_file
from yak_tpu.parallel.mesh import make_mesh, count_file_mesh


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


def test_mesh_histogram_matches(data):
    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    opt = CountOpts(k=17, chunk_size=1 << 14, cap_log2=12)
    single = count_file(str(data / "reads.fa"), opt)
    mesh = make_mesh(4)
    sharded = count_file_mesh(str(data / "reads.fa"), opt, mesh, cap_log2=14)
    np.testing.assert_array_equal(single.hist(), sharded.hist())


def test_dryrun_entrypoints():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_mesh_lookup_matches_single(data):
    if len(jax.devices()) < 8:
        pytest.skip("not enough virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from yak_tpu.parallel.mesh import build_lookup_step

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
    sh = NamedSharding(mesh, P("d"))
    dcodes = jax.device_put(jax.numpy.asarray(codes), sh)
    vals, hasw, ovf = step(dcodes, sharded.keys, sharded.cnt, sharded.size)
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
    import io
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
