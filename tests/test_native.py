"""Differential tests: native C++ packer vs the pure-Python packer.

The native chunk stream must be *exactly* the Python one — same chunk
boundaries, codes, metadata — on FASTA/FASTQ, gzipped input, multi-line
records, N bases, halo splits, and min_len filtering.
"""

import gzip
import os

import numpy as np
import pytest

import util
from yak_tpu import native
from yak_tpu.io.fasta import FastxReader
from yak_tpu.io.pack import pack_records

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def python_chunks(path, chunk_size, k, min_len, with_meta):
    reader = FastxReader(path)

    def recs():
        for rec in reader:
            if len(rec.seq) < min_len:
                continue
            yield rec

    out = list(pack_records(recs(), chunk_size, k, with_meta=with_meta))
    reader.close()
    return out


def assert_stream_equal(path, chunk_size, k, min_len=0, with_meta=True):
    py = python_chunks(path, chunk_size, k, min_len, with_meta)
    nat = list(native.NativePackReader(path, chunk_size, k, min_len=min_len,
                                       with_meta=with_meta))
    assert len(py) == len(nat)
    for p, n in zip(py, nat):
        assert p.n_bases == n.n_bases
        np.testing.assert_array_equal(p.codes, n.codes)
        if with_meta:
            if with_meta is True:
                np.testing.assert_array_equal(p.seq_id, n.seq_id)
                np.testing.assert_array_equal(p.pos, n.pos)
            assert p.seq_names == n.seq_names
            assert p.seq_lens == n.seq_lens
            # record-piece meta (gid, len, start cell, src offset, take)
            for f in ("rec_gid", "rec_len", "rec_start", "rec_off0",
                      "rec_take"):
                np.testing.assert_array_equal(
                    getattr(p, f), getattr(n, f), err_msg=f)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(7)
    genome = util.make_genome(rng, 9000)
    reads = util.mutate_reads(rng, genome, 300, 101, err=0.01, n_rate=0.01)
    util.to_fasta(d / "reads.fa", reads)
    util.to_fastq(d / "reads.fq", reads)
    with open(d / "reads.fq", "rb") as f:
        with gzip.open(d / "reads.fq.gz", "wb") as g:
            g.write(f.read())
    # ragged multi-line FASTA with short records and empty-ish seqs
    lens = rng.integers(1, 400, size=60)
    seqs = [rng.integers(0, 5, size=int(L)).astype(np.int8) for L in lens]
    util.to_fasta(d / "ragged.fa", seqs, line_len=37)
    # one long contig forcing halo splits
    util.to_fasta(d / "long.fa", [rng.integers(0, 4, 30_000).astype(np.int8)])
    return d


def test_fasta_meta(data):
    assert_stream_equal(data / "reads.fa", 4096, 21)


def test_fastq_gz(data):
    assert_stream_equal(data / "reads.fq.gz", 4096, 21)


def test_min_len_filter(data):
    assert_stream_equal(data / "ragged.fa", 2048, 17, min_len=17)


def test_ragged_no_filter(data):
    assert_stream_equal(data / "ragged.fa", 2048, 17, min_len=0)


def test_halo_splits(data):
    assert_stream_equal(data / "long.fa", 1031, 31)


def test_records_meta_level(data):
    """with_meta="records": piece arrays match the Python packer on
    ragged + halo-splitting inputs, with no per-position arrays."""
    assert_stream_equal(data / "ragged.fa", 2000, 17,
                        with_meta="records")
    assert_stream_equal(data / "long.fa", 4096, 31, with_meta="records")
    n = next(iter(native.NativePackReader(data / "reads.fa", 4096, 17,
                                          with_meta="records")))
    assert n.seq_id is None and n.pos is None


def test_no_meta(data):
    assert_stream_equal(data / "reads.fa", 4096, 31, with_meta=False)


def test_n_seq_counter(data):
    r = native.NativePackReader(data / "ragged.fa", 2048, 17, min_len=17)
    list(r)
    want = sum(1 for rec in FastxReader(str(data / "ragged.fa"))
               if len(rec.seq) >= 17)
    assert r.n_seq == want


def test_native_planes_match_host_packer():
    """The reader thread's pre-packed bit planes must equal
    io.pack.pack_planes of the same codes."""
    import numpy as np
    from yak_tpu import native
    from yak_tpu.io.pack import pack_planes
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    import tempfile, os
    rng = np.random.default_rng(7)
    alph = np.frombuffer(b"ACGTN", dtype=np.uint8)
    with tempfile.TemporaryDirectory() as td:
        fn = os.path.join(td, "r.fa")
        with open(fn, "wb") as fp:
            for i in range(200):
                L = int(rng.integers(50, 400))
                s = rng.integers(0, 5, L)
                s = np.where(rng.random(L) < 0.97, s % 4, 4)
                fp.write(b">s%d\n" % i + alph[s].tobytes() + b"\n")
        r = native.NativePackReader(fn, 16384, 21, with_meta="records")
        n = 0
        for c in r:
            want = pack_planes(c.codes)
            for a, b in zip(c.planes, want):
                np.testing.assert_array_equal(a, b)
            n += 1
        assert n > 0
