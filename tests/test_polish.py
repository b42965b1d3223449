"""Regression tests for round-3 polish items: the periodic-meta
compile-shape guard, reference-style CLI error handling, and the
cntasm -r flag (main.c:98)."""

import io
from contextlib import redirect_stdout

import numpy as np


class _Chunk:
    """Minimal stand-in exposing the record-meta fields that
    io.pack.detect_periodic_meta reads."""

    def __init__(self, rl, rs, rt, off0, codes):
        self.rec_len = np.asarray(rl, np.int64)
        self.rec_start = np.asarray(rs, np.int64)
        self.rec_take = np.asarray(rt, np.int64)
        self.rec_off0 = np.asarray(off0, np.int64)
        self.codes = np.asarray(codes, np.uint8)
        self.planes = None


def test_periodic_meta_single_record_not_periodic():
    """A chunk holding ONE record piece must NOT be classified periodic:
    R would equal the record length and every distinct contig length
    would key a fresh fused-step compile (advisor r2 finding)."""
    from yak_tpu.io.pack import detect_periodic_meta
    codes = np.zeros(8192, np.uint8)
    p = _Chunk([5000], [0], [5000], [0], codes)
    assert detect_periodic_meta(p) is None


def test_periodic_meta_multi_record_still_detected():
    from yak_tpu.io.pack import detect_periodic_meta
    codes = np.zeros(8192, np.uint8)
    codes[100] = 4                      # the single N separator
    p = _Chunk([100, 100], [0, 101], [100, 60], [0, 0], codes)
    assert detect_periodic_meta(p) == (100, 161)


def _cli(args, capsys):
    from yak_tpu.cli import main as cli
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli([str(a) for a in args])
    return rc, capsys.readouterr().err


def test_cli_missing_file_clean_error(capsys):
    """A missing .yak must print a reference-style ERROR line and exit 1
    (main.c:82/267), not raise a Python traceback."""
    rc, err = _cli(["inspect", "/nonexistent/table.yak"], capsys)
    assert rc == 1
    assert "ERROR" in err and "Traceback" not in err


def test_cli_bad_magic_clean_error(tmp_path, capsys):
    """Wrong file magic: clean message (htab.c:424-428), exit 1."""
    bad = tmp_path / "bad.yak"
    bad.write_bytes(b"NOTyak" + b"\x00" * 64)
    rc, err = _cli(["inspect", bad], capsys)
    assert rc == 1
    assert "magic" in err and "Traceback" not in err


def test_cli_missing_seq_file_clean_error(tmp_path, capsys):
    """qv with a valid table but missing FASTA also fails cleanly."""
    from yak_tpu.table import KmerTable
    t = KmerTable(21, 10)
    t.insert_codes(np.asarray(
        np.random.default_rng(0).integers(0, 4, 4096), np.uint8))
    t.dump(str(tmp_path / "t.yak"))
    rc, err = _cli(["qv", tmp_path / "t.yak", "/nonexistent/reads.fa"],
                   capsys)
    assert rc == 1
    assert "ERROR" in err and "Traceback" not in err
