"""Native (C++) ingest runtime bindings.

`libyakfastx.so` implements the streaming FASTA/FASTQ parser, 2-bit
encoder, and fixed-shape chunk packer with a background pipeline thread
(fastx.cpp) — the framework's equivalent of the reference's kseq/bseq
front-end and the read stage of its kt_pipeline.  This module builds the
library on first use (g++, cached by mtime) and exposes it through
ctypes as `NativePackReader`, a drop-in for io.pack.pack_records.

If the toolchain or zlib is unavailable the package falls back to the
pure-Python reader transparently (`available()` returns False).
"""

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "fastx.cpp"),
         os.path.join(_DIR, "khlayout.cpp")]
_LIB = os.path.join(_DIR, "libyakfastx.so")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB,
           *_SRCS, "-lz", "-lpthread"]
    r = subprocess.run(cmd, capture_output=True)
    if r.returncode != 0:
        print(f"[W::native] build failed, using Python reader:\n"
              f"{r.stderr.decode()[:500]}", file=sys.stderr)
        return False
    return True


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("YAK_TPU_NO_NATIVE"):
        return None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < max(map(os.path.getmtime,
                                                    _SRCS))):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        print(f"[W::native] load failed, using Python reader: {e}",
              file=sys.stderr)
        return None
    lib.yx_open.restype = ctypes.c_void_p
    lib.yx_open.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                            ctypes.c_long, ctypes.c_int, ctypes.c_int]
    lib.yx_next.restype = ctypes.c_long
    lib.yx_next.argtypes = [ctypes.c_void_p]
    for name, res in [("yx_codes", ctypes.POINTER(ctypes.c_uint8)),
                      ("yx_seq_id", ctypes.POINTER(ctypes.c_int32)),
                      ("yx_pos", ctypes.POINTER(ctypes.c_int32)),
                      ("yx_plo", ctypes.POINTER(ctypes.c_uint32)),
                      ("yx_phi", ctypes.POINTER(ctypes.c_uint32)),
                      ("yx_pnn", ctypes.POINTER(ctypes.c_uint32)),
                      ("yx_meta_names", ctypes.c_char_p)]:
        getattr(lib, name).restype = res
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.yx_meta_n.restype = ctypes.c_long
    lib.yx_meta_n.argtypes = [ctypes.c_void_p]
    lib.yx_plane_words.restype = ctypes.c_long
    lib.yx_plane_words.argtypes = [ctypes.c_void_p]
    lib.yx_meta_names_len.restype = ctypes.c_long
    lib.yx_meta_names_len.argtypes = [ctypes.c_void_p]
    lib.yx_meta_fill.restype = None
    lib.yx_meta_fill.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_int64)] * 5
    lib.yx_n_seq.restype = ctypes.c_int64
    lib.yx_n_seq.argtypes = [ctypes.c_void_p]
    lib.yx_close.restype = None
    lib.yx_close.argtypes = [ctypes.c_void_p]
    # khashl-layout simulator (khlayout.cpp, byte-exact .yak dumps)
    lib.ykl_create.restype = ctypes.c_void_p
    lib.ykl_create.argtypes = [ctypes.c_int] * 4
    lib.ykl_count_file.restype = ctypes.c_long
    lib.ykl_count_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int]
    lib.ykl_clear_counts.restype = None
    lib.ykl_clear_counts.argtypes = [ctypes.c_void_p]
    lib.ykl_shrink.restype = None
    lib.ykl_shrink.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.ykl_tot.restype = ctypes.c_int64
    lib.ykl_tot.argtypes = [ctypes.c_void_p]
    lib.ykl_shard_cap.restype = ctypes.c_uint32
    lib.ykl_shard_cap.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ykl_shard_size.restype = ctypes.c_uint32
    lib.ykl_shard_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ykl_shard_keys.restype = ctypes.c_uint32
    lib.ykl_shard_keys.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_uint64)]
    lib.ykl_destroy.restype = None
    lib.ykl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available():
    return _load() is not None


class KhashlLayout:
    """Host-side simulator of the reference insert protocol + khashl slot
    layout (khlayout.cpp) — produces the byte-exact within-shard key
    order of a reference-produced `.yak` dump (htab.c:373-394).  Used
    only by the opt-in exact-order dump path (io/exactdump.py); the TPU
    table remains the source of truth for contents."""

    def __init__(self, k, pre, bf_shift=0, bf_n_hash=4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.pre = int(pre)
        self._h = lib.ykl_create(int(k), int(pre), int(bf_shift),
                                 int(bf_n_hash))
        if not self._h:
            raise ValueError("bad khlayout parameters")

    def count_file(self, path, create_new=True):
        n = self._lib.ykl_count_file(self._h, str(path).encode(),
                                     1 if create_new else 0)
        if n < 0:
            raise FileNotFoundError(path)
        return int(n)

    def clear_counts(self):
        self._lib.ykl_clear_counts(self._h)

    def shrink(self, mn, mx):
        self._lib.ykl_shrink(self._h, int(mn), int(mx))

    @property
    def tot(self):
        return int(self._lib.ykl_tot(self._h))

    def shard(self, s):
        """(capacity, in-table file keys u64[size] in slot order)."""
        cap = int(self._lib.ykl_shard_cap(self._h, s))
        size = int(self._lib.ykl_shard_size(self._h, s))
        out = np.empty(size, np.uint64)
        if size:
            n = int(self._lib.ykl_shard_keys(
                self._h, s,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))))
            assert n == size, (n, size)
        return cap, out

    def close(self):
        if self._h:
            self._lib.ykl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class _LazyNames:
    """Lazy gid -> name view over the (ascending) gid array and the
    '\n'-joined name blob: the eager 55k-entry dict build per chunk
    cost more host time than the whole C++ parse (measured — it was
    the per-record overhead gap); the default workloads touch at most
    one name per chunk."""

    __slots__ = ("_gids", "_blob", "_names")

    def __init__(self, gids, blob):
        self._gids, self._blob, self._names = gids, blob, None

    def _split(self):
        if self._names is None:
            self._names = self._blob.decode().split(
                "\n")[:len(self._gids)]
        return self._names

    def __getitem__(self, gi):
        i = int(np.searchsorted(self._gids, gi))
        if i >= len(self._gids) or self._gids[i] != gi:
            raise KeyError(gi)
        return self._split()[i]

    def items(self):
        return zip((int(g) for g in self._gids), self._split())

    def __iter__(self):
        return (int(g) for g in self._gids)

    def __len__(self):
        return len(self._gids)

    def __eq__(self, other):
        return dict(self.items()) == other

    __hash__ = None


class _LazyLens:
    """Lazy gid -> full-record-length view (same motivation)."""

    __slots__ = ("_gids", "_lens")

    def __init__(self, gids, lens):
        self._gids, self._lens = gids, lens

    def __getitem__(self, gi):
        i = int(np.searchsorted(self._gids, gi))
        if i >= len(self._gids) or self._gids[i] != gi:
            raise KeyError(gi)
        return int(self._lens[i])

    def __len__(self):
        return len(self._gids)

    def items(self):
        return ((int(g), int(v)) for g, v in
                zip(self._gids, self._lens))

    def __eq__(self, other):
        return dict(self.items()) == other

    __hash__ = None


class _NativeChunk:
    """Mirror of io.pack.PackedChunk backed by native buffers (copied out,
    since the native chunk is recycled on the next yx_next)."""

    __slots__ = ("codes", "seq_id", "pos", "n_bases", "seq_names",
                 "seq_lens", "rec_gid", "rec_len", "rec_start", "rec_off0",
                 "rec_take", "planes")


class NativePackReader:
    """Iterate PackedChunk-compatible chunks from a FASTA/FASTQ path.

    min_len: drop records shorter than this before packing (count.c:94's
    `l < k` skip; pass 0 to keep everything, the scan path).
    """

    def __init__(self, path, chunk_size, k, min_len=0, with_meta=True,
                 n_buf=4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._chunk_size = int(chunk_size)
        self._with_meta = with_meta
        # meta levels: 0 none, 1 records only (no per-position arrays),
        # 2 full (seq_id/pos) — "records" is the cheap qv-style mode
        level = 0 if not with_meta else (1 if with_meta == "records" else 2)
        self._level = level
        p = "-" if path in (None, "-") else str(path)
        self._h = lib.yx_open(p.encode(), self._chunk_size, int(k),
                              int(min_len), level, int(n_buf))
        if not self._h:
            raise FileNotFoundError(p)

    def __iter__(self):
        return self

    def __next__(self):
        if self._h is None:
            raise StopIteration
        n = self._lib.yx_next(self._h)
        if n < 0:
            self.close()
            raise StopIteration
        c = _NativeChunk()
        c.n_bases = int(n)
        cs = self._chunk_size
        c.codes = np.ctypeslib.as_array(
            self._lib.yx_codes(self._h), (cs,)).copy()
        W = int(self._lib.yx_plane_words(self._h))
        c.planes = tuple(
            np.ctypeslib.as_array(getattr(self._lib, f)(self._h),
                                  (W,)).reshape(1, W).copy()
            for f in ("yx_plo", "yx_phi", "yx_pnn"))
        c.seq_id = c.pos = None
        c.seq_names = {}
        c.seq_lens = {}
        c.rec_gid = c.rec_len = c.rec_start = c.rec_off0 = c.rec_take = None
        if self._level >= 2:
            c.seq_id = np.ctypeslib.as_array(
                self._lib.yx_seq_id(self._h), (cs,)).copy()
            c.pos = np.ctypeslib.as_array(
                self._lib.yx_pos(self._h), (cs,)).copy()
        if self._level >= 1:
            m = int(self._lib.yx_meta_n(self._h))
            arrs = [np.empty(m, np.int64) for _ in range(5)]
            blob = b""
            if m:
                self._lib.yx_meta_fill(self._h, *[
                    a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
                    for a in arrs])
                nlen = int(self._lib.yx_meta_names_len(self._h))
                blob = ctypes.string_at(
                    self._lib.yx_meta_names(self._h), nlen)
            gids, lens, starts, off0s, takes = arrs
            c.rec_gid, c.rec_len = gids, lens
            c.rec_start, c.rec_off0, c.rec_take = starts, off0s, takes
            c.seq_names = _LazyNames(gids, blob)
            c.seq_lens = _LazyLens(gids, lens)
        return c

    @property
    def n_seq(self):
        """Records accepted so far (parser side; final after exhaustion)."""
        return int(self._lib.yx_n_seq(self._h)) if self._h else self._n_seq

    def close(self):
        if self._h is not None:
            self._n_seq = int(self._lib.yx_n_seq(self._h))
            self._lib.yx_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
