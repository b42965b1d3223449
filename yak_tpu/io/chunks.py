"""Unified chunk source: native C++ pipeline when available, pure-Python
packer otherwise.

Every workload consumes the same stream of fixed-shape PackedChunks
(io/pack.py docstring for the layout).  `packed_chunks` hides which
front-end produced them; the native path (yak_tpu/native) additionally
overlaps parsing/packing with device compute via a background thread —
the role of the read step in the reference's kt_pipeline
(kthread.c:74-159, count.c:88-110).
"""

from yak_tpu import native
from yak_tpu.io.fasta import FastxReader
from yak_tpu.io.pack import pack_records


class ChunkSource:
    """Iterable of PackedChunks over one file; exposes n_seq after
    exhaustion (the per-file sequence tally used by count's log line)."""

    def __init__(self, path, chunk_size, k, min_len=0, with_meta=True,
                 force_python=False):
        self._n_seq = 0
        self._native = None
        if not force_python and native.available():
            self._native = native.NativePackReader(
                path, chunk_size, k, min_len=min_len, with_meta=with_meta)
            return
        self._reader = FastxReader(path)
        self._chunk_size = chunk_size
        self._k = k
        self._min_len = min_len
        self._with_meta = with_meta

    def __iter__(self):
        if self._native is not None:
            yield from self._native
            self._n_seq = self._native.n_seq
            return

        def recs():
            for rec in self._reader:
                if len(rec.seq) < self._min_len:
                    continue
                self._n_seq += 1
                yield rec

        yield from pack_records(recs(), self._chunk_size, self._k,
                                with_meta=self._with_meta)
        self._reader.close()

    @property
    def n_seq(self):
        return self._n_seq

    def close(self):
        if self._native is not None:
            self._native.close()
        elif hasattr(self, "_reader"):
            self._reader.close()


def packed_chunks(path, chunk_size, k, min_len=0, with_meta=True,
                  force_python=False):
    return ChunkSource(path, chunk_size, k, min_len=min_len,
                       with_meta=with_meta, force_python=force_python)
