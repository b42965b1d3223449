"""The `count` workload: stream sequences -> canonical k-mer hashes ->
counting table (count.c:147-166), plus `recount` (count.c:168-193) and
the Bloom two-pass `-b` protocol (main.c:53-60).

Pipeline shape mirrors the reference's 3-step kt_pipeline but TPU-first:
host packs fixed-shape flat code chunks (io/pack.py) while the device
runs extract+insert on the previous chunk (async dispatch overlaps them
naturally — JAX queues device work ahead of host).
"""

import sys
import time
from dataclasses import dataclass

from yak_tpu.io.chunks import ChunkSource
from yak_tpu.table import KmerTable


@dataclass
class CountOpts:
    """Defaults per yak_copt_init (misc.c:23-32)."""
    k: int = 31
    pre: int = 10
    bf_shift: int = 0
    bf_n_hash: int = 4
    n_thread: int = 4          # accepted for CLI parity; unused on TPU
    chunk_size: int = 10_000_000
    cap_log2: int = 16         # initial table capacity (grows amortized)
    # -X byte-exact dumps: run the serial-exact Bloom gate (reference
    # htab.c:57-70 bit-for-bit) so the pass-1 key set matches the
    # reference even when pass 2 reads a different file.  The default
    # cheap gate already yields the exact two-pass OUTPUT for same-file
    # passes (ops/countstep._gate_batch)
    exact: bool = False


def _device_chunk(opt):
    # fixed flat-buffer size: one compiled shape for the whole run
    c = max(1 << 14, min(int(opt.chunk_size), 1 << 23))
    return -(-c // 1024) * 1024


def count_file(fn, opt, table=None):
    """Count k-mers of one file into `table` (created if None).

    table=None -> create-new mode; otherwise increment-existing-only
    (the pass-2 / recount path, htab.c:71-75).
    """
    create_new = table is None
    if table is None:
        table = KmerTable(opt.k, opt.pre, cap_log2=opt.cap_log2,
                          bf_n_hash=opt.bf_n_hash, bf_shift=opt.bf_shift,
                          bf_exact=getattr(opt, "exact", False))
    else:
        assert table.k == opt.k and table.pre == opt.pre
    chunk = _device_chunk(opt)
    # record-level meta ("records") costs next to nothing and lets the
    # periodic-layout check run on metadata instead of scanning codes
    src = ChunkSource(fn, chunk, opt.k, min_len=opt.k,  # count.c:94 skip
                      with_meta="records")
    from yak_tpu.io.pack import detect_periodic_meta
    from yak_tpu.utils import Progress
    prog = Progress("count_file")
    for packed in src:
        per = detect_periodic_meta(packed)
        table.insert_codes(packed.codes, create_new=create_new,
                           planes=getattr(packed, "planes", None),
                           periodic=per if per else False)
        # per-chunk line (count.c:140-141 shape); the distinct-k-mer
        # figure is the last SETTLED fold (the current fold is still in
        # flight — syncing here would serialize the pipeline)
        prog.line(f"processed {src.n_seq} sequences; {table._tot} "
                  f"distinct k-mers in the hash table")
    prog.line(f"processed {src.n_seq} sequences; {table.tot} distinct "
              f"k-mers in the hash table")
    return table


def _same_stream(a, b):
    """Whether the two -b pass inputs are the same file (the author-
    recommended recipe passes the reads twice: `yak count -b37 sr.fq.gz
    sr.fq.gz`)."""
    import os
    if a == b:
        return True
    try:
        return os.path.realpath(a) == os.path.realpath(b)
    except OSError:
        return False


def count(files, opt):
    """Full `yak count` semantics including the `-b` two-pass protocol
    (main.c:53-60): pass 1 Bloom-gated; destroy BF, zero counts; pass 2
    over the second input (or the same file) increments existing keys;
    shrink to counts >= 2.

    Same-file shortcut (default; YAK_TPU_BLOOM_TWO_PASS=1 forces the
    literal protocol): when both passes read the SAME stream, the
    protocol's final table is EXACTLY {key: total_count | total >= 2} —
    a key's second occurrence always passes the gate (all probed bits
    set by the first), pass 2 then recounts EVERY occurrence of every
    admitted key, and the shrink drops the gate's false-positive
    singletons — so one ungated pass + shrink produces the identical
    table at half the ingest/extract cost and zero gate cost.  The gate
    only changes the OUTPUT when the two passes read different streams
    (pass-1 singleton admission then matters), and the real two-pass
    runs in that case.  The -X byte-exact dump path is unaffected: its
    host simulator always replays the literal protocol and cross-checks
    the multiset (identical by the argument above)."""
    import os
    second = files[1] if len(files) >= 2 else files[0]
    if (opt.bf_shift > 0 and _same_stream(files[0], second)
            and not os.environ.get("YAK_TPU_BLOOM_TWO_PASS")):
        from dataclasses import replace
        table = count_file(files[0], replace(opt, bf_shift=0))
        table.shrink(2, 1023)
        print(f"[M::count] {table.tot} distinct k-mers after shrinking",
              file=sys.stderr)
        return table
    table = count_file(files[0], opt)
    if opt.bf_shift > 0:
        table.destroy_bf()
        table.clear_counts()
        count_file(second, opt, table=table)
        table.shrink(2, 1023)
        print(f"[M::count] {table.tot} distinct k-mers after shrinking",
              file=sys.stderr)
    return table


def recount(fn, table):
    """Zero counts then re-count only existing keys (yak_recount)."""
    table.clear_counts()
    o = CountOpts(k=table.k, pre=table.pre)
    chunk = _device_chunk(o)
    from yak_tpu.io.pack import detect_periodic_meta
    for packed in ChunkSource(fn, chunk, table.k, with_meta="records"):
        per = detect_periodic_meta(packed)
        table.insert_codes(packed.codes, create_new=False,
                           planes=getattr(packed, "planes", None),
                           periodic=per if per else False)
    return table
