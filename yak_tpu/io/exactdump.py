"""Opt-in byte-exact `.yak` dumps (reference khashl slot order).

The only part of the `.yak` format that io/yakfmt.py does not reproduce
byte-for-byte is the *within-shard key order*: reference yak writes keys
in khashl slot order (htab.c:373-394), an artifact of per-shard
insertion order, while we write sorted order (deterministic and
topology-invariant; reference yak reads either identically).

For workflows that diff dump files byte-for-byte, this module emulates
the reference layout: a native simulator (native/khlayout.cpp) replays
the reference insert protocol — canonical k-mer hashing, shard split,
blocked-Bloom gating, khashl put/resize, two-pass clear + shrink — over
the *original input files* on the host, yielding each shard's capacity
and slot-ordered keys.  The TPU table remains the source of truth: the
simulator's (hash, count) multiset is cross-checked against the table
and any disagreement aborts the exact dump (falling back would write a
file that lies about its provenance, so we raise instead).

Byte-parity holds for tables produced by `count` (plain or -b two-pass)
from the original inputs; it is verified against the reference binary in
tests/test_exactdump.py.  Enabled by CountOpts.exact, the CLI's
`-X` flag on `count`, or YAK_TPU_EXACT_DUMP=1.
"""

import struct
import sys

import numpy as np

from yak_tpu import YAK_COUNTER_BITS, YAK_MAGIC, YAK_MAX_COUNT


def simulate_layout(k, pre, files, bf_shift=0, bf_n_hash=4):
    """Replay the reference count protocol (main.c:53-60) on the host.

    files: the `count` positional args (1 or 2 paths; with bf_shift > 0
    the second pass reads files[1] if present else files[0]).
    Returns a native.KhashlLayout holding the final per-shard layouts.
    """
    from yak_tpu.native import KhashlLayout
    sim = KhashlLayout(k, pre, bf_shift=bf_shift, bf_n_hash=bf_n_hash)
    sim.count_file(files[0], create_new=True)
    if bf_shift > 0:
        sim.clear_counts()
        second = files[1] if len(files) >= 2 else files[0]
        sim.count_file(second, create_new=False)
        sim.shrink(2, YAK_MAX_COUNT)
    return sim


def dump_yak_exact(path, table, files, bf_shift=0, bf_n_hash=4):
    """Write `table` as a `.yak` file with reference-identical bytes.

    Re-streams `files` through the khashl-layout simulator, verifies the
    simulator and the device table agree on the full (hash, count)
    multiset (an independent host-vs-TPU end-to-end cross-check), then
    writes the simulator's slot-ordered keys.  Raises ValueError on any
    disagreement rather than writing a misattributed file.

    bf_shift/bf_n_hash: the *count options* used to build the table (the
    table's own BF is destroyed mid-protocol, so they are passed in).
    """
    sim = simulate_layout(table.k, table.pre, files,
                          bf_shift=bf_shift, bf_n_hash=bf_n_hash)
    k, pre = table.k, table.pre
    nsh = 1 << pre
    caps = []
    keyruns = []
    shards = []
    for s in range(nsh):
        cap, keys = sim.shard(s)
        caps.append(cap)
        keyruns.append(keys)
        shards.append(np.full(len(keys), s, np.uint64))
    sim.close()

    # cross-check: same (hash, count) multiset as the device table
    simkeys = np.concatenate(keyruns) if keyruns else np.zeros(0, np.uint64)
    allsh = np.concatenate(shards) if shards else np.zeros(0, np.uint64)
    sim_hash = ((simkeys >> np.uint64(YAK_COUNTER_BITS)) << np.uint64(pre)
                ) | allsh
    sim_cnt = (simkeys & np.uint64(YAK_MAX_COUNT)).astype(np.int64)
    t_hash, t_cnt = table.items()
    t_cnt = np.asarray(t_cnt, np.int64) & YAK_MAX_COUNT
    so, to = np.argsort(sim_hash, kind="stable"), np.argsort(
        np.asarray(t_hash, np.uint64), kind="stable")
    if not (len(sim_hash) == len(t_hash)
            and np.array_equal(sim_hash[so], np.asarray(t_hash,
                                                        np.uint64)[to])
            and np.array_equal(sim_cnt[so], t_cnt[to])):
        raise ValueError(
            "exact-dump cross-check failed: host replay and device table "
            f"disagree ({len(sim_hash)} vs {len(t_hash)} keys) — refusing "
            "to write a byte-exact dump that does not match the table")

    to_stdout = path == "-"
    fp = sys.stdout.buffer if to_stdout else open(path, "wb")
    try:
        fp.write(YAK_MAGIC)
        fp.write(struct.pack("<3I", k, pre, YAK_COUNTER_BITS))
        for s in range(nsh):
            fp.write(struct.pack("<2I", caps[s], len(keyruns[s])))
            if len(keyruns[s]):
                fp.write(keyruns[s].astype("<u8").tobytes())
    finally:
        if not to_stdout:
            fp.close()
