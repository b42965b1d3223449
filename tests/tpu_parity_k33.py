"""TPU end-to-end k=33 parity vs the oracle: the wide (k >= 32
raw-u64 hash_long key) engines on real hardware — the r4-default wide
pmerge path (in-jit XLA u64 sort + wide Pallas merge kernel,
countstep.get_count_wide_step) and the wide Bloom -b gate
(get_bloom_gate_post(wide=True)).  Reference: count.c:45-60.
k>31 `yak print` aborts in the reference, so parity is checked by
parsing both .yak files (io/yakfmt) and comparing (hash, count) maps.
"""
import sys, os
sys.path.insert(0, 'tests'); sys.path.insert(0, '.')
import numpy as np
import util
from yak_tpu.models.count import count, count_file, CountOpts
import yak_tpu.io.yakfmt as yakfmt
import jax
print("backend:", jax.default_backend(), flush=True)
os.makedirs('.testdata', exist_ok=True)


def cmp(ours, ref):
    ka, pa, ha, ca = yakfmt.restore_yak(ours)
    kb, pb, hb, cb = yakfmt.restore_yak(ref)
    assert (ka, pa) == (kb, pb), (ka, pa, kb, pb)
    da = dict(zip(ha.tolist(), ca.tolist()))
    db = dict(zip(hb.tolist(), cb.tolist()))
    assert da == db, f"MISMATCH {len(da)} vs {len(db)}"
    return len(da)


rng = np.random.default_rng(321)
reads = util.mutate_reads(rng, util.make_genome(rng, 50000), 2000, 120,
                          err=0.01, n_rate=0.005)
util.to_fasta('.testdata/k33_reads.fa', reads)

util.run_oracle(['count', '-k33', '-K200000',
                 '-o', '.testdata/k33_ref.yak', '.testdata/k33_reads.fa'])
t = count_file('.testdata/k33_reads.fa', CountOpts(k=33, chunk_size=40000))
t.dump('.testdata/k33_ours.yak')
n = cmp('.testdata/k33_ours.yak', '.testdata/k33_ref.yak')
print("TPU K33 WIDE PARITY OK:", n, "distinct kmers", flush=True)

util.run_oracle(['count', '-b18', '-k33', '-K200000',
                 '-o', '.testdata/k33b_ref.yak', '.testdata/k33_reads.fa',
                 '.testdata/k33_reads.fa'])
os.environ["YAK_TPU_BLOOM_TWO_PASS"] = "1"   # cover the wide gate post
t = count(['.testdata/k33_reads.fa', '.testdata/k33_reads.fa'],
          CountOpts(k=33, bf_shift=18, chunk_size=40000))
t.dump('.testdata/k33b_ours.yak')
n = cmp('.testdata/k33b_ours.yak', '.testdata/k33b_ref.yak')
print("TPU K33 BLOOM TWO-PASS PARITY OK:", n, "kmers", flush=True)
