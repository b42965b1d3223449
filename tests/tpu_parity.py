"""End-to-end count parity on the REAL TPU (pallas path) vs the oracle."""
import sys, subprocess
sys.path.insert(0, 'tests'); sys.path.insert(0, '.')
import numpy as np
import util
from yak_tpu.models.count import count_file, CountOpts
import jax
print("backend:", jax.default_backend(), flush=True)
import os
os.makedirs('.testdata', exist_ok=True)
rng = np.random.default_rng(123)
reads = util.mutate_reads(rng, util.make_genome(rng, 50000), 2000, 120,
                          err=0.01, n_rate=0.005)
util.to_fasta('.testdata/tpu_reads.fa', reads)
util.run_oracle(['count', '-k31', '-K200000', '-o', '.testdata/tpu_ref.yak',
                 '.testdata/tpu_reads.fa'])
t = count_file('.testdata/tpu_reads.fa', CountOpts(k=31, chunk_size=40000))
t.dump('.testdata/tpu_ours.yak')
a = util.oracle_print_counts('.testdata/tpu_ours.yak')
b = util.oracle_print_counts('.testdata/tpu_ref.yak')
assert a == b, f"MISMATCH: {len(a)} vs {len(b)} kmers"
print("TPU COUNT PARITY OK:", len(a), "distinct kmers", flush=True)
