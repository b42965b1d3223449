"""TPU end-to-end -b two-pass Bloom protocol parity vs the oracle."""
import sys, os
sys.path.insert(0, 'tests'); sys.path.insert(0, '.')
import numpy as np
import util
from yak_tpu.models.count import count, CountOpts
import jax
print("backend:", jax.default_backend(), flush=True)
os.makedirs('.testdata', exist_ok=True)
rng = np.random.default_rng(5)
reads = util.mutate_reads(rng, util.make_genome(rng, 30000), 3000, 100,
                          err=0.005)
util.to_fasta('.testdata/bl_reads.fa', reads)
util.run_oracle(['count', '-b20', '-k21', '-K200000',
                 '-o', '.testdata/bl_ref.yak', '.testdata/bl_reads.fa',
                 '.testdata/bl_reads.fa'])
b = util.oracle_print_counts('.testdata/bl_ref.yak')
# 1. the default same-file shortcut (single ungated pass + shrink)
t = count(['.testdata/bl_reads.fa', '.testdata/bl_reads.fa'],
          CountOpts(k=21, bf_shift=20, chunk_size=50000))
t.dump('.testdata/bl_ours.yak')
a = util.oracle_print_counts('.testdata/bl_ours.yak')
assert a == b, f"SHORTCUT MISMATCH {len(a)} vs {len(b)}"
print("TPU BLOOM SHORTCUT PARITY OK:", len(a), "kmers", flush=True)
# 2. the literal two-pass protocol (gate-post engine on hardware)
os.environ["YAK_TPU_BLOOM_TWO_PASS"] = "1"
t = count(['.testdata/bl_reads.fa', '.testdata/bl_reads.fa'],
          CountOpts(k=21, bf_shift=20, chunk_size=50000))
t.dump('.testdata/bl_ours2.yak')
a = util.oracle_print_counts('.testdata/bl_ours2.yak')
assert a == b, f"PROTOCOL MISMATCH {len(a)} vs {len(b)}"
print("TPU BLOOM TWO-PASS PARITY OK:", len(a), "kmers", flush=True)
