"""yak-tpu: a TPU-native k-mer spectrum engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of lh3/yak
(reference: /root/reference): k-mer counting into sharded hash tables,
assembly/read QV estimation, spectrum comparison, trio binning / phasing
evaluation, sex-chromosome partitioning, error-streak detection, and set
algebra over k-mer tables — designed TPU-first:

- canonical k-mer extraction and the 64-bit invertible hash run as
  vectorized VPU bit-ops over padded base batches (no per-base scalar loop);
- the counting store is a functional open-addressing table in HBM,
  updated by sort-dedup + vectorized linear probing (conflict resolution
  via scatter-min claims) instead of serial pointer chasing;
- multi-chip scaling uses a jax.sharding.Mesh: data-parallel ingest,
  an all-to-all radix shuffle over ICI routing each hash to its owner
  chip (generalizing yak's low-`pre`-bit shard partition, count.c:17-26),
  and psum-reduced histograms;
- tiny float64 model fits (the QV error model, qv.c:146) stay on host.

The `.yak` table file format is reproduced exactly (htab.c:373-481) as the
interop surface with hifiasm-era tooling.
"""

import os

import jax

# The whole engine works on 64-bit hashes and 2k-bit packed k-mers;
# uint64 must be first-class.
jax.config.update("jax_enable_x64", True)

# XLA sort/scan graphs at table scale take tens of seconds to compile on
# TPU toolchains; a persistent on-disk cache makes that a one-time cost
# across processes (measured 30s -> 0.05s on re-run).
_cache = os.environ.get("YAK_TPU_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/yak_tpu_xla"))
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"

YAK_MAX_KMER = 31        # yak.h:8
YAK_COUNTER_BITS = 10    # yak.h:9
YAK_N_COUNTS = 1 << YAK_COUNTER_BITS
YAK_MAX_COUNT = (1 << YAK_COUNTER_BITS) - 1
YAK_BLK_SHIFT = 9        # yak.h:13 (512-bit Bloom blocks)
YAK_MAGIC = b"YAK\2"     # yak.h:23

# Table load modes (yak.h:16-21)
YAK_LOAD_ALL = 1
YAK_LOAD_TRIOBIN1 = 2
YAK_LOAD_TRIOBIN2 = 3
YAK_LOAD_SEXCHR1 = 4
YAK_LOAD_SEXCHR2 = 5
YAK_LOAD_SEXCHR3 = 6
