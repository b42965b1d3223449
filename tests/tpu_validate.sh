#!/bin/bash
# Full TPU validation sequence (run from the repo root with the TPU
# tunnel up).  Order matters: the parity drivers compile + validate the
# psort engine's Mosaic kernels incrementally (per-pass jits populate
# the persistent cache, ~28 kernels x ~6 shape families through the
# remote-compile tunnel — the FIRST run carries a large one-time
# compile bill; interrupted runs resume from the cache).  bench.py runs
# twice: the first warms any remaining shapes, the second is the clean
# measurement.  Do not run the CPU pytest suite concurrently (1 core).
set -e
cd "$(dirname "$0")/.."
echo "== TPU parity (count/qv/triobin end-to-end vs oracle) =="
timeout 3000 python tests/tpu_parity.py
echo "== TPU parity: Bloom two-pass =="
timeout 1800 python tests/tpu_parity_bloom.py
echo "== bench (warm) =="
# warm pass exists to populate the persistent compile cache: give it
# the whole window so bench.py's per-section budget never skips a
# section (a skipped section would push its compile bill into the
# clean run / the driver's measured run)
YAK_TPU_BENCH_BUDGET=2300 timeout 2400 python bench.py || true
echo "== bench (clean) =="
timeout 1800 python bench.py
