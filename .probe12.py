import time
import numpy as np
import jax
import jax.numpy as jnp
import bench
from yak_tpu.ops.kmers import extract_kmer_hashes
from yak_tpu.ops import sorttable as st
from yak_tpu.ops import pallas_compact as pc
from yak_tpu.ops.countstep import get_count_step, recombine_u64

K = bench.K
chunks = bench.pack_chunks(bench.make_reads())
G, L = 3, chunks[0].shape[0]
codes_np = np.stack(chunks[:3])
CAP = 1 << 23
B = G * (L - K + 1)


def timed(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms", flush=True)
    return out


codes = jnp.asarray(codes_np)
jax.block_until_ready(codes)

# 1. transfer
t0 = time.time()
for _ in range(3):
    jax.block_until_ready(jnp.asarray(codes_np))
print(f"{'transfer 12.6MB x3':34s} {(time.time()-t0)/3*1e3:8.1f} ms", flush=True)

# 2. extract only
ex = jax.jit(lambda c: extract_kmer_hashes(c, K))
timed("extract G=3", ex, codes)

# 3. batch sort only (the irreducible part)
h, valid = ex(codes)
hf = h.reshape(-1)
vf = valid.reshape(-1)
srt = jax.jit(lambda h, v: jax.lax.sort(
    (jnp.where(v, h << jnp.uint64(1), jnp.uint64(1 << 63)),
     jnp.ones(h.shape, jnp.int32)), num_keys=1, is_stable=False))
timed("batch-only sort B=12.6M", srt, hf, vf)

# 4. full fused step (current: merge sort N=21M + scans, no compaction)
keys, cnt, size = st.make_table(CAP)
step = get_count_step(K, True, None, compact=False)
timed("fused step (extract+sort21M+scans)", step, codes, keys, cnt, size)

# 5. pallas compact at merged width
out = step(codes, keys, cnt, size)
khi, klo, ov = out[0], out[1], out[2]
timed("pallas compact", lambda a, b, c: pc.compact_u32(a, b, c),
      khi, klo, ov)
print("DONE")
