import time
import numpy as np
import jax
import jax.numpy as jnp
import yak_tpu  # noqa
from yak_tpu.ops import sorttable as st

rng = np.random.default_rng(0)
CAP, B = 1 << 23, 12_582_438  # bench flush shape

keys, cnt, size = st.make_table(CAP)
h0 = jnp.asarray(rng.integers(0, 1 << 62, B, dtype=np.uint64))
add = jnp.ones(B, jnp.int32)
val = jnp.ones(B, bool)
# warm
keys, cnt, size, _, _ = st.merge_batch(keys, cnt, size, h0, add, val)
jax.block_until_ready(keys)
for i in range(3):
    h = jnp.asarray(rng.integers(0, 1 << 62, B, dtype=np.uint64))
    jax.block_until_ready(h)
    t0 = time.time()
    keys, cnt, size, _, _ = st.merge_batch(keys, cnt, size, h, add, val)
    jax.block_until_ready(keys)
    print(f"merge cap=2^23 B=12.6M: {time.time()-t0:.3f}s", flush=True)

# raw sort timings with fresh inputs
for lg in (23, 24, 25):
    n = 1 << lg
    v = jnp.ones(n, jnp.int32)
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    x = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    jax.block_until_ready(f(x, v))  # compile
    x = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    jax.block_until_ready(x)
    t0 = time.time()
    o = f(x, v)
    jax.block_until_ready(o)
    dt = time.time() - t0
    print(f"sort u64+i32 2^{lg}: {dt:.4f}s ({n/dt/1e6:.0f}M/s)", flush=True)
print("DONE")
