import time
import numpy as np
import jax
import jax.numpy as jnp
import yak_tpu  # noqa

rng = np.random.default_rng(0)
for stable in (True, False):
    for lg in (23, 24):
        n = 1 << lg
        v = jnp.ones(n, jnp.int32)
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                              is_stable=stable))
        x = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
        jax.block_until_ready(f(x, v))
        x = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
        jax.block_until_ready(x)
        t0 = time.time()
        jax.block_until_ready(f(x, v))
        dt = time.time() - t0
        print(f"stable={stable} 2^{lg}: {dt:.4f}s ({n/dt/1e6:.0f}M/s)",
              flush=True)
# sort keys only (no payload) for comparison
for lg in (24,):
    n = 1 << lg
    f = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False))
    x = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    jax.block_until_ready(f(x))
    x = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    t0 = time.time()
    jax.block_until_ready(f(x))
    print(f"keys-only unstable 2^{lg}: {time.time()-t0:.4f}s", flush=True)
print("DONE")
