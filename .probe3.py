import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import yak_tpu  # noqa: F401

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def bench(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t1 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t2 = time.time()
    n = args[0].shape[0]
    print(f"{name:36s} n=2^{int(np.log2(n))} compile+run={t1-t0:7.2f}s "
          f"run={t2-t1:7.4f}s ({n/max(t2-t1,1e-9)/1e6:9.1f}M/s)", flush=True)
    return out


for lg in [22, 24]:
    n = 1 << lg
    h64 = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    v32 = jnp.asarray(rng.integers(0, 1000, n, dtype=np.int32))
    bench("cumsum i32", lambda a: jnp.cumsum(a), v32)
    bench("cumsum i64 of i32", lambda a: jnp.cumsum(a.astype(jnp.int64)), v32)
    bench("sort u64+i32 payload nk=1",
          lambda a, b: jax.lax.sort((a, b), num_keys=1)[0], h64, v32)
    bench("sort u64+i32+i32 nk=1",
          lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1)[0],
          h64, v32, v32)
print("DONE", flush=True)
