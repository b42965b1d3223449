"""Probe TPU: compile+run times of the primitives the table engine uses."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import yak_tpu  # noqa: F401  (enables x64)

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def bench(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t1 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t2 = time.time()
    n = args[0].shape[0]
    print(f"{name:40s} n=2^{int(np.log2(n))} compile+run={t1-t0:7.2f}s "
          f"run={t2-t1:7.4f}s  ({n/(t2-t1)/1e6:8.1f}M/s)", flush=True)
    return out


for lg in [16, 20, 22]:
    n = 1 << lg
    h64 = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    h32 = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.uint32))
    v32 = jnp.asarray(rng.integers(0, 1000, n, dtype=np.int32))
    u8 = jnp.asarray(rng.integers(0, 2, n, dtype=np.uint8))

    bench("sort u32 single", lambda a: jax.lax.sort((a,), num_keys=1)[0], h32)
    bench("sort u64 single", lambda a: jax.lax.sort((a,), num_keys=1)[0], h64)
    bench("sort (u8,u64,u8,i32) nk=3",
          lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=3)[1],
          u8, h64, u8, v32)
    bench("scan-max i32",
          lambda a: jax.lax.associative_scan(jnp.maximum, a), v32)
    bench("seg or-scan (bool,i32)",
          lambda f, v: jax.lax.associative_scan(
              lambda x, y: (x[0] | y[0],
                            jnp.where(y[0], y[1], x[1] + y[1])),
              (f, v))[1],
          u8 > 0, v32)
    bench("hash64", lambda a: __import__("yak_tpu.ops.hash", fromlist=["h"])
          .hash64(a, (1 << 62) - 1), h64)
print("DONE", flush=True)
