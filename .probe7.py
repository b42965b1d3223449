import numpy as np
import jax
import jax.numpy as jnp
import yak_tpu  # noqa
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)


# 1. trivial kernel
def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2


x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
try:
    o = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    print("basic i32 kernel:", np.asarray(o)[0, :3], flush=True)
except Exception as e:
    print("basic kernel FAILED:", str(e)[:300], flush=True)

# 2. u64 in kernel?
try:
    x64 = jnp.arange(8 * 128, dtype=jnp.uint64).reshape(8, 128)
    o = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct(x64.shape, x64.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x64)
    print("u64 kernel OK:", np.asarray(o)[0, :3], flush=True)
except Exception as e:
    print("u64 kernel FAILED:", str(e)[:200], flush=True)


# 3. roll + sequential-grid SMEM carry + dynamic-offset DMA out
def k3(x_ref, o_ref, cur_ref, stage_ref, sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cur_ref[0] = 0

    t = pltpu.roll(x_ref[:], jnp.int32(1), axis=1) + cur_ref[0]
    stage_ref[:] = t
    cp = pltpu.make_async_copy(
        stage_ref, o_ref.at[pl.ds(cur_ref[0] * 8, 8), :], sem)
    cp.start()
    cp.wait()
    cur_ref[0] = cur_ref[0] + 1


try:
    x = jnp.arange(4 * 8 * 128, dtype=jnp.int32).reshape(32, 128)
    o = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
        grid=(4,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    o = np.asarray(o)
    ok = np.array_equal(o[8:16, 0], np.roll(np.arange(8*128, 2*8*128
         ).reshape(8, 128), 1, axis=1)[:, 0] + 1)
    print("grid/SMEM/DMA kernel OK, check:", ok, o[0, :3], flush=True)
except Exception as e:
    print("grid kernel FAILED:", str(e)[:500], flush=True)
print("DONE")
