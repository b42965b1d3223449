"""Pallas stream-compaction kernel: drop marked lanes, close the gaps.

The sort-merge table engine ends every merge with a *compaction*: kept
lanes (run ends) are in ascending key order but interleaved with dropped
lanes.  XLA's only scatter-free compaction is another full sort (~half
the merge cost).  This kernel does it in one streaming pass instead:

  grid steps are SEQUENTIAL on a TPU core, so SMEM state carries the
  running kept-total; each step loads a T-lane tile, routes its kept
  lanes left to their local rank with a log2(T)-stage butterfly (shift
  by 2^b when bit b of the remaining distance is set — collision-free
  for monotone compaction ranks; verified against a NumPy oracle in
  tests/test_pallas.py), prepends the carried partial block, and DMAs
  one full staging window to the 1024-aligned output base.  HBM DMA
  offsets must be 1024-element aligned, so the sub-block remainder of
  each step's output is carried in a VMEM pending buffer and re-written
  by the next step (the window beyond the kept total is garbage that
  later steps overwrite; the final tail lies beyond the returned size,
  which callers mask).

Mosaic has no 64-bit vectors (and Pallas grids mis-lower under
jax_enable_x64), so keys travel as hi/lo u32 planes and the wrapper
flips the x64 flag around the call; the drop marker is the table
engine's PAD bit = hi-plane bit 31 (ops/sorttable.py key packing).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 8192          # lanes per tile
A = 1024          # HBM DMA alignment (elements)
S = T + A         # staging window
_R = T // 128     # tile rows
_AR = A // 128    # pending rows
_SR = S // 128    # staging rows
_STAGES = 13      # log2(T)


def enabled():
    v = os.environ.get("YAK_TPU_PALLAS", "1")
    return v not in ("0", "false", "no")


def _shl(x, s, fill):
    """Flat shift toward LOWER index by static power-of-two s
    (y[j] = x[j+s]) on an (R, 128) tile; `fill` enters at the tail."""
    R = x.shape[0]
    if s >= 128:
        q = s // 128
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        y = pltpu.roll(x, R - q, axis=0)
        return jnp.where(rows < R - q, y, fill)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    a = pltpu.roll(x, 128 - s, axis=1)                 # x[r, c+s] (wraps)
    b = pltpu.roll(pltpu.roll(x, R - 1, axis=0), 128 - s,
                   axis=1)                             # x[r+1, c+s-128]
    y = jnp.where(cols < 128 - s, a, b)
    tail = (rows == R - 1) & (cols >= 128 - s)
    return jnp.where(tail, fill, y)


def _shr(x, s, fill):
    """Flat shift toward HIGHER index by static s (y[j] = x[j-s])."""
    R = x.shape[0]
    if s >= 128:
        q = s // 128
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        y = pltpu.roll(x, q, axis=0)
        return jnp.where(rows >= q, y, fill)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    a = pltpu.roll(x, s, axis=1)                       # x[r, c-s] (wraps)
    b = pltpu.roll(pltpu.roll(x, 1, axis=0), s, axis=1)    # x[r-1, c-128+s]
    y = jnp.where(cols >= s, a, b)
    head = (rows == 0) & (cols < s)
    return jnp.where(head, fill, y)


def _rot_right_dyn(x, p):
    """Flat circular rotate toward HIGHER index by dynamic p (i32,
    taken mod the flat size): y[flat j] = x[(j - p) mod n]."""
    R = x.shape[0]
    p = jax.lax.rem(p, jnp.int32(R * 128))
    q = p // 128
    m = p % 128
    q1 = jax.lax.rem(q + 1, jnp.int32(R))
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    a = pltpu.roll(pltpu.roll(x, q, axis=0), m, axis=1)
    b = pltpu.roll(pltpu.roll(x, q1, axis=0), m, axis=1)
    return jnp.where(cols >= m, a, b)


def _compact_tile(khi, klo, v):
    """Butterfly-compact one (R,128) tile; returns planes + kept count."""
    keep = khi < jnp.uint32(1 << 31)        # PAD bit clear
    drop = jnp.where(keep, 1, 0).astype(jnp.int32)
    drop = 1 - drop
    p = drop
    for b in range(_STAGES):
        p = p + _shr(p, 1 << b, jnp.int32(0))
    dist = jnp.where(keep, p - drop, 0)

    alive = keep
    for b in range(_STAGES):
        s = 1 << b
        move = alive & ((dist & s) != 0)
        # rotate only 32-bit vectors (Mosaic can't rotate i1)
        arriving = _shl(move.astype(jnp.int32), s, jnp.int32(0)) != 0
        khi = jnp.where(arriving, _shl(khi, s, jnp.uint32(0)), khi)
        klo = jnp.where(arriving, _shl(klo, s, jnp.uint32(0)), klo)
        v = jnp.where(arriving, _shl(v, s, jnp.int32(0)), v)
        dist = jnp.where(arriving, _shl(dist, s, jnp.int32(0)) - s, dist)
        alive = (alive & ~move) | arriving
    return khi, klo, v, jnp.sum(keep.astype(jnp.int32))


def _kernel(khi_ref, klo_ref, v_ref, ohi_ref, olo_ref, ov_ref,
            tot_ref, phi_ref, plo_ref, pv_ref,
            shi_ref, slo_ref, sv_ref, sems):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        tot_ref[0] = jnp.int32(0)

    chi, clo, cv, kept = _compact_tile(khi_ref[:], klo_ref[:], v_ref[:])
    tot = tot_ref[0]
    p = jax.lax.rem(tot, jnp.int32(A))
    new_tot = tot + kept
    d = (new_tot - jax.lax.rem(new_tot, jnp.int32(A))) - (tot - p)
    base_rows = pl.multiple_of((tot - p) // 128, _AR)

    flat8 = (jax.lax.broadcasted_iota(jnp.int32, (_AR, 128), 0) * 128
             + jax.lax.broadcasted_iota(jnp.int32, (_AR, 128), 1))
    for s_ref, p_ref, plane in ((shi_ref, phi_ref, chi),
                                (slo_ref, plo_ref, clo),
                                (sv_ref, pv_ref, cv)):
        s_ref[0:_R] = plane
        s_ref[_R:_SR] = jnp.zeros((_SR - _R, 128), s_ref.dtype)
        rot = _rot_right_dyn(s_ref[:], p)      # tile shifted up by p
        head = jnp.where(flat8 < p, p_ref[:], rot[0:_AR])
        s_ref[0:_AR] = head
        s_ref[_AR:_SR] = rot[_AR:_SR]
        staged = s_ref[:]
        # new pending = staged[d : d + A)
        p_ref[:] = _rot_right_dyn(staged, jnp.int32(S) - d)[0:_AR]

    for j, (src, dst) in enumerate(((shi_ref, ohi_ref), (slo_ref, olo_ref),
                                    (sv_ref, ov_ref))):
        pltpu.make_async_copy(
            src, dst.at[pl.ds(base_rows, _SR), :], sems.at[j]).start()
    for j, (src, dst) in enumerate(((shi_ref, ohi_ref), (slo_ref, olo_ref),
                                    (sv_ref, ov_ref))):
        pltpu.make_async_copy(
            src, dst.at[pl.ds(base_rows, _SR), :], sems.at[j]).wait()
    tot_ref[0] = new_tot


@lru_cache(maxsize=None)
def _compact_call(n, interpret):
    n_pad = -(-n // T) * T
    grid = n_pad // T
    out_rows = (n_pad + S) // 128

    def fn(khi, klo, v):
        if n_pad != n:
            khi = jnp.concatenate(
                [khi, jnp.full(n_pad - n, 0xFFFFFFFF, jnp.uint32)])
            klo = jnp.concatenate(
                [klo, jnp.zeros(n_pad - n, jnp.uint32)])
            v = jnp.concatenate([v, jnp.zeros(n_pad - n, jnp.int32)])
        return pl.pallas_call(
            _kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((_R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
                jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
                jax.ShapeDtypeStruct((out_rows, 128), jnp.int32)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                            pltpu.VMEM((_AR, 128), jnp.uint32),
                            pltpu.VMEM((_AR, 128), jnp.uint32),
                            pltpu.VMEM((_AR, 128), jnp.int32),
                            pltpu.VMEM((_SR, 128), jnp.uint32),
                            pltpu.VMEM((_SR, 128), jnp.uint32),
                            pltpu.VMEM((_SR, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA((3,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(khi.reshape(grid * _R, 128), klo.reshape(grid * _R, 128),
          v.reshape(grid * _R, 128))

    return jax.jit(fn)


def compact_raw(khi, klo, v, interpret=False):
    """Compact (khi, klo, v) u32/u32/i32 arrays, dropping lanes whose
    khi bit 31 is set; kept lanes pack at the front in original order.
    Returns 2-D padded planes ((n_pad+S)/128, 128) — ONE dispatch; the
    caller slices/recombines inside its own jit (countstep.finalize).

    Must be called OUTSIDE any jit (it flips the x64 flag around the
    dispatch — Pallas grids mis-lower under x64 on this toolchain).
    """
    x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        return _compact_call(khi.shape[0], interpret)(khi, klo, v)
    finally:
        jax.config.update("jax_enable_x64", x64)


def compact_u32(khi, klo, v, interpret=False):
    """Test-friendly wrapper: flat same-length outputs (tail garbage)."""
    n = khi.shape[0]
    ohi, olo, ov = compact_raw(khi, klo, v, interpret)
    return (ohi.reshape(-1)[:n], olo.reshape(-1)[:n], ov.reshape(-1)[:n])


def compact_reference(khi, klo, v):
    """NumPy oracle for tests."""
    khi = np.asarray(khi)
    keep = khi < (1 << 31)
    out = [np.zeros_like(np.asarray(a)) for a in (khi, klo, v)]
    m = int(keep.sum())
    for o, a in zip(out, (khi, klo, v)):
        o[:m] = np.asarray(a)[keep]
    return out[0], out[1], out[2], m
