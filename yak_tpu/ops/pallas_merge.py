"""Pallas merge-reduce kernel: the hash-table insert, speed-of-light.

merge_batch's big sort concatenates the (already sorted!) table with the
sorted batch and re-sorts cap+B lanes.  This kernel replaces that with a
single streaming pass: a merge-path partitioned two-way merge of the two
sorted streams, run reduction (ADD with the table-presence bit riding in
the value plane), survivor compaction, and aligned output — everything
after the batch's own sort, in one kernel at HBM speed.

Per sequential grid step t (T output lanes of the union):

  1. the XLA prep pass provides a_starts[t] (merge-path binary search on
     the diagonal t*T), so step t loads A[a_t : a_t+T] and the matching
     window of the front-INF-padded DESCENDING batch — giving exactly
     the classic first exchange pair (A[i], B[b_t+T-1-i]) elementwise
     with no in-kernel flip;
  2. one min-exchange keeps the T smallest of the 2T window (the max
     half is re-read from HBM by later steps — merge-path windows
     overlap), then a log2(T)-stage bitonic cleanup sorts the tile;
  3. key runs reduce with a segmented Hillis-Steele sum; a run that
     touches the tile boundary is never emitted locally — it carries in
     SMEM (key, partial sum) and either continues into the next tile or
     is injected as a survivor there.  One all-pad trailing tile
     guarantees the final run closes;
  4. survivors (run ends; only has-table runs when create=False)
     butterfly-compact and append through the same pending-block +
     1024-aligned DMA scheme as ops/pallas_compact.py.

Value plane packing: table lanes carry cnt | 1<<27, batch lanes carry
their add weight; a run's reduced sum therefore holds the saturating-add
input in bits [0,27) and the table-presence count above — yak's
create/increment-only semantics fall out of two masks (htab.c:61-78).
Keys travel as hi/lo u32 planes with PAD/INF = hi bit 31 (dead table
lanes, invalid batch lanes, beyond-end window lanes): pads sort to the
global tail and close the last real run.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yak_tpu.ops.pallas_compact import (A, S, T, _AR, _R, _SR, _STAGES,
                                        _rot_right_dyn, _shl, _shr)

_INF = np.uint32(0xFFFFFFFF)  # numpy scalar: a literal, not a traced const
_TBIT = 27                     # table-presence bit in the value plane
_VMASK = (1 << _TBIT) - 1
_WA = T + A                    # aligned input window
_WR = _WA // 128


def _less(h1, l1, h2, l2):
    return (h1 < h2) | ((h1 == h2) & (l1 < l2))


def _flat_iota(shape):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1]
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))


def _load_window(src_refs, scratch_refs, sems, base_lane, slot, sem_off):
    """Start DMAs for an aligned (WA)-lane window beginning at the
    1024-aligned `base_lane` of each 2-D HBM plane, into double-buffer
    `slot` of each (2, WR, 128) scratch."""
    rows = pl.multiple_of(base_lane // 128, _AR)
    for j, (src, dst) in enumerate(zip(src_refs, scratch_refs)):
        pltpu.make_async_copy(
            src.at[pl.ds(rows, _WR), :], dst.at[slot],
            sems.at[sem_off + j]).start()


def _wait_window(src_refs, scratch_refs, sems, base_lane, slot, sem_off):
    rows = pl.multiple_of(base_lane // 128, _AR)
    for j, (src, dst) in enumerate(zip(src_refs, scratch_refs)):
        pltpu.make_async_copy(
            src.at[pl.ds(rows, _WR), :], dst.at[slot],
            sems.at[sem_off + j]).wait()


def _take_window(scratch_refs, slot, off, n_left):
    """Rotate double-buffer `slot` of the (2, WR, 128) scratch so the
    true window starts at flat 0, take the first (R,128) rows, and
    INF-mask lanes beyond n_left."""
    out = []
    fi = None
    for ref in scratch_refs:
        x = _rot_right_dyn(ref[slot], jnp.int32(_WA) - off)[0:_R]
        if fi is None:
            fi = _flat_iota(x.shape)
        out.append(x)
    oob = fi >= n_left
    out[0] = jnp.where(oob, _INF, out[0])
    out[1] = jnp.where(oob, _INF, out[1])
    out[2] = jnp.where(oob, 0, out[2])
    return out


def _bitonic_clean(hi, lo, w):
    """Sort a bitonic (T,)-tile ascending: the remaining stages of a 2T
    bitonic merger after the cross-stream min-exchange (distances
    T/2 .. 1); low lane of each pair keeps the min, high keeps the max."""
    fi = _flat_iota(hi.shape)
    for b in range(_STAGES - 1, -1, -1):
        s = 1 << b
        low = (fi & s) == 0
        phi = jnp.where(low, _shl(hi, s, _INF), _shr(hi, s, jnp.uint32(0)))
        plo = jnp.where(low, _shl(lo, s, _INF), _shr(lo, s, jnp.uint32(0)))
        pw = jnp.where(low, _shl(w, s, jnp.int32(0)),
                       _shr(w, s, jnp.int32(0)))
        # no select on i1 vectors in Mosaic: combine with boolean algebra
        take = ((low & _less(phi, plo, hi, lo))
                | (~low & _less(hi, lo, phi, plo)))
        hi = jnp.where(take, phi, hi)
        lo = jnp.where(take, plo, lo)
        w = jnp.where(take, pw, w)
    return hi, lo, w


def _butterfly_compact(keep, planes):
    """Route kept lanes left to their rank (see pallas_compact)."""
    drop = jnp.where(keep, 0, 1).astype(jnp.int32)
    p = drop
    for b in range(_STAGES):
        p = p + _shr(p, 1 << b, jnp.int32(0))
    dist = jnp.where(keep, p - drop, 0)
    alive = keep
    planes = list(planes)
    for b in range(_STAGES):
        s = 1 << b
        move = alive & ((dist & s) != 0)
        arriving = _shl(move.astype(jnp.int32), s, jnp.int32(0)) != 0
        for ix in range(len(planes)):
            planes[ix] = jnp.where(
                arriving, _shl(planes[ix], s, planes[ix].dtype.type(0)),
                planes[ix])
        dist = jnp.where(arriving, _shl(dist, s, jnp.int32(0)) - s, dist)
        alive = (alive & ~move) | arriving
    return planes


def _make_kernel(Na, Nb, create, grid):
    """Kernel closure over static (Na = table cap lanes, Nb = batch
    lanes, create flag, grid length).  Input windows are double-buffered:
    step t prefetches step t+1's A/B windows into the alternate slot
    before waiting on its own, so DMA latency hides behind compute."""

    def kernel(asr, Ahi, Alo, Aw, Bhi, Blo, Bw,
               Ohi, Olo, Ov, Osz, Onw,
               st, ck, wah, wal, waw, wbh, wbl, wbw,
               ph_, pl2, pv, sh, sl, sv, sems):
        t = pl.program_id(0)
        slot = jax.lax.rem(t, 2)

        def bases(tt):
            a_tt = asr[tt]
            b_tt = tt * T - a_tt
            # b index into the front-INF-padded DESCENDING batch
            return a_tt, (a_tt // A) * A, Nb - b_tt

        @pl.when(t == 0)
        def _():
            st[0] = jnp.int32(0)   # emitted total
            st[1] = jnp.int32(0)   # n_new
            st[2] = jnp.int32(0)   # carry open
            st[3] = jnp.int32(0)   # carry sum
            ck[0] = jnp.uint32(0)
            ck[1] = jnp.uint32(0)
            a_0, a0_base, b0_idx = bases(0)
            _load_window((Ahi, Alo, Aw), (wah, wal, waw), sems,
                         a0_base, 0, 0)
            _load_window((Bhi, Blo, Bw), (wbh, wbl, wbw), sems,
                         (b0_idx // A) * A, 0, 3)

        @pl.when(t + 1 < grid)
        def _():
            a_n, an_base, bn_idx = bases(t + 1)
            nslot = 1 - slot
            _load_window((Ahi, Alo, Aw), (wah, wal, waw), sems,
                         an_base, nslot, nslot * 6)
            _load_window((Bhi, Blo, Bw), (wbh, wbl, wbw), sems,
                         (bn_idx // A) * A, nslot, nslot * 6 + 3)

        a_t, a_base, b_idx = bases(t)
        b_base = (b_idx // A) * A
        _wait_window((Ahi, Alo, Aw), (wah, wal, waw), sems, a_base,
                     slot, slot * 6)
        _wait_window((Bhi, Blo, Bw), (wbh, wbl, wbw), sems, b_base,
                     slot, slot * 6 + 3)
        ah, al, aw = _take_window((wah, wal, waw), slot, a_t - a_base,
                                  Na - a_t)
        bh, bl, bw = _take_window((wbh, wbl, wbw), slot, b_idx - b_base,
                                  jnp.int32(T))

        # cross-stream min-exchange: bwin[i] = B_asc[b_t + T-1-i]
        selb = _less(bh, bl, ah, al)
        hi = jnp.where(selb, bh, ah)
        lo = jnp.where(selb, bl, al)
        w = jnp.where(selb, bw, aw)
        hi, lo, w = _bitonic_clean(hi, lo, w)

        fi = _flat_iota(hi.shape)
        real = hi < jnp.uint32(1 << 31)
        # run identity ignores the stream tiebreak bit (packed bit 0)
        lo_id = lo | jnp.uint32(1)
        prev_hi = _shr(hi, 1, jnp.uint32(0))
        prev_lo = _shr(lo_id, 1, jnp.uint32(0))
        neq = (hi != prev_hi) | (lo_id != prev_lo)
        carry_open = st[2]
        cont0 = (carry_open == 1) & (hi == ck[0]) & (lo_id == ck[1])
        lane0 = fi == 0
        start = (lane0 & ~cont0) | (~lane0 & neq)

        # segmented inclusive sum of the value plane (the boundary fill
        # treats the tile edge as a segment start, which is exactly the
        # within-tile semantics; the carried prefix is added below)
        f = start.astype(jnp.int32)
        v = jnp.where(real, w, 0)
        for b in range(_STAGES):
            s = 1 << b
            vs = _shr(v, s, jnp.int32(0))
            fs = _shr(f, s, jnp.int32(1))
            v = jnp.where(f > 0, v, v + vs)
            f = f | fs
        # lanes before the first actual start continue the carried run
        first_start = jnp.min(jnp.where(start, fi, jnp.int32(T)))
        cont = (fi < first_start) & real & (carry_open == 1)
        v = v + jnp.where(cont, st[3], 0)

        ns = _shl(start.astype(jnp.int32), 1, jnp.int32(0))
        end = real & (ns != 0)
        has_tab = (v >> _TBIT) > 0
        val = jnp.minimum(v & _VMASK, 1023)
        if create:
            keep = end
        else:
            keep = end & has_tab
        kept = jnp.sum(keep.astype(jnp.int32))
        created = jnp.sum((keep & ~has_tab).astype(jnp.int32))

        # carried-run bookkeeping (lane T-1 never emits locally);
        # Mosaic only extracts 32-bit scalars, so cast the bool
        last_real = real.astype(jnp.int32)[_R - 1, 127] > 0
        last_hi = hi[_R - 1, 127]
        last_lo = lo_id[_R - 1, 127]
        last_sum = v[_R - 1, 127]
        c0s = (carry_open == 1) & (hi[0, 0] == ck[0]) & (lo_id[0, 0] == ck[1])
        c_tab = (st[3] >> _TBIT) > 0
        c_keep = True if create else c_tab
        inject = ((carry_open == 1) & ~c0s & c_keep).astype(jnp.int32)
        inj_hi = ck[0]
        inj_lo = ck[1]
        inj_val = jnp.minimum(st[3] & _VMASK, 1023)
        inj_new = inject * jnp.where(c_tab, 0, 1)

        chi, clo, cv = _butterfly_compact(keep, [hi, lo, val])

        tot = st[0]
        p_off = jax.lax.rem(tot, jnp.int32(A))
        shift = p_off + inject
        new_tot = tot + inject + kept
        d = (new_tot - jax.lax.rem(new_tot, jnp.int32(A))) - (tot - p_off)
        base_rows = pl.multiple_of((tot - p_off) // 128, _AR)

        flat8 = _flat_iota((_AR, 128))
        for s_ref, p_ref, plane, inj_v in (
                (sh, ph_, chi, inj_hi), (sl, pl2, clo, inj_lo),
                (sv, pv, cv, inj_val)):
            s_ref[0:_R] = plane
            s_ref[_R:_SR] = jnp.zeros((_SR - _R, 128), s_ref.dtype)
            rot = _rot_right_dyn(s_ref[:], shift)
            head = jnp.where(flat8 < p_off, p_ref[:], rot[0:_AR])
            head = jnp.where((flat8 == p_off) & (inject == 1),
                             inj_v.astype(s_ref.dtype), head)
            s_ref[0:_AR] = head
            s_ref[_AR:_SR] = rot[_AR:_SR]
            staged = s_ref[:]
            p_ref[:] = _rot_right_dyn(staged, jnp.int32(S) - d)[0:_AR]

        for j, (src, dst) in enumerate(((sh, Ohi), (sl, Olo), (sv, Ov))):
            pltpu.make_async_copy(
                src, dst.at[pl.ds(base_rows, _SR), :], sems.at[12 + j]).start()
        for j, (src, dst) in enumerate(((sh, Ohi), (sl, Olo), (sv, Ov))):
            pltpu.make_async_copy(
                src, dst.at[pl.ds(base_rows, _SR), :], sems.at[12 + j]).wait()

        st[0] = new_tot
        st[1] = st[1] + created + inj_new
        st[2] = jnp.where(last_real, jnp.int32(1), jnp.int32(0))
        st[3] = jnp.where(last_real, last_sum, jnp.int32(0))
        ck[0] = jnp.where(last_real, last_hi, jnp.uint32(0))
        ck[1] = jnp.where(last_real, last_lo, jnp.uint32(0))
        # the trailing all-pad tile guarantees the carry is closed by the
        # last step, so the final write is the true emitted count
        Osz[0, 0] = new_tot
        Onw[0, 0] = st[1]

    return kernel


@lru_cache(maxsize=None)
def _merge_call(Na, Nb, a_rows, b_rows, create, interpret):
    """Build the pallas_call for static (table lanes, batch lanes,
    padded input rows, create)."""
    grid = (Na + Nb) // T + 1
    out_rows = (grid * T + S) // 128
    kernel = _make_kernel(Na, Nb, create, grid)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        scratch_shapes=[
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SMEM((2,), jnp.uint32),
            pltpu.VMEM((2, _WR, 128), jnp.uint32),
            pltpu.VMEM((2, _WR, 128), jnp.uint32),
            pltpu.VMEM((2, _WR, 128), jnp.int32),
            pltpu.VMEM((2, _WR, 128), jnp.uint32),
            pltpu.VMEM((2, _WR, 128), jnp.uint32),
            pltpu.VMEM((2, _WR, 128), jnp.int32),
            pltpu.VMEM((_AR, 128), jnp.uint32),
            pltpu.VMEM((_AR, 128), jnp.uint32),
            pltpu.VMEM((_AR, 128), jnp.int32),
            pltpu.VMEM((_SR, 128), jnp.uint32),
            pltpu.VMEM((_SR, 128), jnp.uint32),
            pltpu.VMEM((_SR, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((15,)),
        ],
    )

    def fn(a_starts, thi, tlo, tw, bhi, blo, bw):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
                jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
                jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32)],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(a_starts,
          thi.reshape(a_rows, 128), tlo.reshape(a_rows, 128),
          tw.reshape(a_rows, 128),
          bhi.reshape(b_rows, 128), blo.reshape(b_rows, 128),
          bw.reshape(b_rows, 128))

    return jax.jit(fn)


def merge_reduce(a_starts, thi, tlo, tw, bhi, blo, bw, Na, Nb,
                 create=True, interpret=False):
    """Run the merge-reduce kernel on prepped planes (pmerge_prep).

    Returns (ohi 2-D, olo 2-D, ov 2-D, size (1,1) i32, n_new (1,1) i32);
    slice/recombine with countstep.finalize_pmerge.  Must be called
    OUTSIDE jit (flips the x64 flag)."""
    a_rows = thi.shape[0] * thi.shape[1] // 128 if thi.ndim == 2 \
        else thi.shape[0] // 128
    b_rows = bhi.shape[0] * bhi.shape[1] // 128 if bhi.ndim == 2 \
        else bhi.shape[0] // 128
    x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        return _merge_call(Na, Nb, a_rows, b_rows, create, interpret)(
            a_starts, thi, tlo, tw, bhi, blo, bw)
    finally:
        jax.config.update("jax_enable_x64", x64)
