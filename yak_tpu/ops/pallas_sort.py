"""Pallas hierarchical bitonic sort: the batch sort, off the HBM wall.

XLA's `lax.sort` on TPU is a bitonic network that runs EVERY
compare-exchange stage as its own HBM pass: for the count path's
2^23-lane u64 batch that is ~276 passes x 128MB r+w = ~35GB, i.e. the
measured ~45ms at v5e HBM speed (~60% of count device time, CLAUDE.md).
The network's arithmetic is trivial -- the cost is memory traffic.

This kernel keeps every stage whose exchange distance fits inside a
VMEM window ON CHIP: lanes are tiled into windows of W = 2^17; one
windowed pass loads a window once and runs ALL of its in-window stages
back-to-back (the initial pass runs the full local network, levels
1..log2 W = 153 stages in one load/store).  Only stages with distance
>= W touch HBM individually, and those are rare: for n = 2^23 there are
just 21 cross-window exchange passes + 6 windowed tail passes + 1 local
pass = 28 HBM round trips instead of ~276.  The VPU work is unchanged
(the bitonic network is what it is) but it runs from VMEM, so the sort
drops from HBM-bound ~45ms toward the ~10ms VPU floor.

Layout contract (shared with ops/pallas_merge): no 64-bit vectors in
Mosaic, so keys travel as hi/lo u32 planes; any extra planes (payloads,
add weights) ride along under the same take masks.  All window blocks
are 128-row aligned and each program writes only its own block, so none
of pallas_compact's pending-block/alignment machinery is needed --
plain BlockSpec pipelining does the DMA.

Bitonic indexing: level k (block size 2^k pairs of sorted runs), stage
j (exchange distance d = 2^j), partner of lane i is i ^ d, direction of
lane i is bit k of its GLOBAL index (ascending iff clear) -- all masks
fall out of one global flat iota, valid for windowed and cross-window
passes alike because window bases are W-aligned.

The caller pads lanes to a power of two with 0x...00 keys; zeros sort
to the FRONT ascending, which after the optional final complement
(negate_keys) is exactly the merge kernel's "descending E with INF
front pads" contract (ops/pallas_merge.py docstring).

Grids MIS-LOWER under jax_enable_x64 on this toolchain (CLAUDE.md), so
`sort_planes` flips the flag around the whole jitted pass chain, like
pallas_merge.merge_reduce.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = np.uint32(0xFFFFFFFF)

W_LANES = 1 << 17       # window lanes: levels 1..17 run in one VMEM pass


def _flat_iota(shape):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1]
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))


def _less(h1, l1, h2, l2):
    return (h1 < h2) | ((h1 == h2) & (l1 < l2))


def _xroll(x, d):
    """y[f] = x[f ^ d] over the flat index of an (R, 128) tile, for a
    static power-of-two d.  XOR never carries, so d < 128 stays within
    a row (lane roll) and d >= 128 is a pure row roll; the circular
    wrap of each roll is only ever read by lanes whose partner is
    in-range, so no masking is needed."""
    R = x.shape[0]
    if d < 128:
        cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        fwd = pltpu.roll(x, 128 - d, axis=1)    # y[c] = x[c + d]
        bwd = pltpu.roll(x, d, axis=1)          # y[c] = x[c - d]
        return jnp.where((cols & d) == 0, fwd, bwd)
    q = d // 128
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    fwd = pltpu.roll(x, R - q, axis=0)          # y[r] = x[r + q]
    bwd = pltpu.roll(x, q, axis=0)              # y[r] = x[r - q]
    return jnp.where((rows & q) == 0, fwd, bwd)


def _stage(planes, d, dirm, gf, key_planes=2):
    """One compare-exchange stage at distance d.  dirm: descending-block
    mask (bit k of global index set); gf: global flat index tile.
    key_planes=1 compares only plane 0 (u32 keys; the rest are
    payload) — half the compare work for narrow-key sorts."""
    partners = [_xroll(p, d) for p in planes]
    if key_planes == 1:
        h, ph = planes[0], partners[0]
        less_po = ph < h
        less_op = h < ph
    else:
        h, lo = planes[0], planes[1]
        ph, plo = partners[0], partners[1]
        less_po = _less(ph, plo, h, lo)   # partner < own
        less_op = _less(h, lo, ph, plo)
    bitset = (gf & d) != 0
    # the low lane of a pair keeps the min in an ascending block; ties
    # keep self (both strict compares false) -- consistent everywhere
    want_min = ~(bitset ^ dirm)
    take = (want_min & less_po) | (~want_min & less_op)
    return [jnp.where(take, pp, p) for p, pp in zip(planes, partners)]


def _windowed_kernel(nplanes, W, levels, neg_keys, key_planes=2):
    """Kernel running, per window block, the stage list
    `levels = [(k, j_hi), ...]` (stages j_hi..0 of each level k);
    neg_keys complements the key planes on the final write (turning
    ascending xs into the merge kernel's descending E for free)."""
    WR = W // 128

    def kernel(*refs):
        ins, outs = refs[:nplanes], refs[nplanes:]
        w = pl.program_id(0)
        base = w * W
        fi = _flat_iota((WR, 128))
        gf = fi + base
        planes = [r[:] for r in ins]
        for (k, j_hi) in levels:
            dirm = (gf & (1 << k)) != 0
            for j in range(j_hi, -1, -1):
                planes = _stage(planes, 1 << j, dirm, gf, key_planes)
        for idx in range(nplanes):
            val = planes[idx]
            if neg_keys and idx < key_planes:
                val = ~val
            outs[idx][:] = val

    return kernel


def _exchange_kernel(nplanes, W, k, j, key_planes=2):
    """One cross-window stage (d = 2^j >= W): program w exchanges its
    window elementwise with window w ^ (d // W) and writes only its own
    block (both sides read both blocks; no aliasing, no races)."""
    WR = W // 128
    d = 1 << j

    def kernel(*refs):
        mine = refs[:nplanes]
        other = refs[nplanes:2 * nplanes]
        outs = refs[2 * nplanes:]
        w = pl.program_id(0)
        base = w * W
        gf = _flat_iota((WR, 128)) + base
        dirm = (gf & (1 << k)) != 0
        bitset = (gf & d) != 0
        want_min = ~(bitset ^ dirm)
        if key_planes == 1:
            h, oh = mine[0][:], other[0][:]
            less_po = oh < h
            less_op = h < oh
        else:
            h, lo = mine[0][:], mine[1][:]
            oh, olo = other[0][:], other[1][:]
            less_po = _less(oh, olo, h, lo)
            less_op = _less(h, lo, oh, olo)
        take = (want_min & less_po) | (~want_min & less_op)
        for idx in range(nplanes):
            outs[idx][:] = jnp.where(take, other[idx][:], mine[idx][:])

    return kernel


def _exchange_kernel_dyn(nplanes, key_planes=2):
    """_exchange_kernel with (k, j) as PREFETCHED SCALARS instead of
    compile-time constants: ONE kernel serves every cross-window stage
    of a shape family (a 2^24-lane sort runs 28 exchange passes — as
    28 loads of one executable instead of 28 Mosaic compiles through
    the remote-compile tunnel).  The partner window is selected by the
    scalar-aware BlockSpec index_map in _ex_call_dyn."""

    def kernel(s, *refs):
        mine = refs[:nplanes]
        other = refs[nplanes:2 * nplanes]
        outs = refs[2 * nplanes:]
        WR = mine[0].shape[0]
        w = pl.program_id(0)
        base = w * (WR * 128)
        gf = _flat_iota((WR, 128)) + base
        dk = jnp.left_shift(jnp.int32(1), s[0])
        d = jnp.left_shift(jnp.int32(1), s[1])
        dirm = (gf & dk) != 0
        bitset = (gf & d) != 0
        want_min = ~(bitset ^ dirm)
        if key_planes == 1:
            h, oh = mine[0][:], other[0][:]
            less_po = oh < h
            less_op = h < oh
        else:
            h, lo = mine[0][:], mine[1][:]
            oh, olo = other[0][:], other[1][:]
            less_po = _less(oh, olo, h, lo)
            less_op = _less(h, lo, oh, olo)
        take = (want_min & less_po) | (~want_min & less_op)
        for idx in range(nplanes):
            outs[idx][:] = jnp.where(take, other[idx][:], mine[idx][:])

    return kernel


def _tail_kernel_dyn(nplanes, W, neg, key_planes=2):
    """The per-level windowed tail (stages wlog-1..0 of ONE level k)
    with k as a prefetched scalar: one kernel serves every tail pass of
    a multi-window sort (k only enters via the direction mask; the
    stage distances are static)."""
    WR = W // 128
    wlog = W.bit_length() - 1

    def kernel(s, *refs):
        ins, outs = refs[:nplanes], refs[nplanes:]
        w = pl.program_id(0)
        base = w * W
        gf = _flat_iota((WR, 128)) + base
        dk = jnp.left_shift(jnp.int32(1), s[0])
        dirm = (gf & dk) != 0
        planes = [r[:] for r in ins]
        for j in range(wlog - 1, -1, -1):
            planes = _stage(planes, 1 << j, dirm, gf, key_planes)
        for idx in range(nplanes):
            val = planes[idx]
            if neg and idx < key_planes:
                val = ~val
            outs[idx][:] = val

    return kernel


def _stage_params(pairs, S):
    """Encode a bitonic stage list [(k, j), ...] as the loop kernel's
    prefetched (3, S+1) i32 array: column 0 = [n_stages, neg, 0] (neg
    patched by the caller), column 1+i = [1<<k, lane-roll d, row-roll q]
    where d = 2^j splits into a lane part (< 128) and a row part
    (>= 128) — exactly one is nonzero, the other encodes identity."""
    n = len(pairs)
    assert n <= S, (n, S)
    a = np.zeros((3, S + 1), np.int32)
    a[0, 0] = n
    for i, (k, j) in enumerate(pairs):
        a[0, 1 + i] = 1 << k
        if j < 7:
            a[1, 1 + i] = 1 << j
        else:
            a[2, 1 + i] = 1 << (j - 7)
    return a


def _loop_kernel(nplanes, W, S, key_planes=2):
    """The windowed kernel as a LOOP over scalar-prefetched stages
    instead of an unrolled network.  Rationale: the unrolled kernels
    compile through the remote-compile tunnel at ~10s per unrolled
    stage (measured 213s for a 21-stage program), so one shape family's
    windowed passes cost ~30 minutes of one-time Mosaic compile; the
    loop body is one stage's worth of IR and compiles in seconds, and
    ONE executable serves every pass with the same trip count (the
    per-level tails all share S = wlog).  The roll amounts become
    dynamic (tpu.dynamic_rotate), costing a second roll pair per stage
    (lane pass then row pass, one of them identity) — VPU work the
    VMEM-resident sort can afford.  Stage i reads column 1+i of the
    prefetched array (see _stage_params); s[1,0] != 0 complements the
    key planes on the final write (the neg_keys contract)."""
    WR = W // 128

    def kernel(s, *refs):
        ins, outs = refs[:nplanes], refs[nplanes:]
        w = pl.program_id(0)
        base = w * W
        fi = _flat_iota((WR, 128))
        gf = fi + base
        cols = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 0)
        n = s[0, 0]

        def xroll2(x, dl, q):
            # lane pass (identity when dl == 0: both rolls are by 0)
            fl = pltpu.roll(x, (128 - dl) & 127, axis=1)
            bl = pltpu.roll(x, dl, axis=1)
            y = jnp.where((cols & dl) == 0, fl, bl)
            # row pass (identity when q == 0)
            fr = pltpu.roll(y, (WR - q) & (WR - 1), axis=0)
            br = pltpu.roll(y, q, axis=0)
            return jnp.where((rows & q) == 0, fr, br)

        def body(i, planes):
            kbit = s[0, 1 + i]
            dl = s[1, 1 + i]
            q = s[2, 1 + i]
            d = dl | (q * 128)
            dirm = (gf & kbit) != 0
            partners = [xroll2(p, dl, q) for p in planes]
            if key_planes == 1:
                h, ph = planes[0], partners[0]
                less_po = ph < h
                less_op = h < ph
            else:
                h, lo = planes[0], planes[1]
                ph, plo = partners[0], partners[1]
                less_po = _less(ph, plo, h, lo)
                less_op = _less(h, lo, ph, plo)
            bitset = (gf & d) != 0
            want_min = ~(bitset ^ dirm)
            take = (want_min & less_po) | (~want_min & less_op)
            return tuple(jnp.where(take, pp, p)
                         for p, pp in zip(planes, partners))

        planes = jax.lax.fori_loop(0, n, body,
                                   tuple(r[:] for r in ins))
        neg = s[1, 0] != 0
        for idx in range(nplanes):
            val = planes[idx]
            if idx < key_planes:
                val = jnp.where(neg, ~val, val)
            outs[idx][:] = val

    return kernel


def _loop_call(nplanes, dtypes, W, nwin, S, interpret, key_planes=2):
    WR = W // 128
    own = pl.BlockSpec((WR, 128), lambda w, s: (w, 0),
                       memory_space=pltpu.VMEM)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nwin,),
        in_specs=[own] * nplanes,
        out_specs=[own] * nplanes)
    kernel = _loop_kernel(nplanes, W, S, key_planes)

    def fn(s, planes):
        return pl.pallas_call(
            kernel, grid_spec=spec,
            out_shape=[jax.ShapeDtypeStruct((nwin * WR, 128), dt)
                       for dt in dtypes],
            interpret=interpret,
        )(s, *planes)

    return fn


def _ex_call_dyn(nplanes, dtypes, W, nwin, interpret, key_planes=2):
    WR = W // 128
    wlog = W.bit_length() - 1
    own = pl.BlockSpec((WR, 128), lambda w, s: (w, 0),
                       memory_space=pltpu.VMEM)
    par = pl.BlockSpec(
        (WR, 128),
        lambda w, s: (w ^ (1 << (s[1] - wlog)), 0),
        memory_space=pltpu.VMEM)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nwin,),
        in_specs=[own] * nplanes + [par] * nplanes,
        out_specs=[own] * nplanes)
    kernel = _exchange_kernel_dyn(nplanes, key_planes)

    def fn(kj, planes):
        return pl.pallas_call(
            kernel, grid_spec=spec,
            out_shape=[jax.ShapeDtypeStruct((nwin * WR, 128), dt)
                       for dt in dtypes],
            interpret=interpret,
        )(kj, *planes, *planes)

    return fn


def _tail_call_dyn(nplanes, dtypes, W, nwin, neg, interpret,
                   key_planes=2):
    WR = W // 128
    own = pl.BlockSpec((WR, 128), lambda w, s: (w, 0),
                       memory_space=pltpu.VMEM)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nwin,),
        in_specs=[own] * nplanes,
        out_specs=[own] * nplanes)
    kernel = _tail_kernel_dyn(nplanes, W, neg, key_planes)

    def fn(kj, planes):
        return pl.pallas_call(
            kernel, grid_spec=spec,
            out_shape=[jax.ShapeDtypeStruct((nwin * WR, 128), dt)
                       for dt in dtypes],
            interpret=interpret,
        )(kj, *planes)

    return fn


def _kjit(call, interpret):
    """jit for one sort pass.  On real TPU the windowed kernels' scoped
    VMEM footprint (W=2^17 lanes x 3 planes x in/out/partner temps over
    up-to-6 unrolled levels) is ~17.6MB — past the v5e default 16MB
    scoped-vmem cap (measured: 'Ran out of memory in memory space vmem
    ... 17.62M and limit 16.00M').  The chip has 128MB of VMEM; raise
    the per-program cap via proto-backed compiler options (forwarded
    per-compile by the remote-compile helper).  Interpret mode (CPU
    tests) must not see TPU-only flags."""
    if interpret or jax.default_backend() != "tpu":
        return jax.jit(call)
    return jax.jit(call, compiler_options={
        "xla_tpu_scoped_vmem_limit_kib": 65536})


def _mode():
    """Kernel-generation mode for the windowed passes.

    "loop" (default): scalar-steered stage LOOP kernels — 3 Mosaic
    programs per shape family (local-sort loop + tail loop + dynamic
    exchange), each one stage of IR, compiling in seconds through the
    remote-compile tunnel.  YAK_TPU_PSORT_LOOP=0 falls back to
    "dyn": unrolled windowed kernels + scalar-steered exchange/tail
    (~6 programs, ~10s of compile per unrolled stage).
    YAK_TPU_PSORT_DYN=0 falls back further to fully static per-(k, j)
    kernels (~38 programs)."""
    import os

    if os.environ.get("YAK_TPU_PSORT_LOOP", "1") != "0":
        return "loop"
    if os.environ.get("YAK_TPU_PSORT_DYN", "1") != "0":
        return "dyn"
    return "static"


def _win_call(nplanes, dtypes, W, nwin, levels, neg_keys, interpret,
              key_planes=2):
    WR = W // 128
    spec = pl.BlockSpec((WR, 128), lambda w: (w, 0),
                        memory_space=pltpu.VMEM)

    def fn(planes):
        return pl.pallas_call(
            _windowed_kernel(nplanes, W, levels, neg_keys, key_planes),
            grid=(nwin,),
            in_specs=[spec] * nplanes,
            out_specs=[spec] * nplanes,
            out_shape=[jax.ShapeDtypeStruct((nwin * WR, 128), dt)
                       for dt in dtypes],
            interpret=interpret,
        )(*planes)

    return fn


def _ex_call(nplanes, dtypes, W, nwin, k, j, interpret,
             key_planes=2):
    WR = W // 128
    m = (1 << j) // W
    own = pl.BlockSpec((WR, 128), lambda w: (w, 0),
                       memory_space=pltpu.VMEM)
    par = pl.BlockSpec((WR, 128), lambda w: (w ^ m, 0),
                       memory_space=pltpu.VMEM)

    def fn(planes):
        return pl.pallas_call(
            _exchange_kernel(nplanes, W, k, j, key_planes),
            grid=(nwin,),
            in_specs=[own] * nplanes + [par] * nplanes,
            out_specs=[own] * nplanes,
            out_shape=[jax.ShapeDtypeStruct((nwin * WR, 128), dt)
                       for dt in dtypes],
            interpret=interpret,
        )(*planes, *planes)

    return fn


def _pass_plan(Bpad, window, mode, max_levels_per_pass=6):
    """The sort's pass sequence for a static padded lane count.
    Items: ("loop", stage_pairs, trip_S, is_final) — scalar-steered
    stage-loop kernel (trip_S is the executable's static trip count;
    the local sort and the per-level tails each share one);
    ("win", levels, is_final) — static unrolled windowed kernel;
    ("ex", k, j) — static cross-window exchange;
    ("exd", k, j) / ("taild", k, is_final) — the scalar-steered
    unrolled variants."""
    W = min(window, Bpad)
    nwin = Bpad // W
    wlog = W.bit_length() - 1
    blog = Bpad.bit_length() - 1

    passes = []
    if mode == "loop":
        # the ENTIRE local sort (levels 1..wlog) in one VMEM pass
        local = [(k, j) for k in range(1, wlog + 1)
                 for j in range(k - 1, -1, -1)]
        passes.append(("loop", local, len(local), blog == wlog))
        for k in range(wlog + 1, blog + 1):
            for j in range(k - 1, wlog - 1, -1):
                passes.append(("exd", k, j))
            tail = [(k, j) for j in range(wlog - 1, -1, -1)]
            passes.append(("loop", tail, wlog, k == blog))
        return W, nwin, passes
    # local sort: the in-window network, levels 1..wlog, split into
    # level groups to keep each Mosaic program moderate
    ks = list(range(1, wlog + 1))
    for g0 in range(0, len(ks), max_levels_per_pass):
        grp = ks[g0:g0 + max_levels_per_pass]
        levels = tuple((k, k - 1) for k in grp)
        passes.append(("win", levels, blog == wlog and grp[-1] == wlog))
    dynamic = mode == "dyn"
    for k in range(wlog + 1, blog + 1):
        for j in range(k - 1, wlog - 1, -1):
            passes.append(("exd", k, j) if dynamic else ("ex", k, j))
        if dynamic:
            passes.append(("taild", k, k == blog))
        else:
            passes.append(("win", ((k, wlog - 1),), k == blog))
    return W, nwin, passes


def _build_steps(Bpad, nplanes, dtypes, neg_keys, window, interpret,
                 key_planes, mode):
    """(raw_callable, scalar_or_None) pairs for the pass chain.  The
    scalar-steered callables are SHARED across their passes — in loop
    mode 3 Mosaic programs serve the whole shape family (local-sort
    loop, tail loop, dynamic exchange), each selected per pass by its
    prefetched stage array; in dyn mode ~6; static ~38 (through the
    remote-compile tunnel, and as many live executables per
    process)."""
    W, nwin, passes = _pass_plan(Bpad, window, mode)
    exd = tail = tail_neg = None
    loops = {}
    steps = []
    for p in passes:
        if p[0] == "loop":
            _, pairs, S, is_final = p
            if S not in loops:
                loops[S] = _loop_call(nplanes, dtypes, W, nwin, S,
                                      interpret, key_planes=key_planes)
            s = _stage_params(pairs, S)
            if neg_keys and is_final:
                s[1, 0] = 1
            steps.append((loops[S], s))
        elif p[0] == "win":
            steps.append((_win_call(nplanes, dtypes, W, nwin, p[1],
                                    neg_keys and p[2], interpret,
                                    key_planes=key_planes), None))
        elif p[0] == "ex":
            steps.append((_ex_call(nplanes, dtypes, W, nwin, p[1],
                                   p[2], interpret,
                                   key_planes=key_planes), None))
        elif p[0] == "exd":
            if exd is None:
                exd = _ex_call_dyn(nplanes, dtypes, W, nwin, interpret,
                                   key_planes=key_planes)
            steps.append((exd, np.asarray([p[1], p[2]], np.int32)))
        else:  # taild
            use_neg = neg_keys and p[2]
            if use_neg:
                if tail_neg is None:
                    tail_neg = _tail_call_dyn(
                        nplanes, dtypes, W, nwin, True, interpret,
                        key_planes=key_planes)
                call = tail_neg
            else:
                if tail is None:
                    tail = _tail_call_dyn(
                        nplanes, dtypes, W, nwin, False, interpret,
                        key_planes=key_planes)
                call = tail
            steps.append((call, np.asarray([p[1], 0], np.int32)))
    return steps


def _fused():
    """One jit around the WHOLE pass chain (default) vs one jit per
    pass (YAK_TPU_PSORT_FUSE=0).

    Measured on hardware (r4 first psort bench): per-pass jits cost
    ~6ms of remote-tunnel dispatch latency EACH — ~30 dispatches per
    2^24-lane fold added ~180ms/group against ~25ms of actual kernel
    time, making the engine 2.9x slower than the r2 XLA sort it was
    built to beat.  Fusing the chain into one program removes all but
    one dispatch; the Mosaic kernels inside are hash-cached from the
    per-pass builds (loop mode = 3 programs/family), so the one-time
    cost is only the XLA glue compile.  Per-pass mode remains the
    fallback (and the cache-priming order for a cold machine)."""
    import os

    return os.environ.get("YAK_TPU_PSORT_FUSE", "1") != "0"


@lru_cache(maxsize=None)
def _sort_fn(Bpad, nplanes, dtypes, neg_keys, window, interpret,
             key_planes=2, mode="loop", fused=True):
    """Pass chain for a static padded lane count (power of two,
    >= 1024).

    fused=True: the whole chain is ONE jit = one tunnel dispatch (see
    _fused).  fused=False: every pass runs as its OWN jit — the
    remote-compile tunnel compiles Mosaic kernels serially and caches
    per-executable, so per-pass jits compile (and cache, and recover
    from interrupted runs) incrementally; the dynamic exchange/tail
    passes all share ONE jit + executable, re-steered per pass by
    their (k, j) scalar operand.  The fused build reuses those same
    Mosaic binaries via the kernel hash cache.  The local window sort
    is split into level groups to bound single-kernel program size
    (the full levels-1..17 network is ~150 unrolled stages)."""
    assert mode in ("loop", "dyn", "static"), mode
    raw = _build_steps(Bpad, nplanes, dtypes, neg_keys, window,
                       interpret, key_planes, mode)

    if fused:
        def chain(*planes):
            ps = [x.reshape(Bpad // 128, 128) for x in planes]
            for call, s in raw:
                ps = call(ps) if s is None else call(s, ps)
            return tuple(x.reshape(-1) for x in ps)

        return _kjit(chain, interpret)

    steps = []
    seen = {}
    for call, s in raw:
        if id(call) not in seen:
            seen[id(call)] = _kjit(call, interpret)
        steps.append((seen[id(call)], s))

    def fn(*planes):
        ps = [x.reshape(Bpad // 128, 128) for x in planes]
        for call, s in steps:
            ps = call(ps) if s is None else call(s, ps)
        return tuple(x.reshape(-1) for x in ps)

    return fn


_MESH_SORT_CACHE = {}


def _sort_calls_mesh(mesh, Bpad, nplanes, dtypes, neg_keys, window,
                     interpret, key_planes=2, mode="loop", fused=True):
    """The pass steps of _sort_fn wrapped in shard_map over the 1-D
    mesh: every chip runs the identical bitonic pass chain on its own
    [rows, 128] plane slice (one per-chip sort per device — the mesh
    count engine's per-chip batch sort).  Cached per (mesh, shape) in a
    plain dict (Mesh identity keys).  fused=True (default, see _fused)
    runs the WHOLE chain in one shard_map jit = one dispatch; per-pass
    mode shares one shard_map jit across the dynamic passes, steered by
    their replicated (k, j) scalar."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    assert mode in ("loop", "dyn", "static"), mode
    key = (id(mesh), Bpad, nplanes, dtypes, neg_keys, window, interpret,
           key_planes, mode, fused)
    if key in _MESH_SORT_CACHE:
        return _MESH_SORT_CACHE[key]

    raw = _build_steps(Bpad, nplanes, dtypes, neg_keys, window,
                       interpret, key_planes, mode)

    if fused:
        def local_chain(*ps):
            planes = [p[0] for p in ps]
            for call, s in raw:
                planes = call(planes) if s is None else call(s, planes)
            return tuple(o[None] for o in planes)

        fn = _kjit(shard_map(
            local_chain, mesh=mesh, in_specs=(P("d"),) * nplanes,
            out_specs=(P("d"),) * nplanes, check_vma=False), interpret)
        _MESH_SORT_CACHE[key] = ([(fn, None)], Bpad)
        return _MESH_SORT_CACHE[key]

    steps = []
    seen = {}
    for call, s in raw:
        if id(call) not in seen:
            if s is None:
                def local(*ps, _c=call):
                    out = _c([p[0] for p in ps])
                    return tuple(o[None] for o in out)

                in_specs = (P("d"),) * nplanes
            else:
                def local(kj, *ps, _c=call):
                    out = _c(kj, [p[0] for p in ps])
                    return tuple(o[None] for o in out)

                in_specs = (P(),) + (P("d"),) * nplanes
            seen[id(call)] = _kjit(shard_map(
                local, mesh=mesh, in_specs=in_specs,
                out_specs=(P("d"),) * nplanes, check_vma=False),
                interpret)
        steps.append((seen[id(call)], s))
    _MESH_SORT_CACHE[key] = (steps, Bpad)
    return steps, Bpad


def sort_planes_mesh(mesh, hi, lo, *extra, neg_keys=False,
                     window=W_LANES, interpret=False):
    """sort_planes over a mesh-sharded [D, Bpad] batch: each chip
    bitonic-sorts its own slice (no cross-chip traffic — the all_to_all
    routing already assigned lanes to owners).  Must be called OUTSIDE
    jit (flips the x64 flag)."""
    return _sort_entry_mesh(mesh, (hi, lo) + tuple(extra), 2, neg_keys,
                            window, interpret)


def sort_planes32_mesh(mesh, key, *extra, neg_keys=False,
                       window=W_LANES, interpret=False):
    """Single-u32-key mesh variant (the join-post restore sorts)."""
    return _sort_entry_mesh(mesh, (key,) + tuple(extra), 1, neg_keys,
                            window, interpret)


# jitted reshapes (not eager): a multi-host global mesh forbids eager
# ops on non-fully-addressable arrays; under jit the reshape is a plain
# SPMD program every process dispatches in lockstep.
_to_rows = jax.jit(
    lambda *xs: tuple(x.reshape(x.shape[0], -1, 128) for x in xs))
_to_flat = jax.jit(
    lambda *xs: tuple(x.reshape(x.shape[0], -1) for x in xs))


def _sort_entry_mesh(mesh, planes, key_planes, neg_keys, window,
                     interpret):
    D, B = planes[0].shape
    assert B >= 1024 and (B & (B - 1)) == 0, B
    dtypes = tuple(p.dtype.name for p in planes)
    x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        steps, _ = _sort_calls_mesh(mesh, B, len(planes), dtypes,
                                    neg_keys, window, interpret,
                                    key_planes=key_planes,
                                    mode=_mode(), fused=_fused())
        ps = list(_to_rows(*planes))
        for call, s in steps:
            ps = list(call(*ps) if s is None else call(s, *ps))
        return _to_flat(*ps)
    finally:
        jax.config.update("jax_enable_x64", x64)


def sort_planes(hi, lo, *extra, neg_keys=False, window=W_LANES,
                interpret=False):
    """See module docstring; 64-bit keys as hi/lo u32 planes."""
    return _sort_entry((hi, lo) + tuple(extra), 2, neg_keys, window,
                       interpret)


def sort_planes32(key, *extra, neg_keys=False, window=W_LANES,
                  interpret=False):
    """Single-u32-key variant (half the compare work): `key` is the
    sort key, `extra` planes are payload."""
    return _sort_entry((key,) + tuple(extra), 1, neg_keys, window,
                       interpret)


def _sort_entry(planes, key_planes, neg_keys, window, interpret):
    """Sort B lanes of u64 keys given as u32 hi/lo planes ascending;
    `extra` planes ride along.  The input length must be a power of two
    >= 1024 (callers pad with 0x..00 keys, which sort to the front --
    see module docstring).  neg_keys=True complements the key planes on
    the final pass, returning the DESCENDING complement order
    (ops/pallas_merge's E contract) at no extra cost.  Must be called
    OUTSIDE jit (flips the x64 flag)."""
    B = planes[0].shape[0]
    assert B >= 1024 and (B & (B - 1)) == 0, B
    dtypes = tuple(p.dtype.name for p in planes)
    x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        fn = _sort_fn(B, len(planes), dtypes, neg_keys, window,
                      interpret, key_planes=key_planes,
                      mode=_mode(), fused=_fused())
        return fn(*planes)
    finally:
        jax.config.update("jax_enable_x64", x64)
