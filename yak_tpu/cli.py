"""Command-line interface: `python -m yak_tpu <command> [options]`.

Mirrors the reference CLI surface (main.c:325-379): count, recount,
cntasm, subtract, isec, print, qv, triobin, trioeval, inspect, chkerr,
sexchr, version — with the same options and text output, plus `groupxy`
(the reference ships it as a Perl helper, groupxy.pl).
"""

import os
import resource
import sys
import time

from yak_tpu import __version__, YAK_MAX_COUNT


def _parse_num(s):
    """k/m/g size suffixes (mm_parse_num, yak-priv.h:75-84)."""
    mult = 1.0
    if s and s[-1] in "kKmMgG":
        mult = {"k": 1e3, "m": 1e6, "g": 1e9}[s[-1].lower()]
        s = s[:-1]
    return int(float(s) * mult + 0.499)


def _getopt(argv, spec):
    """Tiny getopt (ketopt-style): spec maps letter -> bool(has_arg).
    Returns (opts dict, positional args)."""
    opts, pos, i = {}, [], 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("-") and len(a) > 1 and not a[1].isdigit():
            letter = a[1]
            if letter not in spec:
                print(f"unknown option: -{letter}", file=sys.stderr)
                sys.exit(1)
            if spec[letter]:
                arg = a[2:] if len(a) > 2 else argv[i + 1]
                if len(a) <= 2:
                    i += 1
                opts[letter] = arg
            else:
                opts[letter] = True
        else:
            pos.append(a)
        i += 1
    return opts, pos


def _usage(lines):
    print("\n".join(lines), file=sys.stderr)
    return 1


def _auto_mesh(k=0):
    """The CLI's multi-device surface (the reference is one binary that
    uses every core, main.c:325-379; here every local chip): a 1-D mesh
    over the largest power-of-two device count when more than one
    device is attached.  YAK_TPU_MESH=0 disables; YAK_TPU_MESH=1 forces
    it even on CPU backends (tests / virtual-device runs, where the
    default stays single-device)."""
    import os

    flag = os.environ.get("YAK_TPU_MESH", "auto")
    if flag == "0" or k > 31:
        return None
    import jax

    if flag != "1" and jax.default_backend() == "cpu":
        return None
    n = len(jax.devices())
    n = 1 << (n.bit_length() - 1)
    if n < 2:
        return None
    from yak_tpu.parallel.mesh import make_mesh
    return make_mesh(n)


def _mesh_table(t, mesh):
    """Re-shard a restored KmerTable onto the mesh (chip d owns hashes
    with h & (N-1) == d; lookup workloads accept MeshTables)."""
    from yak_tpu.parallel.mesh import MeshTable

    h, c = t.items()
    return MeshTable.from_items(mesh, t.k, t.pre, h, c)


def main_count(argv):
    from yak_tpu.models.count import count, CountOpts
    o, pos = _getopt(argv, {"k": 1, "p": 1, "K": 1, "t": 1, "b": 1, "H": 1,
                            "o": 1, "X": 0})
    opt = CountOpts()
    if "k" in o: opt.k = int(o["k"])
    if "p" in o: opt.pre = int(o["p"])
    if "K" in o: opt.chunk_size = _parse_num(o["K"])
    if "t" in o: opt.n_thread = int(o["t"])
    if "b" in o: opt.bf_shift = int(o["b"])
    if "H" in o: opt.bf_n_hash = _parse_num(o["H"])
    if "X" in o or os.environ.get("YAK_TPU_EXACT_DUMP"):
        opt.exact = True
    fn_out = o.get("o")
    if not pos:
        return _usage(["Usage: yak_tpu count [options] <in.fa> [in.fa]",
                       "Options:",
                       f"  -k INT     k-mer size [{opt.k}]",
                       f"  -p INT     prefix length [{opt.pre}]",
                       "  -b INT     set Bloom filter size to 2**INT bits; 0 to disable [0]",
                       "  -H INT     use INT hash functions for Bloom filter [4]",
                       "  -t INT     number of worker threads [4]",
                       "  -o FILE    dump the count hash table to FILE []",
                       "  -K INT     chunk size [100m]",
                       "  -X         byte-exact dump (reference khashl"
                       " slot order)"])
    if opt.pre < 10:
        print("ERROR: -p should be at least 10", file=sys.stderr)
        return 1
    if opt.k >= 64:
        print("ERROR: -k must be smaller than 64", file=sys.stderr)
        return 1
    if opt.k >= 32:
        print("WARNING: counts are inexact if -k is greater than 31",
              file=sys.stderr)
    mesh = _auto_mesh(opt.k)
    if mesh is not None and opt.pre >= mesh.devices.size.bit_length() - 1:
        from yak_tpu.parallel.mesh import count_mesh
        h = count_mesh(pos, opt, mesh)
    else:
        h = count(pos, opt)
    if fn_out:
        # -X / YAK_TPU_EXACT_DUMP: reproduce the reference's khashl
        # slot order byte-for-byte (io/exactdump.py); default dumps
        # write sorted key order (equivalent content, yakfmt.py:15-19)
        if "X" in o or os.environ.get("YAK_TPU_EXACT_DUMP"):
            from yak_tpu.io.exactdump import dump_yak_exact
            dump_yak_exact(fn_out, h, pos, bf_shift=opt.bf_shift,
                           bf_n_hash=opt.bf_n_hash)
        else:
            h.dump(fn_out)
    return 0


def main_recount(argv):
    from yak_tpu.models.count import recount
    from yak_tpu.table import KmerTable
    o, pos = _getopt(argv, {"o": 1})
    if len(pos) < 2:
        return _usage(["Usage: yak_tpu recount [-o <out.yak>] <kmer.yak> <seq.fa>"])
    h = KmerTable.restore(pos[0])
    recount(pos[1], h)
    h.dump(o.get("o", "-"))
    return 0


def main_cntasm(argv):
    from yak_tpu.models.count import count_file, CountOpts
    from yak_tpu.table import KmerTable
    o, pos = _getopt(argv, {"k": 1, "p": 1, "K": 1, "t": 1, "i": 1, "o": 1,
                            "c": 1, "x": 1, "e": 1, "s": 1, "r": 0})
    opt = CountOpts(chunk_size=_parse_num("1.9g"))
    min_cnt, max_cnt, max_out, check_n = 1, 1, 0, 10
    if "k" in o: opt.k = int(o["k"])
    if "c" in o: min_cnt = int(o["c"])
    if "x" in o: max_cnt = int(o["x"])
    if "e" in o: max_out = int(o["e"])
    if "s" in o: check_n = int(o["s"])
    if "p" in o: opt.pre = int(o["p"])
    if "K" in o: opt.chunk_size = _parse_num(o["K"])
    if "t" in o: opt.n_thread = int(o["t"])
    # -r (pre-resize before merging, main.c:98 / htab.c:253-257) asks
    # the destination hash to reserve union capacity before the merge
    # walk.  The sorted-array engine ALWAYS does this
    # (table.merge's _ensure_capacity must hold the union before
    # merge_batch runs), so -r is accepted and inherently on.
    if not pos:
        return _usage(["Usage: yak_tpu cntasm [options] <in1.fa> [in2.fa [...]]",
                       "Options:",
                       f"  -k INT     k-mer size [{opt.k}]",
                       f"  -c INT     min count [{min_cnt}]",
                       f"  -x INT     max count [{max_cnt}]",
                       f"  -p INT     prefix length [{opt.pre}]",
                       "  -r         resize before merging; use if merging is slow",
                       f"  -t INT     number of worker threads [{opt.n_thread}]",
                       f"  -e INT     exclude a k-mer if absent from INT samples [{max_out}]",
                       f"  -s INT     shrink the hash table every INT samples [{check_n}]",
                       "  -K INT     chunk size [1.9g]",
                       "  -i FILE    input k-mer dump []",
                       "  -o FILE    output k-mer dump []",
                       "Note: if input and output file names are identical, input is overwritten"])
    if opt.k >= 32:
        print("ERROR: -k must be <=31", file=sys.stderr)
        return 1
    h = None
    if "i" in o:
        try:
            h = KmerTable.restore(o["i"])
        except (OSError, ValueError):
            print(f"WARNING: failed to read {o['i']}. Continue anyway",
                  file=sys.stderr)
    for i, fn in enumerate(pos):
        h1 = count_file(fn, opt)
        if h is None:
            h = h1
            h.shrink(min_cnt, max_cnt)
            h.set_counts(1)
        else:
            h.merge(h1, min_cnt, max_cnt)
        if i == len(pos) - 1 or (i + 1 > max_out and (i + 1) % check_n == 0):
            h.shrink(i + 1 - max_out, YAK_MAX_COUNT)
        print(f"[M::cntasm] processed file {fn}; {h.tot} distinct k-mers "
              f"in the hash table", file=sys.stderr)
    if "o" in o:
        h.dump(o["o"])
    return 0


def main_subtract(argv):
    from yak_tpu.table import KmerTable
    o, pos = _getopt(argv, {"t": 1, "o": 1})
    if len(pos) < 2:
        return _usage(["Usage: yak_tpu subtract [options] <in1.yak> <in2.yak>"])
    h0 = KmerTable.restore(pos[0])
    h1 = KmerTable.restore(pos[1])
    h0.subtract(h1)
    h0.dump(o.get("o", "-"))
    return 0


def main_isec(argv):
    from yak_tpu.table import KmerTable
    o, pos = _getopt(argv, {"t": 1, "o": 1})
    if len(pos) < 2:
        return _usage(["Usage: yak_tpu isec [options] <in1.yak> <in2.yak> "
                       "[in3.yak ...]"])
    h0 = KmerTable.restore(pos[0])
    for fn in pos[1:]:
        h0.isec(KmerTable.restore(fn))
    h0.dump(o.get("o", "-"))
    return 0


def _print_impl(argv):
    from yak_tpu.table import KmerTable
    o, pos = _getopt(argv, {"c": 0})
    if not pos:
        return _usage(["Usage: yak_tpu print [-c] <in.yak>"])
    h = KmerTable.restore(pos[0])
    km, c = h.getseq()
    k = h.k
    w = sys.stdout.write
    for x, cc in zip(km, c):
        s = "".join("ACGT"[(int(x) >> (2 * (k - 1 - j))) & 3] for j in range(k))
        if "c" in o:
            w(f"{s}\t{cc}\n")
        else:
            w(s + "\n")
    return 0


def main_qv(argv):
    from yak_tpu.models.qv import main_qv as qv_main, QvOpts
    from yak_tpu.table import KmerTable
    o, pos = _getopt(argv, {"K": 1, "t": 1, "l": 1, "f": 1, "p": 0, "e": 1,
                            "E": 0})
    opt = QvOpts()
    if "K" in o: opt.chunk_size = _parse_num(o["K"])
    if "l" in o: opt.min_len = _parse_num(o["l"])
    if "f" in o: opt.min_frac = float(o["f"])
    if "t" in o: opt.n_threads = int(o["t"])
    if "p" in o: opt.print_each = True
    if "E" in o: opt.print_err_kmer = True
    if "e" in o: opt.fpr = float(o["e"])
    if len(pos) < 2:
        return _usage(["Usage: yak_tpu qv [options] <kmer.hash> <seq.fa>"])
    ch = KmerTable.restore(pos[0])
    mesh = _auto_mesh(ch.k)
    if mesh is not None:
        ch = _mesh_table(ch, mesh)
    qv_main(opt, ch, pos[1])
    return 0


def main_inspect(argv):
    from yak_tpu.models.inspect import main_inspect as insp
    o, pos = _getopt(argv, {"m": 1})
    if not pos:
        return _usage(["Usage: yak_tpu inspect [options] <in1.yak> [in2.yak]"])
    insp(pos[0], pos[1] if len(pos) > 1 else None,
         max_cnt=int(o.get("m", 20)))
    return 0


def main_triobin(argv):
    from yak_tpu.models.trio import TrioOpts, load_trio_tables, main_triobin as tb
    o, pos = _getopt(argv, {"c": 1, "d": 1, "t": 1, "p": 0, "r": 1, "K": 1})
    opt = TrioOpts()
    if "c" in o: opt.min_cnt = int(o["c"])
    if "d" in o: opt.mid_cnt = int(o["d"])
    if "p" in o: opt.print_diff = True
    if "r" in o: opt.ratio_thres = float(o["r"])
    if len(pos) < 3:
        return _usage(["Usage: yak_tpu triobin [options] <pat.yak> <mat.yak> "
                       "<seq.fa>"])
    ch = load_trio_tables(pos[0], pos[1], opt)
    mesh = _auto_mesh(ch.k)
    if mesh is not None:
        ch = _mesh_table(ch, mesh)
    kw = {}
    if "K" in o: kw["chunk_cap"] = _parse_num(o["K"])
    tb(opt, ch, pos[2], **kw)
    return 0


def main_trioeval(argv):
    from yak_tpu.models.trio import TrioOpts, load_trio_tables, main_trioeval as te
    o, pos = _getopt(argv, {"c": 1, "d": 1, "t": 1, "n": 1, "e": 0,
                            "F": 0, "K": 1})
    opt = TrioOpts()
    kw = {}
    if "c" in o: opt.min_cnt = int(o["c"])
    if "d" in o: opt.mid_cnt = int(o["d"])
    if "n" in o: opt.min_n = int(o["n"])
    if "e" in o: opt.print_err = True
    if "F" in o: opt.print_frag = False
    if "K" in o: kw["chunk_cap"] = _parse_num(o["K"])
    if len(pos) < 3:
        return _usage(["Usage: yak_tpu trioeval [options] <pat.yak> <mat.yak> "
                       "<seq.fa>"])
    ch = load_trio_tables(pos[0], pos[1], opt)
    mesh = _auto_mesh(ch.k)
    if mesh is not None:
        ch = _mesh_table(ch, mesh)
    cnt = ch.hist()
    print(f"[M::trioeval] {cnt[0 << 2 | 2]} file1-specific k-mers and "
          f"{cnt[2 << 2 | 0]} file2-specific k-mers", file=sys.stderr)
    te(opt, ch, pos[2], **kw)
    return 0


def main_chkerr(argv):
    from yak_tpu.models.chkerr import ChkerrOpts, main_chkerr as ce
    from yak_tpu.table import KmerTable
    o, pos = _getopt(argv, {"t": 1, "c": 1, "s": 1, "K": 1})
    opt = ChkerrOpts()
    if "c" in o: opt.min_cnt = int(o["c"])
    if "s" in o: opt.min_streak = int(o["s"])
    if "K" in o: opt.chunk_size = _parse_num(o["K"])
    if len(pos) < 2:
        return _usage(["Usage: yak_tpu chkerr [options] <count.yak> <seq.fa>"])
    ch = KmerTable.restore(pos[0])
    mesh = _auto_mesh(ch.k)
    if mesh is not None:
        ch = _mesh_table(ch, mesh)
    ce(opt, ch, pos[1])
    return 0


def main_sexchr(argv):
    from yak_tpu.models.sexchr import SexchrOpts, load_sexchr_tables, main_sexchr as sc
    o, pos = _getopt(argv, {"t": 1, "K": 1})
    opt = SexchrOpts()
    if "K" in o: opt.chunk_size = _parse_num(o["K"])
    if len(pos) < 5:
        return _usage(["Usage: yak_tpu sexchr [options] <chrY.yak> <chrX.yak> "
                       "<PAR.yak> <hap1.fa> <hap2.fa>"])
    ch = load_sexchr_tables(pos[0], pos[1], pos[2])
    mesh = _auto_mesh(ch.k)
    if mesh is not None:
        ch = _mesh_table(ch, mesh)
    sc(opt, ch, [pos[3], pos[4]])
    return 0


def main_groupxy(argv):
    from yak_tpu.models.sexchr import groupxy
    o, pos = _getopt(argv, {"s": 1, "c": 1, "r": 1})
    if not pos:
        return _usage(["Usage: yak_tpu groupxy [-s .7] [-c .3] [-r .9] "
                       "in.sexchr"])
    with open(pos[0]) as fp:
        for line in groupxy(fp, float(o.get("s", 0.7)), float(o.get("c", 0.3)),
                            float(o.get("r", 0.9))):
            print(line)
    return 0


_COMMANDS = {
    "count": main_count, "recount": main_recount, "cntasm": main_cntasm,
    "subtract": main_subtract, "isec": main_isec, "print": _print_impl,
    "qv": main_qv, "triobin": main_triobin, "trioeval": main_trioeval,
    "inspect": main_inspect, "chkerr": main_chkerr, "sexchr": main_sexchr,
    "groupxy": main_groupxy,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    t0 = time.time()
    if not argv:
        print("Usage: yak_tpu <command> <argument>", file=sys.stderr)
        print("Command:", file=sys.stderr)
        for c in list(_COMMANDS) + ["version"]:
            print(f"  {c}", file=sys.stderr)
        return 1
    cmd = argv[0]
    if cmd == "version":
        print(__version__)
        return 0
    if cmd not in _COMMANDS:
        print(f"[E::main] unknown command", file=sys.stderr)
        return 1
    from yak_tpu.utils import maybe_profile
    try:
        with maybe_profile():
            ret = _COMMANDS[cmd](argv[1:])
    except FileNotFoundError as e:
        # reference-style clean failure (main.c:82,267: "ERROR: failed
        # to load ..."), not a Python traceback
        print(f"ERROR: failed to open file "
              f"'{e.filename or e}'", file=sys.stderr)
        return 1
    except (OSError, ValueError) as e:
        # bad magic / truncated dump / wrong counter bits
        # (htab.c:424-434 prints and returns 0; callers exit 1)
        print(f"ERROR: {e}", file=sys.stderr)
        return 1
    if ret == 0:
        ru = resource.getrusage(resource.RUSAGE_SELF)
        cpu = ru.ru_utime + ru.ru_stime
        print(f"[M::main] Version: {__version__}", file=sys.stderr)
        print(f"[M::main] CMD: yak_tpu " + " ".join(argv), file=sys.stderr)
        print(f"[M::main] Real time: {time.time() - t0:.3f} sec; "
              f"CPU: {cpu:.3f} sec; "
              f"Peak RSS: {ru.ru_maxrss / 1024.0 / 1024.0:.3f} GB",
              file=sys.stderr)
    return ret
