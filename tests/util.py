"""Shared test utilities: synthetic data generation and the reference
oracle (the compiled lh3/yak binary — SURVEY §4: the binary is the test
oracle; golden-file differential testing)."""

import os
import subprocess

import numpy as np

ORACLE = os.path.join(os.path.dirname(__file__), ".oracle", "yak")


def have_oracle():
    return os.path.exists(ORACLE)


def run_oracle(args, stdin=None):
    """Run the reference binary; returns stdout as text."""
    r = subprocess.run([ORACLE] + [str(a) for a in args],
                       capture_output=True, check=True, input=stdin)
    return r.stdout.decode()


def make_genome(rng, length):
    return rng.integers(0, 4, size=length, dtype=np.int8)


def mutate_reads(rng, genome, n_reads, read_len, err=0.003, n_rate=0.0):
    """Sample reads from both strands with substitution errors and optional Ns."""
    L = len(genome)
    starts = rng.integers(0, L - read_len + 1, size=n_reads)
    reads = np.stack([genome[s:s + read_len] for s in starts])
    if err > 0:
        m = rng.random(reads.shape) < err
        reads = np.where(m, (reads + rng.integers(1, 4, reads.shape)) % 4, reads)
    rc = rng.random(n_reads) < 0.5
    comp = 3 - reads
    reads = np.where(rc[:, None], comp[:, ::-1], reads)
    if n_rate > 0:
        m = rng.random(reads.shape) < n_rate
        reads = np.where(m, 4, reads)
    return reads


def to_fasta(path, seq_arrays, names=None, line_len=0):
    alph = np.frombuffer(b"ACGTN", dtype=np.uint8)
    with open(path, "wb") as fp:
        for i, s in enumerate(seq_arrays):
            name = names[i] if names else f"seq{i}"
            fp.write(f">{name}\n".encode())
            txt = alph[np.asarray(s, np.int64)].tobytes()
            if line_len:
                for j in range(0, len(txt), line_len):
                    fp.write(txt[j:j + line_len] + b"\n")
            else:
                fp.write(txt + b"\n")


def to_fastq(path, seq_arrays, names=None):
    alph = np.frombuffer(b"ACGTN", dtype=np.uint8)
    with open(path, "wb") as fp:
        for i, s in enumerate(seq_arrays):
            name = names[i] if names else f"read{i}"
            txt = alph[np.asarray(s, np.int64)].tobytes()
            fp.write(f"@{name}\n".encode())
            fp.write(txt + b"\n+\n")
            fp.write(b"I" * len(txt) + b"\n")


def oracle_print_counts(yak_path):
    """Parse `yak print -c` output into a dict {kmer_string: count}."""
    out = run_oracle(["print", "-c", yak_path])
    d = {}
    for line in out.splitlines():
        km, c = line.split("\t")
        d[km] = int(c)
    return d


def kmer_to_string(packed, k):
    """Decode a 2-bit packed k-mer (int) to an ACGT string, MSB-first
    (matching main_print, main.c:307-310)."""
    return "".join("ACGT"[(int(packed) >> (2 * (k - 1 - i))) & 3] for i in range(k))
