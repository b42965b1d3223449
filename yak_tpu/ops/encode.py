"""Base encoding: ASCII -> 2-bit codes.

Reproduces the `seq_nt4_table` contract (misc.c:4-21): A/a=0, C/c=1,
G/g=2, T/t=3 (U/u too), everything else = 4 ("N"), which restarts the
k-mer window downstream.

On the hot path the translation runs as a vectorized NumPy take on host
(or in the C++ ingest library); `encode_bases` also accepts device arrays.
"""

import numpy as np

NT4_TABLE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    NT4_TABLE[ord(_c)] = _i
    NT4_TABLE[ord(_c.lower())] = _i
# RNA aliases, as in the reference table (misc.c:10,12: 'U'/'u' == 3).
NT4_TABLE[ord("U")] = 3
NT4_TABLE[ord("u")] = 3


def encode_bases(seq):
    """Translate an ASCII sequence (bytes/str/uint8 array) to 2-bit codes.

    Returns a uint8 array of codes in {0,1,2,3,4}.
    """
    if isinstance(seq, str):
        seq = seq.encode()
    if isinstance(seq, (bytes, bytearray)):
        arr = np.frombuffer(bytes(seq), dtype=np.uint8)
    else:
        arr = np.asarray(seq, dtype=np.uint8)
    return NT4_TABLE[arr]


def pad_batch(code_list, pad_to=None, multiple=128):
    """Stack variable-length code arrays into a padded [n, L] uint8 batch.

    Padding value is 4 (the "N" code) so padded tails never produce valid
    k-mers.  Returns (codes[n, L], lengths[n]).  `L` is rounded up to
    `multiple` for TPU lane alignment.
    """
    if not code_list:
        return np.zeros((0, multiple), np.uint8), np.zeros((0,), np.int32)
    lens = np.array([len(c) for c in code_list], dtype=np.int32)
    L = int(pad_to if pad_to is not None else lens.max())
    L = max(L, 1)
    L = -(-L // multiple) * multiple
    out = np.full((len(code_list), L), 4, dtype=np.uint8)
    for i, c in enumerate(code_list):
        out[i, : len(c)] = c
    return out, lens
