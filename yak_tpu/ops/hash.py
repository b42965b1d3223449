"""The 64-bit invertible k-mer hash family, vectorized.

Semantics match the reference inline functions (yak-priv.h:11-68):
  - hash64(key, mask): the masked invertible mix applied to a canonical
    2k-bit-packed k-mer (k <= 31).
  - hash64_inv(key, mask): its exact inverse (used by `print` to recover
    k-mer strings from table keys, htab.c:353-367).
  - hash64_64(key): the unmasked variant.
  - hash_long(x0, x1, x2, x3): the k in [32, 63] path built from four
    1-bit-plane rolling codes (yak-priv.h:35-39); NOT invertible and
    collision-prone — counts are "inexact" for k > 31 by design
    (warning at main.c:50-52).

All functions are pure elementwise uint64 ops (shift/xor/add/mul) and run
on the TPU VPU under jit; they equally accept NumPy arrays for host-side
table transforms.  Written against the algebraic definition, not the C
text: each mix step is `key = f(key) & mask` where f is one of
(~k + (k<<21)), (k ^ k>>s), (k * small-odd), (k + (k<<31)).
"""

from contextlib import nullcontext

import numpy as np

# Modular inverses of the two multiplicative steps (mod 2^64):
#   265 * INV_265 == 1,  21 * INV_21 == 1.
_INV_265 = np.uint64(15244667743933553977)
_INV_21 = np.uint64(14933078535860113213)


def _quiet(ns):
    """The mixes overflow uint64 by DESIGN (wrapping arithmetic);
    silence numpy's per-scalar RuntimeWarnings on the host path."""
    return np.errstate(over="ignore") if ns is np else nullcontext()


def _u64(ns, v):
    return ns.asarray(v, dtype=ns.uint64) if not np.isscalar(v) else ns.uint64(v)


def hash64(key, mask, ns=None):
    """Invertible hash of a (<=62-bit) packed k-mer under `mask`.

    `ns` is the array namespace (jax.numpy or numpy); inferred if None.
    """
    ns = _namespace(key) if ns is None else ns
    with _quiet(ns):
        key = ns.asarray(key, dtype=ns.uint64)
        mask = ns.uint64(mask) if np.isscalar(mask) \
            else ns.asarray(mask, ns.uint64)
        key = (~key + (key << ns.uint64(21))) & mask
        key = key ^ (key >> ns.uint64(24))
        key = ((key + (key << ns.uint64(3))) + (key << ns.uint64(8))) & mask  # * 265
        key = key ^ (key >> ns.uint64(14))
        key = ((key + (key << ns.uint64(2))) + (key << ns.uint64(4))) & mask  # * 21
        key = key ^ (key >> ns.uint64(28))
        key = (key + (key << ns.uint64(31))) & mask
        return key


def hash64_64(key, ns=None):
    """Unmasked invertible mix (yak-priv.h:23-33); building block of hash_long."""
    ns = _namespace(key) if ns is None else ns
    with _quiet(ns):
        key = ns.asarray(key, dtype=ns.uint64)
        key = ~key + (key << ns.uint64(21))
        key = key ^ (key >> ns.uint64(24))
        key = (key + (key << ns.uint64(3))) + (key << ns.uint64(8))
        key = key ^ (key >> ns.uint64(14))
        key = (key + (key << ns.uint64(2))) + (key << ns.uint64(4))
        key = key ^ (key >> ns.uint64(28))
        key = key + (key << ns.uint64(31))
        return key


def hash_long(x0, x1, x2, x3, ns=None):
    """Strand-canonical non-invertible hash for k in [32, 63].

    The strand is chosen by comparing the two reverse 1-bit planes
    (x1 vs x3, yak-priv.h:37); the hash is the wrapping sum of the two
    mixed planes of the chosen strand.
    """
    ns = _namespace(x0) if ns is None else ns
    with _quiet(ns):
        fwd = ns.asarray(x1, ns.uint64) < ns.asarray(x3, ns.uint64)
        a = ns.where(fwd, ns.asarray(x0, ns.uint64),
                     ns.asarray(x2, ns.uint64))
        b = ns.where(fwd, ns.asarray(x1, ns.uint64),
                     ns.asarray(x3, ns.uint64))
        return hash64_64(a, ns) + hash64_64(b, ns)


def hash64_inv(key, mask, ns=None):
    """Exact inverse of hash64 (yak-priv.h:41-68 semantics).

    Inverts each mix stage in reverse order; the xor-shift stages are
    inverted by repeated unmasking, the multiplies by modular inverse.
    Only used on host for `print`/getseq, but jit-compatible.
    """
    ns = _namespace(key) if ns is None else ns
    with _quiet(ns):
        key = ns.asarray(key, dtype=ns.uint64)
        mask = ns.uint64(mask) if np.isscalar(mask) else ns.asarray(mask, ns.uint64)
        # stage 7^-1: key' = key + (key << 31)
        tmp = key - (key << ns.uint64(31))
        key = (key - (tmp << ns.uint64(31))) & mask
        # stage 6^-1: key' = key ^ key >> 28
        tmp = key ^ (key >> ns.uint64(28))
        key = key ^ (tmp >> ns.uint64(28))
        # stage 5^-1: key' = key * 21
        key = (key * _inv21(ns)) & mask
        # stage 4^-1: key' = key ^ key >> 14  (needs 4 unmask rounds for 62 bits)
        tmp = key ^ (key >> ns.uint64(14))
        tmp = key ^ (tmp >> ns.uint64(14))
        tmp = key ^ (tmp >> ns.uint64(14))
        key = key ^ (tmp >> ns.uint64(14))
        # stage 3^-1: key' = key * 265
        key = (key * _inv265(ns)) & mask
        # stage 2^-1: key' = key ^ key >> 24
        tmp = key ^ (key >> ns.uint64(24))
        key = key ^ (tmp >> ns.uint64(24))
        # stage 1^-1: key' = ~key + (key << 21)
        tmp = ~key
        tmp = ~(key - (tmp << ns.uint64(21)))
        tmp = ~(key - (tmp << ns.uint64(21)))
        key = ~(key - (tmp << ns.uint64(21))) & mask
        return key


def _inv21(ns):
    return ns.uint64(14933078535860113213)


def _inv265(ns):
    return ns.uint64(15244667743933553977)


def _namespace(x):
    import jax.numpy as jnp

    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np
    return jnp
