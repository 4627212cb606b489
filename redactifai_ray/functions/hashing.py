"""Stable, process-independent hashing utilities.

Everything here is keyed on content bytes via hashlib (never Python's
``hash()``, which is salted per process) so results are identical across
workers, nodes and reruns — required both by the byte-identical invariant
and by hash-partitioned shuffles (same key must land in the same bucket on
every node).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE_61 = (1 << 61) - 1


def stable_hash64(data: bytes | str, seed: int = 0) -> int:
    """64-bit stable hash of bytes/str (blake2b, keyed by seed)."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    h = hashlib.blake2b(data, digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def stable_hash32(data: bytes | str, seed: int = 0) -> int:
    return stable_hash64(data, seed) & 0xFFFFFFFF


def md5_hex(text: str) -> str:
    """Hex MD5 of UTF-8 text — matches DuckDB's ``md5()`` for oracle checks."""
    return hashlib.md5(text.encode("utf-8", "surrogatepass")).hexdigest()


def bucket_of(key: str, num_buckets: int, seed: int = 0) -> int:
    return stable_hash64(key, seed) % num_buckets


def minhash_permutations(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficient vectors for universal hashing
    ``(a * x + b) mod p`` (p = 2^61-1). Coefficients and inputs are kept
    below 2^32 so ``a*x + b`` fits exactly in uint64 — the whole signature
    computes vectorized in numpy with no overflow."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a set of 32-bit shingle
    hashes. Empty input → all-max sentinel signature. Fully vectorized:
    (n_shingles × num_perm) uint64 intermediate, chunked to bound memory."""
    num_perm = a.shape[0]
    if shingle_hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.unique(shingle_hashes.astype(np.uint64) & 0xFFFFFFFF)
    sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    for i in range(0, x.size, 8192):
        chunk = x[i : i + 8192, None]  # (c, 1)
        vals = (chunk * a[None, :] + b[None, :]) % _MERSENNE_61
        np.minimum(sig, vals.min(axis=0), out=sig)
    return sig


def shingle_hashes(text: str, k: int = 5, seed: int = 0) -> np.ndarray:
    """64-bit hashes of word k-shingles (lowercased, whitespace-split)."""
    words = text.lower().split()
    if len(words) < k:
        if not words:
            return np.empty(0, dtype=np.uint64)
        return np.array([stable_hash64(" ".join(words), seed)], dtype=np.uint64)
    out = np.empty(len(words) - k + 1, dtype=np.uint64)
    for i in range(len(words) - k + 1):
        out[i] = stable_hash64(" ".join(words[i : i + k]), seed)
    return out


def simhash64(text: str, seed: int = 0) -> int:
    """64-bit SimHash over word unigram+bigram features."""
    words = text.lower().split()
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    feats = words + [" ".join(p) for p in zip(words, words[1:])]
    for f in feats:
        h = stable_hash64(f, seed)
        bits = np.unpackbits(
            np.frombuffer(struct.pack("<Q", h), dtype=np.uint8), bitorder="little"
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def rolling_fingerprint(text: str, k: int = 5, seed: int = 0) -> str:
    """Document fingerprint: minimum word-k-gram hash, hex-encoded.

    A winnowing-lite content fingerprint — stable under reordering of
    documents, sensitive to content edits.
    """
    hs = shingle_hashes(text, k=k, seed=seed)
    if hs.size == 0:
        return "0" * 16
    return format(int(hs.min()), "016x")
