"""Hashing utility tests: stability across processes, MinHash accuracy,
SimHash locality."""

import subprocess
import sys

import numpy as np

from redactifai_ray.functions.hashing import (
    hamming64,
    md5_hex,
    minhash_permutations,
    minhash_signature,
    rolling_fingerprint,
    shingle_hashes,
    simhash64,
    stable_hash64,
)


class TestStability:
    def test_stable_across_processes(self):
        # would fail with builtin hash() (per-process salt)
        code = (
            "from redactifai_ray.functions.hashing import stable_hash64;"
            "print(stable_hash64('the quick brown fox', 7))"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, check=True,
            cwd="/root/repo",
        ).stdout.strip()
        assert int(out) == stable_hash64("the quick brown fox", 7)

    def test_seed_changes_hash(self):
        assert stable_hash64("x", 0) != stable_hash64("x", 1)

    def test_md5_matches_duckdb(self):
        import duckdb

        assert md5_hex("abc") == duckdb.sql("select md5('abc')").fetchone()[0]


class TestMinHash:
    def test_jaccard_estimate(self):
        a_words = [f"w{i}" for i in range(100)]
        b_words = [f"w{i}" for i in range(50)] + [f"v{i}" for i in range(50)]
        text_a = " ".join(a_words)
        text_b = " ".join(b_words)
        perms = minhash_permutations(256)
        sa = minhash_signature(shingle_hashes(text_a, k=1), *perms)
        sb = minhash_signature(shingle_hashes(text_b, k=1), *perms)
        est = (sa == sb).mean()
        # true Jaccard = 50/150 ≈ 0.333
        assert abs(est - 1 / 3) < 0.12

    def test_identical_texts_identical_signature(self):
        perms = minhash_permutations(64)
        t = "some repeated document text with several words in it"
        sa = minhash_signature(shingle_hashes(t), *perms)
        sb = minhash_signature(shingle_hashes(t), *perms)
        assert np.array_equal(sa, sb)

    def test_empty_text_sentinel(self):
        perms = minhash_permutations(8)
        sig = minhash_signature(shingle_hashes(""), *perms)
        assert (sig == np.iinfo(np.uint64).max).all()


class TestSimHash:
    def test_near_duplicates_close(self):
        base = " ".join(f"word{i}" for i in range(200))
        edited = base.replace("word100", "edited100")
        different = " ".join(f"other{i}" for i in range(200))
        d_near = hamming64(simhash64(base), simhash64(edited))
        d_far = hamming64(simhash64(base), simhash64(different))
        assert d_near < 8
        assert d_far > 20

    def test_empty(self):
        assert simhash64("") == 0


class TestFingerprint:
    def test_deterministic_hex(self):
        t = "a document with enough words to form shingles of length five here"
        assert rolling_fingerprint(t) == rolling_fingerprint(t)
        assert len(rolling_fingerprint(t)) == 16

    def test_sensitive_to_edits_insensitive_to_padding(self):
        t = "one two three four five six seven eight nine ten"
        assert rolling_fingerprint(t) != rolling_fingerprint(t.replace("five", "5"))
