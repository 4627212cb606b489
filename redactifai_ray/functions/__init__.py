"""Pure per-row functions: span algebra, masking, fuzzy alignment, hashing.

These carry the byte-identical determinism invariant — no randomness, no
dict-order dependence, no wall-clock reads.
"""
