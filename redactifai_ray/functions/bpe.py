"""A real byte-pair-encoding tokenizer: deterministic corpus-trained
merges + greedy encoder (the public BPE algorithm of Sennrich et al.;
round 1 shipped only the regex approximation ``BPE_RE``).

Training is driver-side over a bounded sample (the broadcast-small-side
pattern — a merge table is a model artifact, like IVF centroids): word
frequencies fold vectorized per block, then ``vocab_size`` highest-count
adjacent-pair merges apply iteratively with lexicographic tie-breaks so
the merge list is bit-reproducible. Encoding runs in a warm actor pool —
the merge-rank dict is genuinely expensive state, the ST2 "model load"
case where actors beat per-task rebuilds.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa

_WORD_RE = re.compile(r"\S+")

END = "</w>"  # end-of-word sentinel (standard BPE)


def word_frequencies(ds, text_col: str = "text", sample_rows: int | None = 50_000):
    """Distributed word-frequency fold: per-block Counters → driver merge
    (counter tables are vocabulary-bounded, not corpus-bounded)."""
    def count_block(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch[text_col].to_pylist():
            c.update(_WORD_RE.findall((t or "").lower()))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    src = ds if sample_rows is None else ds.limit(sample_rows)
    partials = src.map_batches(count_block, batch_format="pyarrow")
    if sample_rows is None:
        # unsampled: shuffle-reduce the vocab×blocks partials to
        # vocab-scale before the driver gather (round-4)
        from ray.data.aggregate import Sum

        from ..cluster import default_partitions

        partials = partials.groupby(
            "word", num_partitions=default_partitions()
        ).aggregate(Sum("n", alias_name="n"))
    from ..collect import collect_table

    total = Counter()
    tbl = collect_table(partials)
    if "word" in tbl.column_names:
        for w, n in zip(
            tbl.column("word").to_pylist(), tbl.column("n").to_pylist()
        ):
            total[w] += n
    return total


def train_bpe(word_freqs: dict[str, int], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules. Deterministic: ties on pair count
    break lexicographically."""
    vocab = {
        tuple(list(w) + [END]): n for w, n in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_vocab = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


class BpeTokenizer:
    """Greedy lowest-rank-first encoder over a trained merge list."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(self, word: str) -> list[str]:
        sym = list(word) + [END]
        while len(sym) > 1:
            best_rank, best_i = None, None
            for i in range(len(sym) - 1):
                r = self.ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return sym

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in _WORD_RE.findall((text or "").lower()):
            out.extend(self.encode_word(w))
        return out


class BpeCount:
    """Actor-pool stage: text → trained-BPE token count. The merge table
    ships once via ``ray.put`` and the rank dict builds once per actor in
    ``__init__`` — the genuinely-expensive-state case where the actor
    pool (not a per-task cache) is the right doctrine (SURVEY §2.3 ST2)."""

    def __init__(self, merges_ref, text_col: str = "text",
                 out_col: str = "n_bpe_trained"):
        import ray

        self.tok = BpeTokenizer(ray.get(merges_ref))
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [
            len(self.tok.encode(t or "")) for t in batch[self.text_col].to_pylist()
        ]
        return batch.append_column(self.out_col, pa.array(counts, pa.int64()))


def add_bpe_count(ds, merges, text_col: str = "text", concurrency=(1, 8)):
    import ray

    return ds.map_batches(
        BpeCount,
        fn_constructor_kwargs=dict(merges_ref=ray.put(merges), text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def build_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """Deterministic id table from a merge list alone (no corpus pass):
    ``[END]`` + every merge component and output, sorted. Any symbol the
    greedy encoder can emit is either in this table or a single
    character (unmerged), so ids are total with the codepoint fallback
    in ``BpeIdEncoder`` — unknown chars at encode time (absent from
    training) map to ``len(vocab) + ord(ch)``, keeping encode/decode a
    bijection without shipping a corpus-derived char table."""
    syms = {END}
    for a, b in merges:
        syms.add(a)
        syms.add(b)
        syms.add(a + b)
    return sorted(syms)


class BpeIdEncoder:
    """Trained-BPE text → token-id list (GPT-style tokenize step; the
    ids feed ``pack_sequences``-planned training shards). Actor-pool
    stage — merge ranks + the vocab dict are the expensive state, built
    once per actor from a ``ray.put`` merge list (ST2 doctrine, the
    ``BpeCount`` sibling). Emits ``ids: list<int32>`` and ``n_ids``.

    Id scheme (deterministic, reversible): ids < len(vocab) index
    ``build_vocab(merges)``; ids ≥ len(vocab) are len(vocab)+codepoint
    for single characters unseen in training (every unmergeable symbol
    is a single char by construction). ``decode_ids`` inverts exactly."""

    def __init__(self, merges_ref, text_col: str = "text"):
        import ray

        merges = ray.get(merges_ref)
        self.tok = BpeTokenizer(merges)
        self.vocab = build_vocab(merges)
        self.idx = {s: i for i, s in enumerate(self.vocab)}
        self.offset = len(self.vocab)
        self.text_col = text_col

    def _ids(self, text: str) -> list[int]:
        idx, off = self.idx, self.offset
        out = []
        for sym in self.tok.encode(text or ""):
            i = idx.get(sym)
            if i is None:
                # unmerged unknown: always a single char by construction
                i = off + ord(sym)
            out.append(i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = [self._ids(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(
            "ids", pa.array(ids, pa.list_(pa.int32()))
        ).append_column(
            "n_ids", pa.array([len(x) for x in ids], pa.int64())
        )


def decode_ids(ids, merges: list[tuple[str, str]]) -> str:
    """Exact inverse of ``BpeIdEncoder``: symbols re-join, ``</w>``
    becomes a word boundary (BPE lowercases and collapses whitespace, so
    decode(encode(text)) == " ".join(text.lower().split()) for texts
    whose words end at ``</w>`` — pinned by the roundtrip test)."""
    vocab = build_vocab(merges)
    off = len(vocab)
    syms = [vocab[i] if i < off else chr(i - off) for i in ids]
    return "".join(syms).replace(END, " ").strip()


def add_bpe_ids(ds, merges, text_col: str = "text", concurrency=(1, 8)):
    import ray

    return ds.map_batches(
        BpeIdEncoder,
        fn_constructor_kwargs=dict(
            merges_ref=ray.put(merges), text_col=text_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
