"""Real byte-pair-encoding tokenizer: distributed fit + Arrow-batched apply.

Upgrades ``functions/text.bpe_ish_token_count`` (a regex token-count
heuristic) to an actual BPE (Sennrich et al. 2016, arXiv:1508.07909): the
merge table is learned from a corpus and applied greedily by merge rank —
the same algorithm family as GPT-2's tokenizer, minus byte-level escaping.

Fit/apply split follows the engine's estimator shape (SURVEY §2.4): the fit
is ONE distributed word-frequency aggregation (map-side combinable) whose
result is capped to the top ``max_fit_words`` distinct words — BPE training
only ever needs the word-frequency DICTIONARY (vocab-bounded, ~1e5 rows),
never the corpus, so the driver-side merge loop is scale-safe at 100 TB.
The apply is an Arrow-batched pandas_udf over the token array column with
the merge-rank table shipped in the closure (a few KB); per-batch word
memoization makes the common case a dict hit because natural-language word
frequency is Zipfian.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_END = "</w>"


def _fit_merges(word_freqs: list[tuple[str, int]], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training loop over a word-frequency dictionary.

    Deterministic: ties on pair frequency break lexicographically, so the
    merge table is identical across runs/shard orders."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        if w:
            vocab[tuple(w) + (_END,)] = vocab.get(tuple(w) + (_END,), 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge application (the GPT-2 apply loop)."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeTokenizer:
    """fit(df, tokens_col) learns the merge table; apply adds a subword
    column. ``merges`` is the learned table (inspectable/serializable)."""

    def __init__(self, num_merges: int = 200, max_fit_words: int = 100_000):
        self.num_merges = num_merges
        self.max_fit_words = max_fit_words
        self.merges: list[tuple[str, str]] | None = None

    def fit(self, df: DataFrame, tokens_col: str) -> "BpeTokenizer":
        # one shuffle: word-frequency dictionary, capped to the most
        # frequent words (deterministic order: freq desc, word asc) — the
        # only thing BPE training ever reads
        freqs = (
            df.select(F.explode(tokens_col).alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("f"))
            .orderBy(F.col("f").desc(), F.col("w"))
            .limit(self.max_fit_words)
            .collect()
        )
        self.merges = _fit_merges([(r.w, r.f) for r in freqs], self.num_merges)
        return self

    def encode_column(self, tokens_col: Column | str) -> Column:
        """array<string> words -> array<string> BPE subwords (end-of-word
        marker kept on the final subword of each word)."""
        if self.merges is None:
            raise ValueError("BpeTokenizer.fit must run before encode_column")
        ranks = {pair: i for i, pair in enumerate(self.merges)}

        @F.pandas_udf(ArrayType(StringType()))
        def enc(s):
            import pandas as pd

            cache: dict[str, list[str]] = {}

            def one(words):
                if words is None:
                    return None
                out: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                return out

            return s.map(one)

        col = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
        return enc(col)

    def save(self, path: str) -> None:
        """Persist the merge table as JSON (a few KB — ship it with the
        corpus so every downstream job tokenizes identically)."""
        import json

        if self.merges is None:
            raise ValueError("nothing to save: fit first")
        with open(path, "w") as fh:
            json.dump(
                {"num_merges": self.num_merges,
                 "max_fit_words": self.max_fit_words,
                 "merges": self.merges},
                fh,
            )

    @classmethod
    def load(cls, path: str) -> "BpeTokenizer":
        import json

        with open(path) as fh:
            blob = json.load(fh)
        tok = cls(blob["num_merges"], blob["max_fit_words"])
        tok.merges = [tuple(p) for p in blob["merges"]]
        return tok
