"""Text functions: tokenization, n-grams, fingerprints, quality signals.

KeystoneML NLP nodes (reference: ``nodes/nlp/Tokenizer.scala``,
``Trim.scala``, ``LowerCase.scala``, ``NGramsFeaturizer.scala``) are
per-element maps; here each is a Column expression (codegen, zero Python).
The LLM-data-pipeline additions (simhash, fingerprints, language ID,
quality scoring) are likewise built from JVM-side primitives — xxhash64,
higher-order array functions — so they hold up on 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^\p{L}\p{N}']+"  # unicode letters/digits/apostrophe

# BPE-ish word/number/punct pieces for token *counting* (not a real BPE —
# a deterministic proxy with similar scaling behavior).
BPE_ISH_RE = r"(?i)[a-z]+|[0-9]{1,3}|[^\sa-z0-9]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """text -> array<string> tokens (Trim + LowerCase + Tokenizer chain)."""
    t = F.trim(_c(text))
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(t, TOKEN_SPLIT_RE), lambda x: x != "")


def word_ngrams(toks: Column | str, n: int, sep: str = " ") -> Column:
    """array<string> tokens -> array<string> n-grams (space-joined).

    Reference: ``nodes/nlp/NGramsFeaturizer.scala``. Pure SQL: slice over a
    0..len-n index sequence; empty array when the doc is shorter than n.
    """
    t = _c(toks)
    return F.when(F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.concat_ws(sep, F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """text -> array<string> of distinct k-char shingles (MinHash input).

    The normalized text is BOUND to a lambda variable (via a one-element
    array transform) before the per-position loop: a lambda body
    re-evaluates every captured outer expression PER ELEMENT, so the
    naive ``transform(sequence(...), i -> substr(lower(trim(text)), i,
    k))`` lower+trims the whole document once per shingle — O(len^2)
    per doc, and the single largest JIT-pressure source in the dedup
    family (r9: the signature kernel's warm-up curve ran 93 s -> 2.2 s
    over eight repetitions largely inside this expression). Binding
    makes it O(len)."""
    t = F.lower(F.trim(_c(text)))

    def _shingles(tt: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.length(tt) - k + 1),
            lambda i: tt.substr(i, F.lit(k)),
        )

    return F.when(F.length(t) >= k,
        F.array_distinct(
            F.element_at(F.transform(F.array(t), _shingles), 1)
        ),
    ).otherwise(F.array(t))


def token_count(text: Column | str) -> Column:
    """Whitespace token count (cheap scaling proxy for doc sizing)."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Regex-piece token count — BPE-like granularity, deterministic."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_ISH_RE), F.lit(0)))


STOPWORDS_EN = (
    "the of and a to in is you that it he was for on are as with his they i".split()
)
STOPWORDS_ES = "de la que el en y a los del se las por un para con no una su".split()


def quality_features(text: Column | str) -> Column:
    """Struct of document-quality signals (length / punct / stopword ratios).

    The LLM-pipeline 'quality score' building block: every field is a
    codegen-able expression, no UDF.
    """
    t = _c(text)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS_EN])))
    return F.struct(
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, n_chars.cast("double") / n_tok).alias("avg_token_len"),
        (F.length(F.regexp_replace(t, r"[\p{L}\p{N}\s]", "")).cast("double")
         / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
         / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        F.when(n_tok > 0,
               stop_hits.cast("double") / F.size(F.array_distinct(toks))
               ).alias("stopword_hit_ratio"),
    )


def language_scores(text: Column | str) -> Column:
    """Heuristic language ID: stopword-hit fraction per language + CJK ratio.

    Returns struct<en:double, es:double, cjk:double>; argmax is the label.
    """
    t = _c(text)
    toks = tokens(t)
    denom = F.greatest(F.size(toks), F.lit(1)).cast("double")

    def hit_frac(words: list[str]) -> Column:
        wl = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(wl, x))) / denom

    cjk = (
        F.length(F.regexp_replace(t, r"[^一-鿿぀-ヿ가-힯]", ""))
        .cast("double")
        / F.greatest(F.length(t), F.lit(1))
    )
    return F.struct(
        hit_frac(STOPWORDS_EN).alias("en"),
        hit_frac(STOPWORDS_ES).alias("es"),
        cjk.alias("cjk"),
    )


def simhash64(toks: Column | str) -> Column:
    """64-bit SimHash of a token array — fully JVM-side.

    Each token hashes to 64 bits (xxhash64); per bit position we sum +/-1
    across tokens and keep the sign. Implemented as an ``aggregate`` with an
    array<int> accumulator, so it scales linearly and never leaves codegen.
    """
    # bit masks for positions 0..63 (bit 63 is the sign bit of BIGINT)
    masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    mask_arr = F.array(*[F.lit(m).cast("long") for m in masks])
    hashes = F.transform(_c(toks), lambda tok: F.xxhash64(tok))
    zero = F.array_repeat(F.lit(0), 64)
    counts = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                mask_arr,
                lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
            ),
            lambda a, b: a + b,
        ),
    )
    # fold sign bits back into one BIGINT (masks are disjoint, XOR == OR)
    return F.aggregate(
        F.zip_with(
            counts,
            mask_arr,
            lambda cnt, m: F.when(cnt > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit simhashes."""
    x = _c(a).bitwiseXOR(_c(b))
    return F.bit_count(x)


def rolling_fingerprint(toks: Column | str, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min xxhash64 over every
    ``window``-token shingle (content-defined, shift-invariant)."""
    grams = word_ngrams(toks, window)
    return F.when(
        F.size(grams) > 0,
        F.array_min(F.transform(grams, lambda g: F.xxhash64(g))),
    ).otherwise(F.xxhash64(F.concat_ws(" ", _c(toks))))


# --- PII redaction (LLM-curation scrub pass) --------------------------------
# Patterns are deliberately limited to syntax that means the SAME thing in
# Java regex (Spark codegen) and RE2 (DuckDB oracle): char classes, bounded
# repetition, \b. Order matters: emails first (their local part can contain
# digit runs), then phones, then bare IPv4s.

PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
)


def redact_pii(text: Column | str) -> Column:
    """text -> text with emails/phones/IPv4s replaced by typed tags.

    Pure ``regexp_replace`` chain — codegen end to end, so the scrub pass
    is a map-only scan at 100 TB (no shuffle, no Python)."""
    out = _c(text)
    for pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_count(text: Column | str) -> Column:
    """Number of PII matches that ``redact_pii`` would replace."""
    t = _c(text)
    total = F.lit(0)
    # count patterns on the PROGRESSIVELY REDACTED text, mirroring the
    # replace chain — otherwise the IP pattern would also count the
    # digit runs inside already-counted phone numbers
    for pat, tag in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        t = F.regexp_replace(t, pat, tag)
    return total


def repetition_signals(toks: Column | str) -> Column:
    """Gopher-style repetition quality signals from a token array:
    struct(n_tokens, distinct_ratio, top_bigram_count, top_bigram_frac).

    ``top_bigram_*`` is the most frequent 2-gram's share — high values
    flag boilerplate/spam documents. EVERYTHING comes out of ONE
    run-length ``aggregate`` over the sorted bigram array (O(n log n)
    per doc, map-only; the final struct is built in the finish lambda):
    higher-order expressions evaluate interpreted and are re-evaluated
    PER REFERENCE, so the bigram array must be referenced exactly once
    — the earlier shape (mode referenced by count and frac, g2 by
    three expressions) multiplied a quadratic mode into minutes of one
    core per sf0.1 partition (caught by tools/bench_registry.py).
    Callers should likewise materialize this struct in its own
    projection and extract fields from the column, not re-call it per
    field. At 100 TB: one map-only scan, no per-doc shuffle ever."""
    t = _c(toks)
    g2 = word_ngrams(t, 2)
    n = F.size(t)
    dr = (
        F.when(n > 0, F.size(F.array_distinct(t)).cast("double") / n)
        .otherwise(F.lit(None).cast("double"))
    )
    return F.aggregate(
        F.array_sort(g2),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(0).alias("cnt"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            (acc["cnt"] + 1).alias("cnt"),
        ),
        lambda acc: F.struct(
            n.cast("long").alias("n_tokens"),
            dr.alias("distinct_ratio"),
            acc["best"].cast("long").alias("top_bigram_count"),
            F.when(
                acc["cnt"] > 0, acc["best"].cast("double") / acc["cnt"]
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("top_bigram_frac"),
        ),
    )


def gopher_rules(
    text: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """The Gopher/MassiveText quality-rule bundle (Rae et al. 2021 §A1.1)
    as ONE codegen struct — word-count bounds, mean-word-length band,
    symbol-to-word ratio (# and ellipsis), bullet/ellipsis line fractions,
    alphabetic-word ratio, and a minimum distinct-stopword count — plus
    per-rule booleans and the conjunction ``passes``. Pure built-in
    expressions (no UDF): the whole filter is a map-only scan at 100 TB.
    """
    t = _c(text)
    toks = tokens(t)
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = (
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / nw
    )
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    symbol_ratio = (n_hash + n_ell).cast("double") / nw
    lines = F.split(t, "\n")
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).startswith("-")
                | F.trim(l).startswith("*")
                | F.trim(l).startswith("•"),
            )
        ).cast("double")
        / nl
    )
    ellipsis_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.rtrim(l).endswith("...")
                | F.rtrim(l).endswith("…"),
            )
        ).cast("double")
        / nl
    )
    alpha_ratio = (
        F.size(F.filter(toks, lambda x: x.rlike(r"\p{L}"))).cast("double") / nw
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS_EN])
        )
    )
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mean = (mean_len >= min_avg_word_len) & (mean_len <= max_avg_word_len)
    ok_symbol = symbol_ratio <= max_symbol_word_ratio
    ok_bullet = bullet_frac <= max_bullet_line_frac
    ok_ellipsis = ellipsis_frac <= max_ellipsis_line_frac
    ok_alpha = alpha_ratio >= min_alpha_word_ratio
    ok_stop = stop_hits >= min_stop_hits
    return F.struct(
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        ok_words.alias("ok_words"),
        ok_mean.alias("ok_mean_len"),
        ok_symbol.alias("ok_symbol"),
        ok_bullet.alias("ok_bullet"),
        ok_ellipsis.alias("ok_ellipsis"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
        (
            ok_words & ok_mean & ok_symbol & ok_bullet & ok_ellipsis
            & ok_alpha & ok_stop
        ).alias("passes"),
    )


def hash_bucket(s: Column | str, dim: int) -> Column:
    """Hashing-trick bucket id in [0, dim): md5-derived so the EXACT
    bucket assignment replays in any engine (SQL twin:
    ``CAST('0x' || substr(md5(x),1,13) AS BIGINT) % dim``) — the
    engine-portable HashingTF primitive. 13 hex chars = 52 bits, no
    precision loss through the long cast. Use xxhash64 instead when
    cross-engine replay is not needed (cheaper, no string hex hop)."""
    t = _c(s)
    return (
        F.conv(F.substring(F.md5(t), 1, 13), 16, 10).cast("long") % dim
    )


def hashed_tf(toks: Column | str, dim: int) -> Column:
    """Feature-hashed term-frequency map: tokens -> map<bucket, count>
    (the sparse HashingTF row, collision semantics included). Pure
    higher-order expressions: buckets via hash_bucket, counts via
    a per-distinct-bucket filter — O(min(dim, distinct) * n) integer
    compares per row, so this form is for SMALL dims (hundreds); at
    large dims use the explode + groupBy form (q_hashed_tf) or a
    sorted run-length pass (the ``repetition_signals`` aggregate)."""
    t = _c(toks)
    buckets = F.transform(t, lambda x: hash_bucket(x, dim))
    return F.map_from_arrays(
        F.array_distinct(buckets),
        F.transform(
            F.array_distinct(buckets),
            lambda b: F.size(F.filter(buckets, lambda y: y == b)),
        ),
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL for web-crawl dedup: drop the fragment,
    lowercase the scheme://host prefix, strip tracking query params
    (utm_*, ref, fbclid, gclid), normalize leftover separators, and trim
    a trailing slash from the path. A pure regexp_replace chain —
    codegen map-only, zero Python — because at crawl scale URL dedup
    runs before anything else touches the payload.

    The param patterns are RE2-compatible (no backrefs/lookarounds) so
    engine twins (DuckDB oracle) reproduce them byte-for-byte."""
    u = _c(url)
    # 1. fragment off
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme://host (authority = everything before /?# ends)
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    tail = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(head, tail)
    # 3. tracking params out (value runs to next & or end). The name is
    # anchored to a ?/& separator, kept via $1 — unanchored, "?href=abc"
    # would lose its tail ("ref=abc" is a substring match) and distinct
    # URLs would collide (ADVICE r7)
    u = F.regexp_replace(
        u, r"([?&])(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*", "$1"
    )
    # 4. separator cleanup: collapse && runs, then dangling ?& / ?&-end
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 5. trailing slash off the path end ("/x/" == "/x", "host/" ==
    # "host") and off the path-query boundary ("/x/?q" == "/x?q") — a
    # URL has one "?", so "/?" occurs only there
    u = F.regexp_replace(u, r"/$", "")
    u = F.regexp_replace(u, r"/\?", "?")
    return u
