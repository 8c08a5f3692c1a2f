"""Text-analysis building blocks for the training-data pipeline:
tokenization, n-gram shingling, MinHash components, language-ID
heuristic, quality metrics. All pure Catalyst expressions (JVM-side).

MinHash design: signature component i = min over shingles of
``md5("s<i>|" || shingle)``. Hex-string min is engine-independent
(byte-wise lexicographic), so the same construction is expressible in
the DuckDB oracle — unlike builtin ``hash()`` which differs per engine.
Shingles are word 3-grams: the shingle space is |vocab|³, which keeps
random-document collisions rare where unigram tokens would not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and")


def tokens(col: Column) -> Column:
    """Whitespace tokens (regex split on runs of spaces, trimmed)."""
    return F.split(F.trim(col), " +")


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles: [tok[i] .. tok[i+n-1]] joined by spaces;
    empty array when len < n.

    Built as zip_with over n shifted slices rather than
    transform(sequence, i -> element_at(tok, i+k)): per-element
    element_at re-inlines the whole upstream token expression (no CSE
    inside lambda bodies), turning an O(len) shingle pass into
    O(len²) recomputation of split(). Slices evaluate the token array
    O(n) times per ROW instead."""
    m = F.size(tok) - (n - 1)
    sh = F.slice(tok, 1, m)
    for k in range(1, n):
        sh = F.zip_with(
            sh, F.slice(tok, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(tok) >= n, sh).otherwise(
        F.array().cast("array<string>")
    )


def minhash_component(shingle_col: Column, seed: int) -> Column:
    """One MinHash signature component over a shingle array."""
    return F.array_min(
        F.transform(
            shingle_col, lambda x: F.md5(F.concat(F.lit(f"s{seed}|"), x))
        )
    )


def lang_id_heuristic(text: Column) -> Column:
    """Cheap n-gram language-ID: scores a handful of high-frequency
    function-word/character markers per language and takes the argmax.
    (Real corpora: replace markers with trained n-gram profiles; the
    operator shape — score columns + greatest/argmax — is the same.)"""
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))

    def score(markers: list[str]) -> Column:
        s = F.lit(0)
        for m in markers:
            s = s + F.when(t.contains(f" {m} "), 1).otherwise(0)
        return s

    scores = {
        "en": score(["the", "and", "of", "is"]),
        "de": score(["der", "und", "die", "ist"]),
        "es": score(["el", "los", "es", "una"]),
        "fr": score(["le", "les", "est", "une"]),
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")  # undetermined
    for lang, s in reversed(list(scores.items())):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: word-piece regex (letters runs, digit runs,
    punctuation singles), the standard pre-tokenizer shape."""
    return F.size(
        F.filter(
            F.split(text, r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
            lambda x: (x != "") & (x != " "),
        )
    )
