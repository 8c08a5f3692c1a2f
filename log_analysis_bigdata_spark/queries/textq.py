"""Text-analysis and deduplication operators over ``documents`` — the
LLM-training-data-pipeline surface (BASELINE.json north star): exact
dedup, MinHash-LSH near-dup, fingerprinting, token/quality metrics.

Cross-engine determinism: all hashing is ``md5`` (identical hex output in
Spark and DuckDB), MinHash is min-over-tokens of seeded md5 (lexicographic
min on hex strings — engine-independent), and the dup corpus injects
deterministic duplicates (every doc_id % 10 == 0 re-keyed at +1_000_000)
so dedup queries have non-trivial answers at every scale factor.

Scale notes (100 TB): exact dedup is one hash-shuffle on a 32-hex-char
key; MinHash-LSH is the standard shingle→signature→band→bucket-join plan —
each band join is an equi-join on a short digest, so candidate generation
never goes quadratic.  The only quadratic step (verifying candidate pairs)
runs on the tiny candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import minhash_component, shingles, tokens
from . import register

N_MINHASH = 8  # signature width; 2 bands × 4 rows


def _tokens(col: str = "text") -> Column:
    return tokens(F.col(col))


def _dup_corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return docs.unionByName(dups)


_DUP_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text
    FROM documents WHERE doc_id % 10 = 0
"""


# DuckDB twins of functions.text.tokens / shingles / minhash_component.
_TOK_SQL = "string_split_regex(trim(text), ' +')"
_SHINGLE_SQL = (
    f"(CASE WHEN len({_TOK_SQL}) >= 3 THEN "
    f"list_transform(range(1, len({_TOK_SQL}) - 1), "
    f"i -> {_TOK_SQL}[i] || ' ' || {_TOK_SQL}[i+1] || ' ' || {_TOK_SQL}[i+2]) "
    "ELSE CAST([] AS VARCHAR[]) END)"
)


def _sig_sql(seed: int, shingle_expr: str = "sh") -> str:
    return (
        f"list_aggregate(list_transform({shingle_expr}, "
        f"x -> md5('s{seed}|' || x)), 'min')"
    )


@register(
    "dedup_exact_docs",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL})
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keep_doc_id
    FROM corpus
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
    tags=("dedup", "exact"),
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest; keep min doc_id."""
    corpus = _dup_corpus_spark(spark, sf_dir)
    return (
        corpus.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fingerprint
    FROM documents
    """,
    tags=("dedup", "fingerprint"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
    )


@register(
    "minhash_signatures",
    oracle=f"""
    WITH sh_t AS (SELECT doc_id, {_SHINGLE_SQL} AS sh FROM documents)
    SELECT doc_id,
           {_sig_sql(0)} AS sig0,
           {_sig_sql(1)} AS sig1,
           {_sig_sql(2)} AS sig2,
           {_sig_sql(3)} AS sig3
    FROM sh_t
    """,
    tags=("dedup", "minhash"),
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix (k=4 shown) over word-3-gram shingles.
    Shingles, not unigrams: the shingle space is |vocab|³ so unrelated
    documents rarely collide (unigram minhash over a small vocabulary
    marks everything similar)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles(_tokens()).alias("sh"))
    return sh.select(
        "doc_id",
        *[minhash_component(F.col("sh"), i).alias(f"sig{i}") for i in range(4)],
    )


_BANDS_SQL = f"""
      SELECT doc_id,
             md5({_sig_sql(0)} || '|' || {_sig_sql(1)} || '|'
                 || {_sig_sql(2)} || '|' || {_sig_sql(3)}) AS band0,
             md5({_sig_sql(4)} || '|' || {_sig_sql(5)} || '|'
                 || {_sig_sql(6)} || '|' || {_sig_sql(7)}) AS band1
      FROM sh_t
"""


@register(
    "minhash_dup_pairs",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    sh_t AS (SELECT doc_id, {_SHINGLE_SQL} AS sh FROM corpus),
    sigs AS ({_BANDS_SQL})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sigs a JOIN sigs b
      ON a.band0 = b.band0 OR a.band1 = b.band1
    WHERE a.doc_id < b.doc_id
    """,
    tags=("dedup", "minhash", "lsh"),
)
def minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: shingle → 8-component signature →
    2 bands × 4 rows → per-band equi-join, union, distinct.

    The oracle's OR-join is expressed as a union of two equi-joins so
    each band join stays hash-partitioned (never quadratic). The band
    table is persisted before the self-join — at 100 TB you'd write the
    signature table out and bucket it by band; persist is the local-mode
    stand-in for that materialization.
    """
    # repartition: the doc corpus is one small input split locally —
    # spread the shingle+md5-heavy stages across all cores. persist(sh):
    # pins the computed shingle arrays so CollapseProject can't re-inline
    # the shingle construction into each of the 8 signature components
    # (8× recompute), and the band self-join reads the cache instead of
    # recomputing the whole pipeline per side.
    corpus = _dup_corpus_spark(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    sh = corpus.select("doc_id", shingles(_tokens()).alias("sh")).persist()
    sigs = [minhash_component(F.col("sh"), i) for i in range(N_MINHASH)]
    bands = sh.select(
        "doc_id",
        F.md5(F.concat_ws("|", *sigs[0:4])).alias("band0"),
        F.md5(F.concat_ws("|", *sigs[4:8])).alias("band1"),
    ).persist()
    pairs = None
    for band in ("band0", "band1"):
        a = bands.select(F.col("doc_id").alias("doc_a"), F.col(band).alias("b"))
        b = bands.select(F.col("doc_id").alias("doc_b"), F.col(band).alias("b"))
        p = a.join(b, "b").filter(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    toks AS (
      SELECT doc_id, list_distinct({_SHINGLE_SQL}) AS tok
      FROM corpus
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                 / CAST(len(list_distinct(a.tok || b.tok)) AS DOUBLE), 4)
             AS jaccard
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1000000
    """,
    tags=("dedup", "jaccard", "ngram"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set Jaccard verification over the known dup pairs
    (original, +1M re-key): the verify stage of the dedup pipeline. At
    scale the pair list comes from the LSH candidates, keeping this
    linear in candidates, never quadratic in corpus."""
    corpus = _dup_corpus_spark(spark, sf_dir)
    toks = corpus.select(
        "doc_id", F.array_distinct(shingles(_tokens())).alias("tok")
    )
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("tok").alias("tok_a"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"))
    pairs = a.join(b, F.col("doc_b") == F.col("doc_a") + 1_000_000)
    inter = F.size(F.array_intersect("tok_a", "tok_b")).cast("double")
    uni = F.size(F.array_distinct(F.concat("tok_a", "tok_b"))).cast("double")
    return pairs.select(
        "doc_a", "doc_b", F.round(inter / uni, 4).alias("jaccard")
    )


@register(
    "text_quality_docs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), ' +')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split_regex(trim(text), ' +')))
                AS INTEGER) AS n_uniq_tokens,
           round(CAST(length(regexp_replace(trim(text), ' +', '', 'g')) AS DOUBLE)
                 / CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE), 4)
             AS avg_token_len,
           round(CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                            x -> list_contains(['the', 'a', 'of', 'and'], x)))
                      AS DOUBLE)
                 / CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE), 4)
             AS stopword_ratio,
           round(CAST(len(list_distinct(string_split_regex(trim(text), ' +')))
                      AS DOUBLE)
                 / CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE), 4)
             AS ttr
    FROM documents
    """,
    tags=("text", "quality", "tokens"),
)
def text_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics: token count, type-token ratio, mean token length,
    stopword ratio — all JVM-side expressions, zero Python in the path."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    char_len = F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")).cast(
        "double"
    )
    stop = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))
    ).cast("double")
    return docs.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        n_uniq.cast("int").alias("n_uniq_tokens"),
        F.round(char_len / n_tokens.cast("double"), 4).alias("avg_token_len"),
        F.round(stop / n_tokens.cast("double"), 4).alias("stopword_ratio"),
        F.round(n_uniq.cast("double") / n_tokens.cast("double"), 4).alias("ttr"),
    )


@register(
    "lang_histogram",
    oracle="""
    SELECT lang, count(*) AS n, round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "langid"),
)
def lang_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


# BPE-ish pretokenizer (GPT-2 style, ASCII-simplified so Java and RE2
# regex engines agree): contractions, space-prefixed letter runs, digit
# runs, punctuation runs, whitespace.
BPE_PAT = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


@register(
    "token_counts_docs",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_PAT.replace("'", "''")}'))
             AS bpe_tokens,
           len(string_split_regex(trim(text), ' +')) AS ws_tokens
    FROM documents
    """,
    tags=("text", "tokens", "bpe"),
)
def token_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways a data pipeline needs it: a BPE-ish
    pretokenizer regex (the unit LLM token budgets approximate) and
    whitespace words. Pure regexp_extract_all — JVM-side, no UDF; counts
    verified identical between Spark (Java regex) and DuckDB (RE2) on
    the ASCII-simplified pattern."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_PAT), 0)).alias("bpe_tokens"),
        F.size(F.split(F.trim(F.col("text")), " +")).alias("ws_tokens"),
    )


@register(
    "profile_documents",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_empty,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(avg(n_chars), 4) AS avg_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY source
    """,
    tags=("text", "profiling", "quality"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling — the null/empty/size/cardinality audit a
    training-data pipeline runs before ingest, one agg pass per source."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)
        ).alias("n_empty"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


# Gopher-style heuristic thresholds (public rule-of-thumb values).
QF_MIN_TOKENS = 5
QF_MAX_TOKENS = 1000
QF_MAX_SYMBOL_RATIO = 0.3
QF_MIN_MEAN_WORD_LEN = 2.0
QF_MAX_MEAN_WORD_LEN = 12.0


@register(
    "quality_filter_docs",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), ' +')) AS n_tok,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
               / greatest(length(text), 1) AS sym_ratio,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / greatest(len(string_split_regex(trim(text), ' +')), 1)
               AS mean_word_len
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tok AS INTEGER) AS n_tok,
           round(sym_ratio, 4) AS sym_ratio,
           round(mean_word_len, 4) AS mean_word_len,
           CAST(n_tok >= {QF_MIN_TOKENS} AND n_tok <= {QF_MAX_TOKENS}
                AND sym_ratio <= {QF_MAX_SYMBOL_RATIO!r}
                AND mean_word_len >= {QF_MIN_MEAN_WORD_LEN!r}
                AND mean_word_len <= {QF_MAX_MEAN_WORD_LEN!r}
             AS INTEGER) AS keep
    FROM m
    """,
    tags=("text", "quality", "filter", "gopher"),
)
def quality_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality gate: token-count bounds, symbol
    ratio, mean word length — the pass/fail filter a pretraining corpus
    runs before dedup. All column expressions (no UDF): at 100 TB this
    fuses into the scan and the kept subset streams straight into the
    dedup stage without a second pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), " +"))
    sym_ratio = F.size(
        F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)
    ).cast("double") / F.greatest(F.length("text"), F.lit(1))
    mean_wl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / F.greatest(n_tok, F.lit(1))
    keep = (
        (n_tok >= QF_MIN_TOKENS)
        & (n_tok <= QF_MAX_TOKENS)
        & (sym_ratio <= QF_MAX_SYMBOL_RATIO)
        & (mean_wl >= QF_MIN_MEAN_WORD_LEN)
        & (mean_wl <= QF_MAX_MEAN_WORD_LEN)
    )
    return docs.select(
        "doc_id",
        n_tok.cast("int").alias("n_tok"),
        F.round(sym_ratio, 4).alias("sym_ratio"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        keep.cast("int").alias("keep"),
    )


SIMHASH_BITS = 16

_TOKH_SQL = (
    "list_transform(list_distinct(string_split_regex(trim(text), ' +')), "
    "t -> ('0x' || substring(md5(t), 1, 4))::INTEGER)"
)


def _simhash_sql() -> str:
    bit_votes = " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(hs, "
        f"h -> ((h // {1 << j}) % 2) * 2 - 1), 'sum') > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return bit_votes


@register(
    "simhash_text_docs",
    oracle=f"""
    WITH hs_t AS (SELECT doc_id, {_TOKH_SQL} AS hs FROM documents)
    SELECT doc_id,
           CAST({_simhash_sql()} AS INTEGER) AS simhash
    FROM hs_t
    """,
    tags=("dedup", "simhash", "text"),
)
def simhash_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text SimHash (16-bit): hash each distinct token once, then per
    bit position take the majority vote across tokens — near-identical
    documents land on identical (or 1-2-bit-apart) signatures, so dup
    candidates are an equi-join on the signature (or on banded halves
    for Hamming-distance tolerance).

    Plan: token hashes computed once per doc (one transform), 16 bit
    votes as HOF sums over that array — narrow, shuffle-free, fused into
    the scan. Exact copies provably collide (same token set → same
    votes).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok_hash = F.transform(
        F.array_distinct(F.split(F.trim(F.col("text")), " +")),
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int"),
    )
    hs = docs.select("doc_id", tok_hash.alias("hs"))

    def bit_vote(j: int):
        # closure factory: a 2-arg lambda would receive (element, index)
        return lambda h: (F.shiftright(h, j) % 2) * 2 - 1

    simhash = sum(
        F.when(
            F.aggregate(
                F.transform(F.col("hs"), bit_vote(j)),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            > 0,
            1 << j,
        ).otherwise(0)
        for j in range(SIMHASH_BITS)
    )
    return hs.select("doc_id", simhash.cast("int").alias("simhash"))


@register(
    "simhash_dup_groups",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    hs_t AS (SELECT doc_id, {_TOKH_SQL} AS hs FROM corpus)
    SELECT CAST({_simhash_sql()} AS INTEGER) AS simhash,
           count(*) AS n_docs,
           min(doc_id) AS keep_doc_id
    FROM hs_t
    GROUP BY 1
    HAVING count(*) > 1
    """,
    tags=("dedup", "simhash", "text", "groups"),
)
def simhash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup join: group the (deliberately duplicated) corpus by
    16-bit signature, keep groups with >1 member, min doc_id is the
    keeper — the signature-equality rendering of dedup (vs content-hash
    equality in dedup_exact_docs). One narrow signature pass + one
    groupBy shuffle on a 2-byte key; for Hamming-tolerant matching at
    scale, band the signature and OR the per-band equi-joins exactly as
    minhash_dup_pairs does.
    """
    corpus = _dup_corpus_spark(spark, sf_dir)
    tok_hash = F.transform(
        F.array_distinct(F.split(F.trim(F.col("text")), " +")),
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int"),
    )
    hs = corpus.select("doc_id", tok_hash.alias("hs"))

    def bit_vote(j: int):
        return lambda h: (F.shiftright(h, j) % 2) * 2 - 1

    simhash = sum(
        F.when(
            F.aggregate(
                F.transform(F.col("hs"), bit_vote(j)),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            > 0,
            1 << j,
        ).otherwise(0)
        for j in range(SIMHASH_BITS)
    )
    return (
        hs.select("doc_id", simhash.cast("int").alias("simhash"))
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --- PII redaction (round 3) ------------------------------------------------

# Patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB): no
# backreferences, no lookaround.
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\+1-555-[0-9]{4}"

# The synthetic corpus is PII-free word salad, so the query plants
# deterministic PII derived from doc_id — one email per doc, a phone for
# doc_id % 3 == 0 — then redacts it. Both engines build the identical
# augmented string, so counts and the redacted-text digest are exact.
_AUG_SQL = """
    (text || ' contact user' || CAST(doc_id AS VARCHAR)
          || '@example.com now'
          || CASE WHEN doc_id % 3 = 0
                  THEN ' or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END)
"""


@register(
    "pii_redact_docs",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS s FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(s, '{_EMAIL_PAT}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(s, '{_PHONE_PAT}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(s, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                              '{_PHONE_PAT}', '<PHONE>', 'g')) AS redacted_md5
    FROM aug
    """,
    tags=("text", "pii", "redaction", "F1", "F2"),
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training-data hygiene: detect + mask emails and
    phone numbers, returning per-doc match counts and a digest of the
    redacted text (digest, not the text, so the driver compare stays
    small and the full redacted string is still pinned byte-for-byte).

    Pure column expressions (regexp_extract_all / regexp_replace) — at
    100 TB this is a narrow map fused into the scan, zero Python, zero
    shuffle. Spark's regexp_replace is replace-ALL by default; the DuckDB
    twin needs the explicit 'g' flag — a classic cross-engine trap this
    oracle locks down.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com now"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" or call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
    )
    s = aug.alias("s")
    redacted = F.regexp_replace(
        F.regexp_replace(s, _EMAIL_PAT, "<EMAIL>"), _PHONE_PAT, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(s, F.lit(_EMAIL_PAT), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(s, F.lit(_PHONE_PAT), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# --- Gopher-style repetition metrics (round 3) ------------------------------


@register(
    "repetition_metrics_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    idx AS (SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks),
    grams AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS g
      FROM idx WHERE i <= len(t) - 1
    ),
    counts AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_gram_frac,
           round(CAST(count(*) AS DOUBLE) / sum(c), 4) AS distinct_gram_frac
    FROM counts GROUP BY doc_id
    """,
    tags=("text", "quality", "repetition", "dedup"),
)
def repetition_metrics_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: per doc, the fraction of 2-gram
    mass taken by the single most frequent 2-gram, and the distinct-2-gram
    fraction — the standard signals for boilerplate/looped text that
    quality-gates drop before training.

    Plan: split → inline 2-gram build (``transform`` over an index
    sequence, JVM-side) → explode → two-level aggregate keyed on
    (doc_id, gram) then doc_id. The explode is linear in token count and
    the only shuffle key is doc_id — at 100 TB this is the same shape as
    word-count, with partial aggregation soaking up the per-doc skew.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 2)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")
        ).alias("g"),
    )
    counts = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.round(F.max("c").cast("double") / F.sum("c"), 4).alias("top_gram_frac"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 4).alias(
            "distinct_gram_frac"
        ),
    )


def _ngram_sql(n: int, tok_expr: str = "tok") -> str:
    """DuckDB word n-gram list over a token-array expression — the
    oracle twin of ``functions.text.shingles(tok, n)``."""
    return (
        f"(CASE WHEN len({tok_expr}) >= {n} THEN "
        f"list_transform(range(1, len({tok_expr}) - {n - 1} + 1), "
        f"i -> list_aggregate({tok_expr}[i:i+{n - 1}], 'string_agg', ' ')) "
        "ELSE CAST([] AS VARCHAR[]) END)"
    )


@register(
    "contamination_check",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOK_SQL} AS tok FROM documents
    ), grams AS (
      SELECT doc_id, source,
             unnest(list_distinct({_ngram_sql(5)})) AS g
      FROM toks
    ), bench AS (
      SELECT DISTINCT g FROM grams WHERE source = 'src0'
    ), corpus AS (
      SELECT doc_id, g FROM grams WHERE source <> 'src0'
    ), doc_sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_grams
      FROM corpus GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_hits,
           ds.doc_grams,
           round(CAST(count(*) AS DOUBLE) / ds.doc_grams, 4)
             AS contamination_rate
    FROM corpus c
    JOIN bench b ON b.g = c.g
    JOIN doc_sizes ds ON ds.doc_id = c.doc_id
    GROUP BY c.doc_id, ds.doc_grams
    ORDER BY n_hits DESC, c.doc_id
    LIMIT 100
    """,
    tags=("text", "dedup", "contamination", "ngram"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which training docs leak eval data?

    The held-out "benchmark" is every src0 document; a corpus doc is
    contaminated if it shares word-5-grams with any benchmark doc
    (5-grams: long enough that random same-vocab docs share none —
    measured 2 contaminated docs here vs 400 false hits at 3-grams).
    Reports per-doc distinct-hit count and contamination rate.

    Scale shape: the benchmark gram set is DISTINCT'd and broadcast
    (eval suites are MBs; the corpus is the 100 TB side), so the plan
    is scan → explode → broadcast-hash semi-side join → one groupBy on
    doc_id. No shuffle of the corpus n-gram stream by gram, and the
    grams never leave their scan partition before the hit filter.
    """
    from ..functions.text import shingles, tokens

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 5))).alias("g"),
    )
    bench = (
        grams.filter(F.col("source") == "src0").select("g").distinct()
    )
    corpus = grams.filter(F.col("source") != "src0").select("doc_id", "g")
    doc_sizes = corpus.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("doc_grams")
    )
    hits = (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        hits.join(doc_sizes, "doc_id")
        .select(
            "doc_id",
            "n_hits",
            "doc_grams",
            F.round(
                F.col("n_hits").cast("double") / F.col("doc_grams"), 4
            ).alias("contamination_rate"),
        )
        .orderBy(F.desc("n_hits"), "doc_id")
        .limit(100)
    )


# --- round 3c: training-set assembly ops ------------------------------------
# The last mile of a pretraining data pipeline: pack documents into
# fixed-size sequences, split deterministically, and rebalance the
# source mixture. All pure column/window expressions — at 100 TB each
# is one shuffle (or none), no Python.


@register(
    "sequence_pack_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({_TOK_SQL}) AS n_tokens FROM documents
    ), c AS (
      SELECT source, doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM t
    )
    SELECT source,
           CAST(cum_before // 256 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           round(sum(n_tokens) / 256.0, 4) AS fill_frac
    FROM c
    GROUP BY source, bin
    ORDER BY source, bin
    """,
    tags=("text", "packing", "window", "training"),
)
def sequence_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed 256-token training
    windows by contiguous greedy packing (a doc starts in the bin where
    its shard's running token count stands — the Megatron-style
    pack-then-chunk layout). Reports per-bin document count and fill.

    Scale shape: packing is PER SOURCE SHARD (window partitioned by
    source, ordered by doc_id), never a global cumsum — a corpus-wide
    ordering would serialize 100 TB through one partition. One hash
    shuffle on source; the cumulative sum is in-partition.
    """
    from pyspark.sql.window import Window

    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        c.withColumn("bin", F.expr("cum_before div 256"))
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.round(F.sum("n_tokens") / 256.0, 4).alias("fill_frac"),
        )
        .orderBy("source", "bin")
    )


@register(
    "hash_split_summary",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len({_TOK_SQL}) AS n_tokens,
             strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS h
      FROM documents
    ), s AS (
      SELECT CASE WHEN h < 13 THEN 'train'
                  WHEN h < 15 THEN 'val'
                  ELSE 'test' END AS split,
             n_tokens
      FROM d
    ), g AS (
      SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens
      FROM s GROUP BY split
    )
    SELECT split, n_docs, tokens,
           round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 4) AS doc_frac
    FROM g
    ORDER BY split
    """,
    tags=("text", "split", "hash", "training"),
)
def hash_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split (~81/12/6 via the
    first md5 nibble of the doc id): the standard way to split a corpus
    so membership is stable under re-runs, re-shards, and appends —
    no RNG, no global sort, no state. Reports per-split doc/token
    totals and fractions.

    The md5-nibble bucket is engine-independent (hex-char lookup), so
    the oracle replays the exact assignment. Narrow map + one tiny
    groupBy; the split column would normally become a partition column
    on write.
    """
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        (
            F.expr(
                "locate(substr(md5(CAST(doc_id AS STRING)), 1, 1),"
                " '0123456789abcdef') - 1"
            )
        ).alias("h"),
    )
    s = d.select(
        F.when(F.col("h") < 13, "train")
        .when(F.col("h") < 15, "val")
        .otherwise("test")
        .alias("split"),
        "n_tokens",
    )
    g = s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tokens")
    )
    from pyspark.sql.window import Window

    return g.select(
        "split",
        "n_docs",
        "tokens",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(Window.partitionBy()),
            4,
        ).alias("doc_frac"),
    ).orderBy("split")


@register(
    "mixture_weights_lang",
    oracle=f"""
    WITH g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOK_SQL})) AS BIGINT) AS tokens
      FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, tokens,
           round(CAST(tokens AS DOUBLE) / sum(tokens) OVER (), 4)
             AS token_frac,
           round(0.2 * sum(tokens) OVER () / tokens, 4) AS sample_weight
    FROM g
    ORDER BY lang
    """,
    tags=("text", "mixture", "training"),
)
def mixture_weights_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing: per-language sampling weights that move
    the corpus to a uniform (20% per language) token mixture —
    weight = target_frac / actual_frac. The multiplier a sampling pass
    applies per shard to hit a target pretraining mixture.

    One groupBy over the corpus; the totals are an empty-frame window
    (equivalently a 1-row broadcast). Weights above 1 mean upsample.
    """
    from pyspark.sql.window import Window

    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("tokens"),
    )
    tot = F.sum("tokens").over(Window.partitionBy())
    return g.select(
        "lang",
        "n_docs",
        "tokens",
        F.round(F.col("tokens").cast("double") / tot, 4).alias("token_frac"),
        F.round(0.2 * tot / F.col("tokens"), 4).alias("sample_weight"),
    ).orderBy("lang")
