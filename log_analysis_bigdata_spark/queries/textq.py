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
from . import register

N_MINHASH = 4  # signature width; 2 bands × 2 rows


def _tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.col(col)), " +")


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


def minhash_sig(col: Column, seed: int) -> Column:
    """One MinHash component: min over tokens of md5(seed-prefixed token).
    Hex-string min is engine-independent, unlike builtin hash()."""
    return F.array_min(
        F.transform(col, lambda x: F.md5(F.concat(F.lit(f"s{seed}|"), x)))
    )


def _sig_sql(seed: int) -> str:
    return (
        "list_aggregate(list_transform(string_split_regex(trim(text), ' +'), "
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
    SELECT doc_id,
           {_sig_sql(0)} AS sig0,
           {_sig_sql(1)} AS sig1,
           {_sig_sql(2)} AS sig2,
           {_sig_sql(3)} AS sig3
    FROM documents
    """,
    tags=("dedup", "minhash"),
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix (k=4) over whitespace tokens."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return docs.select(
        "doc_id",
        *[minhash_sig(toks, i).alias(f"sig{i}") for i in range(N_MINHASH)],
    )


@register(
    "minhash_dup_pairs",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    sigs AS (
      SELECT doc_id,
             md5({_sig_sql(0)} || {_sig_sql(1)}) AS band0,
             md5({_sig_sql(2)} || {_sig_sql(3)}) AS band1
      FROM corpus
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sigs a JOIN sigs b
      ON a.band0 = b.band0 OR a.band1 = b.band1
    WHERE a.doc_id < b.doc_id
    """,
    tags=("dedup", "minhash", "lsh"),
)
def minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: band signatures → per-band equi-join
    (bucket join), union of bands, distinct. The OR-join in the oracle is
    expressed in Spark as a union of two equi-joins so each stays a
    shuffle-hash/broadcast join — the scalable LSH plan."""
    corpus = _dup_corpus_spark(spark, sf_dir)
    toks = _tokens()
    sigs = corpus.select(
        "doc_id",
        F.md5(F.concat(minhash_sig(toks, 0), minhash_sig(toks, 1))).alias("band0"),
        F.md5(F.concat(minhash_sig(toks, 2), minhash_sig(toks, 3))).alias("band1"),
    )
    pairs = None
    for band in ("band0", "band1"):
        a = sigs.select(F.col("doc_id").alias("doc_a"), F.col(band).alias("b"))
        b = sigs.select(F.col("doc_id").alias("doc_b"), F.col(band).alias("b"))
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
      SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS tok
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
    """Token-set Jaccard verification over the known dup pairs (original,
    +1M re-key): the verify stage of the dedup pipeline. At scale the
    pair list comes from the LSH candidates, keeping this linear."""
    corpus = _dup_corpus_spark(spark, sf_dir)
    toks = corpus.select(
        "doc_id", F.array_distinct(_tokens()).alias("tok")
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
