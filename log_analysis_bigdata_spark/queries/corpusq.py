"""Corpus-preparation pipeline queries — round-6 additions to the
LLM-training-data surface: the end-to-end dedup pipeline (candidate →
verify → cluster → canonicalize in ONE registry entry), deterministic
reservoir sampling, BPE-style token estimation, and cross-format
(normalization-robust) dedup.

All four follow the package's determinism rules (queries/__init__.py):
integer comparisons instead of float thresholds, md5 for every hash,
total orders before every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import (
    JACCARD_DEN,
    JACCARD_NUM,
    minhash_dedup_pipeline,
)
from . import register
from .textq import (
    _DUP_CORPUS_SQL,
    _HS_SQL,
    _SHINGLE_SQL,
    _TOK_SQL,
    BPE_PAT,
    PLANT_SHIFT,
    _band_sql,
    _dup_corpus_spark,
)


@register(
    "dedup_pipeline_docs",
    oracle=f"""
    WITH RECURSIVE corpus AS ({_DUP_CORPUS_SQL}),
    sh_t AS (SELECT doc_id, {_SHINGLE_SQL} AS sh FROM corpus),
    sh_ne AS (SELECT doc_id, {_HS_SQL} AS hs FROM sh_t WHERE len(sh) > 0),
    sigs AS (
      SELECT doc_id, {_band_sql(0)} AS band0, {_band_sql(4)} AS band1
      FROM sh_ne
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sigs a JOIN sigs b
        ON (a.band0 = b.band0 OR a.band1 = b.band1)
       AND a.doc_id < b.doc_id
    ),
    shd AS (SELECT doc_id, list_distinct(hs) AS shd FROM sh_ne),
    ver AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.doc_a
      JOIN shd sb ON sb.doc_id = c.doc_b
      WHERE {JACCARD_DEN} * len(list_intersect(sa.shd, sb.shd))
            >= {JACCARD_NUM} * len(list_distinct(sa.shd || sb.shd))
    ),
    -- MATERIALIZED: DuckDB inlines CTEs, so the recursive reach join
    -- would otherwise re-run the whole minhash pipeline per iteration
    edges AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM ver
      UNION SELECT doc_b, doc_a FROM ver
      UNION SELECT doc_a, doc_a FROM ver
      UNION SELECT doc_b, doc_b FROM ver
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    labels AS (SELECT src AS node, min(dst) AS component FROM reach
               GROUP BY src)
    SELECT component AS keep_doc_id,
           count(*) AS n_members,
           max(node) AS max_doc_id
    FROM labels GROUP BY component
    """,
    tags=("dedup", "pipeline", "minhash", "lsh", "components", "iterative"),
)
def dedup_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end dedup chain in one entry: minhash → banded-LSH
    candidates → exact-Jaccard verify (integer >= 4/5 compare) →
    connected components → canonical keeper per cluster. Stage plans
    and the bucketed zero-corpus-shuffle variant are asserted in
    tests/test_plans.py; stage semantics live in operators/dedup.py.
    The oracle replays every stage plus a recursive-CTE fixpoint."""
    return minhash_dedup_pipeline(_dup_corpus_spark(spark, sf_dir))


K_RESERVOIR = 100


@register(
    "reservoir_sample_docs",
    oracle=f"""
    SELECT doc_id, lang, n_chars,
           md5('rsv|' || CAST(doc_id AS VARCHAR)) AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id
    LIMIT {K_RESERVOIR}
    """,
    tags=("sampling", "reservoir"),
)
def reservoir_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample via consistent hashing — the
    deterministic, distributed analog of reservoir sampling: keep the
    k smallest md5(seed|doc_id) keys. Same marginal uniformity (md5 is
    uniform over ids), but re-run-stable, append-stable (a new doc
    displaces at most one incumbent), and mergeable: each partition
    keeps its local top-k and the driver merges — which is exactly
    Spark's TakeOrderedAndProject physical plan, no full sort, no full
    shuffle (plan-asserted in tests/test_plans.py). A seeded rand()
    reservoir is NOT re-run-stable under Spark task retries; hashing
    the key is the production-safe form."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("rsv|"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(K_RESERVOIR)
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text,
               '{BPE_PAT.replace("'", "''")}')) AS BIGINT) AS bpe,
             CAST(len({_TOK_SQL}) AS BIGINT) AS ws,
             CAST(n_chars AS BIGINT) AS chars
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           round(sum(bpe) / CAST(sum(ws) AS DOUBLE), 4) AS fertility,
           round(sum(chars) / CAST(sum(bpe) AS DOUBLE), 4)
             AS chars_per_token
    FROM t GROUP BY lang ORDER BY lang
    """,
    tags=("text", "tokens", "bpe", "profiling", "training"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — tokens-per-word and
    chars-per-token, THE metric for judging how well a tokenizer's
    vocabulary fits each language in the mix (a high-fertility language
    pays more sequence length per word, trains slower, and effectively
    sees a smaller context window; the number drives both vocab-size
    decisions and per-language mixture weights). Uses the same BPE-ish
    pretokenizer regex as token_counts_docs, aggregated per ``lang``.

    Scale: pure map (two regex counts per row) into one map-side-
    combinable hash agg onto #langs keys — shuffle volume is
    executors × languages, independent of corpus size. No UDF: the
    regex runs JVM-side (Spark) / RE2 (DuckDB) on the ASCII-simplified
    pattern both engines tokenize identically.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(BPE_PAT), 0))
        .cast("long")
        .alias("bpe"),
        F.size(F.split(F.trim(F.col("text")), " +")).cast("long").alias("ws"),
        F.col("n_chars").cast("long").alias("chars"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("chars").alias("total_chars"),
            F.round(
                F.sum("bpe") / F.sum("ws").cast("double"), 4
            ).alias("fertility"),
            F.round(
                F.sum("chars") / F.sum("bpe").cast("double"), 4
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# Per-source document cap: half the fair share, count-derived so the
# cap scales with the corpus instead of being a magic constant. The
# halving makes the cap BIND on a balanced corpus too (a pure fair
# share only trims sources above the mean).
SRC_CAP_DEN = 2


@register(
    "source_cap_sample",
    oracle=f"""
    WITH g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), caps AS (
      SELECT source, n_docs,
             (sum(n_docs) OVER () + {SRC_CAP_DEN} * count(*) OVER () - 1)
               // ({SRC_CAP_DEN} * count(*) OVER ()) AS cap
      FROM g
    ), ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents
    ), kept AS (
      SELECT r.source, c.n_docs, c.cap, r.n_chars
      FROM ranked r JOIN caps c USING (source)
      WHERE r.rk <= c.cap
    )
    SELECT source, n_docs, CAST(cap AS BIGINT) AS cap,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars,
           round(1.0 - count(*) / CAST(n_docs AS DOUBLE), 4) AS drop_frac
    FROM kept GROUP BY source, n_docs, cap
    ORDER BY source
    """,
    tags=("sampling", "curation", "training"),
)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps — the domain-balancing step every
    web-scale corpus curation runs (no single crawl domain may dominate
    the training mix): rank each source's documents by a deterministic
    quality order (longer first, doc_id tiebreak) and keep only the
    top ``cap`` per source, with ``cap`` count-derived as half the
    fair share ``ceil(total / (2·n_sources))`` so it scales with the
    corpus and binds even when sources are balanced.

    Determinism: the rank order (n_chars DESC, doc_id) is total, the
    cap is integer ceiling division on both engines (``div``/``//``),
    and the summary sums are integer adds.

    Scale: one vocabulary-of-sources agg (tiny) with a single-partition
    window over #sources rows for the cap; the per-source rank is ONE
    window partitioned by source — each partition sorts locally, no
    global sort. A skewed mega-source makes one fat partition; the
    standard fix (two-phase: per-partition pre-rank + cap, then exact
    rank over survivors ≤ 2·cap per source) drops in without changing
    results. Caps table is broadcast back onto the ranked stream.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    caps = g.select(
        "source",
        "n_docs",
        F.expr(
            f"(sum(n_docs) OVER () + {SRC_CAP_DEN} * count(*) OVER () - 1) "
            f"div ({SRC_CAP_DEN} * count(*) OVER ())"
        ).alias("cap"),
    )
    wsrc = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    ranked = docs.select(
        "source", "doc_id", "n_chars", F.row_number().over(wsrc).alias("rk")
    )
    kept = ranked.join(F.broadcast(caps), "source").filter(
        F.col("rk") <= F.col("cap")
    )
    return (
        kept.groupBy("source", "n_docs", "cap")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .select(
            "source",
            "n_docs",
            F.col("cap").cast("long").alias("cap"),
            "n_kept",
            "kept_chars",
            F.round(
                1.0 - F.col("n_kept") / F.col("n_docs").cast("double"), 4
            ).alias("drop_frac"),
        )
        .orderBy("source")
    )


@register(
    "bpe_token_estimate_docs",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
             AS n_word_runs,
           CAST(coalesce(list_aggregate(list_transform(
                 regexp_extract_all(text, '[A-Za-z]+'),
                 w -> (len(w) + 3) // 4), 'sum'), 0) AS BIGINT)
             AS n_word_pieces,
           CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
             AS n_digit_chars,
           CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT)
             AS n_other_chars,
           CAST(coalesce(list_aggregate(list_transform(
                 regexp_extract_all(text, '[A-Za-z]+'),
                 w -> (len(w) + 3) // 4), 'sum'), 0)
               + len(regexp_replace(text, '[^0-9]', '', 'g'))
               + len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
             AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
    tags=("text", "tokenize", "bpe"),
)
def bpe_token_estimate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token-count estimate, pure column expressions: letter
    runs contribute ceil(len/4) subword pieces (BPE merges average ~4
    chars/token on English text), digits tokenize per-character (as
    GPT-2/cl100k largely do), every other non-space char is its own
    token. All integer arithmetic — the estimate is bit-identical
    cross-engine, unlike a float chars-per-token ratio. At 100 TB this
    is a narrow per-row pass: no shuffle, whole-stage codegen, and the
    regexes are anchored character classes (no backtracking blowup)."""
    docs = load_table(spark, sf_dir, "documents")
    words = "regexp_extract_all(text, '[A-Za-z]+', 0)"
    pieces = (
        f"aggregate({words}, 0L, (acc, w) -> acc + (length(w) + 3) div 4)"
    )
    n_digit = "cast(length(regexp_replace(text, '[^0-9]', '')) as bigint)"
    n_other = (
        r"cast(length(regexp_replace(text, '[A-Za-z0-9\\s]', '')) as bigint)"
    )
    return docs.select(
        "doc_id",
        F.expr(f"cast(size({words}) as bigint)").alias("n_word_runs"),
        F.expr(pieces).alias("n_word_pieces"),
        F.expr(n_digit).alias("n_digit_chars"),
        F.expr(n_other).alias("n_other_chars"),
        F.expr(f"{pieces} + {n_digit} + {n_other}").alias("est_bpe_tokens"),
    )


# Cross-format variant corpus: the same content under different
# formatting — case-flipped re-keys at +PLANT_SHIFT (doc_id % 10),
# whitespace-inflated re-keys at +2·PLANT_SHIFT (doc_id % 15) — so
# normalization-robust dedup has non-trivial clusters (docs at % 30 get
# BOTH variants: 3-member groups) while plain exact dedup
# (dedup_exact_docs) would miss all of them.
_VARIANT_CORPUS_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_SHIFT} AS doc_id, upper(text) AS text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + {2 * PLANT_SHIFT} AS doc_id,
           '  ' || replace(text, ' ', '  ') || ' ' AS text
    FROM documents WHERE doc_id % 15 = 0
"""


def _variant_corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    case_v = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANT_SHIFT).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    space_v = docs.filter(F.col("doc_id") % 15 == 0).select(
        (F.col("doc_id") + 2 * PLANT_SHIFT).alias("doc_id"),
        F.concat(
            F.lit("  "), F.expr("replace(text, ' ', '  ')"), F.lit(" ")
        ).alias("text"),
    )
    return docs.unionByName(case_v).unionByName(space_v)


@register(
    "crossformat_dedup_docs",
    oracle=f"""
    WITH corpus AS ({_VARIANT_CORPUS_SQL})
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS canon_hash,
           count(*) AS n_variants,
           min(doc_id) AS keep_doc_id,
           max(doc_id) AS max_doc_id
    FROM corpus
    GROUP BY 1
    HAVING count(*) > 1
    """,
    tags=("dedup", "normalization", "crossformat"),
)
def crossformat_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust exact dedup: canonicalize (lowercase,
    collapse every non-alnum run to one space, trim) then hash-groupBy
    — catches the same content re-encoded with different case/spacing/
    punctuation, which raw content-hash dedup misses. One shuffle on a
    32-hex key, same scale shape as dedup_exact_docs."""
    corpus = _variant_corpus_spark(spark, sf_dir)
    canon = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    )
    return (
        corpus.groupBy(canon.alias("canon_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_variants") > 1)
    )


# Incremental-dedup "new batch": exact re-keys of history at
# +PLANT_SHIFT (doc_id % 10) plus near-dup mutations at +3·PLANT_SHIFT
# (doc_id % 7 == 3, first token dropped — shingle Jaccard ~ (m-1)/m,
# well above the 4/5 verify threshold) plus everything else
# novel-by-construction is absent, so the answer has all three
# outcomes: exact match, near match, novel.
_NEW_BATCH_SQL = f"""
    SELECT doc_id + {PLANT_SHIFT} AS doc_id, text FROM documents
    WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + {3 * PLANT_SHIFT} AS doc_id,
           regexp_replace(text, '^[^ ]+ ', '') AS text
    FROM documents WHERE doc_id % 7 = 3
"""


def _new_batch_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANT_SHIFT).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 3 * PLANT_SHIFT).alias("doc_id"),
        F.regexp_replace("text", "^[^ ]+ ", "").alias("text"),
    )
    return exact.unionByName(near)


@register(
    "incremental_dedup_newbatch",
    oracle=f"""
    WITH newb AS ({_NEW_BATCH_SQL}),
    hist_sh AS (
      SELECT doc_id, {_HS_SQL} AS hs
      FROM (SELECT doc_id, {_SHINGLE_SQL} AS sh FROM documents) t
      WHERE len(sh) > 0
    ),
    new_sh AS (
      SELECT doc_id, {_HS_SQL} AS hs
      FROM (SELECT doc_id, {_SHINGLE_SQL} AS sh FROM newb) t
      WHERE len(sh) > 0
    ),
    hist_bands AS (
      SELECT doc_id, {_band_sql(0)} AS band0, {_band_sql(4)} AS band1
      FROM hist_sh
    ),
    new_bands AS (
      SELECT doc_id, {_band_sql(0)} AS band0, {_band_sql(4)} AS band1
      FROM new_sh
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_doc_id, h.doc_id AS hist_doc_id
      FROM new_bands n JOIN hist_bands h
        ON n.band0 = h.band0 OR n.band1 = h.band1
    ),
    ver AS (
      SELECT c.new_doc_id, c.hist_doc_id
      FROM cand c
      JOIN (SELECT doc_id, list_distinct(hs) AS shd FROM new_sh) sn
        ON sn.doc_id = c.new_doc_id
      JOIN (SELECT doc_id, list_distinct(hs) AS shd FROM hist_sh) sh2
        ON sh2.doc_id = c.hist_doc_id
      WHERE {JACCARD_DEN} * len(list_intersect(sn.shd, sh2.shd))
            >= {JACCARD_NUM} * len(list_distinct(sn.shd || sh2.shd))
    )
    SELECT nb.doc_id AS new_doc_id,
           count(v.hist_doc_id) AS n_matches,
           min(v.hist_doc_id) AS first_match
    FROM newb nb LEFT JOIN ver v ON v.new_doc_id = nb.doc_id
    GROUP BY nb.doc_id
    """,
    tags=("dedup", "incremental", "minhash", "lsh", "broadcast"),
)
def incremental_dedup_newbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a NEW batch against the historical corpus — the production
    shape at 100 TB, where you never re-cluster the world: history's
    band-digest index is computed once at ingest (here derived inline; at
    scale a bucketed table), and the daily batch's digests — orders of
    magnitude smaller — are BROADCAST against it, so the history table
    is never shuffled at all. Candidates then verify with the same
    integer-exact Jaccard as dedup_pipeline_docs; every new doc reports
    n_matches (0 = novel) and its canonical historical match.
    Plan-asserted in tests/test_plans.py: BroadcastHashJoin on the
    candidate join, no history-side Exchange before it."""
    from ..operators.dedup import incremental_verified_matches, shingle_sets

    hist = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    newb = _new_batch_spark(spark, sf_dir)

    hist_sh = shingle_sets(hist).persist()
    new_sh = shingle_sets(newb).persist()
    # materialize the (tiny) verified pair set eagerly so both shingle
    # caches can be released NOW — otherwise each invocation leaks one
    # persisted copy per corpus into the session cache manager until GC
    ver = incremental_verified_matches(hist_sh, new_sh).localCheckpoint(
        eager=True
    )
    hist_sh.unpersist(blocking=False)
    new_sh.unpersist(blocking=False)

    return (
        newb.select(F.col("doc_id").alias("new_doc_id"))
        .join(ver, "new_doc_id", "left")
        .groupBy("new_doc_id")
        .agg(
            F.count("hist_doc_id").alias("n_matches"),
            F.min("hist_doc_id").alias("first_match"),
        )
    )


DEDUP_CHUNK = 20  # non-overlapping token windows for granular dedup


@register(
    "chunk_dedup_retention",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    n AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS tok,
             len(string_split_regex(trim(text), ' +')) AS n_tok
      FROM corpus
    ),
    ex AS (
      SELECT doc_id,
             unnest(range(CAST(floor((n_tok - 1) / {DEDUP_CHUNK}) AS BIGINT)
                          + 1)) AS chunk_idx,
             tok, n_tok
      FROM n
    ),
    h AS (
      SELECT doc_id, chunk_idx,
             md5(array_to_string(list_slice(tok,
                 chunk_idx * {DEDUP_CHUNK} + 1,
                 least((chunk_idx + 1) * {DEDUP_CHUNK}, n_tok)), ' ')) AS ch
      FROM ex
    ),
    r AS (
      SELECT doc_id, ch,
             row_number() OVER (PARTITION BY ch
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM h
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM r GROUP BY doc_id
    """,
    tags=("dedup", "chunk", "granular", "c4"),
)
def chunk_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk-level) dedup — the C4/RefinedWeb granularity:
    split every doc into non-overlapping DEDUP_CHUNK(=20)-token windows,
    keep only each chunk-hash's FIRST occurrence corpus-wide (ordered by
    (doc_id, chunk_idx) — deterministic, append-stable), and report per
    doc how many chunks survive. Full-copy docs retain zero chunks;
    partially-copied docs are trimmed, not dropped — the property that
    makes chunk dedup strictly stronger than doc-level exact dedup.

    Scale: tokenize+explode is narrow; the only corpus-wide shuffle is
    the row_number window keyed on the chunk HASH (uniform md5 — no
    skew); the per-doc rollup then shuffles one row per chunk. No
    Python, no quadratic step anywhere.
    """
    from pyspark.sql import Window

    corpus = _dup_corpus_spark(spark, sf_dir)
    tok = F.split(F.trim(F.col("text")), " +")
    n_tok = F.size(tok)
    n_chunks = F.floor((n_tok - 1) / DEDUP_CHUNK).cast("long") + 1
    ex = corpus.select(
        "doc_id",
        tok.alias("tok"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    h = ex.select(
        "doc_id",
        "chunk_idx",
        F.md5(
            F.array_join(
                F.slice(
                    F.col("tok"),
                    F.col("chunk_idx") * DEDUP_CHUNK + 1,
                    F.lit(DEDUP_CHUNK),
                ),
                " ",
            )
        ).alias("ch"),
    )
    rn = F.row_number().over(
        Window.partitionBy("ch").orderBy("doc_id", "chunk_idx")
    )
    r = h.select("doc_id", rn.alias("rn"))
    kept = F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("bigint")
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        kept.alias("n_kept"),
        (F.count(F.lit(1)) - kept).cast("bigint").alias("n_dropped"),
    )


TOP_MERGES = 20


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH n AS (
      SELECT string_split_regex(trim(text), ' +') AS tok,
             len(string_split_regex(trim(text), ' +')) AS n_tok
      FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, n_tok),
                    i -> tok[i] || ' ' || tok[i + 1])) AS pair
      FROM n WHERE n_tok >= 2
    )
    SELECT pair, count(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {TOP_MERGES}
    """,
    tags=("text", "tokenize", "bpe", "merge"),
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core BPE-training iteration, corpus-scale: count every
    adjacent token pair and rank the top merge candidates — one
    iteration of the merge loop a tokenizer trainer runs (here over
    word tokens; byte-level BPE is the same plan over byte-pair
    columns). Zip-with of two shifted slices builds the pair list
    without per-element element_at (the O(n²) re-inlining trap
    functions/text.shingles documents), explode + count is one
    map-side-combinable shuffle on the pair key, and the top-20 is
    TakeOrderedAndProject — at 100 TB this is exactly a word-count with
    a skewed-but-combinable key distribution, the friendliest shuffle
    shape there is.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = F.split(F.trim(F.col("text")), " +")
    ex = (
        docs.select(tok.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("t"), 1, F.size("t") - 1),
                    F.slice(F.col("t"), 2, F.size("t") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("pair")
        )
    )
    return (
        ex.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(TOP_MERGES)
    )


N_BPE_MERGES = 3


def _bpe_syms_sql(src: str) -> str:
    """DuckDB: delimiter-string word rep -> non-empty symbol list."""
    return (
        f"(SELECT list_filter(string_split(seq, '|'), x -> x <> '') AS syms,"
        f" cnt FROM {src})"
    )


def _bpe_round_sql(i: int) -> str:
    """One oracle BPE round: pair counts over w{i-1}, argmax merge
    m{i}, merged word table w{i}."""
    return f"""
    p{i} AS (
      SELECT s.syms[t.i] AS l, s.syms[t.i + 1] AS r,
             CAST(sum(s.cnt) AS BIGINT) AS n
      FROM {_bpe_syms_sql(f"w{i - 1}")} s,
           unnest(range(1, len(s.syms))) AS t(i)
      GROUP BY 1, 2
    ),
    m{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1),
    w{i} AS (
      -- coalesce to an unmatchable pattern when m{i} is empty
      -- (degenerate corpus), so the chain stays total like the engine
      SELECT replace(w.seq,
                     coalesce((SELECT '|' || l || '||' || r || '|'
                               FROM m{i}), '~'),
                     coalesce((SELECT '|' || l || r || '|'
                               FROM m{i}), '~')) AS seq, w.cnt
      FROM w{i - 1} w
    )"""


@register(
    "bpe_train_merges",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents)
      GROUP BY w
    ),
    w0 AS (
      SELECT '|' || list_aggregate(string_split(w, ''), 'string_agg', '||')
               || '|' AS seq, cnt
      FROM words
    ),{",".join(_bpe_round_sql(i) for i in range(1, N_BPE_MERGES + 1))}
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT {i} AS merge_rank, l AS left_sym, r AS right_sym,"
          f" n AS pair_count FROM m{i}"
          for i in range(1, N_BPE_MERGES + 1)
      )}
    ) ORDER BY merge_rank
    """,
    tags=("text", "tokenize", "bpe", "iterative", "training"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING, the actual iterative loop (completing the tokenizer
    family: bpe_token_estimate_docs estimates, bpe_merge_candidates
    counts one round, THIS learns the merge table): start from
    characters, repeatedly (1) count adjacent symbol pairs weighted by
    word frequency, (2) take the global argmax (count DESC, pair
    tiebreak), (3) apply the merge corpus-wide, N_BPE_MERGES rounds.
    Output: the learned merge table (rank, pair, count) — what a
    HF-style tokenizer trainer persists.

    Scale shape — the three design decisions that make this 100 TB-able:
    - training runs on the WORD-FREQUENCY table, not the corpus: one
      corpus-wide word count up front, then every round touches only
      |vocab| rows (this is how production BPE trainers work);
    - the merge application is ONE string replace per word against a
      both-sides delimiter encoding ('|a||b||c|', every symbol wrapped
      in its own pipes): pattern '|l||r|' -> '|lr|' replaces
      left-to-right non-overlapping, which IS greedy BPE order, and
      the anchors on BOTH symbols make any mid-symbol or prefix false
      match impossible for [a-z]+ words (the first rendering anchored
      only the left symbol — '(a,t)' would have consumed '(a,th)';
      caught in review, regression-tested). Identical semantics in
      DuckDB's replace, so the oracle replays the merge bit-for-bit;
    - the per-round argmax is a 1-row driver pull (the allowlisted
      collect shape, same as kmeans_step_shift's centroid step) and the
      pair count is a map-side-combinable shuffle on the pair key.
    Rounds are bounded (N_BPE_MERGES); each round's word table rides
    the previous round's replace expression — 3 levels of lineage, no
    checkpoint needed.
    """
    merges = _learn_bpe(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


def _learn_bpe(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """The shared learn loop: (rank, left, right, count) per merge.
    Used by bpe_train_merges (reports the table) and bpe_apply_merges
    (tokenizes with it)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = words.select(
        F.concat(
            F.lit("|"),
            F.array_join(F.split(F.col("w"), ""), "||"),
            F.lit("|"),
        ).alias("seq"),
        "cnt",
    ).persist()

    merges = []
    prev = None
    for rank in range(1, N_BPE_MERGES + 1):
        syms = F.filter(
            F.split(F.col("seq"), "[|]"), lambda x: x != ""
        )
        pairs = (
            w.select(syms.alias("s"), "cnt")
            .filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("s"), 1, F.size("s") - 1),
                        F.slice(F.col("s"), 2, F.size("s") - 1),
                        lambda a, b: F.struct(
                            a.alias("l"), b.alias("r")
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").cast("bigint").alias("n"))
        )
        # this collect is the action that fills the CURRENT w's cache,
        # so the PREVIOUS round's table is only released here — never
        # before its child is materialized (code-review r7b: the eager
        # unpersist forced a full corpus re-scan every round)
        rows = pairs.orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if prev is not None:
            prev.unpersist(blocking=False)
            prev = None
        if not rows:
            break  # degenerate corpus: no 2-symbol word remains
        top = rows[0]
        merges.append((rank, top["l"], top["r"], top["n"]))
        if rank < N_BPE_MERGES:
            w2 = w.select(
                F.replace(
                    F.col("seq"),
                    F.lit(f"|{top['l']}||{top['r']}|"),
                    F.lit(f"|{top['l']}{top['r']}|"),
                ).alias("seq"),
                "cnt",
            ).persist()
            prev, w = w, w2
    w.unpersist(blocking=False)
    if prev is not None:
        prev.unpersist(blocking=False)
    return merges


@register(
    "bpe_apply_merges",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents)
      GROUP BY w
    ),
    w0 AS (
      SELECT '|' || list_aggregate(string_split(w, ''), 'string_agg', '||')
               || '|' AS seq, cnt
      FROM words
    ),{",".join(_bpe_round_sql(i) for i in range(1, N_BPE_MERGES + 1))},
    runs AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents
    ),
    d0 AS (
      SELECT doc_id,
             '|' || list_aggregate(string_split(w, ''), 'string_agg', '||')
               || '|' AS seq,
             length(w) AS n_chars
      FROM runs
    ),
    d3 AS (
      SELECT doc_id, n_chars,
        replace(replace(replace(seq,
          coalesce((SELECT '|' || l || '||' || r || '|' FROM m1), '~'),
          coalesce((SELECT '|' || l || r || '|' FROM m1), '~')),
          coalesce((SELECT '|' || l || '||' || r || '|' FROM m2), '~'),
          coalesce((SELECT '|' || l || r || '|' FROM m2), '~')),
          coalesce((SELECT '|' || l || '||' || r || '|' FROM m3), '~'),
          coalesce((SELECT '|' || l || r || '|' FROM m3), '~')) AS seq
      FROM d0
    )
    SELECT doc_id,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(sum(len(list_filter(string_split(seq, '|'), x -> x <> '')))
             AS BIGINT) AS n_bpe_tokens
    FROM d3 GROUP BY doc_id
    """,
    tags=("text", "tokenize", "bpe", "inference"),
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE INFERENCE — the other half of bpe_train_merges: apply the
    learned merge table to every document's word runs and report real
    token counts (chars before, symbols after). Together the pair is
    the train→tokenize contract a data pipeline runs before sequence
    packing (sequence_pack_docs currently packs on estimates;
    this computes the real counts for the learned vocab).

    Scale: the merge table is learned on the word-frequency table
    (|vocab| rows, see _learn_bpe) and APPLIED as N chained string
    replaces in one narrow pass over the corpus — no joins, no shuffle
    beyond the final per-doc sum; the replace chain is exactly how a
    production tokenizer's merge list executes, just vectorized
    JVM-side instead of per-row Python. The oracle replays both the
    learning CTE chain and the nested replaces, so a drift in EITHER
    half breaks the hash.
    """
    merges = _learn_bpe(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    runs = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w"),
    )
    seq = F.concat(
        F.lit("|"), F.array_join(F.split(F.col("w"), ""), "||"), F.lit("|")
    )
    for _rank, left, right, _n in merges:
        seq = F.replace(
            seq, F.lit(f"|{left}||{right}|"), F.lit(f"|{left}{right}|")
        )
    n_syms = F.size(F.filter(F.split(seq, "[|]"), lambda x: x != ""))
    return (
        runs.select("doc_id", F.length("w").alias("n_chars"),
                    n_syms.alias("n_syms"))
        .groupBy("doc_id")
        .agg(
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
        )
    )


# --- round 8: the composed end-to-end training-set build ---------------------

_C2T_CORPUS_SQL = f"""
    SELECT doc_id, source, text FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_SHIFT} AS doc_id, source, text
    FROM documents WHERE doc_id % 10 = 0
"""


def _c2t_oracle() -> str:
    """Chained-CTE oracle replaying every stage of the composed
    pipeline (import-time only — builds one SQL string)."""
    from .textq import (
        QF_MAX_MEAN_WORD_LEN,
        QF_MAX_SYMBOL_RATIO,
        QF_MAX_TOKENS,
        QF_MIN_MEAN_WORD_LEN,
        QF_MIN_TOKENS,
        _ngram_sql,
        _TOK_SQL,
    )

    def stage_row(idx: int, name: str, src: str, tok: str = "n_tok") -> str:
        return (
            f"SELECT {idx} AS stage_idx, '{name}' AS stage, "
            f"CAST(count(*) AS BIGINT) AS n_units, "
            f"CAST(coalesce(sum({tok}), 0) AS BIGINT) AS n_tokens "
            f"FROM {src}"
        )

    return f"""
    WITH RECURSIVE corpus AS ({_C2T_CORPUS_SQL}),
    base AS (
      SELECT doc_id, source, text,
             CAST(len({_TOK_SQL}) AS BIGINT) AS n_tok,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
               / greatest(length(text), 1) AS sym_ratio,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / greatest(len({_TOK_SQL}), 1) AS mwl
      FROM corpus
    ),
    q AS (
      SELECT doc_id, source, text, n_tok FROM base
      WHERE n_tok >= {QF_MIN_TOKENS} AND n_tok <= {QF_MAX_TOKENS}
        AND sym_ratio <= {QF_MAX_SYMBOL_RATIO!r}
        AND mwl >= {QF_MIN_MEAN_WORD_LEN!r}
        AND mwl <= {QF_MAX_MEAN_WORD_LEN!r}
    ),
    sh_t AS (SELECT doc_id, {_SHINGLE_SQL} AS sh FROM q),
    sh_ne AS (SELECT doc_id, {_HS_SQL} AS hs FROM sh_t WHERE len(sh) > 0),
    sigs AS (
      SELECT doc_id, {_band_sql(0)} AS band0, {_band_sql(4)} AS band1
      FROM sh_ne
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sigs a JOIN sigs b
        ON (a.band0 = b.band0 OR a.band1 = b.band1)
       AND a.doc_id < b.doc_id
    ),
    shd AS (SELECT doc_id, list_distinct(hs) AS shd FROM sh_ne),
    ver AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.doc_a
      JOIN shd sb ON sb.doc_id = c.doc_b
      WHERE {JACCARD_DEN} * len(list_intersect(sa.shd, sb.shd))
            >= {JACCARD_NUM} * len(list_distinct(sa.shd || sb.shd))
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM ver
      UNION SELECT doc_b, doc_a FROM ver
      UNION SELECT doc_a, doc_a FROM ver
      UNION SELECT doc_b, doc_b FROM ver
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    labels AS (SELECT src AS node, min(dst) AS component FROM reach
               GROUP BY src),
    drops AS (SELECT node FROM labels WHERE node <> component),
    s2 AS (
      SELECT doc_id, source, text, n_tok FROM q
      WHERE doc_id NOT IN (SELECT node FROM drops)
    ),
    bench_t AS (
      SELECT {_TOK_SQL} AS tok FROM documents WHERE source = 'src0'
    ),
    bench AS (
      SELECT DISTINCT unnest(list_distinct({_ngram_sql(5)})) AS g
      FROM bench_t
    ),
    s2_t AS (
      SELECT doc_id, {_TOK_SQL} AS tok FROM s2 WHERE source <> 'src0'
    ),
    contam AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest(list_distinct({_ngram_sql(5)})) AS g
        FROM s2_t
      ) cg JOIN bench b USING (g)
    ),
    s3 AS (
      SELECT doc_id, source, n_tok FROM s2
      WHERE source <> 'src0'
        AND doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    s4 AS (
      SELECT doc_id, source, n_tok FROM s3
      WHERE strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
    ),
    packc AS (
      SELECT source, doc_id, n_tok,
             coalesce(sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM s4
    ),
    bins AS (
      SELECT source, cum_before // 256 AS bin, sum(n_tok) AS tokens
      FROM packc GROUP BY source, bin
    )
    SELECT * FROM (
      {stage_row(0, "raw", "base")}
      UNION ALL {stage_row(1, "quality", "q")}
      UNION ALL {stage_row(2, "dedup", "s2")}
      UNION ALL {stage_row(3, "decontaminated", "s3")}
      UNION ALL {stage_row(4, "train_split", "s4")}
      UNION ALL {stage_row(5, "packed", "bins", tok="tokens")}
    ) ORDER BY stage_idx
    """


@register(
    "corpus_to_training_set",
    oracle=_c2t_oracle(),
    tags=("pipeline", "dedup", "quality", "contamination", "split",
          "packing", "training", "composed"),
)
def corpus_to_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composed training-set build (VERDICT r7 task 2): every
    LLM-pipeline stage this package verifies in isolation, chained in
    the order a real pretraining run executes them, with per-stage
    row/token attrition as the output —

      raw corpus (documents + the standard 10% near-dup tile)
        → Gopher-style quality gate          (textq.quality_filter_docs)
        → MinHash→LSH→verify→components dedup, keep cluster minimum
                                             (operators/dedup.py)
        → benchmark decontamination: drop the src0 eval suite and any
          doc sharing a distinct word-5-gram with it
                                             (textq.contamination_check)
        → deterministic md5-nibble train split (~81%)
                                             (textq.hash_split_summary)
        → per-source greedy 256-token sequence packing
                                             (textq.sequence_pack_docs)

    Output: one row per stage (stage_idx, stage, n_units, n_tokens) —
    n_units is documents for stages 0-4 and packed sequences for stage
    5, so the frame is the attrition report a data curator reads.

    Proof value: each stage's operator contract is already driver-green
    in isolation; this entry proves the contracts COMPOSE — filtered
    docs feed the shingle stage, survivors feed decontamination,
    the split feeds packing — with a chained-CTE oracle replaying the
    whole run.

    Scale shape (100 TB): one narrow text pass computes quality
    metrics; the dedup stage shuffles only (band, digest) keys and
    candidate pairs (operators/dedup.py docstring); the benchmark gram
    set is broadcast (eval suites are MBs); split and packing are
    metadata-only once per-doc token counts exist — here that metadata
    (doc_id, source, n_tok, flags) is localCheckpoint-ed once and every
    attrition row aggregates the checkpoint, never re-reading text. In
    production each stage boundary would be a parquet write
    (sources/io.py); the composition and shuffle budget are identical.
    """
    from pyspark.sql.window import Window

    from ..functions.text import shingles, symbol_count, tokens
    from ..operators.components import connected_components
    from ..operators.dedup import (
        band_digests,
        candidate_pairs,
        shingle_sets,
        verify_jaccard,
    )
    from .textq import (
        QF_MAX_MEAN_WORD_LEN,
        QF_MAX_SYMBOL_RATIO,
        QF_MAX_TOKENS,
        QF_MIN_MEAN_WORD_LEN,
        QF_MIN_TOKENS,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "source", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + PLANT_SHIFT).alias("doc_id"), "source", "text"
        )
    )
    # spread the one expensive narrow text pass across all cores (the
    # small-SF parquet arrives as 1-2 splits; at cluster scale the
    # reader's own splits make this a no-op cost-wise)
    corpus = corpus.repartition(
        spark.sparkContext.defaultParallelism
    )

    n_tok = F.size(tokens(F.col("text")))
    # translate-based count — 9x cheaper than the regex it replaces,
    # same value by definition (functions.text.symbol_count)
    sym_ratio = symbol_count(F.col("text")).cast("double") / F.greatest(
        F.length("text"), F.lit(1)
    )
    mean_wl = F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    ).cast("double") / F.greatest(n_tok, F.lit(1))
    keep_q = (
        (n_tok >= QF_MIN_TOKENS)
        & (n_tok <= QF_MAX_TOKENS)
        & (sym_ratio <= QF_MAX_SYMBOL_RATIO)
        & (mean_wl >= QF_MIN_MEAN_WORD_LEN)
        & (mean_wl <= QF_MAX_MEAN_WORD_LEN)
    )
    base = corpus.select(
        "doc_id",
        "source",
        "text",
        n_tok.cast("long").alias("n_tok"),
        keep_q.alias("keep_q"),
    ).persist()
    q = base.filter("keep_q")

    # stage 2: dedup on the quality survivors (every survivor has
    # n_tok >= QF_MIN_TOKENS >= 3, so none is dropped by the
    # empty-shingle guard); non-canonical cluster members drop
    sh = shingle_sets(q.select("doc_id", "text")).persist()
    ver = verify_jaccard(candidate_pairs(band_digests(sh)), sh)
    labels = connected_components(
        ver, src="doc_a", dst="doc_b", distinct_pairs=True
    )
    sh.unpersist(blocking=False)
    drops = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    s2 = q.join(drops, "doc_id", "left_anti")

    # stage 3: decontamination — the benchmark is the ORIGINAL src0
    # suite; drop it and every surviving doc sharing a 5-gram with it
    gram5 = lambda c: F.explode(  # noqa: E731
        F.array_distinct(shingles(tokens(c), 5))
    )
    bench = (
        docs.filter(F.col("source") == "src0")
        .select(gram5(F.col("text")).alias("g"))
        .distinct()
    )
    cand_side = s2.filter(F.col("source") != "src0")
    contam = (
        cand_side.select("doc_id", gram5(F.col("text")).alias("g"))
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # all remaining stages are metadata-only: checkpoint the narrow
    # per-doc frame once and release the text-bearing cache
    meta = base.select(
        "doc_id", "source", "n_tok", "keep_q"
    ).localCheckpoint(eager=True)
    base.unpersist(blocking=False)

    # Fused attrition accounting (r18, guide §2.3 "aggregate before you
    # shuffle" / §1.2): stages 0-4 are cumulative predicates over the
    # SAME checkpointed metadata frame, so one pass with per-stage
    # membership flags + ONE conditional aggregation replaces five
    # separate agg subtrees (each with its own partial/final exchange
    # and its own replay of the drops/contam joins — the anti-joins ran
    # 4x/3x across the old stage frames, now once). Anti-join ≡ left
    # join + IS NULL here because drops (one row per clustered node)
    # and contam (distinct) are unique by doc_id. Integer counts/sums —
    # values identical by construction; the oracle is unchanged.
    h = F.expr(
        "locate(substr(md5(CAST(doc_id AS STRING)), 1, 1),"
        " '0123456789abcdef') - 1"
    )
    in_s2 = F.col("keep_q") & F.col("_dropped").isNull()
    in_s3 = in_s2 & (F.col("source") != "src0") & F.col("_contam").isNull()
    flg = (
        meta.join(
            drops.withColumn("_dropped", F.lit(True)), "doc_id", "left"
        )
        .join(contam.withColumn("_contam", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tok",
            F.col("keep_q").alias("in_s1"),
            in_s2.alias("in_s2"),
            in_s3.alias("in_s3"),
            (in_s3 & (h < 13)).alias("in_s4"),
        )
    )

    def cnt(flag):
        return F.coalesce(
            F.sum(F.when(F.col(flag), 1).otherwise(0)), F.lit(0)
        ).cast("long")

    def tok(flag):
        return F.coalesce(
            F.sum(F.when(F.col(flag), F.col("n_tok"))), F.lit(0)
        ).cast("long")

    summary = flg.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("t0"),
        cnt("in_s1").alias("n1"),
        tok("in_s1").alias("t1"),
        cnt("in_s2").alias("n2"),
        tok("in_s2").alias("t2"),
        cnt("in_s3").alias("n3"),
        tok("in_s3").alias("t3"),
        cnt("in_s4").alias("n4"),
        tok("in_s4").alias("t4"),
    )
    names = ["raw", "quality", "dedup", "decontaminated", "train_split"]
    rows04 = summary.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("stage_idx"),
                        F.lit(names[i]).alias("stage"),
                        F.col(f"n{i}").alias("n_units"),
                        F.col(f"t{i}").alias("n_tokens"),
                    )
                    for i in range(5)
                ]
            )
        ).alias("s")
    ).select("s.*")

    m_s4 = flg.filter("in_s4")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bins = (
        m_s4.withColumn(
            "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
        )
        .withColumn("bin", F.expr("cum_before div 256"))
        .groupBy("source", "bin")
        .agg(F.sum("n_tok").alias("tokens"))
    )
    packed = bins.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.coalesce(F.sum("tokens"), F.lit(0)).alias("n_tokens"),
    ).select(
        F.lit(5).alias("stage_idx"),
        F.lit("packed").alias("stage"),
        F.col("n_units").cast("long").alias("n_units"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    return rows04.unionByName(packed).orderBy("stage_idx")


# --- Quality-aware survivor selection (round 10, VERDICT r9 task 6) ---------

# Survivor-policy corpus: every 10th document appears TWICE — the LOW
# doc_id carries a space-bloated degraded copy, the HIGH (+1M) doc_id
# the clean original. Tokens are identical (split on ' +'), so the
# minhash pipeline verifies the pair at Jaccard 1.0 and clusters it —
# but the min-doc_id canonical would keep the DEGRADED copy. That makes
# the quality policy observable: a correct quality-aware survivor is
# the shifted member, provably different from the legacy min-id keeper.
# Shift = 10^12, NOT the legacy +1M (code-review r10): scale_up tiles
# doc_ids to ~5M at sf100, where a +1M clean-copy id collides with a
# real doc_id and every doc_id-keyed stage fans out. 10^12 clears any
# plausible corpus (100 TB ≈ 2.5e10 docs at ~4 KB/doc). Since r11 the
# shift is textq.PLANT_SHIFT, shared by EVERY planted-dup corpus in the
# repo (textq._dup_corpus, the variant/new-batch/c2t corpora below) so
# a headroom fix can't miss a copy.
_SURV_SHIFT = PLANT_SHIFT
_SURV_CORPUS_SQL = f"""
    SELECT doc_id, '  ' || replace(text, ' ', '  ') || ' ' AS text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + {_SURV_SHIFT} AS doc_id, text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
"""

# 52-char alpha table for translate()-based letter counting — the r9
# symbol_count pattern (functions/text.py): a per-char table lookup
# instead of a regex pass, identical semantics in Spark and DuckDB.
_ALPHA_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)


def _surv_corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tenth = docs.filter(F.col("doc_id") % 10 == 0)
    degraded = tenth.select(
        "doc_id",
        F.concat(
            F.lit("  "), F.expr("replace(text, ' ', '  ')"), F.lit(" ")
        ).alias("text"),
    )
    clean = tenth.select((F.col("doc_id") + _SURV_SHIFT).alias("doc_id"), "text")
    rest = docs.filter(F.col("doc_id") % 10 != 0)
    return degraded.unionByName(clean).unionByName(rest)


def _quality_score(col):
    """Letter density: alpha chars / total chars, round(4). Space-bloat
    dilutes it, so the clean member of each planted pair scores higher;
    any monotone quality metric slots in here unchanged."""
    alpha = F.length(col) - F.length(F.translate(col, _ALPHA_CHARS, ""))
    return F.round(
        alpha.cast("double") / F.greatest(F.length(col), F.lit(1)), 4
    )


@register(
    "dedup_survivors_by_quality",
    oracle=f"""
    WITH RECURSIVE corpus AS ({_SURV_CORPUS_SQL}),
    sh_t AS (SELECT doc_id, {_SHINGLE_SQL} AS sh FROM corpus),
    sh_ne AS (SELECT doc_id, {_HS_SQL} AS hs FROM sh_t WHERE len(sh) > 0),
    sigs AS (
      SELECT doc_id, {_band_sql(0)} AS band0, {_band_sql(4)} AS band1
      FROM sh_ne
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sigs a JOIN sigs b
        ON (a.band0 = b.band0 OR a.band1 = b.band1)
       AND a.doc_id < b.doc_id
    ),
    shd AS (SELECT doc_id, list_distinct(hs) AS shd FROM sh_ne),
    ver AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.doc_a
      JOIN shd sb ON sb.doc_id = c.doc_b
      WHERE {JACCARD_DEN} * len(list_intersect(sa.shd, sb.shd))
            >= {JACCARD_NUM} * len(list_distinct(sa.shd || sb.shd))
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM ver
      UNION SELECT doc_b, doc_a FROM ver
      UNION SELECT doc_a, doc_a FROM ver
      UNION SELECT doc_b, doc_b FROM ver
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    labels AS (SELECT src AS node, min(dst) AS component FROM reach
               GROUP BY src),
    qual AS (
      SELECT doc_id,
             round(CAST(length(text)
                        - length(translate(text, '{_ALPHA_CHARS}', ''))
                     AS DOUBLE) / greatest(length(text), 1), 4) AS quality
      FROM corpus
    ),
    memb AS (
      SELECT l.component AS cluster_id, l.node AS doc_id, q.quality,
             row_number() OVER (PARTITION BY l.component
                                ORDER BY q.quality DESC, l.node) AS rn,
             count(*) OVER (PARTITION BY l.component) AS n_members
      FROM labels l JOIN qual q ON q.doc_id = l.node
    )
    SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
           doc_id AS survivor_doc_id, quality AS survivor_quality
    FROM memb WHERE rn = 1 AND n_members > 1
    """,
    tags=("dedup", "components", "quality", "survivor", "minhash"),
)
def dedup_survivors_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection (VERDICT r9 task 6): near-dup
    clusters keep their HIGHEST-QUALITY member, not the min doc_id —
    what a real pretraining pipeline does when the duplicates differ in
    formatting fidelity (reference dedups by first-seen; the Gopher-
    style upgrade keeps the cleanest copy).

    Shape: minhash → LSH candidates → exact-Jaccard verify → connected
    components (member-level labels), then ONE extra shuffle: join the
    per-doc quality score on doc_id and take the top row per cluster by
    (quality DESC, doc_id). The quality join is node-sized — at 100 TB
    it carries only clustered doc_ids + one double, never text; the
    window partitions by cluster_id, whose groups are cluster-sized
    (tiny), so no skew concern. The planted corpus (degraded copy on
    the LOW id) proves the policy differs from min-id canonicals:
    every planted survivor is the +1M clean member.
    """
    from pyspark.sql.window import Window

    from ..operators.components import connected_components
    from ..operators.dedup import (
        band_digests,
        candidate_pairs,
        shingle_sets,
        verify_jaccard,
    )

    corpus = _surv_corpus_spark(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    sh = shingle_sets(corpus).persist()
    ver = verify_jaccard(candidate_pairs(band_digests(sh)), sh)
    labels = connected_components(
        ver, src="doc_a", dst="doc_b", distinct_pairs=True
    )
    sh.unpersist(blocking=False)
    qual = corpus.select("doc_id", _quality_score(F.col("text")).alias("quality"))
    memb = labels.join(qual, labels["node"] == qual["doc_id"]).select(
        F.col("component").alias("cluster_id"),
        F.col("doc_id"),
        F.col("quality"),
    )
    w = Window.partitionBy("cluster_id")
    wr = w.orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        memb.withColumn("rn", F.row_number().over(wr))
        .withColumn("n_members", F.count(F.lit(1)).over(w))
        .filter((F.col("rn") == 1) & (F.col("n_members") > 1))
        .select(
            "cluster_id",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("doc_id").alias("survivor_doc_id"),
            F.col("quality").alias("survivor_quality"),
        )
    )


# --- round 11: temperature-based mixture resampling --------------------------
#
# The data-mixing stage between mixture weighting and training-set
# assembly: given per-source token masses, sample each source at a rate
# that moves the mixture toward temperature-flattened shares
# (share_s ∝ tok_s^τ, τ = 1/2 — the standard pretraining convention for
# up-weighting small high-quality sources without drowning the big ones)
# under a global kept-token budget of half the corpus.
#
# EVERYTHING after the one sqrt is INTEGER math, so both engines derive
# bit-identical rates with no float-sum order risk (the money-sum
# pattern): w_e4 = round(sqrt(tok_s)·10⁴) is an integer weight (sqrt is
# IEEE correctly-rounded in both engines; the round-4 boundary has the
# standing measure-zero argument), the keep rate is the integer
# k_s = min(256, (B·w_e4_s·256) // (Σw_e4 · tok_s)) in 1/256 units, and
# a doc is kept iff its 2-nibble md5 value v ∈ [0,255] < k_s — the
# hash_split_summary determinism pattern widened to 8 bits. The rate
# numerator B·w_e4·256 crosses int64 around sf30–100 corpora, and the
# two engines fail DIFFERENTLY there: DuckDB BIGINT·BIGINT raises
# out-of-range (fail-loud) while non-ANSI Spark silently wraps to a
# wrong k256 — so both sides carry explicit headroom NOW (ADVICE r11:
# latent bounds do get hit — the PLANT_SHIFT history): Spark computes
# the product/quotient in DECIMAL(38,0) (`div` on decimals returns
# BIGINT) and the oracle in HUGEINT. k256 itself is ≤ 256, so only the
# intermediates need width; tests/test_operators.py pins the two
# widened expressions against Python bigint math at an overflow-scale
# operating point.

MIX_RATE_DEN = 256   # keep-rate resolution (2 md5 nibbles)
MIX_BUDGET_DEN = 2   # kept-token budget = total_tokens // 2

_MIX_V_SQL = (
    "((strpos('0123456789abcdef',"
    " substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef',"
    " substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)


@register(
    "mixture_temperature_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len({_TOK_SQL}) AS BIGINT) AS n_tokens,
             {_MIX_V_SQL} AS v
      FROM documents
    ),
    per_src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tok,
             CAST(round(sqrt(CAST(sum(n_tokens) AS DOUBLE)) * 10000)
                  AS BIGINT) AS w_e4
      FROM d GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(w_e4) AS BIGINT) AS sw,
             CAST(sum(n_tok) AS BIGINT) // {MIX_BUDGET_DEN} AS b
      FROM per_src
    ),
    rates AS (
      SELECT p.source, p.n_docs, p.n_tok, p.w_e4,
             least({MIX_RATE_DEN},
                   CAST((CAST(t.b AS HUGEINT) * p.w_e4 * {MIX_RATE_DEN})
                        // (CAST(t.sw AS HUGEINT) * p.n_tok) AS BIGINT))
               AS k256
      FROM per_src p, tot t
    ),
    kept AS (
      SELECT d.source,
             CAST(count(*) AS BIGINT) AS kept_docs,
             CAST(coalesce(sum(d.n_tokens), 0) AS BIGINT) AS kept_tokens
      FROM d JOIN rates r ON d.source = r.source AND d.v < r.k256
      GROUP BY d.source
    )
    SELECT r.source, r.n_docs, r.n_tok, r.w_e4,
           CAST(r.k256 AS BIGINT) AS k256,
           coalesce(k.kept_docs, 0) AS kept_docs,
           coalesce(k.kept_tokens, 0) AS kept_tokens,
           (10000 * coalesce(k.kept_tokens, 0)) // r.n_tok
             AS kept_frac_e4
    FROM rates r LEFT JOIN kept k USING (source)
    ORDER BY r.source
    """,
    tags=("text", "mixture", "sampling", "temperature", "training"),
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture resampling (see module comment):
    per-source keep-rates k/256 from integer math over token masses,
    deterministic 2-nibble md5 membership, per-source before/after
    accounting.

    Scale shape (100 TB): pass 1 is a narrow scan → per-source agg
    (#sources rows); the rate table is #sources rows and BROADCAST back
    into pass 2's keep filter, so the corpus never shuffles — both
    passes are scan-side, and the kept set would be written out
    partitioned by source. The two corpus scans share the page cache;
    persisting per-doc (doc_id, source, n_tokens, v) metadata collapses
    them to one text pass at deployment.
    """
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        (
            (
                F.expr(
                    "locate(substr(md5(CAST(doc_id AS STRING)), 1, 1),"
                    " '0123456789abcdef') - 1"
                )
            )
            * 16
            + F.expr(
                "locate(substr(md5(CAST(doc_id AS STRING)), 2, 1),"
                " '0123456789abcdef') - 1"
            )
        ).alias("v"),
    )
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tok"),
        F.round(F.sqrt(F.sum("n_tokens").cast("double")) * 10000)
        .cast("long")
        .alias("w_e4"),
    )
    tot = per_src.agg(
        F.sum("w_e4").cast("long").alias("sw"),
        F.expr(f"CAST(sum(n_tok) AS BIGINT) div {MIX_BUDGET_DEN}").alias("b"),
    )
    rates = per_src.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tok",
        "w_e4",
        F.least(
            F.lit(MIX_RATE_DEN),
            # DECIMAL(38,0) intermediates: b*w_e4*256 wraps int64 at
            # ~sf30-100 token masses and non-ANSI Spark wraps SILENTLY
            # (the oracle's HUGEINT twin fails loud) — decimal `div`
            # returns BIGINT, so only the product carries the width
            F.expr(
                f"(CAST(b AS DECIMAL(38,0)) * w_e4 * {MIX_RATE_DEN})"
                f" div (CAST(sw AS DECIMAL(38,0)) * n_tok)"
            ),
        ).alias("k256"),
    )
    kept = (
        d.join(F.broadcast(rates.select("source", "k256")), "source")
        .filter(F.col("v") < F.col("k256"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )
    return (
        # kept is #sources rows (an agg output Catalyst can't size) —
        # broadcast it so the tiny final join never sort-merges
        rates.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tok",
            "w_e4",
            F.col("k256").cast("long").alias("k256"),
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
            F.expr("(10000 * coalesce(kept_tokens, 0)) div n_tok")
            .cast("long")
            .alias("kept_frac_e4"),
        )
        .orderBy("source")
    )
