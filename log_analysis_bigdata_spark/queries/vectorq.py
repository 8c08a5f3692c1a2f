"""Vector similarity over ``embeddings`` (array<float>, dim 64) — the
similarity-search surface of the training-data pipeline: brute-force
cosine top-k baseline plus LSH-bucketed candidate generation (the scale
path) built from sign-bit sketches.

Determinism: all arithmetic is promoted to double and folded left-to-right
on both engines (Spark ``aggregate`` fold vs DuckDB ``list_aggregate``),
then rounded to 4 decimals; orderings always carry the unique ``vec_id``
tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..session import bounded_broadcast
from . import register

QUERY_VEC_ID = 0


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, sequential fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


_DOT_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)
_NORM_SQL = (
    "sqrt(list_aggregate(list_transform({a}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)


@register(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           round({_NORM_SQL.format(a="embedding")}, 4) AS l2_norm
    FROM embeddings
    """,
    tags=("vector", "norm"),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.round(norm(F.col("embedding")), 4).alias("l2_norm"),
    )


@register(
    "embedding_dimension_stats",
    oracle="""
    WITH d AS (
      SELECT CAST(t.i - 1 AS INTEGER) AS dim,
             CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000)
               AS BIGINT) AS x_micro
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ), s AS (
      SELECT dim, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x_micro AS HUGEINT)) AS sx,
             sum(CAST(x_micro AS HUGEINT) * x_micro) AS sxx,
             min(x_micro) AS min_micro, max(x_micro) AS max_micro
      FROM d GROUP BY dim
    )
    SELECT dim, n,
           -- + 0.0 folds IEEE -0.0 to 0.0 (a zero-mean dim that rounds
           -- to -0.0 reprs differently across engines)
           round(CAST(sx AS DOUBLE) / n / 1000000.0, 4) + 0.0 AS mean,
           round(sqrt(greatest(
             CAST(sxx AS DOUBLE) / n
               - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n),
             0.0)) / 1000000.0, 4) AS std,
           CAST(min_micro AS BIGINT) AS min_micro,
           CAST(max_micro AS BIGINT) AS max_micro,
           CAST(CASE WHEN max_micro = min_micro THEN 1 ELSE 0 END
             AS INTEGER) AS is_dead
    FROM s ORDER BY dim
    """,
    tags=("vector", "profiling", "quality", "training"),
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding QC — the health check an embedding
    pipeline runs before indexing 100 TB of vectors: mean/std/min/max
    per coordinate plus a dead-dimension flag (a dim whose value never
    varies carries zero information and usually means a truncated or
    mis-sliced model export; a mean far from 0 means the corpus needs
    centering before inner-product search).

    Determinism: every value is quantized to integer micro-units FIRST;
    sums and sums-of-squares are then order-independent integer adds in
    DECIMAL(38,0)/HUGEINT (x²·1e12 per term — a BIGINT sum would
    overflow near ~9·10^6 rows per dim; decimal holds to 10^26 terms),
    and both engines derive mean/std from the identical integers.

    Scale: posexplode is a narrow map (rows × dim), the per-dim agg is
    ONE map-side-combinable hash shuffle onto #dims keys — each
    partition pre-aggregates to at most #dims rows, so the shuffle
    volume is executors × dims regardless of corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim",
        F.round(F.col("x").cast("double") * 1_000_000)
        .cast("long")
        .alias("x_micro"),
    )
    s = d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x_micro").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            F.col("x_micro").cast("decimal(38,0)") * F.col("x_micro")
        ).alias("sxx"),
        F.min("x_micro").alias("min_micro"),
        F.max("x_micro").alias("max_micro"),
    )
    mean_raw = F.col("sx").cast("double") / F.col("n")
    var_raw = F.col("sxx").cast("double") / F.col("n") - mean_raw * mean_raw
    return s.select(
        "dim",
        "n",
        # + 0.0 folds IEEE -0.0 to 0.0 (same normalization as pandasq)
        (F.round(mean_raw / 1_000_000.0, 4) + F.lit(0.0)).alias("mean"),
        F.round(
            F.sqrt(F.greatest(var_raw, F.lit(0.0))) / 1_000_000.0, 4
        ).alias("std"),
        "min_micro",
        "max_micro",
        F.when(F.col("max_micro") == F.col("min_micro"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_dead"),
    ).orderBy("dim")


COV_TOPK = 20
# rows per integer matmul inside embedding_covariance_topk — fixed here
# so raising spark.sql.execution.arrow.maxRecordsPerBatch cannot widen
# the exact-int64 window (ADVICE r14); 4096 rows × (2e7 micro)² ≈
# 1.6e18 < 2⁶² even for |x| ≤ 20 unnormalized embeddings
COV_ROWS_PER_MATMUL = 4096


@register(
    "embedding_covariance_topk",
    oracle=f"""
    WITH d AS (
      SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS i,
             CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000)
               AS BIGINT) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ), s AS (
      SELECT i, sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(x AS HUGEINT) * x) AS sxx
      FROM d GROUP BY i
    ), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
    p AS (
      SELECT a.i AS i, b.i AS j, sum(CAST(a.x AS HUGEINT) * b.x) AS sxy
      FROM d a JOIN d b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY a.i, b.i
    ), c AS (
      SELECT p.i, p.j,
             (CAST(p.sxy AS DOUBLE) / nn.n
              - (CAST(si.sx AS DOUBLE) / nn.n)
                * (CAST(sj.sx AS DOUBLE) / nn.n)) / 1000000000000.0
               AS cov_raw,
             (CAST(si.sxx AS DOUBLE) / nn.n
              - (CAST(si.sx AS DOUBLE) / nn.n)
                * (CAST(si.sx AS DOUBLE) / nn.n)) / 1000000000000.0
               AS var_i,
             (CAST(sj.sxx AS DOUBLE) / nn.n
              - (CAST(sj.sx AS DOUBLE) / nn.n)
                * (CAST(sj.sx AS DOUBLE) / nn.n)) / 1000000000000.0
               AS var_j
      FROM p JOIN s si ON p.i = si.i JOIN s sj ON p.j = sj.i CROSS JOIN nn
    )
    SELECT i, j, round(cov_raw * 1000000, 4) AS cov_micro,
           round(CASE WHEN var_i * var_j > 0
                      THEN cov_raw / sqrt(var_i * var_j) END, 4) AS corr
    FROM c
    ORDER BY abs(cov_raw) DESC, i, j
    LIMIT {COV_TOPK}
    """,
    tags=("vector", "arrow", "profiling", "quality", "training"),
)
def embedding_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most-covariant embedding dimension pairs — the redundancy
    QC behind whitening/PCA decisions: strongly co-varying coordinates
    mean the effective dimensionality is lower than d (wasted index
    bytes, distorted inner products), and the offending pairs are the
    first thing to inspect before choosing a decorrelation transform.

    This is the honest 100 TB covariance shape: ONE ``mapInPandas``
    pass computes integer outer-product partials with d×d numpy
    matmuls (values micro-quantized first, so each partial is exact
    int64), and every chunk emits the same fixed payload: d(d+1)/2
    upper-triangle sums + d per-dim sums + 1 row count. Overflow is
    guarded EXACTLY, not by assumption (ADVICE r14): each Arrow batch
    is sliced into ≤ ROWS_PER_MATMUL-row chunks regardless of
    ``spark.sql.execution.arrow.maxRecordsPerBatch``, and a chunk
    whose max |x_micro| = m could exceed 2⁶² (rows·m² bound) is
    further shortened to ⌊2⁶²/m²⌋ rows — so unnormalized embeddings
    can never wrap silently; a single value with m² ≥ 2⁶² raises.
    The per-chunk rows are collapsed by the groupBy's map-side
    partial aggregation before the shuffle, so wire volume stays
    partitions × O(d²) — independent of corpus size — and the final
    Σ is an order-independent decimal add. Means are NEVER subtracted
    per row (the classic one-pass trick: cov = E[xy] − E[x]E[y] from
    the same integer sums), so no second corpus pass.

    Determinism: numpy's half-away rounding (floor(|y|+0.5)·sign(y))
    reproduces the Spark/DuckDB round() exactly on the identical
    float→double product; both engines then derive cov/corr from the
    same integers with the same IEEE op sequence, so the
    ORDER BY |cov| ranking cannot diverge (i, j tiebreak regardless).
    The oracle replays the pair sums relationally (self-join on
    vec_id, i<j) — quadratic in d but exact, fine at gate scale.
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    # captured as a local so the executor-side closure carries the value
    # by construction (not a worker re-import of this module's global)
    rows_per_matmul = COV_ROWS_PER_MATMUL

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Y = X * 1_000_000.0
            # pre-CAST guard (ADVICE r15): a float micro value at or
            # beyond 2⁶² would wrap in the int64 cast below (undefined,
            # typically INT64_MIN whose np.abs is negative) BEFORE the
            # per-chunk m·m guard could see it — raise on the float64
            # magnitude first so 'can never wrap silently' holds with
            # no bypass
            fmax = float(np.abs(Y).max(initial=0.0))
            if fmax >= float(1 << 62):
                raise ValueError(
                    f"embedding micro value |{fmax:.3g}| overflows an "
                    "int64 product on its own — quantization scale "
                    "must be reduced for this corpus"
                )
            Xq = (np.floor(np.abs(Y) + 0.5) * np.sign(Y)).astype(np.int64)
            dd = Xq.shape[1]
            iu, ju = np.triu_indices(dd)
            start, nrows = 0, Xq.shape[0]
            while start < nrows:
                C = Xq[start : start + rows_per_matmul]
                m = int(np.abs(C).max(initial=0))
                if m:
                    # rows·m² < 2⁶² keeps every int64 partial exact
                    safe = (1 << 62) // (m * m)
                    if safe == 0:
                        raise ValueError(
                            f"embedding micro value |{m}| overflows an "
                            "int64 product on its own — quantization "
                            "scale must be reduced for this corpus"
                        )
                    if safe < len(C):
                        C = C[:safe]
                start += len(C)
                P = C.T @ C
                yield pd.DataFrame(
                    {
                        "i": np.concatenate(
                            [iu, np.arange(dd), [-1]]
                        ).astype(np.int32),
                        "j": np.concatenate(
                            [ju, np.full(dd, -1), [-1]]
                        ).astype(np.int32),
                        "v": np.concatenate(
                            [P[iu, ju], C.sum(axis=0), [C.shape[0]]]
                        ),
                    }
                )

    parts = emb.mapInPandas(partials, "i int, j int, v long")
    s = parts.groupBy("i", "j").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s")
    )
    n = s.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").cast("double").alias("n")
    )
    sums = s.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        F.col("i").alias("d"), F.col("s").cast("double").alias("sx")
    )
    diag = s.filter((F.col("i") == F.col("j")) & (F.col("i") >= 0)).select(
        F.col("i").alias("d"), F.col("s").cast("double").alias("sxx")
    )
    stats = sums.join(diag, "d")
    pairs = s.filter((F.col("i") >= 0) & (F.col("j") > F.col("i"))).select(
        "i", "j", F.col("s").cast("double").alias("sxy")
    )
    a = stats.select(
        F.col("d").alias("i"),
        F.col("sx").alias("sx_i"),
        F.col("sxx").alias("sxx_i"),
    )
    b = stats.select(
        F.col("d").alias("j"),
        F.col("sx").alias("sx_j"),
        F.col("sxx").alias("sxx_j"),
    )
    jn = (
        pairs.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .crossJoin(F.broadcast(n))
    )
    mean = lambda c: F.col(c) / F.col("n")  # noqa: E731
    cov_raw = (
        F.col("sxy") / F.col("n") - mean("sx_i") * mean("sx_j")
    ) / 1e12
    var_i = (
        F.col("sxx_i") / F.col("n") - mean("sx_i") * mean("sx_i")
    ) / 1e12
    var_j = (
        F.col("sxx_j") / F.col("n") - mean("sx_j") * mean("sx_j")
    ) / 1e12
    return (
        jn.select(
            "i",
            "j",
            cov_raw.alias("cov_raw"),
            F.round(cov_raw * 1_000_000, 4).alias("cov_micro"),
            F.round(
                F.when(
                    var_i * var_j > 0, cov_raw / F.sqrt(var_i * var_j)
                ),
                4,
            ).alias("corr"),
        )
        .orderBy(F.abs(F.col("cov_raw")).desc(), "i", "j")
        .limit(COV_TOPK)
        .drop("cov_raw")
    )


@register(
    "cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    sims AS (
      SELECT e.vec_id, e.label,
             round({_DOT_SQL.format(a="e.embedding", b="q.qv")}
                   / ({_NORM_SQL.format(a="e.embedding")}
                      * {_NORM_SQL.format(a="q.qv")}), 4) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cosine
    FROM sims
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    tags=("vector", "ann", "cosine", "topk"),
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against one query vector.

    Plan shape at scale: the query side is a 1-row broadcast; similarity
    is a narrow map stage fused into the scan; top-k is
    TakeOrderedAndProject — no shuffle of the corpus. For batched query
    sets, broadcast the whole query block and let AQE pick the join.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    e = emb.filter(F.col("vec_id") != QUERY_VEC_ID)
    sim = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (norm(F.col("embedding")) * norm(F.col("qv"))),
        4,
    )
    return (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", "label", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


@register(
    "simhash_buckets",
    oracle="""
    SELECT (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
            + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS bucket,
           count(*) AS n,
           min(vec_id) AS min_vec_id
    FROM embeddings
    GROUP BY 1
    """,
    tags=("vector", "lsh", "simhash"),
)
def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit (hyperplane-LSH) bucketing on the first 4 dimensions —
    the candidate-generation stage of approximate NN: at 100 TB the
    corpus is grouped/bucket-joined on this key so each query only scans
    its bucket, never the full corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    bucket = sum(
        F.when(e.getItem(i) >= 0, 1 << (3 - i)).otherwise(0) for i in range(4)
    )
    return emb.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("vec_id").alias("min_vec_id"),
    )


@register(
    "ann_bucketed_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             (CASE WHEN embedding[1] >= 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS qv, bucket AS qbucket
          FROM b WHERE vec_id = {QUERY_VEC_ID}),
    sims AS (
      SELECT b.vec_id, b.label,
             round({_DOT_SQL.format(a="b.embedding", b="q.qv")}
                   / ({_NORM_SQL.format(a="b.embedding")}
                      * {_NORM_SQL.format(a="q.qv")}), 4) AS cosine
      FROM b JOIN q ON b.bucket = q.qbucket
      WHERE b.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cosine
    FROM sims
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    tags=("vector", "ann", "lsh", "topk"),
)
def ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: restrict the scan to the query's LSH bucket
    (2 sign bits here → ~1/4 of the corpus), then exact cosine top-k
    within the bucket. The IVF/LSH scale path vs cosine_topk's baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    bucket = (
        F.when(e.getItem(0) >= 0, 2).otherwise(0)
        + F.when(e.getItem(1) >= 0, 1).otherwise(0)
    ).alias("bucket")
    b = emb.select("vec_id", "label", "embedding", bucket)
    q = b.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    sim = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (norm(F.col("embedding")) * norm(F.col("qv"))),
        4,
    )
    return (
        b.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select("vec_id", "label", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


NEAR_DUP_THRESHOLD = 0.35
# COUNT-DERIVED output bounding for the diffuse near-dup tier (VERDICT
# r10 task 3): at a FIXED cosine threshold the number of GENUINE pairs
# on a diffuse corpus grows O(n²·p) — the r10 sf1→sf10 probe measured
# found-pairs 6.7k → 147k for 10× vectors (runtime stayed sub-quadratic;
# the OUTPUT didn't). For unit vectors in d dims, P(cos ≥ t) ≈
# exp(-d·t²/2)·…, so holding expected pairs ~LINEAR in n needs
# p(t) ∝ 1/n, i.e. t² growing by 2·ln2/d per corpus DOUBLING. The
# ladder below starts at NEAR_DUP_THRESHOLD for n ≤ NEAR_DUP_BASE_N
# (all test SFs and the sf1 probe corpus — their outputs are unchanged)
# and tightens per doubling; Spark derives the threshold from count()
# in Python, the oracle replays the identical integer-breakpoint CASE.
# The trade is explicit: on corpora past BASE_N the query reports the
# TIGHTEST near-dups at ~linear output volume rather than every pair
# above an absolute score — for dedup survivorship (keep one of each
# near-identical group) the tight pairs are the actionable ones, and
# an absolute-threshold sweep at scale belongs in a batch pipeline
# with an explicit pair budget, not a fixed-size answer frame.
NEAR_DUP_BASE_N = 20_000
NEAR_DUP_DIM = 64
NEAR_DUP_MAX_DOUBLINGS = 16  # ladder cap: ~1.3B vectors; raise to extend
_NEAR_DUP_LADDER: tuple[float, ...] = tuple(
    round(
        (NEAR_DUP_THRESHOLD**2 + k * 2 * 0.6931471805599453 / NEAR_DUP_DIM)
        ** 0.5,
        4,
    )
    for k in range(NEAR_DUP_MAX_DOUBLINGS + 1)
)


def near_dup_threshold(n: int) -> float:
    """Smallest ladder rung whose corpus bound covers n — the
    band_bits_ladder pattern applied to the score threshold."""
    for k in range(NEAR_DUP_MAX_DOUBLINGS):
        if n <= (NEAR_DUP_BASE_N << k):
            return _NEAR_DUP_LADDER[k]
    return _NEAR_DUP_LADDER[NEAR_DUP_MAX_DOUBLINGS]


# oracle twin: identical integer breakpoints, identical 4-decimal rungs
_NEAR_DUP_THR_SQL = "(" + " ".join(
    ["CASE"]
    + [
        f"WHEN n <= {NEAR_DUP_BASE_N << k} THEN {_NEAR_DUP_LADDER[k]!r}"
        for k in range(NEAR_DUP_MAX_DOUBLINGS)
    ]
    + [f"ELSE {_NEAR_DUP_LADDER[NEAR_DUP_MAX_DOUBLINGS]!r} END"]
) + ")"
# LSH band width GROWS WITH CORPUS SIZE (round 7, same lesson as
# SemDeDup's cell count): a fixed 6-bit band means 64 buckets forever,
# so candidates are O(N²/64) — measurably super-linear at the sf1
# sweep (16.6x for 10x data). Width = smallest b in [6, 16] with
# N <= TARGET_BUCKET << b keeps the mean bucket ~TARGET_BUCKET vectors,
# so candidate work stays O(N·bucket). Wider bands trade per-band
# recall; the recall knob at scale is MORE bands (linear cost), not
# fatter buckets (quadratic). Pure integer thresholds so Spark and the
# oracle derive the identical width from the identical count.
LSH_MIN_BITS = 6
LSH_MAX_BITS = 16
LSH_TARGET_BUCKET = 32


def band_bits_ladder(n: int, lo: int, hi: int, target: int) -> int:
    """Smallest width b in [lo, hi] with n <= target << b — THE shared
    integer ladder for every corpus-adaptive LSH width in the repo
    (hyperplane bands here, simhash bands in queries/textq); one
    implementation so a cap/bound fix can't miss a copy."""
    for b in range(lo, hi):
        if n <= (target << b):
            return b
    return hi


def lsh_band_bits(n: int) -> int:
    return band_bits_ladder(n, LSH_MIN_BITS, LSH_MAX_BITS, LSH_TARGET_BUCKET)


# Oracle twins. Bands compare as SIGN-BIT STRINGS (substr of one
# 32-char sign string) because SQL can't loop a literal bit-weight sum
# over a runtime width; string equality on b sign chars == integer
# equality on b sign bits, and only EQUALITY of bucket keys matters.
_BITS_SQL = "(" + " ".join(
    ["CASE"]
    + [
        f"WHEN n <= {LSH_TARGET_BUCKET << b} THEN {b}"
        for b in range(LSH_MIN_BITS, LSH_MAX_BITS)
    ]
    + [f"ELSE {LSH_MAX_BITS} END"]
) + ")"
_LSH_BB_SQL = (
    "bb AS (SELECT " + _BITS_SQL + " AS bits, " + _NEAR_DUP_THR_SQL
    + " AS thr FROM (SELECT count(*) AS n FROM embeddings))"
)
# sign string spans exactly the dims the two widest bands can read
# (2 * LSH_MAX_BITS) — derived, not hard-coded, so raising the cap
# can't silently truncate band1 into a shared '' key (review r7c)
assert 2 * LSH_MAX_BITS <= 64, "bands must fit the embedding dim"
_SIGNS_SQL = (
    f"list_aggregate(list_transform(range(1, {2 * LSH_MAX_BITS + 1}), "
    "i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), "
    "'string_agg', '')"
)


@register(
    "embedding_near_dup",
    oracle=f"""
    WITH {_LSH_BB_SQL},
    e AS (
      SELECT vec_id, embedding,
             substr({_SIGNS_SQL}, 1, (SELECT bits FROM bb)) AS band0,
             substr({_SIGNS_SQL}, (SELECT bits FROM bb) + 1,
                    (SELECT bits FROM bb)) AS band1,
             {_NORM_SQL.format(a="embedding")} AS nrm
      FROM embeddings
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             a.embedding AS ea, b.embedding AS eb, a.nrm AS na, b.nrm AS nb
      FROM e a JOIN e b
        ON (a.band0 = b.band0 OR a.band1 = b.band1) AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT id_a, id_b,
             round({_DOT_SQL.format(a="ea", b="eb")} / (na * nb), 4) AS cosine
      FROM cand
    )
    SELECT id_a, id_b, cosine FROM scored
    WHERE cosine >= (SELECT thr FROM bb)
    ORDER BY cosine DESC, id_a, id_b
    """,
    tags=("dedup", "vector", "cosine", "lsh", "near-dup"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    The dedup scale path, banding like MinHash-LSH: two independent
    sign-bit bands whose WIDTH GROWS WITH CORPUS SIZE (lsh_band_bits:
    6 bits at the test SFs, 10 at the sf1 sweep, up to 16) so the mean
    bucket stays ~LSH_TARGET_BUCKET vectors; vectors agreeing on EITHER
    band become candidates (band-OR restores the recall a single longer
    code destroys), each band join equi-partitioned on its bucket key so
    candidate generation scales with bucket size, not corpus². Norms are
    computed once per row and carried through the join as scalars —
    bit-identical to per-pair evaluation but 2 HOF passes per row instead
    of 2 per pair. Pairs found by both bands are deduped before the dot
    product so the similarity work runs once per unique candidate.
    The REPORTING threshold is count-derived too (near_dup_threshold —
    0.35 at every test SF, tightening per corpus doubling past 20k) so
    the answer volume grows ~linearly where a fixed threshold grows
    O(n²·p) — see the ladder comment above.
    At 100 TB: persist the banded table, bucket it by band key on write,
    and add bands to raise recall at linear (not quadratic) cost.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # band width AND report threshold from one cheap count (row-group
    # stats), same integer ladders as the oracle's bb CTE
    n = emb.count()
    return _banded_near_dup_pairs(emb, lsh_band_bits(n), near_dup_threshold(n))


def _banded_near_dup_pairs(emb: DataFrame, bits: int, thr: float) -> DataFrame:
    """(id_a, id_b, cosine) hyperplane-LSH near-dup pairs over
    ``emb(vec_id, embedding)`` — the banding/verify core shared by the
    full pair listing (embedding_near_dup) and the collapsed components
    path (_near_dup_component_edges). Ladder inputs (bits, thr) come
    from the CALLER's corpus count so both paths band identically."""
    e = F.col("embedding")

    def band(start: int):
        return sum(
            F.when(e.getItem(start + i) >= 0, 1 << (bits - 1 - i)).otherwise(0)
            for i in range(bits)
        )

    base = emb.select(
        "vec_id",
        "embedding",
        band(0).alias("band0"),
        band(bits).alias("band1"),
        norm(e).alias("nrm"),
    )
    from ..session import bounded_persist

    base = bounded_persist("vectorq._banded_near_dup_pairs.base", base)

    # r17: score and threshold INSIDE each band join, BEFORE the
    # pair-dedup exchange. cosine is a function of the pair, so
    # dedup-then-score and score-then-dedup give identical rows — but
    # the old order shipped both embedding arrays + norms (~1 KB/row at
    # dim 64) through the corpus-wide dropDuplicates exchange as
    # payload; now only (id_a, id_b, cosine) = 24 bytes moves, and the
    # threshold drops sub-thr candidates before they travel at all.
    # Cost: pairs surviving in BOTH bands evaluate the dot twice
    # (JVM-side HOF, map-local) — bounded by 2x, far cheaper than the
    # exchange bytes it saves. The oracle keeps the dedup-then-score
    # order (DISTINCT on ids), which is the equivalence proof run at
    # every parity gate.
    cosine = F.round(
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4
    )
    cand = None
    for bcol in ("band0", "band1"):
        a = base.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("ea"),
            F.col("nrm").alias("na"),
            F.col(bcol).alias("bk"),
        )
        b = base.select(
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("eb"),
            F.col("nrm").alias("nb"),
            F.col(bcol).alias("bk"),
        )
        p = (
            a.join(b, "bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cosine.alias("cosine"))
            .filter(F.col("cosine") >= thr)
        )
        cand = p if cand is None else cand.unionByName(p)

    return cand.dropDuplicates(["id_a", "id_b"]).orderBy(
        F.desc("cosine"), "id_a", "id_b"
    )


def _near_dup_component_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b) edge list that is COMPONENT-EQUIVALENT to
    embedding_near_dup's pair list, with the minhash exact-class star
    collapse applied (r17 — VERDICT r16 task 4): vectors grouped by a
    fixed-width xxhash64 pair over the raw embedding array collapse to
    one representative before banding, members contribute one star edge
    each to the class's min vec_id. Byte-identical embeddings have
    identical sign patterns in EVERY band — a 2,500-member identical
    class makes the bucket join m²/2-quadratic exactly like minhash's
    degenerate bucket (measured: see the probe's dup-class tile) — and
    cosine(a, a) rounds to 1.0 ≥ thr, so the class is a guaranteed
    clique whose connectivity an (m−1)-edge star reproduces. Any
    member's near-dup edge is its rep's edge (same vector), so
    components are unchanged; the ladder inputs (bits, thr) still come
    from the FULL corpus count, matching the oracle's bb CTE. Digest
    collision needs two independent 64-bit agreements (~2^-128/class
    pair) — the accepted verify_jaccard collision class. The PAIR
    LISTING (embedding_near_dup) keeps the uncollapsed plan: its
    output is itself quadratic on such input, which no plan avoids
    (the minhash_dup_pairs caveat, operators/dedup.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bits, thr = lsh_band_bits(n), near_dup_threshold(n)
    ek = F.col("embedding")
    from ..session import bounded_persist

    keyed = bounded_persist(
        "vectorq._near_dup_component_edges.keyed",
        emb.select(
            "vec_id",
            "embedding",
            F.xxhash64(ek).alias("ck1"),
            F.xxhash64(ek, F.lit(-7046029254386353131)).alias("ck2"),
        ),
    )
    classes = keyed.select("ck1", "ck2", "vec_id").groupBy("ck1", "ck2").agg(
        F.min("vec_id").alias("rep")
    )
    # both branches below (star edges, reps-only banding) read this
    # join: persist it so the corpus-wide exchange runs once, not twice
    with_rep = bounded_persist(
        "vectorq._near_dup_component_edges.with_rep",
        keyed.join(classes, ["ck1", "ck2"]),
    )
    star = with_rep.filter(F.col("vec_id") != F.col("rep")).select(
        F.col("rep").alias("id_a"), F.col("vec_id").alias("id_b")
    )
    reps = with_rep.filter(F.col("vec_id") == F.col("rep")).select(
        "vec_id", "embedding"
    )
    pairs = _banded_near_dup_pairs(reps, bits, thr).select("id_a", "id_b")
    return pairs.unionByName(star)


IVF_CELLS = 4

_IVF_ASSIGN_SQL = f"""
    dims AS (
      SELECT vec_id, vec_id % {IVF_CELLS} AS seed_cell, t.i AS dim,
             CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, 65)) AS t(i)
    ),
    cent AS (SELECT seed_cell AS c, dim, avg(x) AS cx FROM dims GROUP BY 1, 2),
    dist AS (
      SELECT d.vec_id, c.c, sum((d.x - c.cx) * (d.x - c.cx)) AS d2
      FROM dims d JOIN cent c ON d.dim = c.dim
      GROUP BY 1, 2
    ),
    assign AS (SELECT vec_id, arg_min(c, d2) AS cell FROM dist GROUP BY vec_id)
"""


@register(
    "ivf_topk",
    oracle=f"""
    WITH {_IVF_ASSIGN_SQL},
    e AS (
      SELECT a.vec_id, a.cell, e.label, e.embedding
      FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
    ),
    q AS (SELECT embedding AS qv, cell AS qcell FROM e WHERE vec_id = {QUERY_VEC_ID}),
    sims AS (
      SELECT e.vec_id, e.label, e.cell,
             round({_DOT_SQL.format(a="e.embedding", b="q.qv")}
                   / ({_NORM_SQL.format(a="e.embedding")}
                      * {_NORM_SQL.format(a="q.qv")}), 4) AS cosine
      FROM e JOIN q ON e.cell = q.qcell
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cell, cosine
    FROM sims ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tags=("vector", "ann", "ivf", "topk"),
)
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into cells,
    probe only the query's cell, exact cosine top-k within it.

    The coarse "training" is a deterministic stand-in for k-means — each
    centroid is the per-dimension mean of a seeded subset (vec_id mod k),
    which is exactly one Lloyd half-step and keeps the whole flow
    SQL-replayable for the oracle. Plan shape at scale: centroids are
    k×d doubles → broadcast packed into ONE row; assignment is an
    IN-ROW array_min argmin over the corpus scan (_assign_cells — the
    r15 rewrite; the old dim-keyed join exploded n×d×k rows before its
    two groupBy shuffles); the probe reads ~1/k of the rows. On a real
    deployment the assignment is written back partitioned by cell so
    probes are partition-pruned scans, and k grows to √N cells with an
    nprobe>1 multi-cell probe for recall.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        (F.col("vec_id") % IVF_CELLS).alias("seed_cell"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select("vec_id", "seed_cell", "dim", F.col("x").cast("double").alias("x"))
    cent = dims.groupBy(
        F.col("seed_cell").alias("c"), "dim"
    ).agg(F.avg("x").alias("cx"))
    cent_arr = cent.groupBy(F.col("c").alias("cell")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cx"))),
            lambda s: s.cx,
        ).alias("cvec")
    )
    ev = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    assign = _assign_cells(ev, cent_arr)
    e = assign.join(emb, "vec_id").select("vec_id", "cell", "label", "embedding")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv"), F.col("cell").alias("qcell")
    )
    sim = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (norm(F.col("embedding")) * norm(F.col("qv"))),
        4,
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .select("vec_id", "label", "cell", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_LSH_BB_SQL},
    e0 AS (
      SELECT vec_id, embedding,
             substr({_SIGNS_SQL}, 1, (SELECT bits FROM bb)) AS band0,
             substr({_SIGNS_SQL}, (SELECT bits FROM bb) + 1,
                    (SELECT bits FROM bb)) AS band1,
             {_NORM_SQL.format(a="embedding")} AS nrm
      FROM embeddings
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             a.embedding AS ea, b.embedding AS eb, a.nrm AS na, b.nrm AS nb
      FROM e0 a JOIN e0 b
        ON (a.band0 = b.band0 OR a.band1 = b.band1) AND a.vec_id < b.vec_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      WHERE round({_DOT_SQL.format(a="ea", b="eb")} / (na * nb), 4)
            >= (SELECT thr FROM bb)
    ),
    -- MATERIALIZED: DuckDB inlines CTEs by default, so the recursive
    -- reach join would re-evaluate the whole banded-candidate pipeline
    -- on every fixpoint iteration (measured 9 s -> <1 s at sf0.01).
    edges AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
      UNION SELECT id_a, id_a FROM pairs
      UNION SELECT id_b, id_b FROM pairs
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS node, min(dst) AS component FROM reach GROUP BY src
    """,
    tags=("dedup", "components", "iterative", "clustering"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: embedding-LSH near-dup edges → connected
    components (operators.components, iterative min-label propagation);
    each component's min vec_id is the canonical keeper a dedup pipeline
    retains. The oracle replays the fixpoint with a recursive CTE —
    DuckDB's own iteration — over the UNCOLLAPSED pair generation; the
    engine feeds the component-equivalent collapsed edge list
    (_near_dup_component_edges — exact-duplicate embedding classes
    star-collapse before banding, r17), so the oracle doubles as the
    output-preservation proof for the collapse.
    """
    edges = _near_dup_component_edges(spark, sf_dir)
    from ..operators.components import connected_components

    return connected_components(edges, src="id_a", dst="id_b")


# The histogram oracle replays dedup_components' full recursive-CTE
# oracle as a subquery — one component-labelling implementation, two
# registry entries (same single-sourcing rule as _ivfpq_index_sql).
from . import REGISTRY as _REGISTRY  # noqa: E402

_COMPONENTS_ORACLE = _REGISTRY["dedup_components"].oracle


@register(
    "dup_cluster_size_histogram",
    oracle=f"""
    WITH comp AS ({_COMPONENTS_ORACLE}),
    sizes AS (
      SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY component
    )
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs,
           CAST(sum(cluster_size) - count(*) AS BIGINT) AS n_removable
    FROM sizes GROUP BY cluster_size
    ORDER BY cluster_size
    """,
    tags=("dedup", "components", "profiling", "quality"),
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the dedup QC report a
    curation run reads before committing a purge: how many near-dup
    clusters exist at each size, how many documents they cover, and how
    many rows a keep-one-per-cluster policy would remove
    (``n_removable = Σ(size−1)``). A fat tail here (one giant cluster)
    usually means boilerplate or a mirror site, not true duplication —
    the signal to tighten the similarity threshold before deleting.

    Composition, not re-implementation: the cluster labels come from
    the registered dedup_components pipeline (embedding_near_dup pairs
    → connected components); this query adds two count-only hash aggs
    on top. The oracle replays dedup_components' own recursive-CTE
    oracle as a subquery, so the two entries can never disagree on what
    a component is.

    Scale: the aggs shuffle component-count rows (≤ #nodes-in-pairs,
    already a small fraction of the corpus after LSH banding), then
    ≤ #distinct-sizes rows — both map-side combinable.
    """
    comp = dedup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
            (F.sum("cluster_size") - F.count(F.lit(1))).alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


IVF_NPROBE = 2

@register(
    "ivf_topk_nprobe",
    oracle=f"""
    WITH {_IVF_ASSIGN_SQL},
    e AS (
      SELECT a.vec_id, a.cell, e.label, e.embedding
      FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    qdims AS (
      SELECT t.i AS dim, CAST(q.qv[t.i] AS DOUBLE) AS qx
      FROM q, unnest(range(1, 65)) AS t(i)
    ),
    qdist AS (
      SELECT c.c, sum((qd.qx - c.cx) * (qd.qx - c.cx)) AS qd2
      FROM qdims qd JOIN cent c ON qd.dim = c.dim
      GROUP BY 1
    ),
    probe AS (SELECT c FROM qdist ORDER BY qd2, c LIMIT {IVF_NPROBE}),
    sims AS (
      SELECT e.vec_id, e.label, e.cell,
             round({_DOT_SQL.format(a="e.embedding", b="q.qv")}
                   / ({_NORM_SQL.format(a="e.embedding")}
                      * {_NORM_SQL.format(a="q.qv")}), 4) AS cosine
      FROM e JOIN probe p ON e.cell = p.c, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cell, cosine
    FROM sims ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tags=("vector", "ann", "ivf", "nprobe", "topk"),
)
def ivf_topk_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a multi-cell probe: rank centroids by distance to the
    query vector and search the nearest ``IVF_NPROBE`` cells instead of
    only the query's own cell — the standard recall lever for IVF
    indexes (probing one cell misses neighbors that quantize across a
    cell boundary).

    nprobe=1 degenerates to ``ivf_topk`` (the query's assigned cell IS
    its nearest centroid). Plan shape at scale: centroid ranking touches
    k×d doubles on a broadcast side; the probe list (``nprobe`` ints) is
    broadcast back so the corpus scan stays partition-prunable when the
    assignment is written out partitioned by cell — the scan reads
    nprobe/k of the data, never all of it.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        (F.col("vec_id") % IVF_CELLS).alias("seed_cell"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select("vec_id", "seed_cell", "dim", F.col("x").cast("double").alias("x"))
    cent = dims.groupBy(
        F.col("seed_cell").alias("c"), "dim"
    ).agg(F.avg("x").alias("cx"))
    # in-row argmin assignment over the packed broadcast centroid
    # table (r15 — see ivf_topk; identical arithmetic, no n×d×k rows)
    cent_arr = cent.groupBy(F.col("c").alias("cell")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cx"))),
            lambda s: s.cx,
        ).alias("cvec")
    )
    ev = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    assign = _assign_cells(ev, cent_arr)
    e = assign.join(emb, "vec_id").select("vec_id", "cell", "label", "embedding")

    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    qdims = q.select(F.posexplode("qv").alias("dim", "qx")).select(
        "dim", F.col("qx").cast("double").alias("qx")
    )
    qdist = (
        qdims.join(F.broadcast(cent), "dim")
        .groupBy("c")
        .agg(F.sum((F.col("qx") - F.col("cx")) * (F.col("qx") - F.col("cx"))).alias("qd2"))
    )
    probe = qdist.orderBy("qd2", "c").limit(IVF_NPROBE).select(
        F.col("c").alias("pcell")
    )
    sim = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (norm(F.col("embedding")) * norm(F.col("qv"))),
        4,
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probe), F.col("cell") == F.col("pcell"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", "cell", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


# --- k-NN join (round 3) ----------------------------------------------------


@register(
    "knn_join_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id % 100 = 7
    ),
    c AS (
      SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 100 <> 7
    ),
    sims AS (
      SELECT q.query_id, c.vec_id, c.label,
             round({_DOT_SQL.format(a="c.embedding", b="q.qv")}
                   / ({_NORM_SQL.format(a="c.embedding")}
                      * {_NORM_SQL.format(a="q.qv")}), 4) AS cosine
      FROM c CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, label, cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, vec_id
             ) AS INTEGER) AS rank
      FROM sims
    )
    SELECT query_id, vec_id, label, cosine, rank
    FROM ranked WHERE rank <= 5
    """,
    tags=("vector", "ann", "knn", "join", "topk"),
)
def knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN JOIN: top-5 cosine neighbors for EVERY query vector in a
    query block (vec_id % 100 == 7, ~1% of the corpus), neighbors drawn
    from the non-query remainder.

    Plan shape at scale: the query block is broadcast, so the corpus is
    never shuffled for candidate generation — each corpus partition
    scores its rows against all Q queries locally (O(N·Q/partitions)),
    then one shuffle on query_id ranks per-query top-k. For very large Q
    swap the broadcast for the LSH-bucketed generator (ann_bucketed_topk)
    so each corpus row only meets same-bucket queries. Ranking uses the
    ROUNDED cosine with the vec_id tiebreaker on both engines, so
    float-LSB rank flips can't diverge.

    Norms are precomputed PER SIDE below the join (round 8): inside the
    cross-join projection each norm would re-evaluate per PAIR — 2
    extra 64-element folds per (row, query) — where one fold per row +
    one per query suffices (Projects don't collapse across a Join, so
    the per-side projection stays below it). Same double arithmetic,
    bit-identical cosine; ~N·Q·2d fewer flops.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("nq"),
    )
    c = emb.filter(F.col("vec_id") % 100 != 7).select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nc")
    )
    cosine = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (F.col("nc") * F.col("nq")),
        4,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        c.crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", "label", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


@register(
    "kmeans_step_shift",
    oracle=f"""
    WITH dims AS (
      SELECT vec_id, vec_id % {IVF_CELLS} AS seed_cell, t.i AS dim,
             CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, 65)) AS t(i)
    ),
    cent AS (
      SELECT seed_cell AS c, dim, avg(x) AS cx FROM dims GROUP BY 1, 2
    ),
    dist AS (
      SELECT d.vec_id, c.c, sum((d.x - c.cx) * (d.x - c.cx)) AS d2
      FROM dims d JOIN cent c ON d.dim = c.dim GROUP BY 1, 2
    ),
    assign AS (SELECT vec_id, arg_min(c, d2) AS cell FROM dist GROUP BY vec_id),
    sizes AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_members
      FROM assign GROUP BY cell
    ),
    newcent AS (
      SELECT a.cell, d.dim, avg(d.x) AS nx
      FROM dims d JOIN assign a USING (vec_id) GROUP BY 1, 2
    ),
    shift AS (
      SELECT n.cell,
             round(sqrt(sum((n.nx - c.cx) * (n.nx - c.cx))), 4)
               AS centroid_shift
      FROM newcent n JOIN cent c ON n.cell = c.c AND n.dim = c.dim
      GROUP BY n.cell
    )
    SELECT s.cell, z.n_members, s.centroid_shift
    FROM shift s JOIN sizes z USING (cell)
    ORDER BY s.cell
    """,
    tags=("vector", "kmeans", "iterative", "clustering"),
)
def kmeans_step_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd (k-means) iteration over the embedding corpus:
    assign every vector to its nearest seed centroid, recompute the
    centroids from the assignment, and report per-cell membership plus
    the L2 centroid shift — the convergence metric an iterative
    clustering driver loops on (IVF's coarse quantizer is this step's
    fixpoint; see ivf_topk for the half-step it seeds from).

    Scale shape (round-4 rework — the r3 plan had 2 sort-merge joins on
    vec_id, a full corpus shuffle per iteration): centroids are k×d
    doubles → pivoted into k arrays and broadcast as ONE row; assignment
    is then a pure column expression per vector (zip_with squared-diff +
    aggregate-sum per candidate, array_sort argmin) — a narrow map, zero
    corpus shuffle, zero join on vec_id. Recomputation is one
    map-side-combinable groupBy(cell, dim); the shift/size joins are all
    k-row broadcasts. A k-means driver repeats this plan with
    ``localCheckpoint`` per round exactly like operators/components.py
    does for label propagation.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("v"),
    )
    dims = vecs.select(
        "vec_id",
        (F.col("vec_id") % IVF_CELLS).alias("seed_cell"),
        F.posexplode("v").alias("dim", "x"),
    )
    cent = dims.groupBy(F.col("seed_cell").alias("c"), "dim").agg(
        F.avg("x").alias("cx")
    )
    # k rows → 1 row of k (cell, centroid-array) structs; the crossJoin
    # below is the allowlisted broadcast-1-row pattern (PLAN_AUDIT.md).
    cent_arrays = cent.groupBy("c").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cx"))),
            lambda s: s["cx"],
        ).alias("cvec")
    )
    cents_one = cent_arrays.agg(
        F.array_sort(F.collect_list(F.struct("c", "cvec"))).alias("cents")
    )
    # Narrow assignment: per-candidate squared L2 in fixed dim order
    # (deterministic float-add order), argmin via array_sort on
    # (d2, cell) — ties break to the lowest cell id.
    def d2_to(s):
        return F.aggregate(
            F.zip_with("v", s["cvec"], lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )

    assigned = vecs.crossJoin(F.broadcast(cents_one)).select(
        "vec_id",
        "v",
        F.array_sort(
            F.transform(
                "cents",
                lambda s: F.struct(d2_to(s).alias("d2"), s["c"].alias("c")),
            )
        )[0]["c"].alias("cell"),
    )
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    newcent = (
        assigned.select("cell", F.posexplode("v").alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.avg("x").alias("nx"))
    )
    shift = (
        newcent.join(
            F.broadcast(cent),
            (newcent.cell == cent.c) & (newcent.dim == cent.dim),
        )
        .groupBy(newcent.cell)
        .agg(
            F.round(
                F.sqrt(
                    F.sum((F.col("nx") - F.col("cx")) * (F.col("nx") - F.col("cx")))
                ),
                4,
            ).alias("centroid_shift")
        )
    )
    return (
        shift.join(F.broadcast(sizes), "cell")
        .select("cell", "n_members", "centroid_shift")
        .orderBy("cell")
    )


@register(
    "embedding_centroid_drift",
    oracle="""
    WITH dims AS (
      SELECT label, vec_id % 2 AS half, t.i AS dim,
             CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, 65)) AS t(i)
    ),
    m AS (
      SELECT label, dim,
             avg(CASE WHEN half = 0 THEN x END) AS a0,
             avg(CASE WHEN half = 1 THEN x END) AS a1
      FROM dims GROUP BY 1, 2
    )
    SELECT label,
           round(sqrt(sum((a0 - a1) * (a0 - a1))), 4) AS drift_l2,
           round(sum(a0 * a1)
                 / (sqrt(sum(a0 * a0)) * sqrt(sum(a1 * a1))), 4) AS cos_sim
    FROM m GROUP BY label ORDER BY label
    """,
    tags=("vector", "drift", "monitoring", "training"),
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: split the corpus into two
    cohorts (vec_id parity stands in for reference-vs-current snapshots),
    compute the per-label centroid of each cohort in one pass
    (conditional avg — no self-join, no second scan), and report the L2
    shift and cosine similarity between cohort centroids per label. The
    embedding-space analogue of psi_value_drift: the monitor a training
    pipeline runs when a new crawl lands.

    Scale: posexplode → ONE map-side-combinable groupBy(label, dim) with
    both cohort means as conditional aggregates, then a k·d-row
    reduction. No join at all; the heavy stage is linear in corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "dim", "x"
        ),
    )
    m = dims.groupBy("label", "dim").agg(
        F.avg(F.when(F.col("half") == 0, F.col("x"))).alias("a0"),
        F.avg(F.when(F.col("half") == 1, F.col("x"))).alias("a1"),
    )
    return (
        m.groupBy("label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("a0") - F.col("a1")) ** 2)), 4
            ).alias("drift_l2"),
            F.round(
                F.sum(F.col("a0") * F.col("a1"))
                / (
                    F.sqrt(F.sum(F.col("a0") * F.col("a0")))
                    * F.sqrt(F.sum(F.col("a1") * F.col("a1")))
                ),
                4,
            ).alias("cos_sim"),
        )
        .orderBy("label")
    )


# SemDeDup cell count k is DERIVED FROM CORPUS SIZE, not a constant
# (VERDICT r6): the O(N·cell_size) bound in the docstring only holds if
# k grows with N — a fixed k makes the within-cell pair step O(N²/k),
# quadratic. k = max(SEMDEDUP_MIN_CELLS, ceil(N / SEMDEDUP_TARGET_CELL))
# keeps the MEAN cell at <= TARGET vectors as the corpus grows. Both
# sides use the same pure-integer formula — Spark from a cheap count()
# action, the oracle from an inline scalar subquery — so the seed
# assignment (vec_id % k) is bit-identical. At the test SFs
# (N <= ~4,800) the formula yields k = 16, so results are unchanged
# from the constant it replaces. (The IVF queries keep IVF_CELLS=4 for
# a coarser probe granularity.)
SEMDEDUP_MIN_CELLS = 16
SEMDEDUP_TARGET_CELL = 300  # mean vectors per cell


def semdedup_k(n: int) -> int:
    """Cell count for an N-vector corpus: ceil(N/target) with a floor,
    in pure integer arithmetic (matches the oracle's `//` expression)."""
    return max(
        SEMDEDUP_MIN_CELLS,
        (n + SEMDEDUP_TARGET_CELL - 1) // SEMDEDUP_TARGET_CELL,
    )


# `kk` computes the same k as semdedup_k() in DuckDB integer arithmetic;
# seed assignment divides by that scalar subquery so the oracle adapts
# to whatever corpus the driver points it at, exactly as the Spark side
# does from its count().
_SEMDEDUP_ASSIGN_SQL = f"""
    kk AS (
      SELECT greatest({SEMDEDUP_MIN_CELLS},
                      (count(*) + {SEMDEDUP_TARGET_CELL - 1})
                        // {SEMDEDUP_TARGET_CELL}) AS k
      FROM embeddings
    ),
    vecs AS (
      SELECT vec_id, vec_id % (SELECT k FROM kk) AS seed_cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    dims AS (
      SELECT vec_id, seed_cell, t.i AS dim, v[t.i] AS x
      FROM vecs, unnest(range(1, 65)) AS t(i)
    ),
    cent AS (
      SELECT seed_cell AS c, list(cx ORDER BY dim) AS cvec
      FROM (SELECT seed_cell, dim, avg(x) AS cx FROM dims GROUP BY 1, 2)
      GROUP BY seed_cell
    ),
    -- d2 mirrors the engine bit-for-bit (ADVICE r8): a left-to-right
    -- fold of squared diffs in dim order (list_reduce), never an
    -- unordered GROUP BY sum, so FP addition order cannot diverge
    dist AS (
      SELECT v.vec_id, c.c,
             list_reduce(
               list_transform(range(1, 65),
                              i -> (v.v[i] - c.cvec[i]) * (v.v[i] - c.cvec[i])),
               (a, b) -> a + b) AS d2
      FROM vecs v CROSS JOIN cent c
    ),
    -- explicit tie-break to the LOWEST cell id on equal d2 — the same
    -- (d2, c) lexicographic min the engine's array_sort(struct) takes
    assign AS (
      SELECT vec_id, (min(struct_pack(d2 := d2, c := c))).c AS cell
      FROM dist GROUP BY vec_id
    )
"""

# Within-cell pair-width CAP (VERDICT r7 task 3): members of a cell are
# partitioned into rank-contiguous sub-cells of <= SPLIT_WIDTH (rank =
# vec_id order within the cell) and dup pairs are detected within a
# sub-cell only. For cells at or under the width this is a no-op (one
# sub-cell) — the test-SF outputs are bit-identical with or without it
# (max observed cell: 42 at sf0.01, 158 at sf0.1) — while an oversized
# cell's pair work drops from O(m²) to O(m·SPLIT_WIDTH). This is a
# deliberate CAP, not a grows-with-N capacity: per-member work stays
# bounded at any corpus size (SemDeDup's per-cluster comparisons are
# already an approximation bounded by the quantizer; the cap bounds the
# skewed-cell tail the same way). Engine and oracle share the formula.
SEMDEDUP_SPLIT_WIDTH = 2 * SEMDEDUP_TARGET_CELL


@register(
    "semdedup_embedding_cells",
    oracle=f"""
    WITH {_SEMDEDUP_ASSIGN_SQL},
    e AS (
      SELECT a.vec_id, a.cell, e.embedding,
             {_NORM_SQL.format(a="e.embedding")} AS nrm,
             (row_number() OVER (PARTITION BY a.cell ORDER BY a.vec_id)
              - 1) // {SEMDEDUP_SPLIT_WIDTH} AS sub
      FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
    ),
    pairs AS (
      SELECT x.cell, x.vec_id AS id_a, y.vec_id AS id_b
      FROM e x JOIN e y ON x.cell = y.cell AND x.sub = y.sub
                       AND x.vec_id < y.vec_id
      WHERE round({_DOT_SQL.format(a="x.embedding", b="y.embedding")}
                  / (x.nrm * y.nrm), 4) >= {NEAR_DUP_THRESHOLD!r}
    ),
    cells AS (SELECT cell, count(*) AS n_members FROM assign GROUP BY cell),
    p AS (
      SELECT cell, count(*) AS n_dup_pairs,
             count(DISTINCT id_b) AS n_dropped
      FROM pairs GROUP BY cell
    )
    SELECT c.cell, c.n_members,
           CAST(coalesce(p.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
           CAST(coalesce(p.n_dropped, 0) AS BIGINT) AS n_dropped
    FROM cells c LEFT JOIN p ON p.cell = c.cell
    """,
    tags=("dedup", "embedding", "semdedup", "clustering"),
)
def semdedup_embedding_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023, public
    arXiv:2303.09540 recipe): cluster embeddings with the coarse
    k-means quantizer, compare pairs ONLY within a cluster, and drop the
    higher-id member of every near-duplicate pair (the deterministic
    stand-in for "farther from centroid"). Per cell the output reports
    members, dup pairs, and docs a dedup pass would drop.

    This is the third leg of the embedding-dedup family: LSH-banded
    pairs (embedding_near_dup) probe by hash buckets, components
    (dedup_components) resolve transitive clusters, SemDeDup bounds the
    quadratic step by CLUSTER size — the shape that scales to billions
    of embeddings because k grows with N, keeping cells ~constant-sized:
    the all-pairs step is O(N·cell_size), never O(N²), and each cell's
    pairs compute inside one partition after one shuffle on cell id.

    Round-8 rework of the two sf1 hot spots (VERDICT r7 task 3):
    - assignment now uses the kmeans_step_shift shape — centroids
      pivot to ONE broadcast row of k arrays and the cell argmin is a
      pure column expression (array_sort on (d2, cell), ties to the
      lowest cell id, fixed dim-order adds). The previous
      join-on-dim/groupBy plan materialized N·d·k rows through a
      shuffle — with k ∝ N that shuffle was the dominant sf1 cost;
    - the within-cell pair step is capped by SEMDEDUP_SPLIT_WIDTH
      rank-contiguous sub-cells (see the constant's comment) so one
      skewed cell can no longer go quadratic.

    Round-18 rework (guide §3/§4.2): the pair step itself is a
    per-cell Arrow kernel (groupBy(cell).applyInArrow) instead of a
    (cell, sub) row self-join — each embedding crosses ONE cell-keyed
    exchange once and the Gram/threshold work runs vectorized in
    numpy with the same IEEE fold order; the old join broadcast
    locally but turned into a SortMergeJoin shipping BOTH array sides
    past the 64 MB ceiling. sf10: 19.2 → 3.6 s.
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    # one cheap count() sizes k from N (parquet row-group stats; no full
    # scan) — the step that turns the docstring's O(N·cell_size) claim
    # into code. See semdedup_k/_SEMDEDUP_ASSIGN_SQL for the shared
    # integer formula.
    k = semdedup_k(emb.count())
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("v"),
    )
    dims = vecs.select(
        "vec_id",
        (F.col("vec_id") % k).alias("seed_cell"),
        F.posexplode("v").alias("dim", "x"),
    )
    cent = dims.groupBy(F.col("seed_cell").alias("c"), "dim").agg(
        F.avg("x").alias("cx")
    )
    cent_arrays = cent.groupBy("c").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cx"))),
            lambda s: s["cx"],
        ).alias("cvec")
    )
    # Assignment is an Arrow-batched BLAS matmul (r15): k grows with N
    # here (semdedup_k), so the per-row interpreted argmin — k structs
    # × a 64-dim fold each — was N·k·d scalar ops through the
    # expression interpreter and drove the family's sf10 decade ratio
    # to ~11 (the probe's worst). One B×d @ d×k matmul per Arrow batch
    # does the identical argmin in vectorized BLAS: ‖v‖² is constant
    # per row, so ranking by −2·v·C + ‖c‖² equals ranking by d2, and
    # np.argmin's first-minimum rule over index-sorted cells IS the
    # (d2, lowest cell) tie-break; the BLAS-vs-fold summation-order
    # difference is the standing no-exact-ties argument (same class as
    # the oracle's own sum order). The k×d centroid matrix rides a
    # broadcast (dim-table-sized: k ≤ N/1250 → ~3 MB at sf100; at
    # billions of rows the production path is hierarchical/ANN
    # assignment, as the SemDeDup paper itself uses faiss k-means).
    # EAGER by design: this collect() runs at plan-BUILD time (the k
    # centroid rows, k ≤ N/1250 — a dim-table pull, not corpus data),
    # because the BLAS kernel needs the matrix as a contiguous ndarray,
    # not a per-row struct column. Callers that only want the plan
    # (.explain, plan audit) pay one small job. The broadcast residue
    # is bounded by bounded_broadcast: one live block for this site,
    # the previous invocation's unpersisted (ADVICE r15).
    cent_rows = sorted(cent_arrays.collect(), key=lambda r: r["c"])
    C = np.array([r["cvec"] for r in cent_rows], dtype=np.float64)
    cell_ids = np.array([r["c"] for r in cent_rows], dtype=np.int64)
    bc = bounded_broadcast(spark, "semdedup_embedding_cells.centroids", (C, cell_ids))

    def assign_arrow(batches):
        # mapInArrow (r17, guide §4.2): the vector column is ONE
        # contiguous Arrow buffer — np.frombuffer+reshape in, and the
        # untouched v column passes back out zero-copy instead of
        # round-tripping n per-row Python objects through pandas (the
        # same boundary fix as vectorq._assign_cells).
        import pyarrow as pa

        Cm, ids = bc.value
        cn = (Cm * Cm).sum(axis=1)  # ‖c‖² per centroid
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            vcol = rb.column(rb.schema.get_field_index("v"))
            flat = vcol.flatten()
            if len(flat) != n * Cm.shape[1]:
                raise ValueError("ragged embedding batch")  # fail loud
            V = np.asarray(flat, dtype=np.float64).reshape(
                n, Cm.shape[1]
            )
            S = -2.0 * (V @ Cm.T) + cn  # rank-equal to d2 per row
            idx = S.argmin(axis=1)  # first min = lowest cell id
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("vec_id")),
                    vcol,
                    pa.array(ids[idx]),
                ],
                ["vec_id", "v", "cell"],
            )

    assign = vecs.mapInArrow(
        assign_arrow, "vec_id long, v array<double>, cell long"
    )

    # Within-cell pair step as a per-CELL Arrow/BLAS kernel (r18, guide
    # §3/§4.2) replacing the row self-join: the old plan joined two
    # array-carrying projections of the checkpointed member table on
    # (cell, sub) — a BroadcastHashJoin locally, but past the 64 MB
    # ceiling an SMJ shipping BOTH embedding sides. Now each row crosses
    # ONE cell-keyed exchange once; the kernel sorts its cell by vec_id,
    # derives the rank sub-cells (identical (rn-1) div W arithmetic),
    # and emits the finished (n_members, n_dup_pairs, n_dropped) row —
    # the window, the localCheckpoint barrier, the self-join and the two
    # downstream aggregations are all gone (plan: MapInArrow → one
    # Exchange(cell) → FlatMapGroupsInArrow). A skewed cell costs one
    # task, exactly the exposure the old row_number window already had.
    #
    # Bit-exactness with the join it replaces: the dot/norm folds are
    # accumulated DIMENSION BY DIMENSION over vectorized rows — the
    # same left-to-right ((0+x0)+x1)+... IEEE order as the zip_with/
    # aggregate expressions (and the oracle's list_reduce); division
    # and the nrm product are the same scalar ops. Spark's round(x, 4)
    # on DOUBLE goes through BigDecimal(Double.toString(x)) —
    # HALF_UP on the SHORTEST DECIMAL REPR, not the binary value — so
    # qualification (round4(cos) >= threshold ⟺ half-up(cos·10⁴) >=
    # threshold·10⁴) is decided on the scaled float with a guard band:
    # anything within 1e-6 of the half-up boundary re-checks through
    # Decimal(repr(x)), Python's repr being the same shortest-repr
    # contract as Java's Double.toString.
    w_split = SEMDEDUP_SPLIT_WIDTH
    thr_u = int(round(NEAR_DUP_THRESHOLD * 10_000))  # 3500
    dim = C.shape[1]

    def cell_pairs_arrow(table):
        import pyarrow as pa
        from decimal import ROUND_HALF_UP, Decimal

        ids_col = table.column("vec_id")
        vcol = table.column("v")
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        ids = np.asarray(ids_col, dtype=np.int64)
        n = len(ids)
        flat = vcol.flatten()
        if len(flat) != n * dim:
            raise ValueError("ragged embedding batch")  # fail loud
        V = np.asarray(flat, dtype=np.float64).reshape(n, dim)
        order = np.argsort(ids)  # rank = vec_id order within the cell
        ids = ids[order]
        V = V[order]
        # ‖v‖: fold-left over dims (norm()'s aggregate order)
        acc = np.zeros(n)
        for j in range(dim):
            x = V[:, j]
            acc = acc + x * x
        nrm = np.sqrt(acc)
        n_pairs = 0
        n_dropped = 0
        for s0 in range(0, n, w_split):
            blk = V[s0 : s0 + w_split]
            m = blk.shape[0]
            if m < 2:
                continue
            # Gram matrix by dim-ordered accumulation == dot()'s fold
            D = np.zeros((m, m))
            for j in range(dim):
                x = blk[:, j]
                D = D + x[:, None] * x[None, :]
            cos = D / (
                nrm[s0 : s0 + m][:, None] * nrm[s0 : s0 + m][None, :]
            )
            iu, ju = np.triu_indices(m, k=1)  # id_a < id_b (sorted)
            c = cos[iu, ju]
            scaled = c * 1e4
            lo = thr_u - 0.5  # half-up boundary: k >= thr_u
            qualify = scaled > lo + 1e-6
            amb = np.abs(scaled - lo) <= 1e-6
            for idx in np.nonzero(amb)[0]:
                r = Decimal(repr(float(c[idx]))).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
                qualify[idx] = float(r) >= NEAR_DUP_THRESHOLD
            n_pairs += int(np.count_nonzero(qualify))
            # id_b's sub is fixed, so distinct-per-sub sums to the
            # cell's countDistinct(id_b) exactly
            n_dropped += int(np.unique(ju[qualify]).size)
        return pa.table(
            {
                "cell": pa.array(
                    [int(table.column("cell")[0].as_py())],
                    type=pa.int64(),
                ),
                "n_members": pa.array([n], type=pa.int64()),
                "n_dup_pairs": pa.array([n_pairs], type=pa.int64()),
                "n_dropped": pa.array([n_dropped], type=pa.int64()),
            }
        )

    return assign.groupBy("cell").applyInArrow(
        cell_pairs_arrow,
        "cell long, n_members long, n_dup_pairs long, n_dropped long",
    )


N_HARDNEG_QUERIES = 20


@register(
    "hard_negatives_per_query",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel, embedding AS qv,
             {_NORM_SQL.format(a="embedding")} AS qn
      FROM embeddings WHERE vec_id < {N_HARDNEG_QUERIES}
    ),
    scored AS (
      SELECT q.qid, q.qlabel, e.vec_id, e.label,
             round({_DOT_SQL.format(a="e.embedding", b="q.qv")}
                   / ({_NORM_SQL.format(a="e.embedding")} * q.qn), 4)
               AS cosine
      FROM embeddings e JOIN q
        ON e.label <> q.qlabel
    ),
    ranked AS (
      SELECT qid, qlabel, vec_id AS neg_id, label AS neg_label, cosine,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM scored
    )
    SELECT qid, qlabel, neg_id, neg_label, cosine
    FROM ranked WHERE rn = 1
    """,
    tags=("vector", "hard-negatives", "training", "topk"),
)
def hard_negatives_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op: for
    each anchor (here the first 20 vectors), find the single most
    cosine-similar vector with a DIFFERENT label; those are the
    negatives that actually teach a bi-encoder. Plan: the anchor set is
    tiny by construction → BROADCAST against the corpus (one narrow
    scoring pass, no corpus shuffle), then a per-anchor top-1 via
    min-by-style window on the anchor key — at 100 TB with millions of
    anchors this becomes the ANN-probe variant (IVF cells or LSH bands
    restrict candidates first, exactly the ivf_topk/ann_bucketed_topk
    machinery); the brute-force form here is the recall baseline the
    probe variant is judged against, same pattern as cosine_topk.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_HARDNEG_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("qn"),
    )
    scored = emb.join(
        F.broadcast(q), F.col("label") != F.col("qlabel")
    ).select(
        "qid",
        "qlabel",
        "vec_id",
        "label",
        F.round(
            dot(F.col("embedding"), F.col("qv"))
            / (norm(F.col("embedding")) * F.col("qn")),
            4,
        ).alias("cosine"),
    )
    best = scored.groupBy("qid", "qlabel").agg(
        F.max_by(
            F.struct("vec_id", "label", "cosine"),
            F.struct("cosine", (-F.col("vec_id")).alias("tie")),
        ).alias("s")
    )
    return best.select(
        "qid",
        "qlabel",
        F.col("s.vec_id").alias("neg_id"),
        F.col("s.label").alias("neg_label"),
        F.col("s.cosine").alias("cosine"),
    )


# --- IVF-PQ (round 10, recomposed round 11): coarse cells + residual
# product quantization ---------------------------------------------------
#
# At 100 TB the float32 embedding column itself is the bottleneck: a
# candidate scan that touches raw vectors reads 256 bytes/row (64 × f32),
# while a 16-subspace × 16-code product quantization stores 16 nibbles
# (8 bytes) — a 32x scan-size reduction. The round-11 recomposition puts
# IVF cells IN FRONT of the PQ scan (VERDICT r10 task 2) — the classic
# IVF-PQ index (Jégou et al., "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011):
# (1) coarse-quantize the corpus into count-derived cells and PQ-encode
#     the RESIDUAL x − centroid(cell) — residuals are smaller-magnitude,
#     so the same code budget buys finer resolution;
# (2) at query time rank cells by centroid distance, probe the nearest
#     nprobe (3/4 of cells here — an honest knob: this synthetic corpus
#     is diffuse, so cells carry little structure and a deep probe is
#     required for recall; on clustered production corpora nprobe ≪
#     cells is the standard operating point and the scan skips most of
#     the corpus);
# (3) rank candidates in probed cells by the broadcast ADC
#     (asymmetric-distance) table, reading ONLY the 8-byte codes;
# (4) exact-cosine re-rank of the top-C candidates (C count-derived,
#     max(100, n/25)) touches raw vectors for C rows total.
#
# WHY the round-10 flat-PQ version lost recall at scale (measured
# 0.9 → 0.1 from N=500 → 20k, EVIDENCE_r10 §5): its codebook was
# seeded by vec_id % 16 — random groups whose means all converge to the
# SUBSPACE MEAN as N grows (spread ~ σ/√(N/16)), so the codebook
# degenerates to 16 near-identical rows and ADC distances stop
# discriminating. Round 11 seeds every codebook GEOMETRICALLY — the
# sign-orthant of the (sub)vector — so code regions are true spatial
# regions whose centroids stay separated at ANY corpus size. Measured
# (tools/ivfpq_recall.py, r11 full sweep): diffuse-tier recall@10 is
# 0.8/0.9/1.0 at N=500, 0.6/0.9/0.9 at N=2 000 and 0.9/0.9/0.8 at
# N=20 000 across corpus seeds {7,11,23} — flat with N, where the
# flat-PQ version collapsed 0.9 → 0.1; real corpora 0.7/1.0/0.9 at
# sf0.001/0.01/0.1; the planted cos-0.9999 near-dup returns at rank 1
# in a 20k corpus. Pinned in tests/test_properties.py::
# test_ivfpq_recall_20k_diffuse (N=20k fixture, floor 0.8, dup at
# rank 1) and ::test_ivfpq_measured_recall_sf001 (real corpus).
#
# Cell count is count-derived through the shared band_bits_ladder
# (cells = 2^b, smallest b in [2,8] with n ≤ 1250·2^b, so the mean cell
# stays ~1250 vectors at test SFs; a production deployment raises the
# cap with the same one-line ladder edit as LSH_MAX_BITS).
#
# Determinism: cell and code identities are SIGN STRINGS ('1011'),
# compared only for equality — the simhash-band pattern — so both
# engines derive identical keys with no bit-weight arithmetic; arg_min /
# min_by on real-valued distances has no exact ties (parity-proven
# argument, r5); the ADC table is quantized to INTEGER micro-units per
# (cell, sub, code) and candidates are ranked by the INTEGER SUM of 16
# table entries — integer addition is order-independent, so Spark's
# partial-agg order cannot flip the top-C cut (the money-sum pattern;
# closes ADVICE r10's round(·,6) boundary-tie lint). The residual float
# sums inside each table entry keep the standard no-exact-ties
# argument, now confined to 4-element sums.

PQ_SUBDIM = 4      # dims per subspace (64 / PQ_SUBDIM = 16 subspaces)
PQ_NSUB = 64 // PQ_SUBDIM
PQ_CANDIDATES = 100   # floor of the count-derived re-rank budget
PQ_CAND_DIV = 25      # C = max(PQ_CANDIDATES, n // PQ_CAND_DIV)
IVF_CELL_TARGET = 1250  # mean vectors per cell the ladder aims for
IVF_CELL_MIN_BITS = 2
IVF_CELL_MAX_BITS = 8   # 256 cells; production raises this cap


def ivf_cell_bits(n: int) -> int:
    return band_bits_ladder(
        n, IVF_CELL_MIN_BITS, IVF_CELL_MAX_BITS, IVF_CELL_TARGET
    )


def ivf_nprobe(bits: int) -> int:
    """Probe 3/4 of the 2^bits cells — the diffuse-tier operating
    point (see module comment); clustered corpora run far lower."""
    return max(1, (3 * (1 << bits)) // 4)


def pq_candidates(n: int) -> int:
    return max(PQ_CANDIDATES, n // PQ_CAND_DIV)


# -- oracle twins ---------------------------------------------------------
_IVFPQ_BITS_SQL = "(" + " ".join(
    ["CASE"]
    + [
        f"WHEN n <= {IVF_CELL_TARGET << b} THEN {b}"
        for b in range(IVF_CELL_MIN_BITS, IVF_CELL_MAX_BITS)
    ]
    + [f"ELSE {IVF_CELL_MAX_BITS} END"]
) + ")"

# sign string over the first IVF_CELL_MAX_BITS dims; the cell key is its
# b-char prefix (equality-only, so a string key is exact)
_CELL_SIGNS_SQL = (
    f"list_aggregate(list_transform(range(1, {IVF_CELL_MAX_BITS + 1}), "
    "i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), "
    "'string_agg', '')"
)

# Index half (bb .. codes): shared verbatim by ivfpq_topk and
# ivfpq_knn_join — ONE oracle source for the trained index, so a
# codebook-rule edit cannot drift the single-query and batched twins.
# ``src`` parameterizes the training corpus (round 14: the incremental
# append twin trains on the history slice); the default renders the
# exact string the r12/r13-verdicted oracles shipped.


def _ivfpq_index_sql(src: str = "embeddings") -> str:
    return f"""
    bb AS (
      SELECT b, n,
             greatest(1, (3 * (1 << b)) // 4) AS np,
             greatest({PQ_CANDIDATES}, n // {PQ_CAND_DIV}) AS cc
      FROM (SELECT {_IVFPQ_BITS_SQL} AS b, n
            FROM (SELECT count(*) AS n FROM {src}))
    ),
    e0 AS (
      SELECT vec_id, label, embedding,
             substr({_CELL_SIGNS_SQL}, 1, (SELECT b FROM bb)) AS cell
      FROM {src}
    ),
    dims AS (
      SELECT vec_id, cell, t.i - 1 AS dim,
             CAST(embedding[t.i] AS DOUBLE) AS x
      FROM e0, unnest(range(1, 65)) AS t(i)
    ),
    cent AS (SELECT cell, dim, avg(x) AS cx FROM dims GROUP BY 1, 2),
    adist AS (
      SELECT d.vec_id, c.cell, sum((d.x - c.cx) * (d.x - c.cx)) AS d2
      FROM dims d JOIN cent c ON d.dim = c.dim
      GROUP BY 1, 2
    ),
    assign AS (SELECT vec_id, arg_min(cell, d2) AS cell FROM adist GROUP BY 1),
    rdims AS (
      SELECT d.vec_id, a.cell, d.dim, d.x - c.cx AS rx
      FROM dims d
      JOIN assign a ON d.vec_id = a.vec_id
      JOIN cent c ON c.cell = a.cell AND c.dim = d.dim
    ),
    pseed AS (
      SELECT vec_id, dim // {PQ_SUBDIM} AS sub,
             string_agg(CASE WHEN rx >= 0 THEN '1' ELSE '0' END,
                        '' ORDER BY dim) AS scode
      FROM rdims GROUP BY 1, 2
    ),
    rsub AS (
      SELECT r.vec_id, r.cell, p.sub, r.dim % {PQ_SUBDIM} AS subdim,
             r.rx, p.scode
      FROM rdims r
      JOIN pseed p ON r.vec_id = p.vec_id AND r.dim // {PQ_SUBDIM} = p.sub
    ),
    cb AS (
      SELECT sub, scode AS code, subdim, avg(rx) AS cx
      FROM rsub GROUP BY 1, 2, 3
    ),
    edist AS (
      SELECT r.vec_id, r.sub, c.code, sum((r.rx - c.cx) * (r.rx - c.cx)) AS d2
      FROM rsub r JOIN cb c ON c.sub = r.sub AND c.subdim = r.subdim
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, sub, arg_min(code, d2) AS code FROM edist GROUP BY 1, 2
    )
"""


_IVFPQ_INDEX_SQL = _ivfpq_index_sql()

# Single-query tail (q .. cand) — ivfpq_topk's probe/ADC/candidate path.
_IVFPQ_SQL = f"""{_IVFPQ_INDEX_SQL},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    qdims AS (
      SELECT t.i - 1 AS dim, CAST(q.qv[t.i] AS DOUBLE) AS qx
      FROM q, unnest(range(1, 65)) AS t(i)
    ),
    qcd AS (
      SELECT c.cell, sum((qd.qx - c.cx) * (qd.qx - c.cx)) AS qd2
      FROM qdims qd JOIN cent c ON qd.dim = c.dim
      GROUP BY 1
    ),
    probe AS (
      SELECT cell FROM (
        SELECT cell, row_number() OVER (ORDER BY qd2, cell) AS rn FROM qcd
      ) t WHERE rn <= (SELECT np FROM bb)
    ),
    qr AS (
      SELECT p.cell, qd.dim // {PQ_SUBDIM} AS sub,
             qd.dim % {PQ_SUBDIM} AS subdim, qd.qx - c.cx AS qrx
      FROM probe p
      JOIN cent c ON c.cell = p.cell
      JOIN qdims qd ON qd.dim = c.dim
    ),
    adc AS (
      SELECT qr.cell, qr.sub, c.code,
             CAST(round(sum((qr.qrx - c.cx) * (qr.qrx - c.cx)) * 1000000)
                  AS BIGINT) AS qd2u
      FROM qr JOIN cb c ON c.sub = qr.sub AND c.subdim = qr.subdim
      GROUP BY 1, 2, 3
    ),
    approx AS (
      SELECT k.vec_id, sum(a.qd2u) AS ad2u
      FROM codes k
      JOIN assign s ON s.vec_id = k.vec_id
      JOIN adc a ON a.cell = s.cell AND a.sub = k.sub AND a.code = k.code
      WHERE k.vec_id <> {QUERY_VEC_ID}
      GROUP BY 1
    ),
    cand AS (
      SELECT vec_id, ad2u FROM (
        SELECT vec_id, ad2u,
               row_number() OVER (ORDER BY ad2u, vec_id) AS rn
        FROM approx
      ) t WHERE rn <= (SELECT cc FROM bb)
    )
"""


def _sign_str(col: Column, start: int, width: int) -> Column:
    """Sign-orthant string over ``width`` dims from ``start`` — the
    equality-only cell/code key both engines derive identically."""
    return F.concat(
        *[
            F.when(col.getItem(start + i) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(width)
        ]
    )


def _d2_fold(a, b) -> Column:
    # Σ(a_i−b_i)² as a sequential zip_with fold: one ROW per
    # (vector, candidate) instead of one row per DIMENSION — the
    # r11 sf10 probe killed the dim-exploded join+agg formulation
    # (n×64×k rows ≈ 3.3e9 at n=200k, k=256); the fold does the
    # same arithmetic on n×k rows. Distances feed only argmin /
    # ordering, so the fold-vs-agg summation-order difference is
    # covered by the standing no-exact-ties argument.
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cb_arr(cb: DataFrame) -> DataFrame:
    """Residual codebook as per-(sub, code) 4-dim arrays (≤ 256 rows)
    — the broadcastable shape every encode/ADC consumer folds against."""
    return cb.groupBy("sub", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subdim", "cx"))),
            lambda s: s.cx,
        ).alias("cvec4")
    )


def _assign_cells(
    ev: DataFrame, cent_arr: DataFrame, residual: bool = False
) -> DataFrame:
    """Nearest-centroid assignment as an Arrow-batched BLAS matmul
    (r16). The r15 in-row ``array_min(transform(...))`` fold kept the
    argmin inside the row (no n×k row explosion — the r14 fix), but
    it ran n·k·d multiply-adds through the EXPRESSION INTERPRETER
    (HOF lambdas don't codegen), and k grows with n: at sf10
    (n=200k, k=256) the fold alone was 30.7 s of ivfpq_topk's 44.5 s
    wall — the probe's worst remaining ratio (6.40). One B×d @ d×k
    matmul per Arrow batch does the identical argmin in vectorized
    BLAS — the same rework that fixed semdedup in r15.

    ``residual=True`` (r17 optimization) additionally emits
    ``rvec = v − C[cell]`` from the SAME batch pass — the residual the
    PQ encode path needs. Computing it here removes the two
    corpus-wide ``ev ⋈ assign`` joins (plus their broadcast-centroid
    residual joins) the encode path previously paid: at 100 TB those
    joins shuffled the raw vectors by vec_id twice (guide §2.4 —
    remove shuffles outright; §2.3 — the heavy payload moves zero
    times instead of twice). The subtraction is the same IEEE double
    ``x − c`` the zip_with expression computed, on the same operands,
    so every downstream value is bit-identical.

    Semantics: ‖v‖² is constant per row, so ranking by −2·v·C + ‖c‖²
    equals ranking by d2; np.argmin's first-minimum over cell-sorted
    columns IS the (min d2, lowest cell) tie-break of the old struct
    min; the BLAS-vs-fold float summation order is the standing
    no-exact-ties argument (same class as the oracle's own sum order,
    oracle: arg_min(cell, d2)). The ≤ 2^bits centroid rows are pulled
    at plan-BUILD time (a dim-table pull — the semdedup-documented
    eager-collect pattern) and ship via bounded_broadcast (one live
    block per site). ``cell`` keeps the caller's type (bigint for the
    plain-IVF seed cells, string for the sign-orthant ivfpq cells)."""
    import numpy as np

    from ..session import bounded_broadcast

    cell_dt = cent_arr.schema["cell"].dataType.simpleString()
    rows = sorted(cent_arr.collect(), key=lambda r: r["cell"])
    C = np.array([r["cvec"] for r in rows], dtype=np.float64)
    if cell_dt == "string":
        ids = np.array([r["cell"] for r in rows], dtype=object)
    else:
        ids = np.array([r["cell"] for r in rows], dtype=np.int64)
    bc = bounded_broadcast(
        ev.sparkSession, "vectorq._assign_cells.centroids", (C, ids)
    )

    def assign_arrow(batches):
        # mapInArrow, not mapInPandas (r17, guide §4.2): the vector
        # column arrives as ONE contiguous Arrow values buffer —
        # np.frombuffer + reshape replaces the former per-row
        # np.stack(object array), and the residual goes back out as a
        # ListArray built from the flat (n·d) buffer + an offsets
        # array instead of n per-row Python objects. Measured at sf10
        # (200k×64): the pandas-object boundary dominated the pass.
        import pyarrow as pa

        Cm, ida = bc.value
        cn = (Cm * Cm).sum(axis=1)  # ‖c‖² per centroid
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            vcol = rb.column(rb.schema.get_field_index("v"))
            flat = vcol.flatten()
            if len(flat) != n * Cm.shape[1]:
                raise ValueError("ragged embedding batch")  # fail loud
            V = np.asarray(flat, dtype=np.float64).reshape(
                n, Cm.shape[1]
            )
            S = -2.0 * (V @ Cm.T) + cn  # rank-equal to d2 per row
            amin = S.argmin(axis=1)
            cols = [
                rb.column(rb.schema.get_field_index("vec_id")),
                pa.array(ida[amin]),
            ]
            names = ["vec_id", "cell"]
            if residual:
                R = V - Cm[amin]  # same x−c as the zip_with it replaced
                if n * Cm.shape[1] >= 2**31:  # ADVICE r17: int32
                    # ListArray offsets would wrap silently if the
                    # session's arrow batch cap were ever raised
                    raise ValueError(
                        "batch too large for int32 list offsets"
                    )
                cols.append(
                    pa.ListArray.from_arrays(
                        pa.array(
                            np.arange(n + 1, dtype=np.int32)
                            * Cm.shape[1]
                        ),
                        pa.array(R.ravel(), type=pa.float64()),
                    )
                )
                names.append("rvec")
            yield pa.RecordBatch.from_arrays(cols, names)

    schema = f"vec_id long, cell {cell_dt}"
    if residual:
        schema += ", rvec array<double>"
    return ev.mapInArrow(assign_arrow, schema)


def _ivfpq_encode(
    ev: DataFrame,
    cent_arr: DataFrame,
    cb_arr: DataFrame,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Encode vectors against a FROZEN index — the ONE implementation
    of the IVF-PQ encode rule (nearest-centroid assign → residual →
    4-dim subspace slices → broadcast-codebook argmin), shared by
    :func:`_ivfpq_index` (encoding the training corpus itself) and
    ``ivfpq_index_append`` (encoding a NEW batch with centroids and
    codebooks frozen — the incremental-ingest shape). ``ev`` is
    (vec_id, v: array<double>); pass ``assign`` to reuse a
    precomputed (vec_id, cell, rvec) assignment+residual frame.
    Returns (vec_id, cell, sub, code).

    r17 optimization (guide §2.3/§2.4): the residual now comes out of
    the SAME Arrow/BLAS pass as the cell assignment
    (_assign_cells(residual=True)) instead of an ``ev ⋈ assign`` join
    followed by a broadcast-centroid zip_with — the joins that, at
    100 TB, shuffled the raw vectors by vec_id for no reason the
    batch pass couldn't serve. Encoding N vectors is now genuinely
    join-free on the corpus side: one narrow Python pass, one
    broadcast of the ≤16-row packed codebook. The code pick stays an
    in-row array_min over the broadcast packed codebook (n·16·16·4
    ops — the code count is FIXED at 16, so it scales with the scan;
    the r15 rewrite that removed the old n×k and n×256 join+shuffle
    stages)."""
    if assign is None:
        assign = _assign_cells(ev, cent_arr, residual=True)
    rv = F.col("rvec")
    rsv = assign.select(
        "vec_id",
        "cell",
        F.posexplode(
            F.array(
                *[
                    F.slice(rv, s * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for s in range(PQ_NSUB)
                ]
            )
        ).alias("sub", "rv4"),
    )
    # encode: the ≤16 codes of each subspace packed into ONE row per
    # sub (16 rows total, broadcast); each of the n×16 subvector rows
    # picks its code with an in-row array_min over ≤16 4-dim d2 folds
    # — same arithmetic as the old join + min_by, no n×256 rows and
    # no groupBy shuffle (tie order: min d2 then min code, no-exact-
    # ties argument as everywhere)
    cbk = cb_arr.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("code", "cvec4"))).alias("cbk")
    )
    pick = F.array_min(
        F.transform(
            "cbk",
            lambda c: F.struct(
                _d2_fold(F.col("rv4"), c["cvec4"]).alias("d2"),
                c["code"].alias("code"),
            ),
        )
    )
    return rsv.join(F.broadcast(cbk), "sub").select(
        "vec_id", "cell", "sub", pick["code"].alias("code")
    )


def _ivfpq_index(
    emb: DataFrame, bits: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the IVF-PQ index — ONE implementation shared by
    ivfpq_topk and ivfpq_knn_join (round 12; SQL twin
    ``_IVFPQ_INDEX_SQL``). Returns (cent_arr, cb, codes):

    - ``cent_arr`` (cell, cvec): coarse centroids as arrays, ≤ 2^bits
      rows — sign-orthant seeded, one Lloyd half-step;
    - ``cb`` (sub, code, subdim, cx): the residual PQ codebook,
      ≤ 16×16×4 values, sign-orthant seeded per subspace;
    - ``codes`` (vec_id, cell, sub, code): the 8-byte-per-vector code
      index — at 100 TB this is the PERSISTED artifact, written
      bucketed by cell so a probe is a partition-pruned scan.

    Training is two narrow dim-exploded aggs (cells, then residual
    codebook) + ONE Arrow/BLAS assign+residual pass (r17 — the encode
    path no longer joins the raw vectors against the assignment); the
    raw vectors never shuffle and are scanned exactly once past the
    centroid agg. Both consumers' plans are asserted in test_plans."""
    e = F.col("embedding")
    e0 = emb.select("vec_id", "embedding", _sign_str(e, 0, bits).alias("cell"))
    dims = e0.select(
        "vec_id", "cell", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "cell", "dim", F.col("x").cast("double").alias("x"))
    # centroid training: one narrow dim-exploded agg (n×64 rows, no
    # join). The ≤2^bits centroid-array rows are COLLECTED once here
    # (they are collected anyway — _assign_cells needs the contiguous
    # matrix for the BLAS argmin) and re-issued as a LOCAL relation:
    # r17 replaces the former localCheckpoint-then-collect pair (two
    # barrier jobs) with one job, and every query-side consumer (probe
    # ranking, query residuals) now broadcasts a driver-local table
    # with zero recompute — at deployment the coarse quantizer is
    # trained once and persisted, which this mirrors.
    cent_arr_plan = (
        dims.groupBy("cell", "dim")
        .agg(F.avg("x").alias("cx"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cx"))),
                lambda s: s.cx,
            ).alias("cvec")
        )
    )
    cent_rows = cent_arr_plan.collect()
    cent_arr = emb.sparkSession.createDataFrame(
        cent_rows, cent_arr_plan.schema
    )
    ev = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # nearest-centroid assignment + residual out of ONE Arrow/BLAS
    # pass (r17): no n×k rows, no shuffle — and no ev ⋈ assign join to
    # rebuild the residual (it previously shuffled the raw vectors by
    # vec_id twice once the assignment outgrew the broadcast ceiling —
    # guide §2.4). Columnar persist, not localCheckpoint: the rvec
    # payload stays compressed batches (the repeated_ngram_spans r16
    # lesson) and the eager cb checkpoint below materializes it for the
    # codes consumer. (A no-cache recompute variant was measured 2×
    # slower at sf10 — the pass is transfer-bound, not compute-bound,
    # so paying it twice loses.)
    from ..session import bounded_persist

    assign = bounded_persist(
        "vectorq._ivfpq_index.assign",
        _assign_cells(ev, cent_arr, residual=True),
    )
    rv = F.col("rvec")
    rsv = assign.select(
        "vec_id",
        "cell",
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        F.slice(rv, s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("rv4"),
                        _sign_str(rv, s * PQ_SUBDIM, PQ_SUBDIM).alias("scode"),
                    )
                    for s in range(PQ_NSUB)
                ]
            )
        ).alias("sub", "sc"),
    ).select("vec_id", "cell", "sub", F.col("sc.rv4").alias("rv4"),
             F.col("sc.scode").alias("scode"))
    # residual codebook: ≤ 16 subs × 16 codes × 4 dims = 1 024 values;
    # trained by ONE narrow agg over the subdim-exploded residuals,
    # checkpointed so encode and ADC train it exactly once
    cb = (
        rsv.select("sub", "scode", F.posexplode("rv4").alias("subdim", "rx"))
        .groupBy("sub", F.col("scode").alias("code"), "subdim")
        .agg(F.avg("rx").alias("cx"))
        .localCheckpoint(eager=True)
    )
    # final encode of the training corpus itself: the SAME frozen-index
    # encode rule the incremental append applies to new batches
    # (_ivfpq_encode — single-sourced in r14), reusing the cached
    # assignment+residual so neither the argmin nor the subtraction is
    # recomputed and the raw vectors are never joined against
    codes = _ivfpq_encode(ev, cent_arr, _cb_arr(cb), assign=assign)
    return cent_arr, cb, codes


@register(
    "ivfpq_topk",
    oracle=f"""
    WITH {_IVFPQ_SQL}
    SELECT cand.vec_id, e.label,
           round(cand.ad2u / 1000000.0, 4) AS pq_d2,
           round({_DOT_SQL.format(a="e.embedding", b="q.qv")}
                 / ({_NORM_SQL.format(a="e.embedding")}
                    * {_NORM_SQL.format(a="q.qv")}), 4) AS cosine
    FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id, q
    ORDER BY cosine DESC, cand.vec_id LIMIT 10
    """,
    tags=("vector", "ann", "ivfpq", "quantization", "residual", "topk"),
)
def ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: count-derived coarse cells (sign-orthant seeded
    centroids, one Lloyd half-step), residual product quantization into
    16 sign-orthant-seeded 4-dim codebooks, nprobe cell pruning, a
    broadcast integer-micro-unit ADC table over the probed cells, and
    an exact-cosine re-rank of the count-derived top-C.

    Plan shape (asserted in test_plans): centroids (≤ 256×64 rows),
    codebooks (≤ 1 024 rows), the probe list (nprobe rows) and the ADC
    table (≤ nprobe×16×16 rows) all broadcast; the corpus flows
    through narrow passes (cell assign, residual encode, code scan)
    and never shuffles against anything wider than vec_id. At 100 TB
    assign+codes are the persisted index (written bucketed by cell, so
    the probe is a partition-pruned scan of the 8-byte codes); the
    re-rank touches raw vectors for C rows only. See the module
    comment for the measured recall ladder and the diffuse-tier nprobe
    trade.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bits = ivf_cell_bits(n)
    nprobe = ivf_nprobe(bits)
    cand_c = pq_candidates(n)
    cent_arr, cb, codes = _ivfpq_index(emb, bits)

    # query side: rank cells by centroid distance, probe the nearest
    # nprobe, build the integer-micro-unit ADC table for those cells
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    probe = (
        cent_arr.join(F.broadcast(q))
        .select(
            "cell", "cvec", _d2_fold(F.col("qv"), F.col("cvec")).alias("qd2")
        )
        .orderBy("qd2", "cell")
        .limit(nprobe)
    )
    qr = probe.join(F.broadcast(q)).select(
        "cell",
        F.posexplode(
            F.zip_with("qv", "cvec", lambda x, c: x - c)
        ).alias("dim", "qrx"),
    ).select(
        "cell",
        F.expr(f"dim div {PQ_SUBDIM}").alias("sub"),
        (F.col("dim") % PQ_SUBDIM).alias("subdim"),
        "qrx",
    )
    adc = (
        qr.join(F.broadcast(cb), ["sub", "subdim"])
        .groupBy("cell", "sub", "code")
        .agg(
            F.round(
                F.sum(
                    (F.col("qrx") - F.col("cx")) * (F.col("qrx") - F.col("cx"))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("qd2u")
        )
    )
    approx = (
        codes.join(F.broadcast(adc), ["cell", "sub", "code"])
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .groupBy("vec_id")
        .agg(F.sum("qd2u").alias("ad2u"))
    )
    cand = approx.orderBy("ad2u", "vec_id").limit(cand_c)
    cosine = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (norm(F.col("embedding")) * norm(F.col("qv"))),
        4,
    )
    return (
        # the C-row candidate set broadcasts into the re-rank: the raw
        # vectors are touched by one hash-probe scan, never shuffled
        emb.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(F.col("ad2u") / 1_000_000.0, 4).alias("pq_d2"),
            cosine.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


# --- Batched IVF-PQ k-NN join (round 12, VERDICT r11 task 3) -----------------
#
# The production retrieval shape at 100 TB: MANY queries probing the
# cell-bucketed code index at once — the retrieval side of hard-negative
# mining, semantic dedup against a seed set, and RAG-style corpus
# lookup. ivfpq_topk serves one query vector; brute-force knn_join_topk
# scores every (query, corpus) pair. This operator joins the two: the
# SAME trained index (_ivfpq_index / _IVFPQ_INDEX_SQL — one source), a
# per-query probe list, ONE stacked integer ADC table for all (query,
# cell) pairs, and a single scan of the codes that meets each code row
# only with the queries probing its cell.

IVFPQ_JOIN_K = 10  # per-query neighbors (recall@10 is the pinned metric)


@register(
    "ivfpq_knn_join",
    oracle=f"""
    WITH {_IVFPQ_INDEX_SQL},
    qs AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id % 100 = 7
    ),
    qdims AS (
      SELECT q.query_id, t.i - 1 AS dim, CAST(q.qv[t.i] AS DOUBLE) AS qx
      FROM qs q, unnest(range(1, 65)) AS t(i)
    ),
    qcd AS (
      SELECT qd.query_id, c.cell,
             sum((qd.qx - c.cx) * (qd.qx - c.cx)) AS qd2
      FROM qdims qd JOIN cent c ON qd.dim = c.dim
      GROUP BY 1, 2
    ),
    probe AS (
      SELECT query_id, cell FROM (
        SELECT query_id, cell, row_number() OVER (
          PARTITION BY query_id ORDER BY qd2, cell) AS rn
        FROM qcd
      ) t WHERE rn <= (SELECT np FROM bb)
    ),
    qr AS (
      SELECT p.query_id, p.cell, qd.dim // {PQ_SUBDIM} AS sub,
             qd.dim % {PQ_SUBDIM} AS subdim, qd.qx - c.cx AS qrx
      FROM probe p
      JOIN cent c ON c.cell = p.cell
      JOIN qdims qd ON qd.dim = c.dim AND qd.query_id = p.query_id
    ),
    adc AS (
      SELECT qr.query_id, qr.cell, qr.sub, c.code,
             CAST(round(sum((qr.qrx - c.cx) * (qr.qrx - c.cx)) * 1000000)
                  AS BIGINT) AS qd2u
      FROM qr JOIN cb c ON c.sub = qr.sub AND c.subdim = qr.subdim
      GROUP BY 1, 2, 3, 4
    ),
    approx AS (
      SELECT a.query_id, k.vec_id, sum(a.qd2u) AS ad2u
      FROM codes k
      JOIN assign s ON s.vec_id = k.vec_id
      JOIN adc a ON a.cell = s.cell AND a.sub = k.sub AND a.code = k.code
      WHERE k.vec_id % 100 <> 7
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT query_id, vec_id, ad2u FROM (
        SELECT query_id, vec_id, ad2u, row_number() OVER (
          PARTITION BY query_id ORDER BY ad2u, vec_id) AS rn
        FROM approx
      ) t WHERE rn <= (SELECT cc FROM bb)
    ),
    rer AS (
      SELECT c.query_id, c.vec_id, e.label,
             round(c.ad2u / 1000000.0, 4) AS pq_d2,
             round({_DOT_SQL.format(a="e.embedding", b="q.qv")}
                   / ({_NORM_SQL.format(a="e.embedding")}
                      * {_NORM_SQL.format(a="q.qv")}), 4) AS cosine
      FROM cand c
      JOIN embeddings e ON c.vec_id = e.vec_id
      JOIN qs q ON q.query_id = c.query_id
    )
    SELECT query_id, vec_id, label, pq_d2, cosine,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
      FROM rer
    ) t WHERE rank <= {IVFPQ_JOIN_K}
    """,
    tags=("vector", "ann", "ivfpq", "knn", "join", "batched", "topk"),
)
def ivfpq_knn_join(
    spark: SparkSession, sf_dir: str, *, adc_chunks: int = 1
) -> DataFrame:
    """Batched IVF-PQ k-NN JOIN: top-10 approximate cosine
    neighbors for EVERY query in the block (vec_id % 100 == 7 — the
    same query set as the exact brute-force knn_join_topk), served from
    the shared IVF-PQ index instead of an all-pairs scan. Recall@10 vs
    the exact per-query top-10 is pinned in tests/test_properties.py:
    mean 0.90 over the 200 queries of the N=20k diffuse fixture (floor
    0.8), 0.8 on the sf0.01 real corpus (floor 0.7, 5 queries — small-
    sample variance); misses sit in unprobed cells (measured: raising C
    does not move recall), i.e. the honest nprobe coverage trade.

    Plan shape (asserted in test_plans): the index is trained once by
    :func:`_ivfpq_index` (at 100 TB it's the persisted cell-bucketed
    code table — see that docstring); the Q-row query block cross-joins
    the BROADCAST ≤2^bits-row centroid table to rank cells (the one
    allowlisted BroadcastNestedLoopJoin — a Q×cells scalar product),
    one window cuts per-query probe lists, and ALL (query, cell) ADC
    entries land in ONE stacked integer table (Q × nprobe × 16 × 16
    rows) that BROADCASTS into a SINGLE scan of the codes: each 8-byte
    code row hash-joins only the queries probing its cell — the corpus
    is never shuffled and never scanned per query. Per-query cuts are
    windows over (query_id, ad2u|cosine, vec_id) on the candidate set
    (Q × C rows), so the only q-keyed shuffles carry candidates, not
    the corpus. Brute-force scoring is O(N·Q·d); this reads N 8-byte
    code rows once + re-ranks Q·C raw vectors.

    For very large Q the stacked ADC table outgrows a single broadcast
    (Q × nprobe × 256 rows): ``adc_chunks > 1`` bounds it by splitting
    the materialized ADC table into ``query_id % adc_chunks`` blocks
    and scanning the code index once PER BLOCK (each scan broadcasts
    only its block), trading scans for broadcast ceiling — per-query
    results are independent, so the union is exactly the unchunked
    answer (equality-tested in test_properties). The default (1) keeps
    the single-scan plan; the driver/bench path never chunks at tested
    SFs.

    Determinism: candidate cuts on integer (ad2u, vec_id), final rank
    on (round-4 cosine, vec_id) — the knn_join_topk pattern; the ADC
    integer-micro-unit sum is order-independent (money-sum pattern);
    chunking only partitions the broadcast side of the code-index
    join, so it cannot re-order any tie-break.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bits = ivf_cell_bits(n)
    nprobe = ivf_nprobe(bits)
    cand_c = pq_candidates(n)
    cent_arr, cb, codes = _ivfpq_index(emb, bits)

    qs = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    # per-query cell ranking: Q × ≤2^bits rows through a broadcast
    qcd = qs.crossJoin(F.broadcast(cent_arr)).select(
        "query_id",
        "cell",
        "cvec",
        "qv",
        _d2_fold(F.col("qv"), F.col("cvec")).alias("qd2"),
    )
    wp = Window.partitionBy("query_id").orderBy("qd2", "cell")
    probe = (
        qcd.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "cell", "qv", "cvec")
    )
    # stacked per-(query, cell) residuals -> ONE integer ADC table
    qr = probe.select(
        "query_id",
        "cell",
        F.posexplode(
            F.zip_with("qv", "cvec", lambda x, c: x - c)
        ).alias("dim", "qrx"),
    ).select(
        "query_id",
        "cell",
        F.expr(f"dim div {PQ_SUBDIM}").alias("sub"),
        (F.col("dim") % PQ_SUBDIM).alias("subdim"),
        "qrx",
    )
    adc = (
        qr.join(F.broadcast(cb), ["sub", "subdim"])
        .groupBy("query_id", "cell", "sub", "code")
        .agg(
            F.round(
                F.sum(
                    (F.col("qrx") - F.col("cx")) * (F.col("qrx") - F.col("cx"))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("qd2u")
        )
    )
    # ONE pass over the code index: each code row meets only the
    # queries probing its cell (broadcast hash join on cell/sub/code).
    # Chunked path (very large Q): materialize the stacked ADC table
    # and the corpus codes once, then scan the codes once per
    # query-block with only that block's ADC rows broadcast — the
    # broadcast ceiling becomes Q/adc_chunks × nprobe × 256 rows.
    corpus_codes = codes.filter(F.col("vec_id") % 100 != 7)
    if adc_chunks > 1:
        from functools import reduce

        adc = adc.localCheckpoint(eager=True)
        corpus_codes = corpus_codes.localCheckpoint(eager=True)
        joined = reduce(
            DataFrame.unionByName,
            [
                corpus_codes.join(
                    F.broadcast(
                        adc.filter(F.col("query_id") % adc_chunks == i)
                    ),
                    ["cell", "sub", "code"],
                )
                for i in range(adc_chunks)
            ],
        )
    else:
        joined = corpus_codes.join(F.broadcast(adc), ["cell", "sub", "code"])
    approx = joined.groupBy("query_id", "vec_id").agg(
        F.sum("qd2u").alias("ad2u")
    )
    wc = Window.partitionBy("query_id").orderBy("ad2u", "vec_id")
    cand = (
        approx.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= cand_c)
        .select("query_id", "vec_id", "ad2u")
    )
    # exact re-rank: the Q×C candidate set broadcasts into one
    # hash-probe scan of the raw vectors; norms cost one fold per side
    qn = qs.select("query_id", "qv", norm(F.col("qv")).alias("nq"))
    cosine = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (norm(F.col("embedding")) * F.col("nq")),
        4,
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        emb.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(F.col("ad2u") / 1_000_000.0, 4).alias("pq_d2"),
            cosine.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= IVFPQ_JOIN_K)
    )


# --- Incremental IVF-PQ index maintenance (round 14, VERDICT r13 task 7) -----
#
# The missing LLM-pipeline shape: at 100 TB you never retrain the ANN
# index on the full corpus per ingest — new embedding batches are
# assigned to the EXISTING trained index (centroids + codebooks
# FROZEN, codes appended), exactly as incremental_dedup_newbatch never
# reshuffles the historical band index. Reference parity note: the
# reference has no ANN at all (its nearest analogue is the pandas
# batch scoring in jobs/batch_layer); this operator is part of the
# beyond-reference training-data-pipeline brief.

# the appended-batch fingerprint packs (vec_id mod _FP_MOD, sub,
# code_val) injectively per row — sub*16 + code_val < 256 — while
# keeping the per-cell integer sum far from BIGINT range at any corpus
# size (≤ 2.6e8 per row → ~3.6e10 rows of headroom)
_FP_MOD = 1_000_003

# integer value of the 4-char '0'/'1' PQ code string (DuckDB has no
# conv(); Spark side uses F.conv(code, 2, 10))
_CODE_VAL_SQL = "(" + " + ".join(
    f"{1 << (PQ_SUBDIM - 1 - i)} * "
    f"CASE WHEN substr(code, {i + 1}, 1) = '1' THEN 1 ELSE 0 END"
    for i in range(PQ_SUBDIM)
) + ")"


@register(
    "ivfpq_index_append",
    oracle=f"""
    WITH hist AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 3),
    {_ivfpq_index_sql(src="hist")},
    newb AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 3
    ),
    ndims AS (
      SELECT vec_id, t.i - 1 AS dim, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM newb, unnest(range(1, 65)) AS t(i)
    ),
    nad AS (
      SELECT d.vec_id, c.cell, sum((d.x - c.cx) * (d.x - c.cx)) AS d2
      FROM ndims d JOIN cent c ON d.dim = c.dim
      GROUP BY 1, 2
    ),
    nassign AS (SELECT vec_id, arg_min(cell, d2) AS cell FROM nad GROUP BY 1),
    nrsub AS (
      SELECT d.vec_id, a.cell, d.dim // {PQ_SUBDIM} AS sub,
             d.dim % {PQ_SUBDIM} AS subdim, d.x - c.cx AS rx
      FROM ndims d
      JOIN nassign a ON a.vec_id = d.vec_id
      JOIN cent c ON c.cell = a.cell AND c.dim = d.dim
    ),
    nedist AS (
      SELECT r.vec_id, r.cell, r.sub, c.code,
             sum((r.rx - c.cx) * (r.rx - c.cx)) AS d2
      FROM nrsub r JOIN cb c ON c.sub = r.sub AND c.subdim = r.subdim
      GROUP BY 1, 2, 3, 4
    ),
    ncodes AS (
      SELECT vec_id, cell, sub, arg_min(code, d2) AS code
      FROM nedist GROUP BY 1, 2, 3
    ),
    hc AS (SELECT cell, count(*) AS n_hist FROM assign GROUP BY 1),
    na AS (
      SELECT cell,
             count(CASE WHEN sub = 0 THEN 1 END) AS n_new,
             sum((vec_id % {_FP_MOD}) * 256 + sub * {1 << PQ_SUBDIM}
                 + {_CODE_VAL_SQL}) AS code_fp
      FROM ncodes GROUP BY 1
    )
    SELECT coalesce(hc.cell, na.cell) AS cell,
           CAST(coalesce(hc.n_hist, 0) AS BIGINT) AS n_hist,
           CAST(coalesce(na.n_new, 0) AS BIGINT) AS n_new,
           CAST(coalesce(na.code_fp, 0) AS BIGINT) AS code_fp
    FROM hc FULL JOIN na ON hc.cell = na.cell
    ORDER BY 1
    """,
    tags=("vector", "ann", "ivfpq", "incremental", "index", "append"),
)
def ivfpq_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF-PQ index maintenance: assign a NEW embedding
    batch (vec_id % 10 == 3, ~10% of the corpus — the daily-ingest
    stand-in) to the index trained on the HISTORY slice alone, with
    centroids and codebooks FROZEN; only new code rows are produced.
    Output: per cell, the history occupancy, the appended count, and a
    deterministic integer fingerprint of every appended (vec_id, sub,
    code) assignment — so the oracle cross-checks each appended code,
    not just counts.

    The incremental-ingest contract (mirrors
    incremental_dedup_newbatch): the history CODE TABLE is never
    shuffled and never joined against — appending N vectors touches
    history only through one partial-aggregated per-cell COUNT (≤2^bits
    partial rows per task), and the new-batch encode is
    :func:`_ivfpq_encode` — the SAME single-sourced encode rule the
    initial build uses — whose every join BROADCASTS index-sized
    tables (≤2^bits centroids, ≤256 codebook rows) into narrow scans
    of the batch. Plan-asserted in test_plans: no SortMergeJoin, no
    shuffle of either corpus slice besides the count partials and the
    batch's own min_by aggregations. Recall served from the combined
    (history + appended) codes vs a full retrain is pinned in
    test_properties.

    At 100 TB: centroids/codebooks are the persisted artifacts of ONE
    training run (at deployment: loaded, not retrained per ingest —
    here history training stands in); appended codes are written as new
    cell-bucketed files next to the history codes, so probes stay
    partition-pruned scans and ingest cost is O(batch), independent of
    corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    hist = emb.filter(F.col("vec_id") % 10 != 3)
    newb = emb.filter(F.col("vec_id") % 10 == 3)
    bits = ivf_cell_bits(hist.count())
    cent_arr, cb, codes = _ivfpq_index(hist, bits)

    nev = newb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    ncodes = _ivfpq_encode(nev, cent_arr, _cb_arr(cb))

    # history occupancy: one row per (vec, sub) in codes — the sub=0
    # slice counts vectors without a distinct-agg (partial-aggregated,
    # ≤2^bits rows out per task)
    hc = (
        codes.filter(F.col("sub") == 0)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_hist"))
    )
    code_val = F.conv("code", 2, 10).cast("long")
    na = ncodes.groupBy("cell").agg(
        F.count(F.when(F.col("sub") == 0, 1)).alias("n_new"),
        F.sum(
            (F.col("vec_id") % _FP_MOD) * 256
            + F.col("sub") * (1 << PQ_SUBDIM)
            + code_val
        ).alias("code_fp"),
    )
    # union + re-agg instead of a FULL OUTER join: a frozen cell can
    # hold zero history members after Lloyd reassignment yet still
    # attract new vectors, and Spark cannot broadcast a full outer —
    # the union keeps the combine join-free (≤ 2×2^bits rows total)
    return (
        hc.select(
            "cell",
            F.col("n_hist").cast("long").alias("n_hist"),
            F.lit(0).cast("long").alias("n_new"),
            F.lit(0).cast("long").alias("code_fp"),
        )
        .unionByName(
            na.select(
                "cell",
                F.lit(0).cast("long").alias("n_hist"),
                F.col("n_new").cast("long").alias("n_new"),
                F.col("code_fp").cast("long").alias("code_fp"),
            )
        )
        .groupBy("cell")
        .agg(
            F.sum("n_hist").alias("n_hist"),
            F.sum("n_new").alias("n_new"),
            F.sum("code_fp").alias("code_fp"),
        )
        .orderBy("cell")
    )
