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
    "bb AS (SELECT " + _BITS_SQL
    + " AS bits FROM (SELECT count(*) AS n FROM embeddings))"
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
    WHERE cosine >= {NEAR_DUP_THRESHOLD!r}
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
    At 100 TB: persist the banded table, bucket it by band key on write,
    and add bands to raise recall at linear (not quadratic) cost.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    # width from a cheap count (row-group stats), same integer ladder
    # as the oracle's bb CTE — see lsh_band_bits
    bits = lsh_band_bits(emb.count())

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
    ).persist()

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
        p = a.join(b, "bk").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", "ea", "eb", "na", "nb"
        )
        cand = p if cand is None else cand.unionByName(p)

    deduped = cand.dropDuplicates(["id_a", "id_b"])
    cosine = F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4)
    return (
        deduped.select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_THRESHOLD)
        .orderBy(F.desc("cosine"), "id_a", "id_b")
    )


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
    k×d doubles → broadcast; assignment is one narrow pass over the
    corpus (posexplode + broadcast join + min_by); the probe reads ~1/k
    of the rows. On a real deployment the assignment is written back
    partitioned by cell so probes are partition-pruned scans, and k
    grows to √N cells with an nprobe>1 multi-cell probe for recall.
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
    dist = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "c")
        .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("d2"))
    )
    assign = dist.groupBy("vec_id").agg(F.min_by("c", "d2").alias("cell"))
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
            >= {NEAR_DUP_THRESHOLD!r}
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
    """Near-dup clusters: embedding_near_dup pairs → connected
    components (operators.components, iterative min-label propagation);
    each component's min vec_id is the canonical keeper a dedup pipeline
    retains. The oracle replays the fixpoint with a recursive CTE —
    DuckDB's own iteration — over the identical pair generation.
    """
    pairs = embedding_near_dup(spark, sf_dir).select("id_a", "id_b")
    from ..operators.components import connected_components

    return connected_components(pairs, src="id_a", dst="id_b")


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
    dist = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "c")
        .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("d2"))
    )
    assign = dist.groupBy("vec_id").agg(F.min_by("c", "d2").alias("cell"))
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
    - the within-cell pair join is capped by SEMDEDUP_SPLIT_WIDTH
      rank-contiguous sub-cells (see the constant's comment) so one
      skewed cell can no longer go quadratic.
    """
    from pyspark.sql.window import Window

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
    # k rows → 1 row of k (cell, centroid-array) structs; the crossJoin
    # is the allowlisted broadcast-1-row pattern (PLAN_AUDIT.md).
    cent_arrays = cent.groupBy("c").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cx"))),
            lambda s: s["cx"],
        ).alias("cvec")
    )
    cents_one = cent_arrays.agg(
        F.array_sort(F.collect_list(F.struct("c", "cvec"))).alias("cents")
    )

    def d2_to(s):
        return F.aggregate(
            F.zip_with("v", s["cvec"], lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )

    assign = vecs.crossJoin(F.broadcast(cents_one)).select(
        "vec_id",
        "v",
        F.array_sort(
            F.transform(
                "cents",
                lambda s: F.struct(d2_to(s).alias("d2"), s["c"].alias("c")),
            )
        )[0]["c"].alias("cell"),
    )
    sub = F.expr(f"(rn - 1) div {SEMDEDUP_SPLIT_WIDTH}")
    # materialize ONCE: e feeds both sides of the pair self-join AND the
    # per-cell member count — without the checkpoint each branch re-runs
    # the whole centroid+argmin chain (measured 9.1 -> ~6 s at sf1)
    e = (
        assign.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cell").orderBy("vec_id")
            ),
        )
        .select(
            "vec_id",
            "cell",
            sub.alias("sub"),
            "v",
            norm(F.col("v")).alias("nrm"),
        )
        .localCheckpoint(eager=True)
    )
    x = e.select(
        F.col("cell"),
        F.col("sub"),
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("ea"),
        F.col("nrm").alias("na"),
    )
    y = e.select(
        F.col("cell"),
        F.col("sub"),
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4
    )
    pairs = (
        x.join(y, ["cell", "sub"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= NEAR_DUP_THRESHOLD)
        .select("cell", "id_a", "id_b")
    )
    cells = e.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    p = pairs.groupBy("cell").agg(
        F.count(F.lit(1)).alias("dp"),
        F.countDistinct("id_b").alias("dr"),
    )
    return cells.join(p, "cell", "left").select(
        "cell",
        "n_members",
        F.coalesce("dp", F.lit(0)).cast("bigint").alias("n_dup_pairs"),
        F.coalesce("dr", F.lit(0)).cast("bigint").alias("n_dropped"),
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


# --- IVF-PQ (round 10): product-quantized ANN -------------------------
#
# At 100 TB the float32 embedding column itself is the bottleneck: a
# candidate scan that touches raw vectors reads 256 bytes/row (64 × f32),
# while an 8-subspace × 16-code product quantization stores 8 nibbles
# (4 bytes) — a 64x scan-size reduction. The production shape is:
# (1) train tiny per-subspace codebooks once (M × K × dims/M doubles —
#     here 8 × 16 × 8 = 1 024 values, kilobytes at any corpus size);
# (2) encode the corpus in ONE narrow pass (broadcast codebooks, no
#     shuffle of the raw vectors);
# (3) at query time build the ADC (asymmetric-distance) lookup table —
#     M × K doubles, broadcast — and rank candidates reading ONLY the
#     4-byte codes;
# (4) exact re-rank of the top-C candidates touches raw vectors for C
#     rows total.
# Like ivf_topk's centroids, codebook "training" is one deterministic
# Lloyd half-step (per-dimension mean of the vec_id % K seed classes) so
# the full flow — train, encode, ADC, re-rank — is SQL-replayable by the
# DuckDB oracle. Reference anchor: the reference's serving-side
# similarity lookups (SURVEY §2.10) scan raw vectors; this is the
# beyond-reference scale path the brief's "similarity search" bullet
# asks for (IVF/LSH-bucketed variant), compressed one step further.
#
# Determinism: code assignment uses min_by(code, d2) — exact float ties
# across distinct codebook rows do not occur on real-valued data (same
# argument as _IVF_ASSIGN_SQL, parity-proven since r5); the candidate
# cut rounds the ADC distance to 6 decimals and tie-breaks on vec_id so
# both engines cut the same top-C set.
#
# Recall (measured, EVIDENCE_r10 §5): planted near-dups are found at
# every SF; on the DIFFUSE synthetic tier (near-uniform vectors, true
# top-10 cosine ~0.37 — the ANN worst case) recall@10 at C=100 is 0.9
# at N=500 but falls to 0.1 at N=20k, since 16-code subspaces cannot
# separate cos-0.37 peers from the bulk without cluster structure.
# Production levers, in order: IVF cells in front of PQ (the cells
# carry the cluster structure this corpus lacks), count-derived C
# (band_bits_ladder pattern), more codebook bits per subspace.

PQ_SUBDIM = 8      # dims per subspace  (64 / PQ_SUBDIM subspaces)
PQ_CODES = 16      # codebook size per subspace (4-bit codes)
PQ_CANDIDATES = 100  # ADC top-C kept for exact re-rank

_PQ_COMMON_SQL = f"""
    sdims AS (
      SELECT vec_id, vec_id % {PQ_CODES} AS seed_code,
             (t.i - 1) // {PQ_SUBDIM} AS sub,
             (t.i - 1) % {PQ_SUBDIM} AS subdim,
             CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, 65)) AS t(i)
    ),
    cb AS (
      SELECT sub, seed_code AS code, subdim, avg(x) AS cx
      FROM sdims GROUP BY 1, 2, 3
    ),
    dist AS (
      SELECT s.vec_id, s.sub, c.code,
             sum((s.x - c.cx) * (s.x - c.cx)) AS d2
      FROM sdims s JOIN cb c ON s.sub = c.sub AND s.subdim = c.subdim
      GROUP BY 1, 2, 3
    )
"""


@register(
    "ivfpq_topk",
    oracle=f"""
    WITH {_PQ_COMMON_SQL},
    codes AS (
      SELECT vec_id, sub, arg_min(code, d2) AS code FROM dist GROUP BY 1, 2
    ),
    adc AS (
      SELECT sub, code, d2 AS qd2 FROM dist WHERE vec_id = {QUERY_VEC_ID}
    ),
    approx AS (
      SELECT c.vec_id, round(sum(a.qd2), 6) AS ad2
      FROM codes c JOIN adc a ON c.sub = a.sub AND c.code = a.code
      WHERE c.vec_id <> {QUERY_VEC_ID}
      GROUP BY 1
    ),
    cand AS (
      SELECT vec_id, ad2 FROM approx
      ORDER BY ad2, vec_id LIMIT {PQ_CANDIDATES}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT cand.vec_id, e.label,
           round(cand.ad2, 4) AS pq_d2,
           round({_DOT_SQL.format(a="e.embedding", b="q.qv")}
                 / ({_NORM_SQL.format(a="e.embedding")}
                    * {_NORM_SQL.format(a="q.qv")}), 4) AS cosine
    FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id, q
    ORDER BY cosine DESC, cand.vec_id LIMIT 10
    """,
    tags=("vector", "ann", "ivfpq", "quantization", "topk"),
)
def ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN: train 8×16 subspace codebooks (one
    deterministic Lloyd half-step), encode every vector as 8 nibble
    codes, rank candidates by the broadcast ADC lookup table WITHOUT
    touching raw vectors, then exact-cosine re-rank the top-C candidates.

    Plan shape (asserted in test_plans): the codebook (1 024 rows) and
    the ADC table (128 rows) are broadcast; the corpus is read in two
    narrow passes (encode, re-rank join on the C candidate ids) and never shuffles
    by anything wider than vec_id. At 100 TB the codes frame is the
    only full-corpus operand of the query path — 64x smaller than the
    raw embedding column.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    sdims = emb.select(
        "vec_id",
        (F.col("vec_id") % PQ_CODES).alias("seed_code"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id",
        "seed_code",
        (F.col("dim") / PQ_SUBDIM).cast("long").alias("sub"),
        (F.col("dim") % PQ_SUBDIM).alias("subdim"),
        F.col("x").cast("double").alias("x"),
    )
    # The trained codebook is referenced by BOTH downstream branches
    # (corpus encode and the query's ADC table); without a cut Catalyst
    # re-derives the full-corpus training pass for each. localCheckpoint
    # materializes the 1 024-row table once — at deployment the codebook
    # is trained once and persisted, so "train exactly once" is also the
    # production contract.
    cb = (
        sdims.groupBy("sub", F.col("seed_code").alias("code"), "subdim")
        .agg(F.avg("x").alias("cx"))
        .localCheckpoint(eager=True)
    )
    dist = (
        sdims.join(F.broadcast(cb), ["sub", "subdim"])
        .groupBy("vec_id", "sub", "code")
        .agg(
            F.sum(
                (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
            ).alias("d2")
        )
    )
    codes = dist.groupBy("vec_id", "sub").agg(F.min_by("code", "d2").alias("code"))
    adc = dist.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "sub", "code", F.col("d2").alias("qd2")
    )
    approx = (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(adc), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("qd2"), 6).alias("ad2"))
    )
    cand = approx.orderBy("ad2", "vec_id").limit(PQ_CANDIDATES)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    cosine = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (norm(F.col("embedding")) * norm(F.col("qv"))),
        4,
    )
    return (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(F.col("ad2"), 4).alias("pq_d2"),
            cosine.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )
