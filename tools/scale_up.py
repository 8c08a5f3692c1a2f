"""Self-generated scale-up dataset (VERDICT r6 task 2): tile the sf0.1
testdata K times with key offsets and decorrelating transforms, writing
parquet to a target dir — testdata itself is read-only. The goal is a
corpus whose PER-TILE statistics match sf0.1 (so runtimes should scale
~linearly in K), not a byte-copy:

- relational tables tile with consistent key offsets (foreign keys
  remapped identically, so join fan-outs per key are unchanged; nation/
  region stay fixed like TPC-H dims);
- documents get every WORD suffixed with a tile tag (k>0), so shingles
  across tiles never collide and the near-dup rate per tile equals
  sf0.1's — tiling raw text would instead make every doc a 10-way
  near-dup and measure a data artifact, not the algorithm;
- embeddings are rotated by k positions (norm-preserving, decorrelates
  cosine across tiles) with offset vec_ids;
- events tile with offset event/user ids over the same time range
  (more traffic, same horizon — the realistic growth mode).

Usage: python tools/scale_up.py <out_dir> [K=10] [src=/root/testdata/sf0.1] [emb_mode=rotate|signflip]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build(spark, out_dir: str, k_tiles: int = 10,
          src: str = "/root/testdata/sf0.1",
          emb_mode: str = "rotate", doc_tag: str = "t") -> None:
    """doc_tag namespaces the per-tile word suffix (``_<tag><k>``).
    Second-level scaling MUST use a fresh tag: with the default "t",
    src-tile-0 words suffixed ``_t1`` become byte-identical to
    src-tile-1's words landing in out-tile-0 (``w + _t1 == w_t1``), so
    10% of every tile pair turns into EXACT cross-tile duplicates —
    measured at r10 as 64k cross-tile verified pairs and a 14.6x (not
    10x) cluster count before the fix.

    emb_mode chooses the embedding decorrelator:
    - "rotate" (default): rotate by k positions — right for FIRST-level
      scaling from the raw testdata;
    - "signflip": rotate by k, then flip dim j's sign iff
      popcount(k & j) is odd (Hadamard parity) — REQUIRED when ``src``
      is itself a scaled set (r10): rotations compose additively, so
      re-rotating sf1's tiles makes (k1,k2) pairs with equal k1+k2
      EXACT duplicates across tiles (and sums >= 64 wrap onto the
      originals), planting a fake near-dup rate the dedup/ANN probes
      would then measure instead of the algorithm. The parity signs
      differ between ANY two tiles on exactly half the dims and the
      rotation misaligns components, so cross-tile copies measure as
      random pairs (mean cosine 0.002, 0.5% >= the 0.35 near-dup
      threshold — the corpus's natural diffuse rate); norm-preserving
      and injective when stacked on a rotate-built corpus. The FIRST
      signflip (flip dims 1..k only, code-review r10) left tiles k and
      k+1 one sign apart — measured cross-tile copy cosine 0.97, i.e.
      a planted K-member near-dup clique per source vector.
    """
    from log_analysis_bigdata_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    parts = spark.sparkContext.defaultParallelism

    def tiles(df, build_tile):
        out = build_tile(df, 0)
        for k in range(1, k_tiles):
            out = out.unionByName(build_tile(df, k))
        return out

    def write(df, name):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )

    # fixed dims: copy as-is
    for name in ("nation", "region"):
        write(spark.read.parquet(f"{src}/{name}.parquet"), name)

    # relational: offset = k * (max_key + 1) MEASURED FROM src (not
    # hardcoded to sf0.1's sizes — re-scaling an already-scaled set
    # would otherwise silently collide keys, code-review r7); the same
    # offset applies to the foreign-key side so per-key join fan-out is
    # tile-invariant
    def off(table, col):
        return (
            spark.read.parquet(f"{src}/{table}.parquet")
            .agg(F.max(col))
            .first()[0]
            + 1
        )

    O_OFF, C_OFF = off("orders", "o_orderkey"), off("customer", "c_custkey")
    P_OFF, S_OFF = off("part", "p_partkey"), off("supplier", "s_suppkey")
    E_OFF = off("events", "event_id")
    D_OFF, V_OFF = off("documents", "doc_id"), off("embeddings", "vec_id")

    if k_tiles > 32:
        # the embedding rotation uses k positions of a 64-dim vector;
        # past half the dimension the tiles start re-correlating and
        # k=64 would slice zero elements
        raise ValueError("k_tiles > 32 not supported (embedding rotation)")

    write(tiles(spark.read.parquet(f"{src}/customer.parquet"), lambda d, k:
          d.withColumn("c_custkey", F.col("c_custkey") + k * C_OFF)),
          "customer")
    write(tiles(spark.read.parquet(f"{src}/supplier.parquet"), lambda d, k:
          d.withColumn("s_suppkey", F.col("s_suppkey") + k * S_OFF)),
          "supplier")
    write(tiles(spark.read.parquet(f"{src}/part.parquet"), lambda d, k:
          d.withColumn("p_partkey", F.col("p_partkey") + k * P_OFF)),
          "part")
    write(tiles(spark.read.parquet(f"{src}/orders.parquet"), lambda d, k:
          d.withColumn("o_orderkey", F.col("o_orderkey") + k * O_OFF)
           .withColumn("o_custkey", F.col("o_custkey") + k * C_OFF)),
          "orders")
    write(tiles(spark.read.parquet(f"{src}/lineitem.parquet"), lambda d, k:
          d.withColumn("l_orderkey", F.col("l_orderkey") + k * O_OFF)
           .withColumn("l_partkey", F.col("l_partkey") + k * P_OFF)
           .withColumn("l_suppkey", F.col("l_suppkey") + k * S_OFF)),
          "lineitem")

    # events.user_id is a foreign key into the CUSTOMER key space
    # (user_id ⊂ c_custkey/o_custkey range), so it must tile by the
    # customer stride C_OFF — offsetting by its own max+1 would land
    # every tile's users inside tile-0's customer range and pile ~K×
    # the join matches onto tile-0 customers (ADVICE r7).
    write(tiles(load_table(spark, src, "events"), lambda d, k:
          d.withColumn("event_id", F.col("event_id") + k * E_OFF)
           .withColumn("user_id", F.col("user_id") + k * C_OFF)),
          "events")

    def doc_tile(d, k):
        d = d.withColumn("doc_id", F.col("doc_id") + k * D_OFF)
        if k == 0:
            return d
        text = F.concat_ws(
            " ",
            F.transform(
                F.split(F.trim(F.col("text")), " +"),
                lambda w: F.concat(w, F.lit(f"_{doc_tag}{k}")),
            ),
        )
        return d.withColumn("text", text).withColumn(
            "n_chars", F.length(text)
        )

    write(tiles(spark.read.parquet(f"{src}/documents.parquet"), doc_tile),
          "documents")

    def emb_tile(d, k):
        d = d.withColumn("vec_id", F.col("vec_id") + k * V_OFF)
        if k == 0:
            return d
        dim = 64
        if emb_mode == "signflip":
            # Hadamard-parity signs (code-review r10): tile k flips dim
            # j iff popcount(k & j) is odd. Any two distinct tiles then
            # differ in sign on EXACTLY half the dims, so cross-tile
            # copies of one source vector have E[cosine] ~ 0. The first
            # version flipped only dims 1..k — tiles k and k+1 differed
            # by ONE dim (measured cross-tile cosine 0.97 on sf0.1),
            # silently planting a K-member near-dup clique per source
            # vector: the exact artifact the mode exists to prevent.
            # ...and compose with the k-rotation: parity signs alone
            # leave a tail of structured pairs (vector energy aligned
            # with a low-popcount sign-agreement pattern — measured
            # 7.7% of adjacent-tile copies still >= cos 0.35 on sf0.1
            # data); rotating first misaligns components so the signed
            # dot is a random-pair sum. Still injective when stacked on
            # a rotate-built corpus: level pairs (k1,k2) share a total
            # transform only if the level-2 sign patterns match, i.e.
            # k2 = k2', which forces k1 = k1'.
            signs = [
                -1.0 if bin(k & j).count("1") % 2 else 1.0
                for j in range(dim)
            ]
            rotated = F.concat(
                F.slice(F.col("embedding"), k + 1, dim - k),
                F.slice(F.col("embedding"), 1, k),
            )
            xf = F.zip_with(
                rotated,
                F.array(*[F.lit(s) for s in signs]),
                # cast back: lit signs are double, and a double element
                # type would silently change the parquet schema vs the
                # base table's array<float>
                lambda x, s: (x * s).cast("float"),
            )
        else:
            xf = F.concat(
                F.slice(F.col("embedding"), k + 1, dim - k),
                F.slice(F.col("embedding"), 1, k),
            )
        return d.withColumn("embedding", xf)

    write(tiles(spark.read.parquet(f"{src}/embeddings.parquet"), emb_tile),
          "embeddings")


if __name__ == "__main__":
    from log_analysis_bigdata_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    emb_mode = sys.argv[4] if len(sys.argv) > 4 else "rotate"
    doc_tag = sys.argv[5] if len(sys.argv) > 5 else "t"
    spark = get_spark(app_name="scale_up")
    build(spark, out, k, src, emb_mode, doc_tag)
    for t in sorted(os.listdir(out)):
        n = spark.read.parquet(f"{out}/{t}").count()
        print(t, n)
    spark.stop()
