"""Graph-analytics queries over the relational tables: deterministic
integer PageRank (the second iterative-algorithm family next to
operators/components.py's connected components).

Determinism design: PageRank in floating point is NOT cross-engine
hash-stable (per-key double sums depend on reduction order), so ranks
are kept in integer micro-units with floor division — addition of
bigints is order-independent, and ``floor(a * b / c)`` on bigints is
bit-identical in Spark and DuckDB. The damping update is

    r'(v) = JUMP + Σ_{u→v} floor(DAMP_NUM * r(u) / (DAMP_DEN * outdeg(u)))

with JUMP = 150_000, DAMP_NUM/DAMP_DEN = 850/1000 and r0 = 1_000_000 —
the classic 0.15/0.85 PageRank scaled by 1e6. A fixed iteration budget
(unrolled in the SQL oracle) bounds the loop; the loop ALSO exits
early at an exact integer fixpoint (round 8): the update is a
deterministic function of the rank frame, so once r_i == r_{i-1}
every later round reproduces the same frame bit-for-bit — stopping
there cannot diverge from the unrolled oracle, unlike a float
epsilon threshold, which would. The change count rides the same job
that materializes each round's checkpoint (Observation fires on
eager localCheckpoint), so convergence detection adds zero extra
jobs — the pattern operators/components.py uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

PR_ITERS = 3
PR_JUMP = 150_000
PR_DAMP_NUM = 850
PR_DAMP_DEN = 1000
PR_INIT = 1_000_000
SUPP_OFFSET = 10_000_000  # supplier node ids, disjoint from customers

# Directed edge list, both directions: customer ↔ supplier whenever a
# lineitem links them. Bidirectional edges mean no dangling nodes, so
# the rank mass lost to floor() is the only leak (identical on both
# engines).
_EDGES_SQL = f"""
      SELECT DISTINCT o.o_custkey AS src,
             l.l_suppkey + {SUPP_OFFSET} AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      UNION
      SELECT DISTINCT l.l_suppkey + {SUPP_OFFSET} AS src,
             o.o_custkey AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def _pr_step_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT e.dst AS node,
             {PR_JUMP} + CAST(coalesce(sum(
               ({PR_DAMP_NUM} * r.rank) // ({PR_DAMP_DEN} * d.outdeg)
             ), 0) AS BIGINT) AS rank
      FROM edges e
      JOIN {prev} r ON r.node = e.src
      JOIN deg d ON d.node = e.src
      GROUP BY e.dst
    )"""


@register(
    "pagerank_supplier_graph",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS rank FROM deg),
    {_pr_step_sql("r0", "r1")},
    {_pr_step_sql("r1", "r2")},
    {_pr_step_sql("r2", "r3")}
    SELECT node, rank FROM r3
    ORDER BY rank DESC, node
    LIMIT 20
    """,
    tags=("graph", "pagerank", "iterative"),
)
def pagerank_supplier_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank over the customer↔supplier order graph, 3
    rounds, top-20 nodes. The driver loop is the standard Spark
    iterative discipline (operators/components.py): each round is one
    edges⋈ranks join + a groupBy(dst) sum, the new rank frame is
    localCheckpoint-ed (eager) so round N's plan never re-derives rounds
    1..N-1, and the edge/degree frames are materialized ONCE before the
    loop. Integer micro-unit arithmetic makes every round's output
    bit-identical to the unrolled-CTE oracle (module docstring).

    Scale: per round, one shuffle of the edge list keyed on src (join)
    and one on dst (agg) — the same budget as one round of label
    propagation; ranks/degrees are node-sized. Top-20 is
    TakeOrderedAndProject, no full sort.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    cs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + SUPP_OFFSET).alias("s"),
        )
        # dedup the UNDIRECTED pair set FIRST (r15): customer and
        # supplier ids live in disjoint ranges (SUPP_OFFSET), so the
        # two directed copies below are distinct-by-construction and
        # disjoint from each other — the old `union(...).distinct()`
        # hash-aggregated 2× the rows for the identical edge set
        # (the probe's sf10 graph OOM'd exactly in that doubled
        # distinct on an 8g heap; halving its input is the fix that
        # scales rather than a bigger heap)
        .distinct()
    )
    # Materialize the UNDIRECTED pair set ONCE as a serialized columnar
    # cache (r15): the old localCheckpoint of the mirrored 2E edge list
    # stored every row as a deserialized JVM object — 32 concurrent
    # tasks each buffering a full partition block put ~2E × ~100 B of
    # raw objects on the heap at materialization (the sf10 probe's
    # 120M-edge graph OOM'd an 8–16 GiB driver exactly there).
    # A DataFrame persist is compressed columnar batches (~16 B/row
    # here) and the mirror is a zero-cost narrow view on top of it.
    cs = cs.persist()
    edges = cs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(cs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    # deg's eager checkpoint is the ONE pre-loop barrier (r17): it
    # materializes the cs cache as a side effect, and an Observation on
    # the same job carries Σoutdeg (= 2·|undirected pairs|, the
    # loop_parallelism sizing input) and the node count (the loop's
    # row-count guard baseline) — replacing the separate cs.count() and
    # ranks.count() jobs the old plan paid (guide §1.2: fewer barrier
    # jobs, same answers).
    from pyspark.sql import Observation

    deg_obs = Observation()
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumnRenamed("src", "node")
        .observe(
            deg_obs,
            F.sum("outdeg").alias("deg_sum"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
        .localCheckpoint(eager=True)  # node-sized: cheap, truncates
    )
    got = deg_obs.get
    two_e = int(got["deg_sum"] or 0)
    n_nodes = int(got["n_nodes"] or 0)
    # narrow derivation from the checkpointed deg — its own checkpoint
    # was a pure barrier job (r17)
    ranks = deg.select(
        "node", F.lit(PR_INIT).cast("bigint").alias("rank")
    )
    pre = edges.join(
        deg.withColumnRenamed("node", "src"), "src"
    )  # (src, dst, outdeg), loop-invariant
    # per-round joins/aggs shuffle at edge-set scale, not the session's
    # corpus-scale default — shared helper with connected_components
    from ..operators.components import loop_parallelism

    with loop_parallelism(spark, two_e) as session_default:
        # Pre-partition the loop-invariant edge frame ON THE JOIN KEY
        # and persist it (r9): persist — unlike localCheckpoint —
        # preserves outputPartitioning, so every round's shuffle-hash
        # join reads the cached partitions in place and only the
        # node-sized ranks frame moves. Previously the FULL edge frame
        # re-exchanged every round (3 exchanges/round -> 2, and the big
        # one is gone) — at 100 TB this is the difference between
        # shuffling the edge list k times and once. The partition count
        # matches the narrowed loop conf so the per-round ranks
        # exchange aligns with the cached layout.
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # persisted but NOT pre-counted (r17): round 1's own job
        # materializes the cache exactly once (the frame appears once
        # per round's plan), so the standalone count was a pure barrier
        contrib_src = pre.repartition(nparts, "src").persist()
        try:
            # checkpoint_every=PR_ITERS (r18): the whole 3-round budget
            # nests into ONE lazy plan and materializes as one job —
            # loop barrier jobs 3 → 1 (guide §1.2); exit/latch
            # semantics unchanged, see _pr_loop
            ranks, _rounds = _pr_loop(
                contrib_src,
                ranks,
                session_default,
                initial_n=n_nodes,
                checkpoint_every=PR_ITERS,
            )
        finally:
            contrib_src.unpersist(blocking=False)
            cs.unpersist(blocking=False)  # contrib_src is materialized
    return ranks.orderBy(F.desc("rank"), "node").limit(20)


def _pr_loop(
    contrib_src: DataFrame,
    ranks: DataFrame,
    session_default: str | None = None,
    max_iter: int = PR_ITERS,
    stop_shift: int = 0,
    initial_n: int | None = None,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, int]:
    """Run up to ``max_iter`` damped-update rounds; returns the final
    rank frame and the number of rounds actually executed.

    Early exit, two modes:
    - ``stop_shift=0`` (default, what the registered query uses): exit
      ONLY at an exact integer fixpoint (no rank changed) — semantics-
      preserving against an unrolled max_iter-round oracle, see module
      docstring.
    - ``stop_shift>0``: ALSO exit once the round's total absolute rank
      movement Σ|Δ| (micro-units) drops to <= stop_shift — the
      practical convergence stop for large iteration budgets, where
      integer ranks typically cycle in the last few units and never
      reach exact equality. Callers opting in accept ranks from the
      first sub-threshold round instead of the full budget.

    ``checkpoint_every=k`` (r18, guide §1.2 — fewer barrier jobs)
    materializes one eager localCheckpoint per WINDOW of k rounds
    instead of per round: the k join+agg rounds nest into one lazy plan
    and execute as ONE job (one barrier, one scheduler round-trip). The
    fixpoint/shrink tests move to the window's LAST round, which is
    exit-equivalent: a fixpoint at any round j inside the window makes
    every later round reproduce the same frame bit-for-bit (module
    docstring), so "last round unchanged" fires iff some round in the
    window reached the fixpoint, and the returned frame is that same
    fixpoint frame. The node count is monotonically non-increasing
    across rounds (a step's nodes are the dsts reachable from the
    current frame), so comparing the window-end count to the window-
    start baseline detects any mid-window shrink — the latch semantics
    are unchanged. ``stop_shift>0`` forces k=1: its exit is a
    threshold on ONE round's movement, not a window's.
    (Plan note: only the window's last round references the previous
    frame twice — the mid-window rounds reference it once — so the
    nested plan grows linearly in k, and the duplicated subtree's
    exchanges dedupe through ReuseExchange/AQE stage reuse.)

    Both tests ride the checkpoint materialization via Observation:
    zero additional jobs per window.

    PRECONDITION: every ranked node must appear as a ``dst`` in
    ``contrib_src`` (true for bidirectional edge sets, as the
    registered query builds). A node with no in-edges silently leaves
    the frame after one round — the row-count guard below (ADVICE r8,
    hardened by code-review r9) seeds the baseline from the INITIAL
    ranks frame (one extra count; round-1 shrinks are visible) and
    LATCHES on any shrink, so reuse on a non-bidirectional graph can
    burn the full iteration budget but can never report a false
    fixpoint over a shrunken frame."""
    from pyspark.sql import Observation

    from ..operators.components import guard_parallelism

    spark = contrib_src.sparkSession
    if session_default is None:
        session_default = spark.conf.get("spark.sql.shuffle.partitions")
    if stop_shift > 0:
        checkpoint_every = 1  # per-round threshold needs per-round frames
    checkpoint_every = max(1, checkpoint_every)
    rounds = 0
    # baseline row count for the shrink guard — a node lost in round 1
    # must register as a shrink too. The registered query passes it in
    # (it rides deg's Observation — r17: one fewer barrier job); other
    # callers pay one count of their own frame.
    prev_n: int = ranks.count() if initial_n is None else initial_n
    ever_shrank = False

    def one_round(cur: DataFrame) -> DataFrame:
        guard_parallelism(spark, session_default)
        return (
            contrib_src.join(
                # shuffle_hash with ranks as build side: the persisted
                # edge frame's hashpartitioning(src) satisfies the join
                # requirement (no re-exchange; a broadcast would ship
                # the node-sized frame to every executor each round and
                # a sort-merge would re-sort the cached side per round)
                cur.withColumnRenamed("node", "src").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(PR_JUMP)
                    + F.coalesce(
                        # SQL `div`: exact bigint division (the Python
                        # `/` operator would route through double)
                        F.sum(
                            F.expr(
                                f"({PR_DAMP_NUM} * rank) div "
                                f"({PR_DAMP_DEN} * outdeg)"
                            )
                        ),
                        F.lit(0),
                    )
                )
                .cast("bigint")
                .alias("rank")
            )
        )

    while rounds < max_iter:
        window = min(checkpoint_every, max_iter - rounds)
        final_window = rounds + window >= max_iter
        cur = ranks
        if final_window and window > 1 and not ever_shrank:
            # Last window of the budget with nothing left to decide:
            # no exit test can shorten the run and no fixpoint claim
            # follows, so skip the old-join + Observation entirely —
            # the window is a straight-line nest of `window` rounds
            # (each referencing the previous frame ONCE — no duplicated
            # subtree to re-execute) materialized by one checkpoint.
            for _ in range(window):
                cur = one_round(cur)
            ranks = cur.localCheckpoint(eager=True)
            rounds += window
            break
        for _ in range(window - 1):  # mid-window rounds: lazy, no obs
            cur = one_round(cur)
        step = one_round(cur)
        # bidirectional edges → every node has in- and out-edges, so
        # step's node set equals the previous frame's and the left join
        # below never invents or drops nodes; `old` is null-free after
        # round 0 too, the coalesce is belt-and-braces for an empty
        # frame
        obs = Observation()
        nxt = (
            step.join(
                cur.select(
                    "node", F.col("rank").alias("old")
                ),
                "node",
                "left",
            )
            .observe(
                obs,
                F.sum(
                    (
                        F.col("rank")
                        != F.coalesce(F.col("old"), F.lit(-1))
                    ).cast("long")
                ).alias("changed"),
                F.sum(
                    F.abs(
                        F.col("rank")
                        - F.coalesce(F.col("old"), F.lit(0))
                    )
                ).alias("shift"),
                F.count(F.lit(1)).alias("n"),
            )
            .select("node", "rank")
            .localCheckpoint(eager=True)
        )
        ranks = nxt
        rounds += window
        got = obs.get
        n = got["n"] or 0
        if n != prev_n:
            ever_shrank = True  # LATCHED: a rank vanished without
            # counting as "changed" — no later round may claim a
            # fixpoint over the shrunken frame
        prev_n = n
        if ever_shrank:
            continue
        if (got["changed"] or 0) == 0:
            break
        if stop_shift > 0 and (got["shift"] or 0) <= stop_shift:
            break
    return ranks, rounds
