"""Distributed exact global row-number / NTILE — the scale-safe plan
for global-order windows (SURVEY.md §4.3).

``Window.orderBy(...)`` with no ``partitionBy`` funnels every row into
ONE task — the canonical 100 TB scale-killer. The exact semantics are
recovered with three narrow-ish jobs, none of which ever holds more
than one range-bucket of rows in a task:

1. ``approxQuantile`` on the leading order column → P-1 boundary
   values (tiny driver list, broadcast by closure).
2. Assign each row its range bucket with a JVM fold over the boundary
   array (monotone in the sort order: bucket is non-decreasing in the
   leading key, and within a bucket the (key, tiebreak) sort is the
   global order); hash-shuffle by bucket and count per bucket — a
   P-row aggregate that yields exact cumulative offsets.
3. Re-shuffle by bucket, ``sortWithinPartitions`` on the full order
   key, and emit ``offset[bucket] + local_index`` from an
   Arrow-batched ``mapInPandas`` that keeps one counter per bucket.
   Buckets are contiguous under the sort, so a task holding several
   buckets still assigns correct, deterministic numbers.

Determinism note: every step is a pure function of the data (quantile
sketch, exact counts, total-order sort) — no sampling-dependent
``repartitionByRange`` and therefore no ``.cache()`` that must stay
pinned to keep two passes consistent. Re-running any job reproduces
identical numbers, which is what the DuckDB oracle hash requires.
The r10 lazy localCheckpoints on ``bucketed``/``numbered`` are a
pure recompute-elimination on top of that (each table is consumed by
2+ executions; stacked rank calls consumed the whole previous
numbering once per downstream action) — they change which jobs run,
never any value. The plan tests pin the MapInPandas/no-Window
pipeline shape via ``checkpoint=False``, which skips both
checkpoints so one explain() shows the full machinery.

NTILE(b) and PERCENT_RANK follow from (row_number, n_total) as narrow
column expressions (the exact SQL-standard formulas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_range_bucket(
    df: DataFrame, lead: str, num_buckets: int | None = None
) -> DataFrame:
    """Phase 1 of the two-phase prefix machinery: append ``_gr_bucket``,
    a contiguous range-bucket id over ``lead`` (approxQuantile
    boundaries → JVM fold assignment). Bucket is non-decreasing in
    ``lead`` and equal values always share a bucket, so any
    order-by-``lead`` prefix aggregate decomposes into (driver-side
    cumulative of per-bucket subtotals) + (a PARTITIONED window within
    the bucket) — no single-task global Sort/Window."""
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    qs = [i / num_buckets for i in range(1, num_buckets)]
    boundaries = sorted(set(df.stat.approxQuantile(lead, qs, 0.001)))

    if boundaries:
        barr = F.array(*[F.lit(b) for b in boundaries])
        bucket = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(lead) > b, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    return df.withColumn("_gr_bucket", bucket)


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "_rn",
    num_buckets: int | None = None,
    checkpoint: bool = True,
) -> tuple[DataFrame, int]:
    """Return (df + ``out_col`` 1-based global row number, n_total).

    ``order_cols[0]`` is the range-bucketed leading key; the full list
    defines the total order (caller must make it unique via a final
    tie-break column, same contract as a deterministic ORDER BY).
    ``checkpoint=False`` skips the lazy localCheckpoints so the whole
    pipeline stays visible in one explain() — used by the plan tests
    to pin the MapInPandas/no-Window shape; production callers keep
    the default. The env override ``SPARK_GRAFT_GR_CHECKPOINT=0``
    forces it off for REGISTERED keys too, so the plan tests can
    assert key-level shapes below the truncation boundary (r10
    ADVICE) without the keys growing a test-only parameter.

    Fault-tolerance note (r10 ADVICE): ``localCheckpoint`` pins the
    materialized partitions to executor-local storage — on a cluster a
    lost executor fails the query instead of recomputing lineage. That
    is the documented trade for eliminating cross-action recompute in
    local/batch-driver runs; deployments with preemptible workers
    should prefer ``spark.checkpoint`` to reliable storage (set via
    sparkContext.setCheckpointDir) or simply run with
    SPARK_GRAFT_GR_CHECKPOINT=0 and accept the recompute.
    """
    import os

    spark = df.sparkSession
    if os.environ.get("SPARK_GRAFT_GR_CHECKPOINT", "1") == "0":
        checkpoint = False
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Lazy localCheckpoints (guide §5 reuse-over-recompute): the
    # bucketed table is consumed by TWO executions (the offset counts
    # below and the numbering pipeline), the numbered output by at
    # least one caller action — and in stacked rank calls (RRF / RFM /
    # rank-transform tests) each call's lineage contains the whole
    # PREVIOUS numbering, which uncheckpointed re-executed once per
    # downstream action. eager=False materializes each table on its
    # first use and replays it afterwards; every step stays the same
    # pure function of the data, so the numbers are bit-identical —
    # only the recompute is gone. (A/B at sf0.01, min of 3 warm noop
    # reps: rfm 5.23→2.57 s, rank_fusion 5.21→2.51, cvm 5.35→2.30;
    # the bucketed-only variant left half the win on the table.)
    bucketed = with_range_bucket(df, order_cols[0], num_buckets)
    if checkpoint:
        bucketed = bucketed.localCheckpoint(eager=False)

    counts = {
        r["_gr_bucket"]: r["n"]
        for r in bucketed.groupBy("_gr_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())
    offsets = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    in_schema = bucketed.schema
    out_fields = [f for f in in_schema.fields if f.name != "_gr_bucket"]
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
        + f", {out_col} bigint"
    )
    names = [f.name for f in out_fields]

    def assign(batches):
        local = dict(offsets)  # bucket -> next 0-based local index + offset
        for pdf in batches:
            buckets = pdf["_gr_bucket"].to_numpy()
            rns = []
            for b in buckets:
                nxt = local[b] + 1  # 1-based
                local[b] = nxt
                rns.append(nxt)
            out = pdf[names].copy()
            out[out_col] = rns
            yield out

    numbered = (
        bucketed.repartition(num_buckets, "_gr_bucket")
        .sortWithinPartitions(*order_cols)
        .mapInPandas(assign, out_schema)
    )
    if checkpoint:
        numbered = numbered.localCheckpoint(eager=False)
    return numbered, n_total


def ntile_expr(rn_col: str, n_total: int, buckets: int):
    """Exact SQL NTILE(buckets) from a 1-based global row number:
    the first ``n % buckets`` tiles get ``n // buckets + 1`` rows."""
    base, rem = divmod(n_total, buckets)
    big = base + 1
    split = rem * big  # rows 1..split live in the bigger tiles
    rn = F.col(rn_col)
    if base == 0:
        return rn.cast("int")
    return (
        F.when(rn <= split, ((rn - 1) / big).cast("bigint") + 1)
        .otherwise(rem + ((rn - split - 1) / base).cast("bigint") + 1)
        .cast("int")
    )


def percent_rank_expr(rn_col: str, n_total: int):
    """PERCENT_RANK over a total order (rank == row_number when the
    order key is unique): (rank - 1) / (n - 1)."""
    if n_total <= 1:
        return F.lit(0.0)
    return ((F.col(rn_col) - 1) / F.lit(n_total - 1)).cast("double")
