"""Additional source formats (SURVEY.md §2.2-A: the engine's data
entry points beyond parquet). Each query round-trips the `events`
fixture through the format with a DECLARED schema (never inferred —
inference reorders types between engines) and returns the read-back
rows; the oracle is the original table, so a lossy writer or reader
fails the hash. Timestamps go through ISO-8601 strings; doubles
through repr round-trip."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..scratch import scratch_dir
from . import load

_CACHE: dict[tuple[str, str], str] = {}

EVENTS_ORACLE = """
SELECT event_id, ts, user_id, event_type, value FROM events
"""

READ_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double"
)


def _written(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write events once per (sf_dir, fmt) per process; return path."""
    key = (sf_dir, fmt)
    if key not in _CACHE:
        out = scratch_dir(prefix=f"dms_{fmt}_")
        ev = load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        w = ev.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", "true").option(
                "timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).csv(out)
        elif fmt == "json":
            w.option(
                "timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).json(out)
        else:
            raise ValueError(fmt)
        _CACHE[key] = out
    return _CACHE[key]


@query("source_csv", oracle=EVENTS_ORACLE)
def source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> CSV -> read back with declared schema. Header on,
    microsecond timestamps; values must hash-match the parquet
    original exactly."""
    path = _written(spark, sf_dir, "csv")
    return (
        spark.read.schema(READ_SCHEMA)
        .option("header", "true")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )


@query("source_jsonl", oracle=EVENTS_ORACLE)
def source_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSON-lines -> read back with declared schema."""
    path = _written(spark, sf_dir, "json")
    return (
        spark.read.schema(READ_SCHEMA)
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


@query("source_orc", oracle=EVENTS_ORACLE)
def source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> ORC -> read back (binary columnar round-trip; ORC
    stores timestamp_ntz natively, so no string formatting is
    involved — a lossy writer or reader fails the hash)."""
    key = (sf_dir, "orc")
    if key not in _CACHE:
        out = scratch_dir(prefix="dms_orc_")
        load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        ).write.mode("overwrite").orc(out)
        _CACHE[key] = out
    return spark.read.schema(READ_SCHEMA).orc(_CACHE[key])


@query(
    "source_python_datasource",
    oracle="""
SELECT range AS id, range * range AS sq, CAST(range % 10 AS INT) AS bucket
FROM range(0, 1000)
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Spark 4 Python Data Source (spark.dataSource.register +
    read.format): a custom partitioned reader generating a
    deterministic derived-column table across 4 input partitions —
    the extension point for reading proprietary formats without JVM
    code. Arrow-batched per partition; the DuckDB oracle states the
    identical table via range()."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    N = 1000
    P = 4

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", N))

        def partitions(self):
            return [InputPartition(i) for i in range(P)]

        def read(self, partition):
            i = partition.value
            per = self.n // P
            lo = i * per
            hi = self.n if i == P - 1 else lo + per
            for x in range(lo, hi):
                yield (x, x * x, x % 10)

    class SynthSource(DataSource):
        @classmethod
        def name(cls):
            return "dms_synth"

        def schema(self):
            return "id bigint, sq bigint, bucket int"

        def reader(self, schema):
            return SynthReader(self.options)

    spark.dataSource.register(SynthSource)
    return spark.read.format("dms_synth").option("n", str(N)).load()


@query(
    "source_python_datasource_stream",
    oracle="""
SELECT CAST(range % 10 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(range * range) AS BIGINT) AS sum_sq
FROM range(0, 1000) GROUP BY 1
""",
)
def source_python_datasource_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The STREAMING side of the Spark 4 Python Data Source API: a
    custom DataSourceStreamReader with real offset management
    (initialOffset -> latestOffset -> partitions(start, end) ->
    read(partition)) emitting the same deterministic table as
    source_python_datasource in offset-bounded batches, 4
    partitions per batch (under availableNow the engine takes the
    whole initial->latest span as one batch; partitions() must cover
    EXACTLY the committed range — clamping it drops rows, the bug
    this key's first draft shipped and the oracle caught). Consumed with availableNow and aggregated
    per bucket in complete mode; the batch-equivalence oracle states
    the same totals via range() — proving exactly-once offset
    accounting (no gap, no double-read) end to end through the
    Python source seam a proprietary feed would plug into."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    N = 1000
    P = 4

    class _Part(InputPartition):
        def __init__(self, lo, hi):
            self.lo, self.hi = lo, hi

    class SynthStreamReader(DataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def latestOffset(self):
            return {"pos": N}

        def partitions(self, start, end):
            # MUST cover exactly [start, end): the engine commits the
            # offset range it asked for, so clamping here would drop
            # rows silently (exactly-once means read what you commit)
            lo, hi = start["pos"], end["pos"]
            span = max(hi - lo, 0)
            per = max(span // P, 1)
            parts = []
            at = lo
            while at < hi:
                parts.append(_Part(at, min(at + per, hi)))
                at += per
            return parts or [_Part(lo, lo)]

        def read(self, partition):
            for x in range(partition.lo, partition.hi):
                yield (x, x * x, x % 10)

        def commit(self, end):
            pass  # no external offsets to clean up

    class SynthStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "dms_synth_stream"

        def schema(self):
            return "id bigint, sq bigint, bucket int"

        def streamReader(self, schema):
            return SynthStreamReader()

    spark.dataSource.register(SynthStreamSource)
    st = spark.readStream.format("dms_synth_stream").load()
    agg = st.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id") * F.col("id")).alias("sum_sq"),
    )
    from ..streaming.replay import run_to_memory

    name = f"pyds_stream_{next(_PYDS_COUNTER)}"
    return run_to_memory(agg, name, mode="complete")


import itertools as _itertools

_PYDS_COUNTER = _itertools.count()

@query(
    "source_csv_permissive",
    oracle="""
WITH numbered AS (
  SELECT value, ROW_NUMBER() OVER (ORDER BY event_id) AS rn FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN rn % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bad,
       CAST(SUM(CASE WHEN rn % 100 <> 0
                THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
            AS DOUBLE) / 100 AS good_value_total
FROM numbered
""",
)
def source_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-CSV ingestion audit — the PERMISSIVE-mode contract
    every lakehouse ingest relies on: a CSV written with every 100th
    row (in event_id order) deterministically corrupted is read
    under the declared schema; damaged rows surface as NULL-keyed
    rows instead of killing the job. The audit over the READ-BACK
    file (total rows, NULL-keyed rows, exact-cents total over clean
    rows) must hash-match the oracle's prediction computed purely
    from the pristine parquet and the corruption rule — proving
    PERMISSIVE parsing dropped exactly the planted rows and nothing
    else."""
    path = _permissive_fixture(spark, sf_dir)
    df = (
        spark.read.schema(
            "event_id bigint, user_id bigint, event_type string,"
            " value double"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("user_id").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_bad"),
        (
            F.sum(
                F.when(
                    F.col("user_id").isNotNull(),
                    F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                ).otherwise(0)
            ).cast("double")
            / 100
        ).alias("good_value_total"),
    )


_PERMISSIVE_CACHE: dict = {}


def _permissive_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write a single CSV of events where every 100th row (1-indexed
    in event_id order) is corrupted (replaced by an unparseable
    line) — deterministic, cached per sf."""
    import os
    import tempfile

    if sf_dir in _PERMISSIVE_CACHE:
        return _PERMISSIVE_CACHE[sf_dir]
    rows = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .collect()
    )
    d = scratch_dir(prefix="dms_badcsv_")
    path = os.path.join(d, "events_dirty.csv")
    with open(path, "w") as f:
        f.write("event_id,user_id,event_type,value\n")
        for i, r in enumerate(rows):
            if i % 100 == 99:
                f.write("CORRUPT\n")
            else:
                f.write(
                    f"{r['event_id']},{r['user_id']},"
                    f"{r['event_type']},{r['value']!r}\n"
                )
    _PERMISSIVE_CACHE[sf_dir] = path
    return path


# Fixed-width layout: event_id[12] user_id[12] event_type[10] ts[27]
# value[28] — numbers right-aligned space-padded, strings left-aligned.
_FW = [("event_id", 12), ("user_id", 12), ("event_type", 10),
       ("ts", 27), ("value", 28)]


@query("source_fixed_width", oracle=EVENTS_ORACLE)
def source_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> FIXED-WIDTH text -> read back by column position —
    the mainframe/COBOL copybook ingest path every enterprise data
    platform still needs (no delimiters, no quoting: layout IS the
    schema). The writer pads each field to its declared width
    (numbers left-padded, strings right-padded); the reader is
    spark.read.text + substring/trim/cast — schema DECLARED by
    (offset, width) pairs, never inferred. Timestamps and doubles
    ride their canonical string forms (CAST round-trips are exact
    in both directions), so a one-character layout drift fails the
    hash against the parquet original."""
    key = (sf_dir, "fixedwidth")
    if key not in _CACHE:
        out = scratch_dir(prefix="dms_fw_")

        def fit(col, width: int, left: bool):
            # lpad/rpad silently TRUNCATE over-width values; guard with
            # raise_error so a layout violation fails the write loudly
            # instead of corrupting the round-trip (executor-side, no
            # driver pass)
            s = col.cast("string")
            padded = (
                F.lpad(s, width, " ") if left else F.rpad(s, width, " ")
            )
            return F.when(
                F.length(s) > width,
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"source_fixed_width: value exceeds declared "
                            f"width {width}: "
                        ),
                        s,
                    )
                ),
            ).otherwise(padded)

        ev = load(spark, sf_dir, "events").select(
            F.concat(
                fit(F.col("event_id"), 12, True),
                fit(F.col("user_id"), 12, True),
                fit(F.col("event_type"), 10, False),
                fit(F.col("ts"), 27, False),
                fit(F.col("value"), 28, False),
            ).alias("value")
        )
        ev.write.mode("overwrite").text(out)
        _CACHE[key] = out
    lines = spark.read.text(_CACHE[key])
    pos = 1
    cols = []
    types = {
        "event_id": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "ts": "timestamp_ntz",
        "value": "double",
    }
    for name, width in _FW:
        c = F.trim(F.substring(F.col("value"), pos, width))
        cols.append(c.cast(types[name]).alias(name))
        pos += width
    out_df = lines.select(*cols)
    return out_df.select("event_id", "ts", "user_id", "event_type", "value")
