"""Fixture table loaders with declared schemas.

Schemas are declared (FIXTURES.md), not inferred: the loader reads the
self-describing parquet and then *asserts* the declared column set, so
a fixture drift fails loudly instead of silently hashing differently
against the DuckDB oracle. Column order is normalized to the declared
order.

At 100 TB these `spark.read.parquet` scans are the engine's only data
entry point, so every query built on them benefits from Catalyst's
predicate pushdown / column pruning automatically — see
operators/scans.py for the explicit verification query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# table -> declared columns, in order (FIXTURES.md, verified 2026-08-13)
TABLES: dict[str, list[str]] = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

EMBEDDING_DIM = 64

# (session id, sf_dir, table) -> verified parquet StructType. A query
# like tpch_q5 calls load() six times and the bench repeats every
# query 3x; without this, EVERY call pays a driver-side parquet footer
# schema-inference pass (guide §6 — metadata work on the driver is
# serial and shows up as "nothing running"). The first load of a
# table in a session does the real inference AND the declared-column
# drift assertion; later loads reuse the verified schema via
# spark.read.schema(...), which skips footer inference entirely. This
# caches only schema METADATA within one process — every query still
# computes from the parquet files (no result or data caching).
_SCHEMA_CACHE: dict[tuple[int, str, str], object] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, asserting its declared columns.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    cannot represent; with spark.sql.legacy.parquet.nanosAsLong it
    arrives as int64 nanos and is converted here to timestamp_ntz at
    microsecond precision (truncation — matching how DuckDB's
    micro-resolution TIMESTAMP reads the same column, so the oracle
    sees identical values).
    """
    cols = TABLES[name]
    # The driver constructs its own SparkSession without our session
    # factory's confs, so the nanos-compat conf must be (re)set here —
    # it is a runtime-settable SQL conf, safe to set before every read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), sf_dir, name)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
        return _postprocess(df, name, cols)
    df = spark.read.parquet(path)
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"fixture {name} missing declared columns {missing}")
    _SCHEMA_CACHE[key] = df.schema
    return _postprocess(df, name, cols)


def _postprocess(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"),
        )
    return df.select(*cols)


def load_all_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so arbitrary
    ANSI SQL runs against the corpus via ``spark.sql`` — the
    engine's direct SQL entry point (same names the DuckDB oracle
    layer registers, so any oracle query text runs on both engines
    verbatim). Views are lazy: no scan happens until a query runs,
    and Catalyst pushes each query's filters/projections into the
    per-view parquet scans independently."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
