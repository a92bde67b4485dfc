"""Iceberg integration seam — real code paths, gated on the runtime jar.

The sandbox has no Iceberg runtime, so these paths can't execute here;
everything that CAN be exercised without the jar is (capability probe,
MERGE INTO / snapshot SQL generation — pure functions with unit tests),
and everything that needs it fails fast with a precise message instead of
a missing-class stack trace. On a cluster with
``--packages org.apache.iceberg:iceberg-spark-runtime-…`` and a catalog
configured, the same calls run as-is:

- ``merge_upsert`` replaces the SignatureStore's manifest machinery
  (streaming/ingest.py documents this seam): one MERGE INTO per
  micro-batch, with Iceberg handling atomicity, partition targeting, and
  snapshot isolation.
- ``current_snapshot_id`` feeds ``DedupPipeline.run(input_token=...)`` so
  checkpoint invalidation keys on the table snapshot instead of scanning
  (url, warc_ts, length(html)) — closing the length-preserving-rewrite
  residual documented in plans/pipeline.py:input_digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CATALOG_IMPLS = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)


def iceberg_enabled(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured in this session. Conf
    scan only — no class loading, safe to call anywhere."""
    confs = spark.sparkContext.getConf().getAll()
    return any(
        k.startswith("spark.sql.catalog.") and v in _CATALOG_IMPLS
        for k, v in confs
    )


def merge_upsert_sql(table: str, source_view: str, keys: list[str], columns: list[str]) -> str:
    """The MERGE INTO statement for an idempotent keyed upsert — the
    reference's INSERT OR REPLACE semantics (database.py:68-91) at
    lakehouse scale. Pure string builder (unit-tested without Iceberg)."""
    if not keys or not columns:
        raise ValueError("keys and columns must be non-empty")
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    non_key = [c for c in columns if c not in keys]
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    if not non_key:
        # every column is a key: 'UPDATE SET' with no assignments is a
        # parse error on a real Iceberg deployment, and a matched row is
        # by definition already identical — emit an insert-only merge
        return (
            f"MERGE INTO {table} t USING {source_view} s ON {on} "
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
        )
    sets = ", ".join(f"t.{c} = s.{c}" for c in non_key)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def merge_upsert(
    spark: SparkSession, table: str, df: DataFrame, keys: list[str]
) -> None:
    """Run the keyed upsert against an Iceberg table. Raises RuntimeError
    with setup guidance when no Iceberg catalog is configured (this
    sandbox), instead of a ClassNotFoundException mid-query."""
    if not iceberg_enabled(spark):
        raise RuntimeError(
            "No Iceberg catalog configured: add the iceberg-spark-runtime "
            "package and a spark.sql.catalog.<name> configuration; in this "
            "sandbox use SignatureStore (streaming/ingest.py), which "
            "implements the same upsert contract over parquet."
        )
    view = f"_merge_src_{abs(hash(table)) % 10_000_000}"
    df.createOrReplaceTempView(view)
    try:
        spark.sql(merge_upsert_sql(table, view, keys, df.columns))
    finally:
        spark.catalog.dropTempView(view)


def current_snapshot_id(spark: SparkSession, table: str) -> str:
    """The table's current snapshot id (``{table}.snapshots`` metadata
    table) — pass as ``DedupPipeline.run(input_token=...)``. Same gating
    as merge_upsert."""
    if not iceberg_enabled(spark):
        raise RuntimeError(
            "No Iceberg catalog configured; snapshot-id input tokens need "
            "an Iceberg table. Fall back to DedupPipeline.input_digest "
            "(row count + xxhash over url/warc_ts/length(html))."
        )
    row = (
        spark.sql(f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1")
        .first()
    )
    if row is None:
        raise RuntimeError(f"table {table} has no snapshots")
    return str(row["snapshot_id"])
