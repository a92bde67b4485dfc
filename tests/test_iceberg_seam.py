"""Iceberg seam: everything testable without the runtime jar is tested —
capability probe, MERGE INTO generation, fail-fast gating with guidance."""

from __future__ import annotations

import pytest

from video_duplicate_finder_python_spark.sources.iceberg import (
    current_snapshot_id,
    iceberg_enabled,
    merge_upsert,
    merge_upsert_sql,
)


def test_sandbox_has_no_iceberg_catalog(spark):
    assert iceberg_enabled(spark) is False


def test_merge_upsert_sql_shape():
    sql = merge_upsert_sql(
        "lake.dedup.signatures",
        "src_view",
        keys=["url"],
        columns=["url", "content_hash", "minhash", "simhash"],
    )
    assert sql == (
        "MERGE INTO lake.dedup.signatures t USING src_view s ON t.url = s.url "
        "WHEN MATCHED THEN UPDATE SET t.content_hash = s.content_hash, "
        "t.minhash = s.minhash, t.simhash = s.simhash "
        "WHEN NOT MATCHED THEN INSERT (url, content_hash, minhash, simhash) "
        "VALUES (s.url, s.content_hash, s.minhash, s.simhash)"
    )


def test_merge_upsert_sql_composite_key():
    sql = merge_upsert_sql("t1", "v", keys=["url", "warc_ts"], columns=["url", "warc_ts", "x"])
    assert "ON t.url = s.url AND t.warc_ts = s.warc_ts" in sql
    assert "UPDATE SET t.x = s.x " in sql


def test_merge_upsert_sql_rejects_empty():
    with pytest.raises(ValueError):
        merge_upsert_sql("t", "v", keys=[], columns=["a"])


def test_gated_calls_fail_fast_with_guidance(spark):
    df = spark.createDataFrame([("u", 1)], ["url", "x"])
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        merge_upsert(spark, "lake.t", df, keys=["url"])
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        current_snapshot_id(spark, "lake.t")


def test_merge_upsert_sql_all_key_columns_is_insert_only():
    """columns ⊆ keys: 'UPDATE SET' with an empty assignment list is a
    parse error on real Iceberg, and a matched row is already identical —
    the builder must emit an insert-only merge (ADVICE r3)."""
    sql = merge_upsert_sql("t", "v", keys=["url", "ts"], columns=["url", "ts"])
    assert "WHEN MATCHED" not in sql
    assert "UPDATE SET" not in sql
    assert "WHEN NOT MATCHED THEN INSERT (url, ts) VALUES (s.url, s.ts)" in sql
    assert "ON t.url = s.url AND t.ts = s.ts" in sql
