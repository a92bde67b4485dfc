"""Bucketed-table co-located joins: pre-bucketing the signature store by
url removes the join-time shuffle entirely — the storage-layout lever the
100 TB deployment uses (Iceberg bucket partition transform / Spark
bucketBy) so repeated joins against the store never re-exchange the
corpus."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    df = spark.createDataFrame(
        [(f"https://x/{i}", i, i % 7) for i in range(2000)],
        ["url", "payload", "grp"],
    )
    names = []
    for name in ("sig_store_a", "sig_store_b"):
        (
            df.write.bucketBy(8, "url").sortBy("url")
            .mode("overwrite").format("parquet")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
        names.append(name)
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    joined = spark.table(a).join(spark.table(b), "url")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 2000


def test_unbucketed_join_needs_exchange(spark, bucketed_pair, tmp_path):
    """Control: the same join against a plain parquet copy shuffles —
    the bucketing, not the data size, removes the exchange."""
    a, _ = bucketed_pair
    plain_path = str(tmp_path / "plain")
    spark.table(a).write.mode("overwrite").parquet(plain_path)
    plain = spark.read.parquet(plain_path)
    joined = spark.table(a).join(plain, "url")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan, plan
