"""Structured-Streaming ingest of the pages source into a signature store.

The reference is strictly batch; the lakehouse-scale extension point is a
stream of page snapshots (new WARC drops landing as parquet files). Each
micro-batch flows through the same incremental anti-join as the batch path
(operators/incremental.py): only new/changed urls pay for signature
computation, vanished/stale cached rows are dropped, and the store is
swapped atomically (write new generation, flip a pointer file) so readers
never observe a half-written store.

``trigger(availableNow=True)`` drains everything currently in the source
and stops — the snapshot-catch-up mode; leave it off for a long-running
ingest.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from ..functions.text import extract_text_udf
from ..operators.exact import content_hash_col
from ..operators.signature_stage import compute_signatures

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


class SignatureStore:
    """Atomically-swapped parquet signature store (Iceberg table in a real
    deployment — MERGE INTO replaces the generation swap)."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = Path(base_dir)
        self.base.mkdir(parents=True, exist_ok=True)

    @property
    def _pointer(self) -> Path:
        return self.base / "_CURRENT"

    def current_path(self) -> str | None:
        if not self._pointer.exists():
            return None
        gen = self._pointer.read_text().strip()
        return str(self.base / gen)

    def read(self) -> DataFrame | None:
        path = self.current_path()
        if path is None:
            return None
        return self.spark.read.parquet(path)

    def swap_in(self, df: DataFrame) -> str:
        gen = f"gen-{int(time.time() * 1000)}"
        path = str(self.base / gen)
        df.write.mode("overwrite").parquet(path)
        tmp = self._pointer.with_suffix(".tmp")
        tmp.write_text(gen)
        tmp.replace(self._pointer)  # atomic pointer flip
        return path


class StreamingSignatureIngest:
    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        cfg: DedupConfig | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.store = SignatureStore(spark, store_dir)
        self.batch_stats: list[dict] = []

    # -- batch-side logic (also usable without a stream) --------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(
            "url", extract_text_udf(F.col("html")).alias("text")
        ).withColumn("content_hash", content_hash_col(F.col("text")))

        old = self.store.read()
        if old is None:
            sigs = compute_signatures(
                docs, self.cfg, keep_cols=["url", "content_hash", "text"]
            )
            delta_count = None
        else:
            # upsert semantics, NOT snapshot semantics: a stream micro-batch
            # carries only newly-landed pages, so a url being absent from
            # the batch means "unchanged", not "deleted" (snapshot deletes
            # are the batch path's incremental_signatures job).
            keys = ["url", "content_hash"]
            delta = docs.join(old.select(*keys), keys, "left_anti")
            untouched = old.join(docs.select("url"), "url", "left_anti")
            unchanged = old.join(docs.select(*keys), keys, "left_semi")
            fresh = compute_signatures(
                delta, self.cfg, keep_cols=["url", "content_hash", "text"]
            )
            sigs = untouched.unionByName(unchanged).unionByName(fresh)
            delta_count = delta.count()

        path = self.store.swap_in(sigs)
        stat = {
            "batch_id": int(batch_id),
            "store_rows": self.spark.read.parquet(path).count(),
            "delta_rows": delta_count,
        }
        self.batch_stats.append(stat)
        meta = Path(path) / "_ingest.json"
        meta.write_text(json.dumps(stat))

    # -- stream wiring -------------------------------------------------------
    def start(
        self,
        input_path: str,
        stream_checkpoint: str,
        available_now: bool = True,
    ):
        stream = (
            self.spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", 8)
            .parquet(input_path)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", stream_checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
