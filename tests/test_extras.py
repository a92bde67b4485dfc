"""Training-pipeline extras: text stats, ANN (brute vs LSH), multimodal stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_duplicate_finder_python_spark.functions.multimodal import decode_media
from video_duplicate_finder_python_spark.functions.textstats import (
    lang_guess,
    quality_score,
    regex_token_count,
    token_count,
)
from video_duplicate_finder_python_spark.operators.ann import (
    brute_force_topk,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.01"


def test_textstats_columns(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog sat on a mat of wool to rest in it is",),
            ("der hund und die katze ist nicht ein tier",),
            ("xyzzy plugh qwerty",),
        ],
        ["text"],
    )
    rows = df.select(
        token_count(F.col("text")).alias("n"),
        regex_token_count(F.col("text")).alias("rn"),
        lang_guess(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    assert rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "de"
    assert rows[2]["lang"] == "und"
    assert rows[0]["n"] == rows[0]["rn"]
    assert 0.0 <= rows[0]["q"] <= 1.0
    assert rows[2]["q"] < rows[0]["q"]


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ann_lsh_recall_vs_brute(spark, embeddings):
    brute = [r["vec_id"] for r in brute_force_topk(embeddings, 0, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_topk(embeddings, 0, k=10).collect()]
    # multiprobe hyperplane LSH should recover most of the exact top-10
    overlap = len(set(brute) & set(approx))
    assert overlap >= 5, (brute, approx)
    # and both are deterministic
    approx2 = [r["vec_id"] for r in lsh_topk(embeddings, 0, k=10).collect()]
    assert approx == approx2


def test_multimodal_decode_stub(spark):
    df = spark.createDataFrame(
        [("u1", b"\x00\x01\x02" * 100), ("u2", b"\xff" * 50), ("u3", None)],
        ["url", "html"],
    )
    out = decode_media(df).collect()
    assert {r["key"] for r in out} == {"u1", "u2"}  # None row dropped
    by_key = {r["key"]: r for r in out}
    assert by_key["u1"]["n_bytes"] == 300
    assert len(by_key["u1"]["features"]) == 16
    assert abs(sum(by_key["u1"]["features"]) - 1.0) < 1e-5
    assert 64 <= by_key["u2"]["width"] < 256
    # determinism
    out2 = decode_media(df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_multimodal_real_codec_raises(spark):
    df = spark.createDataFrame([("u", b"x")], ["url", "html"])
    with pytest.raises(NotImplementedError):
        decode_media(df, codec="jpeg")
