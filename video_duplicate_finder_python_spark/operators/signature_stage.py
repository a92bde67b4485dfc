"""The signature stage as a reusable transformation (SURVEY O2).

Shared by the batch pipeline (plans/pipeline.py, on exact-dup
representatives) and the streaming ingest (streaming/ingest.py, per
micro-batch delta): one Arrow-batched NumPy UDF for shingling +
MinHash+SimHash, one for CDC substring fingerprints. Shingle hashing runs
in the UDF, not in a JVM higher-order function — the interpreted HOF path
scales inversely with local threads (see functions/signatures.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.fingerprint import cdc_fingerprints_udf
from ..functions.signatures import make_text_signature_udf

SIGNATURE_COLS = ["minhash", "simhash", "n_shingles", "fingerprints"]


def compute_signatures(
    docs: DataFrame, cfg: DedupConfig, keep_cols: list[str] | None = None
) -> DataFrame:
    """``docs(url, text, ...)`` → keep_cols + minhash/simhash/n_shingles/
    fingerprints."""
    keep_cols = keep_cols if keep_cols is not None else ["url", "text"]
    sig_udf = make_text_signature_udf(cfg.seed, cfg.num_perm, cfg.shingle_k)
    fp_udf = cdc_fingerprints_udf(cfg.cdc_window, cfg.cdc_mask_bits, cfg.cdc_min_chunk)
    return (
        docs.withColumn("_sig", sig_udf(F.col("text")))
        .withColumn("fingerprints", fp_udf(F.col("text")))
        .select(
            *keep_cols,
            F.col("_sig.minhash").alias("minhash"),
            F.col("_sig.simhash").alias("simhash"),
            F.col("_sig.n_shingles").alias("n_shingles"),
            "fingerprints",
        )
    )
