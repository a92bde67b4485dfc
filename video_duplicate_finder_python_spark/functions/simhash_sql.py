"""SQL-reproducible SimHash — md5-derived 60-bit signatures, pure JVM.

The pipeline's production SimHash (functions/signatures.py) hashes tokens
with blake2b inside the batched Arrow UDF — fast, but no SQL engine can
replay blake2b, so its driver-side correctness check was rows-only. This
module is the same algorithm expressed entirely in Catalyst expressions
over a hash both Spark and DuckDB implement bit-identically (md5), so the
driver's DuckDB oracle can verify SimHash semantics end-to-end
(signature → pigeonhole candidates → Hamming verify), hash-matched:

- token hash: first 15 hex chars of ``md5(token)`` → 60-bit int (15 hex
  chars keep the value < 2^60 < 2^63, exact in a signed BIGINT in both
  engines; Spark's ``conv(_, 16, 10)`` and DuckDB's ``('0x'||h)::BIGINT``
  agree on that range),
- per-bit votes: one ``aggregate`` over the token array building a
  60-long count array via ``zip_with`` (bit test is ``h & 2^b``, all
  integer ops — no doubles anywhere, so no rounding divergence),
- signature bit b is 1 iff ``2 * ones_b > n_tokens`` (strict majority,
  deterministic at ties).

Everything is whole-stage-codegen JVM: no UDF, no shuffle until the
candidate groupBy. Candidate generation reuses operators/bucket_join
(pigeonhole: ``n_chunks`` equal slices of the signature; any pair within
Hamming ``n_chunks - 1`` shares ≥ 1 exact chunk, so the chunk-equality
buckets have guaranteed recall at ``threshold <= n_chunks - 1``) and the
verify step is a JVM ``bit_count(xor)``.

Reference parity: same per-frame Hamming semantic as the reference's
similarity scoring (/root/reference/src/core/hasher.py:110-124), over
web text instead of video frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.bucket_join import bucket_pairs
from ..operators.simhash_candidates import explode_chunks

SIMHASH_SQL_BITS = 60


def simhash60(text: Column) -> Column:
    """60-bit md5-SimHash of the whitespace token multiset of ``text``
    (bigint). Pure Catalyst expression — see module docstring."""
    toks = F.split(text, " ")
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
    )
    pows = F.array(
        *[F.lit(1 << b).cast("bigint") for b in range(SIMHASH_SQL_BITS)]
    )
    zero = F.lit(0).cast("bigint")
    counts = F.aggregate(
        hashes,
        F.array_repeat(zero, SIMHASH_SQL_BITS),
        lambda acc, h: F.zip_with(
            acc,
            pows,
            lambda a, p: a + F.when(h.bitwiseAND(p) != zero, 1).otherwise(0),
        ),
    )
    n = F.size(toks)
    return F.aggregate(
        F.zip_with(
            counts, pows, lambda c, p: F.when(c * 2 > n, p).otherwise(zero)
        ),
        zero,
        lambda a, x: a + x,
    )


def simhash_sql_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: int = 5,
    n_chunks: int = 6,
    max_bucket_size: int = 1_000_000,
) -> DataFrame:
    """→ ``(doc_a, doc_b, hamming)`` for every pair within Hamming
    ``threshold`` of each other's md5-SimHash (``doc_a < doc_b``).

    ``n_chunks`` must divide 60 and exceed ``threshold`` (pigeonhole
    recall guarantee — asserted). The default (6 chunks of 10 bits,
    threshold 5) is tuned for *exactness against the brute-force oracle*:
    wider thresholds need narrower chunks, which admit more false
    candidates — at web scale, prefer the production pipeline's 4×16-bit
    chunks at threshold 3 and treat this operator as the
    cross-engine-verifiable twin. ``max_bucket_size`` defaults high
    because capping would break brute-force parity; production candidate
    generation caps + salts instead (operators/bucket_join.py)."""
    assert SIMHASH_SQL_BITS % n_chunks == 0, "n_chunks must divide 60"
    assert threshold <= n_chunks - 1, "pigeonhole needs threshold <= n_chunks - 1"
    sigs = docs.select(
        F.col(id_col).alias("url"), simhash60(F.col(text_col)).alias("sig")
    )
    chunked = explode_chunks(sigs, "sig", SIMHASH_SQL_BITS, n_chunks)
    pairs, _dropped, _caches = bucket_pairs(
        chunked,
        key_cols=["chunk_id", "chunk_value"],
        carry_cols=["sig"],
        max_bucket_size=max_bucket_size,
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .where(F.col("hamming") <= threshold)
        .select(
            F.col("url_a").alias("doc_a"), F.col("url_b").alias("doc_b"), "hamming"
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_sql_oracle(threshold: int = 5) -> str:
    """DuckDB brute-force twin of ``simhash_sql_pairs`` over the
    ``documents`` view — generated beside the Spark expression so the two
    stay in lockstep. O(n²) on purpose: the oracle verifies, the operator
    scales."""
    bits = SIMHASH_SQL_BITS
    ones = ",\n    ".join(
        f"SUM((h >> {b}) & 1) AS c{b}" for b in range(bits)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN 2 * c{b} > n THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         len(string_split(text, ' ')) AS n
  FROM documents
), hashed AS (
  SELECT doc_id, n,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
  FROM toks
), votes AS (
  SELECT doc_id, any_value(n) AS n,
    {ones}
  FROM hashed GROUP BY doc_id
), sigs AS (
  SELECT doc_id, ({sig_terms})::BIGINT AS sig FROM votes
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sig, b.sig))::INTEGER AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {threshold}
ORDER BY doc_a, doc_b
"""
