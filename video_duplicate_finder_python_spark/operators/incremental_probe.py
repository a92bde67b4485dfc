"""Incremental near-dup probe: a NEW batch of pages vs the EXISTING
signature store, without re-running the corpus pipeline.

The reference re-scans the whole library and compares everything cached
when new files land (scanner.py:88-124 + comparator full pass). The batch
pipeline here is O(corpus) per run by design; the streaming ingest keeps
the signature STORE current in O(delta) (streaming/ingest.py) — but
neither answers the operational question "which of today's N new pages
duplicate something we already have?" in O(delta) work. This operator
does:

- signatures for the new batch only (the Arrow kernel, O(delta));
- the store side is ONE scan with the new batch's band hashes
  **broadcast** against it — the 10^12-row store is never shuffled,
  never banded into a window, never collected; a deployment that keeps
  a materialized band index partitioned by band_hash turns the scan
  into partition-pruned probes (same seam as `build_ann_index`);
- skew-safe boilerplate guard with NO window: match counts per new doc
  come from a map-side-combinable groupBy, and a new doc matching more
  than ``max_matches_per_doc`` store docs is diverted to an ``overflow``
  output (these are boilerplate/empty-page probes where "which exact
  duplicates" is not an answerable question at bounded cost — the
  caller sees the url + match count instead of a silent explosion);
- exact verification reuses ``verify_candidates`` with shingle profiles
  recomputed ONLY for the matched url set (tiny by construction);
  within-batch (new×new) duplicates ride the same verify pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.signatures import make_shingles_udf
from .lsh import explode_bands
from .signature_stage import compute_signatures
from .verify import verify_candidates


def probe_near_dups(
    store: DataFrame,
    new_docs: DataFrame,
    cfg: DedupConfig,
    max_matches_per_doc: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """``store(url, minhash, simhash, text, ...)`` (a SignatureStore
    snapshot / signatures checkpoint) × ``new_docs(url, text)`` →
    ``(pairs, overflow)``.

    ``pairs(new_url, other_url, is_new_other, jaccard, hamming, is_dup)``
    — every verified candidate where ``new_url`` is from the batch;
    ``other_url`` is a store url (``is_new_other`` false) or another
    batch url (true). ``overflow(new_url, n_matches)`` — batch docs whose
    store-candidate count exceeded ``max_matches_per_doc`` (boilerplate
    guard; no pairs are emitted for them).
    """
    sigs_new = compute_signatures(new_docs, cfg, keep_cols=["url", "text"])
    bands_new = explode_bands(sigs_new, cfg).withColumnRenamed("url", "new_url")

    # store scan with the (tiny) batch band table broadcast: candidates
    # are store rows colliding with a batch band — no store-side shuffle
    bands_store = explode_bands(store, cfg)
    cand_old = (
        bands_store.join(F.broadcast(bands_new), ["band_id", "band_hash"])
        .where(F.col("url") != F.col("new_url"))
        .select("new_url", F.col("url").alias("other_url"))
        .dropDuplicates(["new_url", "other_url"])
    )

    # boilerplate guard: map-side-combinable count, no window anywhere
    counts = cand_old.groupBy("new_url").agg(F.count(F.lit(1)).alias("n_matches"))
    overflow = counts.where(F.col("n_matches") > max_matches_per_doc)
    cand_old = cand_old.join(F.broadcast(overflow.select("new_url")), "new_url", "left_anti")

    # within-batch candidates (new x new) from the same band table
    b2 = bands_new.withColumnRenamed("new_url", "other_url")
    cand_new = (
        bands_new.join(b2, ["band_id", "band_hash"])
        .where(F.col("new_url") < F.col("other_url"))
        .select("new_url", "other_url")
        .dropDuplicates(["new_url", "other_url"])
    )

    cand = cand_old.withColumn("is_new_other", F.lit(False)).unionByName(
        cand_new.withColumn("is_new_other", F.lit(True))
    )

    # profiles for exactly the urls verify will touch: the batch, plus the
    # matched store rows (semi-join — tiny). Shingles recomputed for this
    # set only, same policy as the batch pipeline's verify stage.
    matched_old = store.join(
        F.broadcast(cand.where(~F.col("is_new_other")).select(F.col("other_url").alias("url")).distinct()),
        "url",
        "left_semi",
    ).select("url", "text", "simhash")
    profile_src = sigs_new.select("url", "text", "simhash").unionByName(matched_old)
    profiles = profile_src.withColumn(
        "shingles", make_shingles_udf(cfg.shingle_k)(F.col("text"))
    ).select("url", "shingles", "simhash")

    oriented = cand.select(
        "new_url",
        "other_url",
        "is_new_other",
        F.least("new_url", "other_url").alias("url_a"),
        F.greatest("new_url", "other_url").alias("url_b"),
    )
    candidates = oriented.select(
        "url_a", "url_b", F.array(F.lit("minhash")).alias("sources")
    ).dropDuplicates(["url_a", "url_b"])
    verified = verify_candidates(candidates, profiles, cfg, texts=None)

    pairs = oriented.join(verified, ["url_a", "url_b"]).select(
        "new_url", "other_url", "is_new_other", "jaccard", "hamming", "is_dup"
    )
    return pairs, overflow
