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
- **exactly two store passes**, both shuffle-free on the store side:
  (1) the band probe — the batch's band hashes are **broadcast** against
  one scan of the store's banded view, and the (tiny) candidate output
  is persisted so every downstream action reuses it instead of
  re-scanning; (2) the text fetch — a broadcast left-semi join pulls
  text/simhash for just the matched url set. The 10^12-row store is
  never shuffled, never windowed, never collected; a deployment that
  keeps a materialized band index partitioned by band_hash turns pass
  (1) into partition-pruned probes (same seam as ``build_ann_index``);
- skew-safe boilerplate guard with NO window: candidate degree per new
  doc (store matches AND within-batch matches) comes from a map-side-
  combinable groupBy, and a new doc whose degree exceeds
  ``max_matches_per_doc`` is diverted to an ``overflow`` output — these
  are boilerplate/empty-page probes where "which exact duplicates" is
  not an answerable question at bounded cost; the caller sees the url +
  match count instead of a silent quadratic explosion (within-batch
  pairs are capped by the same guard: a pair is dropped if EITHER
  endpoint overflows);
- exact verification reuses ``verify_candidates`` with shingle profiles
  recomputed ONLY for the matched url set (tiny by construction);
  within-batch (new×new) duplicates ride the same verify pass.

Cache ownership follows the house pattern (plans/pipeline.py:492-494):
the returned ``cached`` list holds every persisted handle this call
created (the candidate table and verify's internal cache) — the caller
must ``unpersist()`` them after running its actions, or a long-running
stream accumulates cached frames without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

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
    persist: bool = True,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """``store(url, minhash, simhash, text, ...)`` (a SignatureStore
    snapshot / signatures checkpoint) × ``new_docs(url, text)`` →
    ``(pairs, overflow, cached)``.

    ``pairs(new_url, other_url, is_new_other, jaccard, hamming, is_dup)``
    — every verified candidate where ``new_url`` is from the batch;
    ``other_url`` is a store url (``is_new_other`` false) or another
    batch url (true). ``overflow(new_url, n_matches)`` — batch docs whose
    candidate degree exceeded ``max_matches_per_doc`` (boilerplate guard;
    no pairs are emitted for them). ``cached`` — persisted handles the
    caller must unpersist after its actions (empty when
    ``persist=False``, which re-runs the store band scan per action).
    """
    caches: list[DataFrame] = []
    # drop the CDC fingerprints STRUCTURALLY: no probe consumer reads
    # them, and without the drop the persist below would materialize the
    # per-byte CDC UDF pass Catalyst's column pruning otherwise removes
    sigs_new = compute_signatures(new_docs, cfg, keep_cols=["url", "text"]).drop(
        "fingerprints"
    )
    if persist:
        # the batch signature kernel feeds the band broadcast (twice: the
        # store probe and the within-batch self-join) AND the verify
        # profiles — cache it or it re-runs once per consumer per action
        sigs_new = sigs_new.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(sigs_new)
    bands_new = explode_bands(sigs_new, cfg).withColumnRenamed("url", "new_url")

    # store pass 1: band probe — batch bands broadcast against one scan
    # of the banded store; the candidate output is tiny and persisted so
    # the degree count, the anti-joins, and both returned actions reuse
    # it instead of re-scanning the store
    bands_store = explode_bands(store, cfg)
    cand_old = (
        bands_store.join(F.broadcast(bands_new), ["band_id", "band_hash"])
        .where(F.col("url") != F.col("new_url"))
        .select("new_url", F.col("url").alias("other_url"))
        .dropDuplicates(["new_url", "other_url"])
    )
    if persist:
        cand_old = cand_old.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(cand_old)

    # within-batch candidates (new x new) from the same band table
    b2 = bands_new.withColumnRenamed("new_url", "other_url")
    cand_new = (
        bands_new.join(b2, ["band_id", "band_hash"])
        .where(F.col("new_url") < F.col("other_url"))
        .select("new_url", "other_url")
        .dropDuplicates(["new_url", "other_url"])
    )

    # boilerplate guard: candidate DEGREE per batch doc across both
    # sources (a within-batch pair counts toward both endpoints) via a
    # map-side-combinable groupBy — no window anywhere
    degree = (
        cand_old.select("new_url")
        .unionAll(cand_new.select("new_url"))
        .unionAll(cand_new.select(F.col("other_url").alias("new_url")))
        .groupBy("new_url")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    overflow = degree.where(F.col("n_matches") > max_matches_per_doc)
    ov_a = F.broadcast(overflow.select("new_url"))
    ov_b = F.broadcast(overflow.select(F.col("new_url").alias("other_url")))
    cand_old = cand_old.join(ov_a, "new_url", "left_anti")
    cand_new = (
        cand_new.join(ov_a, "new_url", "left_anti")
        .join(ov_b, "other_url", "left_anti")
    )

    cand = cand_old.withColumn("is_new_other", F.lit(False)).unionByName(
        cand_new.withColumn("is_new_other", F.lit(True))
    )

    # store pass 2: text/simhash fetch for exactly the matched url set
    # (broadcast left-semi — tiny by construction after the cap)
    matched_old = store.join(
        F.broadcast(
            cand.where(~F.col("is_new_other"))
            .select(F.col("other_url").alias("url"))
            .distinct()
        ),
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
    vc = getattr(verified, "_vdf_cached", None)
    if vc is not None:
        caches.append(vc)

    pairs = oriented.join(verified, ["url_a", "url_b"]).select(
        "new_url", "other_url", "is_new_other", "jaccard", "hamming", "is_dup"
    )
    return pairs, overflow, caches
