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
- **one store pass per enabled candidate source plus one text fetch**,
  every one shuffle-free on the store side: the MinHash band probe and
  (with ``substring=True``) the CDC-fingerprint probe each broadcast the
  batch's keys against one scan of the store's exploded view, and the
  (tiny) candidate output is persisted so downstream actions reuse it;
  the text fetch is a broadcast left-semi join pulling text/simhash for
  just the matched url set. The 10^12-row store is never shuffled, never
  windowed, never collected; a deployment that keeps materialized
  band/fingerprint indexes partitioned by hash turns the scans into
  partition-pruned probes (same seam as ``build_ann_index``);
- the fingerprint source closes the recall class the band probe alone
  misses: a batch doc sharing a >= ``substring_min_len`` verbatim span
  with a store doc at LOW overall Jaccard (the pipeline's "suffix"
  source, operators/substring.py) — verified through the same
  anchored-span check `verify_candidates` runs for the batch pipeline;
- skew-safe boilerplate guard with NO window: candidate degree per new
  doc (store matches AND within-batch matches, across all sources)
  comes from a map-side-combinable groupBy, and a new doc whose degree
  exceeds ``max_matches_per_doc`` is diverted to an ``overflow`` output
  — these are boilerplate/empty-page probes where "which exact
  duplicates" is not an answerable question at bounded cost; the caller
  sees the url + match count instead of a silent quadratic explosion
  (within-batch pairs are dropped if EITHER endpoint overflows);
- exact verification reuses ``verify_candidates`` with shingle profiles
  recomputed ONLY for the matched url set (tiny by construction);
  within-batch (new×new) duplicates ride the same verify pass.

Cache ownership follows the house pattern (plans/pipeline.py:492-494):
the returned ``cached`` list holds every persisted handle this call
created (batch signatures, the candidate tables, verify's internal
cache) — the caller must ``unpersist()`` them after running its actions,
or a long-running stream accumulates cached frames without bound.
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
    substring: bool = True,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """``store(url, minhash, simhash, text[, fingerprints], ...)`` (a
    SignatureStore snapshot / signatures checkpoint) × ``new_docs(url,
    text)`` → ``(pairs, overflow, cached)``.

    ``pairs(new_url, other_url, is_new_other, jaccard, hamming, lcs_len,
    is_dup)`` — every verified candidate where ``new_url`` is from the
    batch; ``other_url`` is a store url (``is_new_other`` false) or
    another batch url (true); ``lcs_len`` is the exact verbatim-span
    length for fingerprint-source pairs that needed the substring check
    (NULL otherwise). ``overflow(new_url, n_matches)`` — batch docs whose
    candidate degree exceeded ``max_matches_per_doc`` (boilerplate guard;
    no pairs are emitted for them). ``cached`` — persisted handles the
    caller must unpersist after its actions.

    ``substring=True`` requires a ``fingerprints`` column on the store
    (every SignatureStore / compute_signatures output has one) and adds
    the CDC-fingerprint candidate source; ``False`` skips it AND prunes
    the batch-side CDC kernel structurally.
    """
    if substring and "fingerprints" not in store.columns:
        raise ValueError(
            "substring=True needs a 'fingerprints' column on the store "
            "(compute_signatures output); pass substring=False to probe "
            "with MinHash bands only"
        )
    caches: list[DataFrame] = []
    # a url present in BOTH batch and store (streaming re-crawl: the probe
    # runs before the upsert) would make "other_url is a store url"
    # ambiguous — the same pair would appear against the store's OLD text
    # and the batch's NEW text with different scores/sources, fanning the
    # verify join into conflicting duplicate rows. The batch is
    # authoritative for its own urls: store rows they shadow are excluded
    # from candidates AND profiles (broadcast anti — the store side stays
    # shuffle-free).
    store = store.join(
        F.broadcast(new_docs.select("url").distinct()), "url", "left_anti"
    )
    sigs_new = compute_signatures(new_docs, cfg, keep_cols=["url", "text"])
    if not substring:
        # drop the CDC fingerprints STRUCTURALLY: nothing reads them, and
        # the persist below would otherwise materialize the per-byte CDC
        # UDF pass Catalyst's column pruning normally removes
        sigs_new = sigs_new.drop("fingerprints")
    if persist:
        # the batch signature kernel feeds every candidate source (store
        # probe + within-batch self-join, per source) AND the verify
        # profiles — cache it or it re-runs once per consumer per action
        sigs_new = sigs_new.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(sigs_new)

    # --- candidate sources: per source, one broadcast store probe + one
    # within-batch self-join, each row tagged with its source name -------
    bands_new = explode_bands(sigs_new, cfg).withColumnRenamed("url", "new_url")
    bands_store = explode_bands(store, cfg)
    old_parts = [
        bands_store.join(F.broadcast(bands_new), ["band_id", "band_hash"])
        .where(F.col("url") != F.col("new_url"))
        .select("new_url", F.col("url").alias("other_url"), F.lit("minhash").alias("src"))
    ]
    b2 = bands_new.withColumnRenamed("new_url", "other_url")
    new_parts = [
        bands_new.join(b2, ["band_id", "band_hash"])
        .where(F.col("new_url") < F.col("other_url"))
        .select("new_url", "other_url", F.lit("minhash").alias("src"))
    ]
    if substring:
        # cdc_fingerprints emits a distinct set per doc, so the exploded
        # (url, fp) rows are unique by construction — no dedup needed
        fp_new = sigs_new.select(
            F.col("url").alias("new_url"), F.explode("fingerprints").alias("fp")
        )
        fp_store = store.select("url", F.explode("fingerprints").alias("fp"))
        old_parts.append(
            fp_store.join(F.broadcast(fp_new), "fp")
            .where(F.col("url") != F.col("new_url"))
            .select(
                "new_url", F.col("url").alias("other_url"), F.lit("suffix").alias("src")
            )
        )
        fp2 = fp_new.withColumnRenamed("new_url", "other_url")
        new_parts.append(
            fp_new.join(fp2, "fp")
            .where(F.col("new_url") < F.col("other_url"))
            .select("new_url", "other_url", F.lit("suffix").alias("src"))
        )

    def collect_pairs(parts: list[DataFrame]) -> DataFrame:
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u.groupBy("new_url", "other_url").agg(
            F.collect_set("src").alias("sources")
        )

    cand_old = collect_pairs(old_parts)
    if persist:
        cand_old = cand_old.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(cand_old)
    cand_new = collect_pairs(new_parts)

    # boilerplate guard: candidate DEGREE per batch doc across both
    # sides (a within-batch pair counts toward both endpoints) via a
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

    # store text fetch for exactly the urls verify will touch: the batch,
    # plus the matched store rows (broadcast left-semi — tiny after the
    # cap). Shingles recomputed for this set only, same policy as the
    # batch pipeline's verify stage.
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
        "sources",
        F.least("new_url", "other_url").alias("url_a"),
        F.greatest("new_url", "other_url").alias("url_b"),
    )
    candidates = oriented.select("url_a", "url_b", "sources").dropDuplicates(
        ["url_a", "url_b"]
    )
    verified = verify_candidates(
        candidates,
        profiles,
        cfg,
        texts=profile_src.select("url", "text") if substring else None,
    )
    vc = getattr(verified, "_vdf_cached", None)
    if vc is not None:
        caches.append(vc)

    pairs = oriented.join(verified.drop("sources"), ["url_a", "url_b"]).select(
        "new_url", "other_url", "is_new_other", "jaccard", "hamming", "lcs_len", "is_dup"
    )
    return pairs, overflow, caches
