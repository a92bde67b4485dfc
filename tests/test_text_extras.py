"""Python-oracle twins for the round-5 text extras: weighted (multiset)
Jaccard, TF-IDF top terms (linear idf), and the Gopher-style duplicate-
2-gram repetition score. Each Spark result is compared against an
independent pure-Python computation on a handcrafted corpus that exercises
the edge cases (no shared tokens, identical docs, repeated tokens where
set- and multiset-Jaccard diverge, single-token and empty docs)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the mat"),  # identical → WJ 1.0
    (2, "the the the the cat"),  # repetition: multiset ≠ set jaccard
    (3, "zebra quagga okapi"),  # disjoint from 0/1/2
    (4, "one"),  # single token → rep 0.0, no bigrams
    (5, ""),  # empty text → [''] token
    (6, "spam ham spam ham spam ham"),  # heavy bigram repetition
]


def py_weighted_jaccard(ta: str, tb: str) -> float:
    ca, cb = Counter(ta.split(" ")), Counter(tb.split(" "))
    inter = sum(min(ca[t], cb[t]) for t in ca.keys() & cb.keys())
    union = sum(ca.values()) + sum(cb.values()) - inter
    return inter / union


def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_weighted_jaccard_matches_counter_oracle(spark):
    from video_duplicate_finder_python_spark.operators.weighted_jaccard import (
        weighted_jaccard_pairs,
    )

    d = docs_df(spark)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(len(DOCS)) for b in range(a + 1, len(DOCS))],
        ["doc_a", "doc_b"],
    )
    got = {
        (r.doc_a, r.doc_b): r.w_jaccard
        for r in weighted_jaccard_pairs(d, pairs).collect()
    }
    assert len(got) == len(DOCS) * (len(DOCS) - 1) // 2
    for (a, ta), (b, tb) in [
        (DOCS[i], DOCS[j])
        for i in range(len(DOCS))
        for j in range(i + 1, len(DOCS))
    ]:
        assert got[(a, b)] == py_weighted_jaccard(ta, tb), (a, b)
    # the cases that motivate the operator
    assert got[(0, 1)] == 1.0
    assert got[(0, 3)] == 0.0
    # set-Jaccard of (0,2) would be 2/6; multiset is min-sum 3 / max-sum 8
    assert got[(0, 2)] == 3 / 8


def test_tfidf_top_terms_matches_python_oracle(spark):
    from video_duplicate_finder_python_spark.functions.tfidf import tfidf_top_terms

    d = docs_df(spark)
    n = len(DOCS)
    tf: dict[tuple[int, str], int] = {}
    for doc_id, text in DOCS:
        for t, c in Counter(text.split(" ")).items():
            tf[(doc_id, t)] = c
    df: Counter = Counter(t for (_, t) in tf)
    expected = {}
    for doc_id, _ in DOCS:
        terms = [(t, c) for (d_, t), c in tf.items() if d_ == doc_id]
        ranked = sorted(terms, key=lambda tc: (-(tc[1] * n / df[tc[0]]), tc[0]))
        expected[doc_id] = [
            (t, c, df[t], (c * n) / df[t], i + 1) for i, (t, c) in enumerate(ranked[:3])
        ]
    rows = tfidf_top_terms(d, k=3).orderBy("doc_id", "term_rank").collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.term, r.tf, r.df, r.score, r.term_rank)
        )
    assert got == expected


def test_repetition_score_matches_python_oracle(spark):
    from video_duplicate_finder_python_spark.functions.textstats import (
        repetition_score,
    )

    def py_rep(text: str) -> float:
        toks = text.split(" ")
        if len(toks) < 2:
            return 0.0
        bg = [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
        return 1.0 - len(set(bg)) / len(bg)

    rows = (
        docs_df(spark)
        .select("doc_id", repetition_score(F.col("text")).alias("rep"))
        .collect()
    )
    got = {r.doc_id: r.rep for r in rows}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_rep(text), doc_id
    assert got[4] == 0.0 and got[5] == 0.0
    # "spam ham" ×3 interleaved: 5 bigrams, 2 distinct → 0.6
    assert got[6] == 0.6


# ---------------------------------------------------------------------------
# SQL-reproducible SimHash (functions/simhash_sql.py) — the cross-engine
# verifiable twin of the production blake2b SimHash path
# ---------------------------------------------------------------------------
def test_simhash_sql_matches_duckdb_brute_force(spark):
    import duckdb

    from video_duplicate_finder_python_spark.functions.simhash_sql import (
        simhash_sql_oracle,
        simhash_sql_pairs,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy cat again and again"),  # near 0
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact 0
        (3, "completely different words about spark partitions and shuffles"),
        (4, "another unrelated sentence mentioning minhash bands and rows"),
        (5, "the quick brown fox leaps over the lazy dog again and again"),  # near 0
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_sql_pairs(docs).orderBy("doc_a", "doc_b").collect()
    ]
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    want = [tuple(r) for r in con.sql(simhash_sql_oracle()).fetchall()]
    assert got == want
    # the planted exact pair must be present at hamming 0
    assert (0, 2, 0) in got


def test_simhash_sql_pigeonhole_recall_guarantee(spark):
    """Every pair within the Hamming threshold MUST be emitted (pigeonhole:
    6 chunks catch hamming <= 5) — compare against a brute-force pass over
    the signatures themselves."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from video_duplicate_finder_python_spark.functions.simhash_sql import (
        simhash60,
        simhash_sql_pairs,
    )

    docs = spark.range(40).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(
            F.lit("shared prefix tokens for everyone then w"),
            (F.col("id") % 7).cast("string"),
            F.lit(" and w"),
            (F.col("id") % 11).cast("string"),
        ).alias("text"),
    )
    sigs = {
        r["doc_id"]: r["sig"]
        for r in docs.select("doc_id", simhash60(F.col("text")).alias("sig")).collect()
    }
    want = {
        (a, b)
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 5
    }
    got = {
        (r["doc_a"], r["doc_b"]) for r in simhash_sql_pairs(docs).collect()
    }
    assert got == want and want  # non-vacuous
