"""Single-node oracle re-implementing the *semantics* the pipeline must match.

Mirrors the reference's pipeline shape — candidate generation → pairwise
similarity >= threshold → transitive union-find grouping
(/root/reference/src/core/comparator.py:25-36 and
/root/reference/src/gui/main_window.py:224-264) — but with the web-text
similarity the north rule fixes: exact word-shingle Jaccard. The oracle is
deliberately brute-force (all-pairs) so it has *perfect* recall; the Spark
engine's dup-pair recall is measured against it (bar: >= 0.99 on pairs with
jaccard_true >= threshold, BASELINE.json).

Substring ground truth: exact longest-common-substring check on every pair
*within a planted duplicate family* (docs connected through planted pairs).
Two derived docs of one base can share the planted span with each other,
not just with the base, so the check must be family-wide; restricting LCS
to families is still exact because accidental >=500-char verbatim overlap
between independently-random docs is impossible at these sizes.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from .functions.lcs import longest_common_substring_len


def shingle_set(text: str, k: int) -> set[tuple[str, ...]]:
    toks = text.split(" ")
    if not toks:
        return set()
    if len(toks) < k:
        return {tuple(toks)}
    return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class UnionFind:
    """Transitive grouping with the same final semantics as the reference's
    greedy merge loop (/root/reference/src/gui/main_window.py:238-255)."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # keep the lexicographically smaller root so cluster_id = min(url)
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


@dataclass
class OracleResult:
    pairs: pd.DataFrame     # url_a, url_b, jaccard_true, kind
    clusters: pd.DataFrame  # url, cluster_id (only urls that appear in pairs)


def run_oracle(
    pages: pd.DataFrame,
    truth_pairs: pd.DataFrame,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    substring_min_len: int = 500,
) -> OracleResult:
    urls = pages["url"].tolist()
    texts = dict(zip(pages["url"], pages["text"]))
    shingles = {u: shingle_set(texts[u], shingle_k) for u in urls}

    rows: list[tuple[str, str, float, str]] = []
    seen: set[tuple[str, str]] = set()

    # all-pairs Jaccard (perfect-recall near/exact ground truth)
    for i in range(len(urls)):
        for j in range(i + 1, len(urls)):
            a, b = sorted((urls[i], urls[j]))
            jac = jaccard(shingles[a], shingles[b])
            if jac >= jaccard_threshold:
                rows.append((a, b, jac, "exact" if texts[a] == texts[b] else "near"))
                seen.add((a, b))

    # substring duplicates: exact LCS >= L over every pair inside a planted
    # duplicate family (see module docstring for why family-wide is exact)
    fam = UnionFind()
    for r in truth_pairs.itertuples(index=False):
        fam.union(r.url_a, r.url_b)
    families: dict[str, list[str]] = {}
    for u in {x for r in truth_pairs.itertuples(index=False) for x in (r.url_a, r.url_b)}:
        families.setdefault(fam.find(u), []).append(u)
    for members in families.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if (a, b) in seen:
                    continue
                if longest_common_substring_len(texts[a], texts[b]) >= substring_min_len:
                    rows.append((a, b, jaccard(shingles[a], shingles[b]), "substring"))
                    seen.add((a, b))

    pairs = pd.DataFrame(rows, columns=["url_a", "url_b", "jaccard_true", "kind"])

    uf = UnionFind()
    for r in pairs.itertuples(index=False):
        uf.union(r.url_a, r.url_b)
    members = sorted({u for r in pairs.itertuples(index=False) for u in (r.url_a, r.url_b)})
    clusters = pd.DataFrame({"url": members, "cluster_id": [uf.find(u) for u in members]})
    return OracleResult(pairs=pairs, clusters=clusters)
