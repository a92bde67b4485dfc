"""URL canonicalization — pure-JVM column expressions (no UDF).

Training-data pipelines over web crawls dedup first on the *canonical*
URL: the same page is typically crawled under dozens of surface forms
(tracking parameters, fragments, case-insensitive hosts, default ports,
trailing slashes). Collapsing those before any content hashing removes
the cheapest duplicate class with zero text processing — at 10^12 docs
this is a groupBy on a short string, map-side-combinable and skew-free
relative to content keys.

Reference parity: the reference dedups files by absolute path only
(/root/reference/src/core/scanner.py) — surface-form identity. This is
the web generalization of that same "same name -> same item" first pass.

Canonical form (applied in this order, each step a deterministic string
rewrite; the DuckDB twin lives in __spark_entry__.oracle_sql):

1. trim surrounding whitespace
2. strip the fragment (``#...``)
3. lowercase the ``scheme://host[:port]`` prefix (path/query untouched)
4. strip default ports (``http://h:80`` -> ``http://h``, ``https://h:443``
   -> ``https://h``)
5. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid`` by
   default; caller-extensible), then repair the separator chain (first
   ``&`` after a stripped leading ``?`` becomes ``?``; dangling
   ``?``/``&`` dropped)
6. collapse ``/+?`` to ``?`` and strip trailing slashes when there is no
   query (``/path/`` == ``/path``, host root ``/`` == host)

Every step uses only ``regexp_replace`` / ``regexp_extract`` / ``lower``
/ ``substring`` with RE2-compatible patterns (no lookaround, no
backreference *matching*) so the DuckDB oracle can mirror it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query parameters that never change page identity. Conservative default:
# bare `ref` was dropped in round 6 (ADVICE r5) — it is content-bearing on
# many real sites (GitHub `?ref=<branch>`, newsletter routing), and a
# canonicalizer that conflates those pages would make retention drop real
# content. Callers with a known-tracking `ref` convention can pass their
# own set via ``tracking_params``.
TRACKING_PARAMS = r"utm_[A-Za-z0-9_]*|fbclid|gclid"


def canonicalize_url(url: Column, tracking_params: str = TRACKING_PARAMS) -> Column:
    """Canonical surface form of ``url`` (see module docstring).
    ``tracking_params`` is the RE2 alternation of query-parameter names to
    strip (step 5)."""
    u = F.trim(url)
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. lowercase scheme://host[:port]
    head = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*", 0)
    u = F.concat(F.lower(head), F.substring(u, F.length(head) + F.lit(1), F.lit(2_000_000_000)))
    # 4. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?]+):80([/?].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?]+):443([/?].*)?$", r"$1$2")
    # 5. tracking params (drop match incl. its leading separator, then repair)
    u = F.regexp_replace(u, r"[?&](" + tracking_params + r")=[^&#]*", "")
    u = F.regexp_replace(u, r"^([^?]+)&", r"$1?")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 6. trailing slashes
    u = F.regexp_replace(u, r"/+\?", "?")
    u = F.when(u.contains("?"), u).otherwise(F.regexp_replace(u, r"/+$", ""))
    return u


def canonicalize_url_duckdb_steps() -> list[str]:
    """DuckDB twin of ``canonicalize_url``, one expression per rewrite
    step, each over a column named ``u`` (the previous step's output).
    The oracle query composes them as chained CTEs — naive textual
    nesting would grow exponentially since several steps reference their
    input more than once. Kept beside the Spark expression so the two
    rewrite chains are reviewed together. DuckDB regexp_replace needs the
    explicit 'g' flag where Spark replaces globally by default, and RE2
    replacement groups are ``\\1`` where Java's are ``$1``."""
    head = r"regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*', 0)"
    return [
        "trim(u)",
        "regexp_replace(u, '#.*$', '')",
        f"(lower({head}) || substring(u, length({head}) + 1))",
        r"regexp_replace(u, '^(http://[^/:?]+):80([/?].*)?$', '\1\2')",
        r"regexp_replace(u, '^(https://[^/:?]+):443([/?].*)?$', '\1\2')",
        rf"regexp_replace(u, '[?&]({TRACKING_PARAMS})=[^&#]*', '', 'g')",
        r"regexp_replace(u, '^([^?]+)&', '\1?')",
        r"regexp_replace(u, '[?&]$', '')",
        r"regexp_replace(u, '/+\?', '?', 'g')",
        "CASE WHEN position('?' IN u) > 0 THEN u"
        " ELSE regexp_replace(u, '/+$', '') END",
    ]
