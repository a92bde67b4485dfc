"""HTML → text extraction.

The reference has no HTML stage (its inputs are video files); this is the
web-corpus analog of its per-item decode step
(/root/reference/src/core/hasher.py:14-54). The north-rule invariant is
*byte-identical extracted text per url*, so extraction is a deterministic
pure function with two implementations that must agree exactly:

- ``extract_text_bytes``   — single-row pure function (oracle + tests)
- ``extract_text_udf``     — Arrow-batched pandas UDF using pandas'
                             vectorized string ops (the Spark hot path)

Rules (applied in order, no whitespace normalization so byte identity with
the page template holds):
1. decode UTF-8 (errors → U+FFFD)
2. if a ``<body>…</body>`` element exists, keep only its inner content
3. drop ``<script>…</script>`` / ``<style>…</style>`` blocks
4. strip all remaining tags

Three implementations that must agree byte-for-byte (asserted in
tests/test_extract.py):

- ``extract_text_bytes`` — single-row pure function (oracle + tests)
- ``extract_text_udf``   — Arrow-batched pandas UDF (parity reference)
- ``extract_text_col``   — pure JVM Column expression (THE hot path):
  codegen'd ``regexp_extract``/``regexp_replace``, so the html bytes never
  cross the JVM→Arrow→Python boundary at all. At 200k×8KB pages the UDF
  path moves ~3.2 GB through Python workers per run; the Column path moves
  zero. Java and Python regex agree on every construct used here
  ((?is), lazy quantifiers, \\b, [^>]); UTF-8 decode parity holds for
  valid UTF-8 input (malformed sequences may differ in U+FFFD counts —
  WARC extractors should pre-validate encoding upstream).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BODY_RE = re.compile(r"(?is)<body[^>]*>(.*?)</body>")
_SCRIPT_STYLE_RE = re.compile(r"(?is)<script\b.*?</script>|<style\b.*?</style>")
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text_bytes(html: bytes | None) -> str | None:
    """Pure single-row extraction; the reference semantics for tests/oracle."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    m = _BODY_RE.search(s)
    if m is not None:
        s = m.group(1)
    s = _SCRIPT_STYLE_RE.sub("", s)
    return _TAG_RE.sub("", s)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction; must match extract_text_bytes byte-for-byte."""
    s = html.map(lambda b: None if b is None else bytes(b).decode("utf-8", errors="replace"))
    body = s.str.extract(_BODY_RE, expand=False)
    s = body.where(body.notna(), s)
    s = s.str.replace(_SCRIPT_STYLE_RE, "", regex=True)
    return s.str.replace(_TAG_RE, "", regex=True)


_BODY_PAT = r"(?is)<body[^>]*>(.*?)</body>"
_SCRIPT_STYLE_PAT = r"(?is)<script\b.*?</script>|<style\b.*?</style>"
_TAG_PAT = r"<[^>]*>"


def extract_text_col(html: Column) -> Column:
    """JVM-side extraction (whole-stage codegen, zero Python transfer);
    byte-identical to extract_text_bytes for valid-UTF-8 input."""
    s = html.cast("string")  # UTF-8 decode, U+FFFD replacement
    body = F.regexp_extract(s, _BODY_PAT, 1)
    kept = F.when(s.rlike(_BODY_PAT), body).otherwise(s)
    stripped = F.regexp_replace(
        F.regexp_replace(kept, _SCRIPT_STYLE_PAT, ""), _TAG_PAT, ""
    )
    return F.when(html.isNull(), F.lit(None).cast("string")).otherwise(stripped)
