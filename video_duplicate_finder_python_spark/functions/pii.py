"""PII scrubbing — pure-JVM column expressions (no UDF).

Web-scale training pipelines redact personal identifiers before anything
else touches the text (C4/Dolma-style). Three ASCII pattern classes are
handled — emails, North-American-style phone numbers, IPv4 addresses —
each replaced by a stable token so downstream dedup/shingling sees the
redacted form consistently. Counting happens on the ORIGINAL text so the
redaction is auditable per document.

Scrub order matters and is fixed: emails first (their local parts can
contain digits), then phones, then IPv4 (the looser digit patterns must
not fire inside a yet-unscrubbed email).

All patterns are RE2-compatible (no lookaround/backreference) so the
DuckDB oracle runs the very same regex text; Spark's global-by-default
``regexp_replace`` pairs with DuckDB's explicit ``'g'`` flag.

Reference parity: none (the reference handles media files, not text
redaction); this is part of the LLM-pipeline extension mandated by the
build brief alongside dedup/quality/language-ID.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"

_SCRUB_ORDER = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>")]


def scrub_pii(text: Column) -> Column:
    """Text with emails/phones/IPv4s replaced by ``<EMAIL>/<PHONE>/<IP>``."""
    out = text
    for pat, token in _SCRUB_ORDER:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts on the original text:
    ``{"n_emails": ..., "n_phones": ..., "n_ips": ...}``. Phones and IPs
    are counted after scrubbing the *earlier* classes, mirroring
    ``scrub_pii``'s order, so a digit run inside an email never counts as
    a phone/IP."""
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(after_email, F.lit(PHONE_RE)),
        "n_ips": F.regexp_count(after_phone, F.lit(IPV4_RE)),
    }
