"""WARC (ISO 28500 Web ARChive) source — ingest real crawl containers.

The reference walks a directory of media files (scanner.py:65-75); the
web-scale analog of "the filesystem full of inputs" is a bucket of WARC
files — the container format every major crawl (Common Crawl, Internet
Archive, Heritrix output) ships. This module turns a glob of ``.warc`` /
``.warc.gz`` / ``.wet`` / ``.wet.gz`` files into the engine's pages table
``(url, warc_ts, html, lang)`` so the whole dedup DAG runs unchanged on
crawl data — WET ``conversion`` records (Common Crawl's extracted-text
sidecar) carry their plain text straight through, since extraction is the
identity on tag-free text.

Spark-first shape
-----------------
``spark.read.format("binaryFile")`` lists and reads whole files — correct
for WARC, which is NOT byte-splittable: ``.warc.gz`` is a concatenation of
per-record gzip members, so a mid-file split would land inside a member.
Crawl convention caps files at ~1 GB, so a 100 TB crawl is ~10^5 files →
10^5 map tasks with zero shuffle; parallelism comes from file count, the
same way Hadoop WARC readers (e.g. the public cc-pyspark examples) get it.
Record parsing happens in ONE ``mapInPandas`` pass (Arrow-batched, one
input row per file); the emitted table is columnar from then on, so
extraction/signatures stay JVM-side.

No third-party warc library is used: the parser below implements the
ISO 28500 framing directly (version line, CRLF headers, Content-Length
payload, CRLF CRLF trailer) — ~60 lines, no dependency to gate.
"""

from __future__ import annotations

import io
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "content_type string, record_id string, source_file string"
)

_CRLF = b"\r\n"
_HDR_SEP = b"\r\n\r\n"


def _gunzip_chunks(
    data: bytes, max_out: int = 1 << 20, in_chunk: int = 1 << 20
) -> Iterator[bytes]:
    """Incrementally decompress a concatenation of gzip members (the
    .warc.gz layout: one member per record), yielding ≤ ``max_out``-byte
    chunks. Never materializes the decompressed file: the caller's rolling
    buffer holds ~one record, so a 1 GB crawl file costs compressed-size +
    one-record memory instead of compressed + fully-decompressed (4-5x at
    typical HTML ratios).

    Input is fed in ``in_chunk`` slices of a zero-copy memoryview — feeding
    the whole remaining tail per call looks equivalent but is quadratic
    (zlib copies the uneaten input to ``unconsumed_tail`` on every
    ``max_length``-limited call). ``flush()`` is deliberately never called:
    at member end (``d.eof``) zlib leaves the post-member bytes in BOTH
    ``unconsumed_tail`` and ``unused_data``, and ``flush()`` re-feeds the
    former into the latter — the remainder doubles per member and a 200-
    member file balloons exponentially. With ``max_length`` every output
    byte is emitted by ``decompress`` itself, so there is nothing for
    ``flush`` to return; ``unused_data`` captured at eof seeds the next
    member."""
    view = memoryview(data)
    n = len(view)
    pos = 0  # next unfed byte of the file
    d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
    pending: bytes | memoryview = b""  # unconsumed input for this member
    while True:
        if not pending:
            if pos >= n:
                return  # clean end (after eof) or truncated final member
            pending = view[pos : pos + in_chunk]
            pos += len(pending)
        try:
            out = d.decompress(pending, max_out)
        except zlib.error:
            return  # corrupt member (bit flip / garbage): good prefix only
        pending = d.unconsumed_tail
        if out:
            yield out
        if d.eof:
            rest = d.unused_data  # bytes after member end within fed input
            d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
            pending = rest
        elif not out and not pending and pos >= n:
            return  # truncated member: emit the good prefix only


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per WARC record in ``data``.

    ``headers`` maps lower-cased WARC header names to values; ``payload``
    is the raw Content-Length block (for response records: an HTTP
    response — status line, headers, body). Gzip input (magic 1f 8b) is
    decompressed INCREMENTALLY against a rolling buffer that is trimmed
    after every record, so peak memory is the (already-in-memory
    binaryFile cell) compressed bytes + one record — not the whole
    decompressed file. Malformed trailing garbage ends iteration rather
    than raising — a truncated crawl file should yield its good prefix.
    """
    if data[:2] == b"\x1f\x8b":
        chunks = _gunzip_chunks(data)
    else:
        view = memoryview(data)
        chunks = (
            view[i : i + (1 << 20)] for i in range(0, len(data), 1 << 20)
        )
    buf = bytearray()

    def fill() -> bool:
        for c in chunks:
            buf.extend(c)
            return True
        return False

    pos = 0
    while True:
        # tolerate inter-record padding / blank lines
        while True:
            while len(buf) - pos < 2 and fill():
                pass
            if buf[pos : pos + 2] == _CRLF:
                pos += 2
            else:
                break
        while len(buf) - pos < 5 and fill():
            pass
        if len(buf) == pos:
            return
        if not buf[pos : pos + 5] == b"WARC/":
            return  # not a record boundary: stop at the good prefix
        while (hdr_end := buf.find(_HDR_SEP, pos)) < 0:
            if not fill():
                return
        header_block = bytes(buf[pos:hdr_end]).decode("utf-8", errors="replace")
        lines = header_block.split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:  # lines[0] is the WARC/1.x version line
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + len(_HDR_SEP)
        while len(buf) < body_start + length and fill():
            pass
        if len(buf) < body_start + length:
            return  # truncated record
        yield headers, bytes(buf[body_start : body_start + length])
        # trim the consumed record so the rolling buffer stays ~one
        # record deep regardless of file size
        del buf[: body_start + length]
        pos = 0


def split_http_payload(payload: bytes) -> tuple[dict, bytes]:
    """Split an HTTP response payload into (lower-cased headers, body).
    A payload that doesn't start with ``HTTP/`` is returned whole as the
    body (some archives store raw content with Content-Type ``resource``).
    """
    if not payload.startswith(b"HTTP/"):
        return {}, payload
    sep = payload.find(_HDR_SEP)
    if sep < 0:
        return {}, payload
    head = payload[:sep].decode("latin-1", errors="replace")
    headers: dict[str, str] = {}
    for line in head.split("\r\n")[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers, payload[sep + len(_HDR_SEP) :]


# ISO 639-3 → 639-1 for the languages that dominate web crawls; WET's
# WARC-Identified-Content-Language uses the 3-letter codes while HTTP
# Content-Language (the response branch) uses 2-letter — one pages table
# must not mix formats or exact-match lang filters silently drop WET rows
_ISO639_3_TO_1 = {
    "eng": "en", "rus": "ru", "deu": "de", "ger": "de", "fra": "fr",
    "fre": "fr", "spa": "es", "ita": "it", "por": "pt", "nld": "nl",
    "dut": "nl", "pol": "pl", "tur": "tr", "ces": "cs", "cze": "cs",
    "zho": "zh", "chi": "zh", "jpn": "ja", "kor": "ko", "ara": "ar",
    "hin": "hi", "vie": "vi", "ind": "id", "swe": "sv", "dan": "da",
    "nor": "no", "fin": "fi", "ell": "el", "gre": "el", "heb": "he",
    "tha": "th", "ukr": "uk", "ron": "ro", "rum": "ro", "hun": "hu",
    "cat": "ca", "fas": "fa", "per": "fa",
}

_TS_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})")


def _parse_warc_date(value: str | None):
    """WARC-Date (ISO 8601 Zulu) → tz-aware UTC datetime, or None.

    Tz-aware (not naive) so Arrow pins the instant regardless of
    ``spark.sql.session.timeZone``: a naive datetime would be read as
    session-local and shift every warc_ts by the session offset on
    non-UTC sessions (the engine's own sessions pin UTC, but the source
    must be correct under a caller's session too)."""
    import datetime as dt

    if not value:
        return None
    m = _TS_RE.match(value)
    if not m:
        return None
    return dt.datetime(*(int(g) for g in m.groups()), tzinfo=dt.timezone.utc)


def _records_to_rows(file_path: str, data: bytes, html_only: bool):
    """Yield pages-schema tuples for the page-bearing records of one file.

    Two record classes carry pages:

    - ``response`` / ``resource`` (.warc): payload is an HTTP envelope —
      split it, body = the HTTP body (html bytes).
    - ``conversion`` (.wet — Common Crawl's extracted-text sidecar,
      ISO 28500 §6.8): payload IS the extracted plain text, no HTTP
      envelope to split. The text flows into the ``html`` column
      unchanged — extraction is the identity on tag-free text (see
      functions/text.py), so WET input feeds the same pipeline with the
      decode step effectively pre-done by the crawler. Language comes
      from ``WARC-Identified-Content-Language`` when present (ISO 639-3
      codes; first one wins). ``html_only`` does not drop conversion
      records: their text/plain IS the page.
    """
    for headers, payload in iter_warc_records(data):
        wtype = headers.get("warc-type")
        url = headers.get("warc-target-uri")
        if not url:
            continue
        if wtype == "conversion":
            body = payload
            ctype = (
                headers.get("content-type", "text/plain")
                .split(";")[0].strip().lower()
            )
            lang = headers.get("warc-identified-content-language")
            if lang:
                # WET carries ISO 639-3 ('eng'); the response branch (and
                # every lang filter downstream) uses 639-1 ('en') — map
                # common codes so one pages table never mixes formats;
                # unmapped codes pass through as-is (documented, visible)
                code = lang.split(",")[0].strip().lower()
                lang = _ISO639_3_TO_1.get(code, code) or None
            else:
                lang = None
        elif wtype in ("response", "resource"):
            http_headers, body = split_http_payload(payload)
            ctype = http_headers.get(
                "content-type", headers.get("content-type", "")
            ).split(";")[0].strip().lower()
            if html_only and ctype not in ("text/html", "application/xhtml+xml", ""):
                continue
            lang = http_headers.get("content-language")
            if lang:
                lang = lang.split(",")[0].strip().lower()[:2] or None
        else:
            continue  # warcinfo / request / metadata records carry no page
        yield (
            url,
            _parse_warc_date(headers.get("warc-date")),
            body,
            lang,
            ctype or None,
            headers.get("warc-record-id"),
            file_path,
        )


def warc_files_to_pages(files: DataFrame, html_only: bool = True) -> DataFrame:
    """``(path, content)`` binary-file rows → pages rows. Shared by the
    batch reader below and the streaming crawl ingest
    (``StreamingSignatureIngest.start_warc``): mapInPandas works
    identically on batch and streaming DataFrames."""

    def parse(batches):
        import pandas as pd

        cols = [
            "url", "warc_ts", "html", "lang",
            "content_type", "record_id", "source_file",
        ]
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_records_to_rows(path_, bytes(content), html_only))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(
        parse, schema=WARC_PAGES_SCHEMA
    )


def read_warc(
    spark: SparkSession,
    path: str,
    html_only: bool = True,
    path_glob_filter: str | None = "*.{warc,warc.gz}",
) -> DataFrame:
    """Read crawl-container files under ``path`` into the pages table
    ``(url, warc_ts, html, lang, content_type, record_id, source_file)``
    — drop the extra columns and the result feeds ``DedupPipeline.run``
    directly. WET conversion records are fully supported (their extracted
    text lands in ``html``; extraction is the identity on tag-free text,
    see _records_to_rows) — but the DEFAULT glob reads ``.warc`` only:
    Common Crawl ships every segment as ``X.warc.gz`` PLUS its
    ``X.warc.wet.gz`` sidecar, so a glob matching both would ingest every
    page twice (html bytes AND extracted-text bytes under the same url).
    Pass ``path_glob_filter="*.{wet,wet.gz}"`` for a WET-only corpus, or
    an explicit combined glob only for buckets known to hold disjoint
    page sets.

    One map task per file (binaryFile never splits — required, see module
    docstring), no shuffle; predicate ``html_only`` drops non-HTML
    responses inside the Python batch before any bytes reach the table.
    The default glob matches EXACT ``.warc`` / ``.warc.gz`` suffixes so
    in-progress temp names (``x.warc.gz.tmp``) in a live crawl bucket are
    never read; pass ``path_glob_filter=None`` to read every file.
    """
    reader = spark.read.format("binaryFile")
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    return warc_files_to_pages(reader.load(path), html_only=html_only)


# -- deterministic writer (test fixtures / round-trip evidence) --------------

def build_warc_bytes(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize page dicts (url, warc_ts, html, lang) into WARC bytes.

    Deterministic: record ids derive from the url, dates from warc_ts.
    With ``gzip_members=True`` each record is its own gzip member, the
    standard ``.warc.gz`` layout (level 9, zeroed mtime for determinism).
    """
    out = io.BytesIO()
    for rec in records:
        html: bytes = rec["html"]
        lang = rec.get("lang")
        http_lines = [
            b"HTTP/1.1 200 OK",
            b"Content-Type: text/html; charset=utf-8",
        ]
        if lang:
            http_lines.append(b"Content-Language: " + lang.encode("ascii"))
        http_lines.append(b"Content-Length: " + str(len(html)).encode("ascii"))
        payload = _CRLF.join(http_lines) + _HDR_SEP + html
        ts = rec["warc_ts"]
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else "2025-01-01T00:00:00Z"
        warc_headers = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + rec["url"].encode("utf-8"),
            b"WARC-Date: " + date.encode("ascii"),
            b"WARC-Record-ID: <urn:uuid:" + rec["url"].encode("utf-8") + b">",
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: " + str(len(payload)).encode("ascii"),
        ]
        record = _CRLF.join(warc_headers) + _HDR_SEP + payload + _HDR_SEP
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS | 16)
            record = co.compress(record) + co.flush()
        out.write(record)
    return out.getvalue()


def build_wet_bytes(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize page dicts (url, warc_ts, text, lang) into WET bytes —
    ``conversion`` records whose payload is the extracted text directly
    (no HTTP envelope), the Common Crawl ``.wet`` layout. Deterministic,
    same conventions as build_warc_bytes."""
    out = io.BytesIO()
    for rec in records:
        text: bytes = rec["text"].encode("utf-8") if isinstance(
            rec["text"], str
        ) else rec["text"]
        ts = rec.get("warc_ts")
        date = (
            ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None
            else "2025-01-01T00:00:00Z"
        )
        warc_headers = [
            b"WARC/1.0",
            b"WARC-Type: conversion",
            b"WARC-Target-URI: " + rec["url"].encode("utf-8"),
            b"WARC-Date: " + date.encode("ascii"),
            b"WARC-Record-ID: <urn:uuid:" + rec["url"].encode("utf-8") + b">",
            b"Content-Type: text/plain",
        ]
        lang = rec.get("lang")
        if lang:
            warc_headers.append(
                b"WARC-Identified-Content-Language: " + lang.encode("ascii")
            )
        warc_headers.append(b"Content-Length: " + str(len(text)).encode("ascii"))
        record = _CRLF.join(warc_headers) + _HDR_SEP + text + _HDR_SEP
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS | 16)
            record = co.compress(record) + co.flush()
        out.write(record)
    return out.getvalue()
