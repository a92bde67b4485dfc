"""WARC source tests: framing round-trip, gzip members, record filtering,
truncation tolerance, and pipeline equivalence (WARC-read pages produce the
same clusters as the in-memory pages table)."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from video_duplicate_finder_python_spark.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
    read_warc,
    split_http_payload,
)


def _corpus_records(corpus, lo: int, hi: int) -> list[dict]:
    rows = corpus.pages.iloc[lo:hi]
    return [
        {
            "url": r.url,
            # corpus timestamps are tz-aware UTC; WARC-Date is Zulu and the
            # parser emits naive UTC (what Spark's TimestampType stores)
            "warc_ts": r.warc_ts.to_pydatetime().astimezone(dt.timezone.utc).replace(tzinfo=None),
            "html": bytes(r.html),
            "lang": r.lang,
        }
        for r in rows.itertuples()
    ]


def _write_fixture(tmp_path: Path, corpus) -> Path:
    """240 corpus pages over 3 files: plain, gzip, plain — mixed layouts in
    one directory, as a real crawl bucket would hold."""
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-00.warc").write_bytes(build_warc_bytes(_corpus_records(corpus, 0, 80)))
    (d / "seg-01.warc.gz").write_bytes(
        build_warc_bytes(_corpus_records(corpus, 80, 160), gzip_members=True)
    )
    (d / "seg-02.warc").write_bytes(build_warc_bytes(_corpus_records(corpus, 160, 240)))
    return d


def test_parser_roundtrip_plain_and_gzip(corpus):
    recs = _corpus_records(corpus, 0, 25)
    for gz in (False, True):
        data = build_warc_bytes(recs, gzip_members=gz)
        parsed = list(iter_warc_records(data))
        assert len(parsed) == 25
        for rec, (headers, payload) in zip(recs, parsed):
            assert headers["warc-target-uri"] == rec["url"]
            assert headers["warc-type"] == "response"
            http, body = split_http_payload(payload)
            assert body == rec["html"]
            assert http["content-language"] == rec["lang"]


def test_truncated_file_yields_good_prefix(corpus):
    data = build_warc_bytes(_corpus_records(corpus, 0, 10))
    cut = data[: len(data) - len(data) // 3]  # last record(s) mutilated
    parsed = list(iter_warc_records(cut))
    assert 0 < len(parsed) < 10
    # every yielded record is intact
    for headers, payload in parsed:
        assert len(payload) == int(headers["content-length"])


def test_non_response_and_non_html_records_skipped(spark, tmp_path):
    ts = dt.datetime(2025, 1, 1)
    html_rec = {"url": "https://a.example/x", "warc_ts": ts,
                "html": b"<html><body><p>keep</p></body></html>", "lang": "en"}
    data = build_warc_bytes([html_rec])
    # warcinfo record (no target URI) + a request record, hand-framed
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n")
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://a.example/x\r\n"
           b"Content-Length: 4\r\n\r\nGET \r\n\r\n")
    # a PDF response that html_only must drop
    pdf_payload = (b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n%PDF")
    pdf = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://a.example/doc.pdf\r\n"
           b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(pdf_payload)).encode() + b"\r\n\r\n"
           + pdf_payload + b"\r\n\r\n")
    (tmp_path / "mix.warc").write_bytes(info + req + data + pdf)

    out = read_warc(spark, str(tmp_path)).collect()
    assert [r.url for r in out] == ["https://a.example/x"]
    assert bytes(out[0].html) == html_rec["html"]
    assert out[0].lang == "en"
    assert out[0].warc_ts == ts

    everything = read_warc(spark, str(tmp_path), html_only=False).collect()
    assert {r.url for r in everything} == {
        "https://a.example/x", "https://a.example/doc.pdf"
    }


def test_read_warc_matches_source_pages(spark, corpus, tmp_path):
    d = _write_fixture(tmp_path, corpus)
    got = read_warc(spark, str(d)).select("url", "warc_ts", "html", "lang")
    got_rows = {r.url: r for r in got.collect()}
    assert len(got_rows) == 240
    for rec in _corpus_records(corpus, 0, 240):
        r = got_rows[rec["url"]]
        assert bytes(r.html) == rec["html"]
        assert r.lang == rec["lang"]
        assert r.warc_ts == rec["warc_ts"]


def test_pipeline_on_warc_equals_pipeline_on_pages(spark, corpus, tmp_path, pipeline_result):
    """End-to-end: the dedup DAG over WARC-read pages emits the exact same
    cluster membership as over the in-memory pages table (conftest's
    pipeline_result) — the source swap is semantics-free."""
    from video_duplicate_finder_python_spark import DedupConfig, DedupPipeline

    d = _write_fixture(tmp_path, corpus)
    pages = read_warc(spark, str(d)).select("url", "warc_ts", "html", "lang")
    res = DedupPipeline(spark, DedupConfig()).run(pages)
    got = {(r.url, r.cluster_id) for r in res.clusters.collect()}
    want = {(r.url, r.cluster_id) for r in pipeline_result.clusters.collect()}
    assert got == want


def test_streaming_warc_ingest_incremental(spark, corpus, tmp_path):
    """Landing WARC segments one at a time: each availableNow pass ingests
    only the new files (tracked by the stream checkpoint) and the store's
    signatures equal a batch compute over the same pages."""
    from video_duplicate_finder_python_spark import DedupConfig
    from video_duplicate_finder_python_spark.streaming.ingest import (
        SignatureStore,
        StreamingSignatureIngest,
    )

    src = tmp_path / "crawl_stream"
    src.mkdir()
    ckpt = str(tmp_path / "warc_ckpt")
    store_dir = str(tmp_path / "warc_store")

    (src / "seg-00.warc").write_bytes(build_warc_bytes(_corpus_records(corpus, 0, 60)))
    ingest = StreamingSignatureIngest(spark, store_dir, DedupConfig())
    q = ingest.start_warc(str(src), ckpt, available_now=True)
    q.awaitTermination(180)
    store = SignatureStore(spark, store_dir)
    assert store.read().count() == 60

    # a gzip segment lands later; only it is ingested on the next pass
    (src / "seg-01.warc.gz").write_bytes(
        build_warc_bytes(_corpus_records(corpus, 60, 100), gzip_members=True)
    )
    q2 = ingest.start_warc(str(src), ckpt, available_now=True)
    q2.awaitTermination(180)
    assert store.read().count() == 100
    urls = {r.url for r in store.read().select("url").collect()}
    assert urls == {rec["url"] for rec in _corpus_records(corpus, 0, 100)}


# -- property: framing is Content-Length-delimited, not delimiter-scanned ----

from hypothesis import given, settings
from hypothesis import strategies as st

_payload = st.binary(min_size=0, max_size=300).map(
    # plant adversarial boundary-looking bytes inside payloads
    lambda b: b + b"\r\n\r\nWARC/1.0\r\n" if len(b) % 3 == 0 else b
)


@settings(max_examples=60, deadline=None)
@given(
    payloads=st.lists(_payload, min_size=1, max_size=8),
    gz=st.booleans(),
)
def test_warc_framing_roundtrip_property(payloads, gz):
    ts = dt.datetime(2025, 3, 1, 12, 0, 0)
    recs = [
        {"url": f"https://p.example/{i}", "warc_ts": ts, "html": p, "lang": None}
        for i, p in enumerate(payloads)
    ]
    data = build_warc_bytes(recs, gzip_members=gz)
    parsed = list(iter_warc_records(data))
    assert len(parsed) == len(recs)
    for rec, (headers, payload) in zip(recs, parsed):
        assert headers["warc-target-uri"] == rec["url"]
        _, body = split_http_payload(payload)
        assert body == rec["html"]


def test_gunzip_chunks_incremental_equivalence(corpus):
    """The incremental member decompressor must reproduce the file exactly
    under adversarially tiny output/input chunk sizes (forces every
    max_length / unconsumed_tail / member-boundary code path), and a
    truncated .warc.gz must still yield its good record prefix."""
    from video_duplicate_finder_python_spark.sources.warc import _gunzip_chunks

    recs = _corpus_records(corpus, 0, 40)
    gz = build_warc_bytes(recs, gzip_members=True)
    plain = build_warc_bytes(recs, gzip_members=False)
    assert b"".join(_gunzip_chunks(gz)) == plain
    assert b"".join(_gunzip_chunks(gz, max_out=7, in_chunk=11)) == plain
    cut = list(iter_warc_records(gz[: len(gz) // 2]))
    assert 0 < len(cut) < 40
    for headers, payload in cut:
        assert len(payload) == int(headers["content-length"])


def test_warc_parse_memory_is_bounded_by_record_not_file():
    """Parsing a .warc.gz must hold ~one record in memory, not the whole
    decompressed file: 400 records / ~93 MB decompressed must peak under
    30 MB of traced allocations (regression guard for the rolling-buffer
    parser; the eager shape held compressed + fully-decompressed bytes)."""
    import datetime as dt
    import tracemalloc

    big = [
        {
            "url": f"https://big.example/{i}",
            "warc_ts": dt.datetime(2025, 1, 1),
            "html": (f"<html>{'lorem ipsum ' * 20000}doc{i}</html>").encode(),
        }
        for i in range(400)
    ]
    data = build_warc_bytes(big, gzip_members=True)
    tracemalloc.start()
    n = sum(1 for _ in iter_warc_records(data))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 400
    assert peak < 30e6, f"peak {peak/1e6:.1f} MB — rolling buffer regressed"


def test_corrupt_gzip_member_yields_good_prefix(corpus):
    """A bit-flipped byte mid-.warc.gz must end iteration at the good
    prefix, not raise zlib.error out of mapInPandas (one bad file in a
    10^5-file crawl would otherwise abort the whole ingest job)."""
    recs = _corpus_records(corpus, 0, 30)
    data = bytearray(build_warc_bytes(recs, gzip_members=True))
    data[len(data) // 2] ^= 0xFF  # corrupt a mid-file member
    parsed = list(iter_warc_records(bytes(data)))
    assert 0 < len(parsed) < 30
    for headers, payload in parsed:
        assert len(payload) == int(headers["content-length"])
    # garbage appended after the last member: full file parses
    good = build_warc_bytes(recs, gzip_members=True)
    parsed = list(iter_warc_records(good + b"\x1f\x8bGARBAGE"))
    assert len(parsed) == 30


def test_read_warc_ignores_in_progress_temp_files(spark, corpus, tmp_path):
    """The default glob matches exact .warc/.warc.gz suffixes only: a
    crawler's half-written x.warc.gz.tmp must not be ingested (the batch
    reader would emit its good prefix; the streaming checkpoint would
    then mark the file done forever — silent data loss on rename)."""
    d = _write_fixture(tmp_path, corpus)
    (d / "seg-03.warc.gz.tmp").write_bytes(
        build_warc_bytes(_corpus_records(corpus, 0, 5), gzip_members=True)
    )
    (d / "seg-04.warc.part").write_bytes(b"WARC/1.0\r\n")
    got = read_warc(spark, str(d)).select("url").distinct().count()
    assert got == 240  # the 3 finished segments only, temp files unseen


def test_wet_conversion_records(spark, tmp_path):
    """WET (.wet.gz) conversion records: extracted text lands in `html`,
    language from WARC-Identified-Content-Language, and the extraction
    invariant holds as the identity (tag-free text passes through
    byte-identically) — so WET input feeds the same pipeline."""
    from video_duplicate_finder_python_spark.functions.text import (
        extract_text_bytes,
    )
    from video_duplicate_finder_python_spark.sources.warc import (
        build_wet_bytes,
        read_warc,
    )

    texts = {
        "https://wet.example/a": "plain extracted text one two three",
        "https://wet.example/b": "another page entirely different words",
    }
    data = build_wet_bytes(
        [
            {"url": u, "text": t, "warc_ts": None, "lang": "eng,rus"}
            for u, t in sorted(texts.items())
        ],
        gzip_members=True,
    )
    (tmp_path / "part.wet.gz").write_bytes(data)
    rows = read_warc(
        spark, str(tmp_path), path_glob_filter="*.{wet,wet.gz}"
    ).collect()
    assert {r.url for r in rows} == set(texts)
    for r in rows:
        assert r.content_type == "text/plain"
        assert r.lang == "en"  # first identified language, 639-3 -> 639-1
        raw = bytes(r.html)
        assert raw.decode("utf-8") == texts[r.url]
        # extraction identity on tag-free text: the pipeline's extract
        # stage returns WET text byte-identically
        assert extract_text_bytes(raw) == texts[r.url]


def test_mixed_warc_and_wet_dir(spark, tmp_path):
    """A directory holding both .warc.gz and .wet.gz is read in one pass;
    response and conversion records coexist in the pages table."""
    from video_duplicate_finder_python_spark.sources.warc import (
        build_warc_bytes,
        build_wet_bytes,
        read_warc,
    )

    warc = build_warc_bytes(
        [
            {
                "url": "https://mixed.example/html",
                "warc_ts": None,
                "html": b"<html><body><p>from warc</p></body></html>",
                "lang": "en",
            }
        ],
        gzip_members=True,
    )
    wet = build_wet_bytes(
        [{"url": "https://mixed.example/wet", "text": "from wet", "warc_ts": None}],
        gzip_members=True,
    )
    (tmp_path / "a.warc.gz").write_bytes(warc)
    (tmp_path / "b.wet.gz").write_bytes(wet)
    # combined glob is EXPLICIT: the default excludes .wet (sidecar
    # double-ingest hazard, see read_warc docstring)
    rows = {
        r.url: r
        for r in read_warc(
            spark, str(tmp_path), path_glob_filter="*.{warc.gz,wet.gz}"
        ).collect()
    }
    assert read_warc(spark, str(tmp_path)).count() == 1  # default: warc only
    assert set(rows) == {"https://mixed.example/html", "https://mixed.example/wet"}
    assert rows["https://mixed.example/html"].content_type == "text/html"
    assert rows["https://mixed.example/wet"].content_type == "text/plain"
