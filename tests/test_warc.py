"""WARC ingestion tests: fixture archives written by encode_warc (the
pgoutput-encoder convention), read back through binaryFile + the
mapInPandas record splitter, with the raw byte-level parser also
exercised directly as its own oracle."""

from __future__ import annotations

import pytest

from pg2kinesis_spark.functions import warc as W


def _fixture_records():
    html1 = b"<html><head><title>T1</title></head><body><p>hello world</p></body></html>"
    html2 = "<html><body><p>café 世界</p></body></html>".encode()
    return [
        {
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "payload": b"software: test\r\n",
        },
        {
            "warc_type": "request",
            "url": "https://example.com/a",
            "payload": b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
        },
        {
            "warc_type": "response",
            "url": "https://example.com/a",
            "content_type": "application/http; msgtype=response",
            "payload": W.http_response_bytes(html1),
        },
        {
            "warc_type": "response",
            "url": "https://example.com/missing",
            "payload": W.http_response_bytes(b"gone", status=404),
        },
        {
            "warc_type": "response",
            "url": "https://example.com/img.png",
            "payload": W.http_response_bytes(b"\x89PNG...", content_type="image/png"),
        },
        {
            "warc_type": "response",
            "url": "https://example.com/b",
            "payload": W.http_response_bytes(html2),
        },
        {
            # 200 with NO Content-Type header: could be anything —
            # dropped by the pinned rule (mojibake guard)
            "warc_type": "response",
            "url": "https://example.com/untyped",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\n\xff\xd8\xff\xe0",
        },
    ]


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "gzip"])
def archive_df(request, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    name = "crawl-00000.warc.gz" if request.param else "crawl-00000.warc"
    (d / name).write_bytes(W.encode_warc(_fixture_records(), gzip_members=request.param))
    return spark.read.format("binaryFile").load(str(d))


def test_warc_records_roundtrip(spark, archive_df):
    rows = sorted(W.warc_records(archive_df).collect(), key=lambda r: r.offset)
    fx = _fixture_records()
    assert [r.warc_type for r in rows] == [f["warc_type"] for f in fx]
    assert [r.url for r in rows] == [f.get("url") for f in fx]
    assert [bytes(r.payload) for r in rows] == [f["payload"] for f in fx]
    # offsets into the DECOMPRESSED stream must agree with the raw parser
    plain = W.gunzip_members(W.encode_warc(_fixture_records(), gzip_members=False))
    want_offsets = [off for off, _, _ in W.iter_warc_records(plain)]
    # gzip per-member and plain layouts decompress to the same stream
    assert [r.offset for r in rows] == want_offsets


def test_warc_responses_to_docs_filters(spark, archive_df):
    docs = {r.url: r for r in W.warc_responses_to_docs(W.warc_records(archive_df)).collect()}
    # 200 text/html kept; 404 and image/png dropped; request/warcinfo never seen
    assert set(docs) == {"https://example.com/a", "https://example.com/b"}
    assert docs["https://example.com/a"].http_status == 200
    assert "hello world" in docs["https://example.com/a"].html
    assert "café 世界" in docs["https://example.com/b"].html


def test_warc_to_corpus_extracts_text(spark, archive_df):
    out = {r.url: r for r in W.warc_to_corpus(archive_df).collect()}
    assert out["https://example.com/a"].text == "hello world"
    assert out["https://example.com/b"].text == "café 世界"
    # doc_id is deterministic across runs
    again = {r.url: r.doc_id for r in W.warc_to_corpus(archive_df).collect()}
    assert {u: r.doc_id for u, r in out.items()} == again


def test_iter_warc_records_stops_on_garbage():
    good = W.encode_warc(_fixture_records()[:2])
    recs = list(W.iter_warc_records(good + b"NOT A WARC RECORD"))
    assert len(recs) == 2  # records before the garbage still parse


def test_parse_http_response_edges():
    assert W.parse_http_response(b"no http envelope here") == (
        None,
        None,
        b"no http envelope here",
    )
    s, c, b = W.parse_http_response(
        b"HTTP/1.0 301 Moved\r\nLocation: /x\r\n\r\nbody"
    )
    assert (s, c, b) == (301, None, b"body")


def test_gunzip_members_multi():
    import gzip

    data = gzip.compress(b"abc") + gzip.compress(b"def")
    assert W.gunzip_members(data) == b"abcdef"
    assert W.gunzip_members(b"plain bytes") == b"plain bytes"


def test_streaming_warc_ingest(spark, tmp_path):
    """Two WARC archives arriving across two stream runs: cross-batch
    exact dedup holds (a page recrawled in archive 2 is not re-accepted),
    and restart consumes only the new archive (checkpointed file source)."""
    from pg2kinesis_spark.streaming.corpus_ingest import start_warc_ingest

    land = tmp_path / "landing"
    land.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def page(i, text):
        return {
            "warc_type": "response",
            "url": f"https://example.com/p{i}",
            "payload": W.http_response_bytes(
                f"<html><body><p>{text}</p></body></html>".encode()
            ),
        }

    docs1 = [page(i, f"unique page number {i} with plenty of words here") for i in range(5)]
    (land / "c-00000.warc.gz").write_bytes(W.encode_warc(docs1, gzip_members=True))
    q = start_warc_ingest(spark, str(land), out, ckpt, near_dup_jaccard=None)
    q.awaitTermination(120)
    first = spark.read.parquet(f"{out}/accepted")
    assert first.count() == 5

    # archive 2: a recrawl of page 2 (same body → same text) + one new page
    docs2 = [page(2, "unique page number 2 with plenty of words here"), page(9, "a brand new page body")]
    (land / "c-00001.warc.gz").write_bytes(W.encode_warc(docs2, gzip_members=True))
    q2 = start_warc_ingest(spark, str(land), out, ckpt, near_dup_jaccard=None)
    q2.awaitTermination(120)
    acc = spark.read.parquet(f"{out}/accepted")
    assert acc.count() == 6  # only the new page joined; the recrawl deduped
    texts = {r.text for r in acc.collect()}
    assert "a brand new page body" in texts


def test_warc_roundtrip_property():
    """Hypothesis: arbitrary payloads (including CRLF sequences, empty,
    binary) and unicode URLs round-trip through encode_warc →
    gunzip_members → iter_warc_records byte-identically, plain and
    gzip-per-member."""
    from hypothesis import given, settings, strategies as st

    rec = st.fixed_dictionaries(
        {
            "warc_type": st.sampled_from(["response", "request", "metadata"]),
            "url": st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
                    min_size=1,
                    max_size=30,
                ).map(lambda s: "https://h.example/" + s.replace(" ", "%20").replace("\r", "").replace("\n", "")),
            ),
            "payload": st.binary(max_size=400),
        }
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(rec, min_size=1, max_size=6), st.booleans())
    def check(records, gz):
        for r in records:
            if r["url"] is None:
                r.pop("url")
        buf = W.gunzip_members(W.encode_warc(records, gzip_members=gz))
        parsed = list(W.iter_warc_records(buf))
        assert len(parsed) == len(records)
        for r, (off, hdrs, payload) in zip(records, parsed):
            assert payload == r["payload"]
            assert hdrs["warc-type"] == r["warc_type"]
            if "url" in r:
                assert hdrs["warc-target-uri"] == r["url"]

    check()


def test_warc_quarantine_and_salvage(spark):
    """One hostile archive among good ones must not kill the batch: a
    bomb over the inflate cap yields one error row (quarantine), a
    corrupt gzip member salvages its already-decoded records, and
    errors='raise' restores fail-stop."""
    import gzip

    good = W.encode_warc(
        [{"warc_type": "response", "url": "http://a.example/1",
          "payload": W.http_response_bytes(
              b"<html><body><p>hello good page</p></body></html>")}],
        gzip_members=True,
    )
    salvage = W.encode_warc(
        [{"warc_type": "response", "url": "http://b.example/1",
          "payload": W.http_response_bytes(
              b"<html><body><p>salvaged record</p></body></html>")}],
        gzip_members=True,
    ) + b"\x1f\x8b\x08\x00CORRUPT-MEMBER-NOT-DEFLATE"
    bomb = gzip.compress(bytes(1 << 16))  # expands past the test cap
    rows = [(f"mem://{i}.warc.gz", bytearray(b))
            for i, b in enumerate((good, salvage, bomb))]
    archives = spark.createDataFrame(rows, "path string, content binary")

    recs = W.warc_records(archives, max_inflate_bytes=1 << 12).collect()
    errs = [r for r in recs if r.decode_error is not None]
    assert len(errs) == 1 and errs[0].path == "mem://2.warc.gz"
    assert "bomb" in errs[0].decode_error
    ok = {r.url for r in recs if r.decode_error is None}
    assert ok == {"http://a.example/1", "http://b.example/1"}  # salvaged

    # the composed corpus front door drops the error row silently
    docs = W.warc_to_corpus(archives).collect()
    assert {d.url for d in docs} == {"http://a.example/1", "http://b.example/1"}

    # fail-stop stays available for trusted archives
    with pytest.raises(Exception, match="bomb"):
        W.warc_records(
            archives, errors="raise", max_inflate_bytes=1 << 12
        ).collect()


def test_hostile_warc_headers_and_fully_corrupt_gzip(spark):
    """A negative Content-Length must terminate the record walk (it
    previously re-yielded the same record forever), and an archive
    whose gzip never produced one complete member must surface as a
    QUARANTINE row — not vanish silently."""
    import gzip as _gzip

    neg = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -54\r\n\r\n"
        b"payload bytes"
    )
    recs = list(W.iter_warc_records(neg))
    assert recs == []  # terminated, no infinite loop

    fully_corrupt = b"\x1f\x8b\x08\x00CORRUPT-FROM-THE-FIRST-MEMBER"
    with pytest.raises(ValueError, match="corrupt gzip"):
        W.gunzip_members(fully_corrupt)
    # truncated-but-started member with no complete predecessor: raises too
    half = _gzip.compress(b"some content here")[:10]
    with pytest.raises(ValueError, match="gzip"):
        W.gunzip_members(half)
    # and through the Spark kernel: one quarantine row, batch survives
    good = W.encode_warc(
        [{"warc_type": "response", "url": "http://ok.example/",
          "payload": W.http_response_bytes(b"<html><body><p>fine</p></body></html>")}],
        gzip_members=True,
    )
    archives = spark.createDataFrame(
        [("mem://good.warc.gz", bytearray(good)),
         ("mem://dead.warc.gz", bytearray(fully_corrupt))],
        "path string, content binary",
    )
    rows = W.warc_records(archives).collect()
    errs = [r for r in rows if r.decode_error is not None]
    assert len(errs) == 1 and errs[0].path == "mem://dead.warc.gz"
    assert {r.url for r in rows if r.decode_error is None} == {"http://ok.example/"}
