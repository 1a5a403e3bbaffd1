"""WARC → HTTP → HTML ingestion contract (operators/web.py).

Framing exactness for all three layers: WARC records (plain and
per-member-gzip, Content-Length byte framing), HTTP responses
(chunked reassembly, gzip/deflate Content-Encoding), and the
deterministic tag-level HTML extraction (dropped subtrees, block
breaks, entities, whitespace collapse). The DuckDB-side check is
multimodal_suite's 'warc' rows (closed-form text per record)."""

from __future__ import annotations

import gzip
import zlib

import pytest

from rta_registrations_pyspark_glue_spark.operators import web


def _one_page(html: str, **kw) -> bytes:
    return web.encode_warc([("http://x/1", html)], **kw)


# ---------------------------------------------------------------------------
# WARC framing


@pytest.mark.parametrize("gz", [True, False])
def test_warc_record_framing(gz):
    b = web.encode_warc(
        [("http://a/0", "<p>A</p>"), ("http://a/1", "<p>B</p>")],
        gzip_records=gz,
    )
    recs = web.parse_warc(b)
    assert [r["type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[1]["url"] == "http://a/0"
    # Content-Length framing is byte-exact: the body must start with
    # the HTTP status line, not CRLF residue
    assert recs[1]["body"].startswith(b"HTTP/1.1 200")


def test_warc_body_with_crlf_content_is_not_resplit():
    # a body containing "\r\n\r\nWARC/1.0" must NOT confuse framing —
    # only Content-Length counts
    html = "<p>fake\r\n\r\nWARC/1.0 inside body</p>"
    recs = web.parse_warc(_one_page(html, gzip_records=False))
    assert len(recs) == 2
    _s, _h, body = web.parse_http_response(recs[1]["body"])
    assert b"WARC/1.0 inside body" in body


def test_warc_malformed_envelope():
    with pytest.raises(ValueError):
        web.parse_warc(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError):
        web.parse_warc(b"\x1f\x8b garbage gzip")
    good = _one_page("<p>x</p>", gzip_records=False)
    with pytest.raises(ValueError):
        web.parse_warc(good[: len(good) - 30])  # truncated body


# ---------------------------------------------------------------------------
# HTTP layer


def test_http_chunked_reassembly():
    b = _one_page("<p>" + "x" * 500 + "</p>", chunked=True)
    recs = web.parse_warc(b)
    _s, h, body = web.parse_http_response(recs[1]["body"])
    assert h["transfer-encoding"] == "chunked"
    assert body.decode() == "<p>" + "x" * 500 + "</p>"


def test_http_content_encoding_gzip_and_deflate():
    b = _one_page("<p>zipped</p>", content_gzip=True)
    recs = web.parse_warc(b)
    _s, h, body = web.parse_http_response(recs[1]["body"])
    assert h["content-encoding"] == "gzip" and body == b"<p>zipped</p>"

    # hand-build deflate (zlib-wrapped AND raw — both server styles)
    raw_obj = zlib.compressobj(wbits=-15)
    raw_deflate = raw_obj.compress(b"<p>d</p>") + raw_obj.flush()
    for payload in (zlib.compress(b"<p>d</p>"), raw_deflate):
        raw = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode() + payload
        )
        _s, _h, body = web.parse_http_response(raw)
        assert body == b"<p>d</p>"


def test_http_bad_status_line():
    with pytest.raises(ValueError, match="status"):
        web.parse_http_response(b"NOPE 200\r\n\r\n")


# ---------------------------------------------------------------------------
# HTML extraction


def test_html_drops_script_style_head_keeps_title():
    got = web.extract_html_text(
        "<html><head><title>T</title><style>p{}</style>"
        "<script>var a=1;</script></head>"
        "<body><p>keep</p><noscript>no</noscript></body></html>"
    )
    assert got["title"] == "T"
    assert got["text"] == "keep"


def test_html_block_breaks_and_whitespace_collapse():
    got = web.extract_html_text(
        "<div>  a   b  </div><p>c</p>inline <b>bold</b> tail<br>next"
    )
    assert got["text"] == "a b\nc\ninline bold tail\nnext"


def test_html_entities_and_links():
    got = web.extract_html_text(
        '<p>a &amp; b &lt;c&gt;</p><a href="/1">x</a><a href="/2">y</a>'
    )
    assert got["text"].startswith("a & b <c>")
    assert got["n_links"] == 2


def test_html_nested_dropped_subtree():
    got = web.extract_html_text(
        "<script><style>deep</style>if (a<b) {}</script><p>ok</p>"
    )
    assert got["text"] == "ok"


# ---------------------------------------------------------------------------
# Gate fixture ↔ oracle equality + Spark surface


def test_gate_fixture_matches_analytic_formula():
    for d in (0, 1, 2, 3, 17, 38, 104):
        payloads = web.encode_warc(
            [
                (
                    f"http://example.com/{d}/{p}",
                    f"<html><head><title>Page {d}-{p}</title>"
                    f"<script>var x = {d};</script></head>"
                    f"<body><h1>Doc {d} page {p}</h1>"
                    f"<p>Gamma {(d * 19 + p) % 997} text body.</p>"
                    f"<div>"
                    + "".join(
                        f'<a href="/l{i}">link {i}</a> '
                        for i in range((d + p) % 3)
                    )
                    + "</div></body></html>",
                )
                for p in range(2)
            ],
            gzip_records=True,
            chunked=(d % 3 == 1),
            content_gzip=(d % 3 == 2),
        )
        recs = [
            r for r in web.parse_warc(payloads) if r["type"] == "response"
        ]
        for p, rec in enumerate(recs):
            status, _h, body = web.parse_http_response(rec["body"])
            got = web.extract_html_text(body.decode())
            expect = (
                f"Doc {d} page {p}\nGamma {(d * 19 + p) % 997} text body."
            )
            nl = (d + p) % 3
            if nl:
                expect += "\n" + " ".join(f"link {i}" for i in range(nl))
            assert status == 200 and got["text"] == expect, (d, p)
            assert got["title"] == f"Page {d}-{p}"
            assert got["n_links"] == nl


def test_spark_fixture_and_features(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    rows = (
        web.extract_warc_features(web.synthesize_warc_docs(docs))
        .orderBy("doc_id", "rec_idx")
        .collect()
    )
    assert len(rows) == 12  # 2 response records per doc
    for r in rows:
        assert r.parse_ok and r.status == 200
        assert r.url == f"http://example.com/{r.doc_id}/{r.rec_idx}"
        assert r.n_links == (r.doc_id + r.rec_idx) % 3


def test_spark_malformed_blob_yields_visible_failure_row(spark):
    docs = spark.createDataFrame(
        [(1, bytearray(b"not a warc"))], "doc_id bigint, content binary"
    )
    rows = web.extract_warc_features(docs).collect()
    assert len(rows) == 1 and rows[0].parse_ok is False


def test_decode_html_bytes_whatwg_precedence():
    from rta_registrations_pyspark_glue_spark.operators.web import (
        decode_html_bytes,
    )

    # BOM wins over everything
    body = "﻿<p>é</p>".encode("utf-8")
    assert decode_html_bytes(body, "text/html; charset=latin-1") == "<p>é</p>"
    assert decode_html_bytes("<p>é</p>".encode("utf-16")) == "<p>é</p>"
    # transport charset beats meta
    body = "<meta charset=utf-8><p>caf\xe9</p>".encode("latin-1")
    assert "café" in decode_html_bytes(body, "text/html; charset=ISO-8859-1")
    # meta prescan when the header is silent (both syntaxes)
    body = b'<meta charset="windows-1252"><p>\x93quoted\x94</p>'
    assert "“quoted”" in decode_html_bytes(body, "text/html")
    body = (
        '<meta http-equiv="Content-Type" content="text/html; charset=latin-1">'
        "<p>caf\xe9</p>"
    ).encode("latin-1")
    assert "café" in decode_html_bytes(body, None)
    # unknown label falls through to utf-8
    body = "<meta charset=bogus-enc><p>ok</p>".encode("utf-8")
    assert "ok" in decode_html_bytes(body, "text/html; charset=also-bogus")


def test_encode_warc_bytes_are_process_stable():
    """ADVICE r9: record IDs came from salted hash() — fixture bytes
    differed across processes/executors. Now an md5 digest: the bytes
    must embed the stable derivation, not interpreter state."""
    import hashlib

    raw = web.encode_warc([("http://a.com/x", "<p>hi</p>")], gzip_records=False)
    rid = hashlib.md5(b"response|http://a.com/x").hexdigest()[:12]
    assert f"WARC-Record-ID: <urn:uuid:{rid}>".encode() in raw
    assert raw == web.encode_warc([("http://a.com/x", "<p>hi</p>")], gzip_records=False)
