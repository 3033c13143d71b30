"""WARC ingestion + HTML→text extraction (round 9): the CommonCrawl
entry point of the LLM-pipeline surface. Writer and parser are
independent directions (string builder vs gzip-member/Content-Length
walk); the extraction is deterministic so corpora fixtures can be
verified in closed form."""

import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.operators.warc import (  # noqa: E402
    build_warc_gz,
    html_to_text,
    parse_warc,
)


def _rec(i, html="<p>hi</p>", status=200):
    return {
        "uri": f"http://ex.com/{i}",
        "date": "2024-01-01T00:00:00Z",
        "html": html,
        "status": status,
    }


def test_warc_roundtrip_multi_member():
    recs = [_rec(i, f"<p>page {i}</p>", 200 + i) for i in range(5)]
    out = parse_warc(build_warc_gz(recs))
    assert [r["http_status"] for r in out] == [200, 201, 202, 203, 204]
    assert [r["headers"]["warc-target-uri"] for r in out] == [
        f"http://ex.com/{i}" for i in range(5)
    ]
    assert out[3]["body"] == b"<p>page 3</p>"
    assert out[0]["headers"]["warc-type"] == "response"
    assert out[0]["http_headers"]["content-type"].startswith("text/html")


def test_warc_accepts_uncompressed_and_rejects_truncation():
    blob = build_warc_gz([_rec(0)])
    plain = gzip.decompress(blob)
    assert parse_warc(plain)[0]["body"] == b"<p>hi</p>"
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc(blob[:-4])
    # payload shorter than Content-Length is a framing error
    bad = plain.replace(b"<p>hi</p>\r\n\r\n", b"<p>hi")
    with pytest.raises(ValueError, match="Content-Length|WARC/"):
        parse_warc(bad)


def test_warc_binary_payload_with_crlf_traps():
    """Content-Length framing must slice EXACTLY — a body containing
    record-separator and header-terminator byte sequences must not
    confuse the walk."""
    trap = "X\r\n\r\nWARC/1.0\r\n\r\nY"
    out = parse_warc(build_warc_gz([_rec(0, trap), _rec(1, "ok")]))
    assert out[0]["body"].decode() == trap
    assert out[1]["body"] == b"ok"


def test_html_to_text_rules():
    html = (
        "<html><head><title>T</title><style>p{a:b}</style></head>"
        "<body><!-- no --><h1>A &amp; B</h1><p>c&#65;d &lt;tag&gt;</p>"
        "<script>drop();</script><SCRIPT>drop2()</SCRIPT>"
        "<p>x\n\n  y</p></body></html>"
    )
    assert html_to_text(html) == "T A & B cAd <tag> x y"
    # unknown entities pass through verbatim; hex entities decode
    assert html_to_text("&bogus; &#x41;") == "&bogus; A"
    # nested angle text inside attributes
    assert html_to_text('<a href="u" title="q">link</a>') == "link"
