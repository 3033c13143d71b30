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


# ---------------------------------------------------------------------------
# ZIP archives (round 9): stdlib writer vs hand parser
# ---------------------------------------------------------------------------

import zlib  # noqa: E402

from bazof_spark.operators.ziparchive import build_zip, parse_zip  # noqa: E402


def test_zip_roundtrip_deflate_and_stored():
    members = [
        ("a.txt", b"hello " * 200),
        ("dir/b.bin", bytes(range(256)) * 3),
        ("empty.txt", b""),
    ]
    for compress in (True, False):
        out = parse_zip(build_zip(members, compress))
        assert [(m["name"], m["data"]) for m in out] == members
        assert all(
            m["method"] == (8 if compress and m["size"] else 0)
            or m["method"] in (0, 8)
            for m in out
        )


def test_zip_crc_and_framing_errors_loud():
    import pytest

    blob = bytearray(build_zip([("a.txt", b"x" * 500)]))
    # flip a byte inside the deflate stream -> inflate error or CRC trip
    blob[45] ^= 0xFF
    with pytest.raises((ValueError, zlib.error)):
        parse_zip(bytes(blob))
    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip(b"not a zip at all")


def test_zip_interops_with_stdlib_reader():
    """Our parse agrees with zipfile on the same blob."""
    import io
    import zipfile

    members = [("x.txt", b"alpha"), ("y.txt", b"beta" * 100)]
    blob = build_zip(members)
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        std = [(n, z.read(n)) for n in z.namelist()]
    ours = [(m["name"], m["data"]) for m in parse_zip(blob)]
    assert std == ours


# ---------------------------------------------------------------------------
# tar shards (round 9): the WebDataset convention
# ---------------------------------------------------------------------------

from bazof_spark.operators.tarshard import (  # noqa: E402
    build_tar,
    group_samples,
    parse_tar,
)


def test_tar_roundtrip_and_stdlib_interop():
    import io
    import tarfile

    members = [
        ("000000.txt", b"alpha beta"),
        ("000000.cls", b"3"),
        ("sub/dir/000001.txt", b"x" * 1500),  # spans 3+ data blocks
        ("sub/dir/000001.cls", b"7"),
        ("noext", b"raw"),
    ]
    blob = build_tar(members)
    ours = [(m["name"], m["data"]) for m in parse_tar(blob)]
    assert ours == members
    with tarfile.open(fileobj=io.BytesIO(blob)) as t:
        std = [(m.name, t.extractfile(m).read()) for m in t if m.isfile()]
    assert std == ours


def test_tar_webdataset_grouping():
    members = parse_tar(
        build_tar(
            [
                ("a/000.txt", b"t0"), ("a/000.cls", b"1"),
                ("a/001.txt", b"t1"), ("a/001.cls", b"2"),
                ("plain", b"p"),
            ]
        )
    )
    groups = group_samples(members)
    assert [g["key"] for g in groups] == ["a/000", "a/001", "plain"]
    assert groups[0]["parts"] == {"txt": b"t0", "cls": b"1"}
    assert groups[2]["parts"] == {"": b"p"}


def test_tar_checksum_and_truncation_loud():
    import pytest

    blob = bytearray(build_tar([("a.txt", b"hello")]))
    blob[130] ^= 1  # corrupt the size field -> checksum trips
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(blob))
    good = build_tar([("a.txt", b"hello" * 200)])
    with pytest.raises(ValueError, match="truncated|mid-header"):
        parse_tar(good[:700])
