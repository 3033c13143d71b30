"""WARC (ISO 28500 Web ARChive) ingestion + HTML→text extraction.

The de-facto container of LLM pretraining data: CommonCrawl ships
petabytes of `.warc.gz` — one gzip MEMBER per record, concatenated —
and every web-corpus pipeline starts by demuxing records, splitting
the HTTP envelope, and extracting visible text from HTML. The
reference engine has no such surface (tabular scans only); this
module continues the repo's LLM-pipeline operators (dedup, quality,
lm, dsir) at the INGESTION end.

Scope:
- Writer (fixture + real use): standards-shaped WARC/1.0 `response`
  records (named headers, Content-Length framing, the \\r\\n\\r\\n
  record separator) wrapping an HTTP/1.1 response, each record its
  own gzip member (the CommonCrawl convention, so readers can split
  archives at member boundaries without parsing content).
- Parser: gzip-member walk (zlib with unused_data continuation —
  also accepts uncompressed archives), record-header parse,
  Content-Length-exact payload slicing, HTTP status/header/body
  split.
- `html_to_text`: the classic visible-text extraction — drops
  <script>/<style> subtrees and comments, strips tags, decodes the
  standard character entities (named + numeric), collapses
  whitespace to single spaces. Deterministic (no heuristics), so an
  oracle that knows the page template can recompute the extraction
  in closed form.

Scale shape: both demux and extraction are per-blob pure functions —
mapInPandas over a binary column, zero exchanges (the same seam as
the media codecs); trafilatura/resiliparse slot in here in
production.
"""

from __future__ import annotations

import gzip
import re
import zlib

_CRLF = "\r\n"


def build_warc_gz(records: list[dict]) -> bytes:
    """records: [{uri, date, html, status (opt), record_id (opt)}] →
    a .warc.gz blob, one gzip member per WARC response record."""
    out = bytearray()
    for i, r in enumerate(records):
        body = r["html"].encode("utf-8")
        status = int(r.get("status", 200))
        http = (
            f"HTTP/1.1 {status} OK{_CRLF}"
            f"Content-Type: text/html; charset=utf-8{_CRLF}"
            f"Content-Length: {len(body)}{_CRLF}{_CRLF}"
        ).encode("ascii") + body
        rid = r.get("record_id", f"<urn:uuid:{i:032x}>")
        head = (
            f"WARC/1.0{_CRLF}"
            f"WARC-Type: response{_CRLF}"
            f"WARC-Record-ID: {rid}{_CRLF}"
            f"WARC-Date: {r['date']}{_CRLF}"
            f"WARC-Target-URI: {r['uri']}{_CRLF}"
            f"Content-Type: application/http; msgtype=response{_CRLF}"
            f"Content-Length: {len(http)}{_CRLF}{_CRLF}"
        ).encode("ascii")
        member = head + http + (_CRLF + _CRLF).encode("ascii")
        out += gzip.compress(member, compresslevel=6)
    return bytes(out)


def _gzip_members(content: bytes):
    """Yield decompressed gzip members from a concatenated stream;
    a non-gzip blob is yielded whole (uncompressed WARC)."""
    if content[:2] != b"\x1f\x8b":
        yield content
        return
    pos = 0
    while pos < len(content):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        yield d.decompress(content[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        consumed = len(content) - pos - len(d.unused_data)
        pos += consumed
        if consumed <= 0:
            raise ValueError("gzip member made no progress")


def parse_warc(content: bytes) -> list[dict]:
    """Parse a (gzipped or plain) WARC blob → one dict per record:
    {headers: {lower-name: value}, http_status: int|None,
    http_headers: {...}|None, body: bytes}. Non-HTTP records (e.g.
    warcinfo) keep body raw with http_status None."""
    records = []
    for member in _gzip_members(content):
        pos = 0
        while pos < len(member):
            # skip inter-record blank lines
            while member[pos : pos + 2] == b"\r\n":
                pos += 2
            if pos >= len(member):
                break
            if not member[pos : pos + 5] == b"WARC/":
                raise ValueError("record does not start with WARC/ version")
            hdr_end = member.index(b"\r\n\r\n", pos)
            lines = member[pos:hdr_end].decode("utf-8").split(_CRLF)
            headers = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            payload = member[hdr_end + 4 : hdr_end + 4 + length]
            if len(payload) != length:
                raise ValueError("WARC payload shorter than Content-Length")
            rec = {"headers": headers, "http_status": None,
                   "http_headers": None, "body": payload}
            if "application/http" in headers.get("content-type", ""):
                he = payload.find(b"\r\n\r\n")
                if he == -1:
                    raise ValueError("HTTP envelope lacks header terminator")
                hlines = payload[:he].decode("utf-8", "replace").split(_CRLF)
                parts = hlines[0].split(" ", 2)
                rec["http_status"] = int(parts[1])
                rec["http_headers"] = {
                    k.strip().lower(): v.strip()
                    for k, _, v in (ln.partition(":") for ln in hlines[1:])
                }
                rec["body"] = payload[he + 4 :]
            records.append(rec)
            pos = hdr_end + 4 + length
    return records


_DROP_SUBTREE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ",
}
_ENTITY_RE = re.compile(r"&(#x?[0-9A-Fa-f]+|[A-Za-z]+);")


def _entity(m: re.Match) -> str:
    e = m.group(1)
    if e.startswith("#x") or e.startswith("#X"):
        return chr(int(e[2:], 16))
    if e.startswith("#"):
        return chr(int(e[1:]))
    return _ENTITIES.get(e, m.group(0))


def html_to_text(html: str) -> str:
    """Visible text: drop script/style subtrees and comments, strip
    tags, decode standard entities, collapse whitespace."""
    s = _DROP_SUBTREE_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENTITY_RE.sub(_entity, s)
    return " ".join(s.split())
