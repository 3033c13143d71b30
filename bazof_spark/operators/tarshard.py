"""POSIX tar shard ingestion — the WebDataset convention.

Large-scale multimodal training data ships as TAR SHARDS (WebDataset:
thousands of `.tar` files, each holding samples as member GROUPS that
share a basename key — `000123.jpg` + `000123.json` + `000123.cls`),
streamed sequentially for throughput. The ingestion step is: walk tar
headers, group members by key, emit one sample per group. The
reference has no such surface; this joins WARC/ZIP at the repo's
ingestion end.

Discipline mirrors ziparchive.py: the ENCODER is the stdlib
``tarfile`` module (fixtures are real tars), the PARSER is written
here from the POSIX ustar spec — 512-byte headers, octal size fields,
checksum verification (both the signed and unsigned historical
variants accepted, as real readers do), data blocks padded to 512,
two zero blocks at the end. A checksum or framing mistake is a loud
error.

Scale shape: per-blob pure function → mapInPandas over a binary
column, zero exchanges; the grouping into samples happens inside the
blob (shard-local by construction — exactly why WebDataset uses tar),
so no shuffle is ever needed to assemble a sample.
"""

from __future__ import annotations

import io
import tarfile


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Real ustar via the stdlib writer."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def parse_tar(content: bytes) -> list[dict]:
    """Hand-parse a tar blob → [{name, size, data}] for regular files,
    verifying each header checksum."""
    out = []
    pos = 0
    n = len(content)
    while pos + 512 <= n:
        block = content[pos : pos + 512]
        if block == b"\x00" * 512:
            break  # end-of-archive
        name = block[0:100].split(b"\x00", 1)[0].decode("utf-8")
        size_field = block[124:136].split(b"\x00", 1)[0].strip() or b"0"
        size = int(size_field, 8)
        stored = int(block[148:156].split(b"\x00", 1)[0].strip() or b"0", 8)
        blank = block[:148] + b" " * 8 + block[156:]
        if sum(blank) != stored:
            # historical writers summed SIGNED bytes — only compute
            # that variant when the standard one mismatches
            signed = sum(b - 256 if b > 127 else b for b in blank)
            if signed != stored:
                raise ValueError(f"tar header checksum mismatch at {pos}")
        typeflag = block[156:157]
        prefix = block[345:500].split(b"\x00", 1)[0].decode("utf-8")
        if prefix:
            name = prefix + "/" + name
        data_at = pos + 512
        if typeflag in (b"0", b"\x00"):
            data = content[data_at : data_at + size]
            if len(data) != size:
                raise ValueError(f"tar member {name!r} truncated")
            out.append({"name": name, "size": size, "data": data})
        pos = data_at + ((size + 511) // 512) * 512
    else:
        if pos < n:
            raise ValueError("tar stream ends mid-header")
    return out


def group_samples(members: list[dict]) -> list[dict]:
    """WebDataset grouping: members sharing a dotted basename key form
    one sample — `a/000123.jpg` + `a/000123.json` → key `a/000123`,
    parts {'jpg': …, 'json': …}. Order of first appearance."""
    samples: dict[str, dict] = {}
    order: list[str] = []
    for m in members:
        name = m["name"]
        key, _, ext = name.rpartition(".")
        if not key:
            key, ext = name, ""
        if key not in samples:
            samples[key] = {"key": key, "parts": {}}
            order.append(key)
        samples[key]["parts"][ext] = m["data"]
    return [samples[k] for k in order]
