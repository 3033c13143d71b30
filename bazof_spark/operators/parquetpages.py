"""From-spec parquet COLUMN reader — pages, levels, values.

Together with :mod:`parquetmeta` (the footer) and the from-spec codec
family (inflate/gzip, snappy, zstd, lz4 — the page codecs), this
closes the loop: a flat parquet column decodes END-TO-END with zero
external parsers — footer → row group → column chunk → PageHeader
(Thrift compact) → decompress (in-repo codecs) → definition levels
(RLE/bit-packed hybrid) → values (PLAIN or dictionary indices). The
pin is total: the decoded value lists must equal pyarrow's
``read_table(...).to_pylist()`` on every fixture, so a wrong field id,
level width, bit order or codec route cannot hide.

Format facts this implements (parquet-format spec):

- **PageHeader** thrift: 1 type (0 DATA_PAGE, 2 DICTIONARY_PAGE,
  3 DATA_PAGE_V2), 2 uncompressed_page_size, 3 compressed_page_size,
  5 DataPageHeader {1 num_values, 2 encoding, 3 definition_level_
  encoding, 4 repetition_level_encoding}, 7 DictionaryPageHeader
  {1 num_values, 2 encoding}, 8 DataPageHeaderV2 {1 num_values,
  2 num_nulls, 3 num_rows, 4 encoding, 5 definition_levels_byte_
  length, 6 repetition_levels_byte_length, 7 is_compressed}.
- **v1 data page** (after decompression): repetition levels (absent
  for flat columns), then definition levels as ``<LE32 length><RLE/
  bit-packed hybrid>``, then values. **v2**: levels sit UNCOMPRESSED
  before the (optionally compressed) values, lengths in the header.
- **RLE/bit-packed hybrid**: varint header h; even h = RLE run of
  h>>1 copies of a ceil(bw/8)-byte LE value; odd h = (h>>1) groups of
  8 values bit-packed LSB-first.
- **PLAIN**: INT32/INT64/FLOAT/DOUBLE little-endian, BOOLEAN
  bit-packed LSB-first, BYTE_ARRAY ``<LE32 length><bytes>``.
- **Dictionary encoding** (pyarrow's default): a PLAIN dictionary
  page, then data pages of ``<bit_width byte><hybrid indices>``
  (PLAIN_DICTIONARY / RLE_DICTIONARY are the same wire format here).

Scope (honest): FLAT columns only — max repetition level 0,
definition level 0/1; nested paths raise. DELTA_* encodings and
BYTE_STREAM_SPLIT raise with a clear message (pyarrow only emits them
on request). That covers every file this repo writes or ships.
"""

from __future__ import annotations

import struct as _struct

from bazof_spark.operators.parquetmeta import (
    _Reader,
    _read_struct,
    parse_parquet_footer,
)


def _decompress(codec: str, data: bytes, uncompressed_size: int) -> bytes:
    if codec == "UNCOMPRESSED":
        return data
    if codec == "SNAPPY":
        from bazof_spark.operators.snappycodec import snappy_decompress

        return snappy_decompress(data)
    if codec == "GZIP":
        from bazof_spark.operators.inflate import gzip_decompress

        return gzip_decompress(data)
    if codec == "ZSTD":
        from bazof_spark.operators.zstdcodec import zstd_decompress

        return zstd_decompress(data)
    if codec == "LZ4_RAW":
        from bazof_spark.operators.lz4codec import lz4_block_decompress

        return lz4_block_decompress(data, uncompressed_size)
    raise NotImplementedError(f"page codec {codec!r} not implemented")


def _read_hybrid(data: bytes, bit_width: int, count: int) -> list[int]:
    """RLE/bit-packed hybrid run of ``count`` values."""
    out: list[int] = []
    r = _Reader(data)
    byte_w = (bit_width + 7) // 8
    while len(out) < count:
        h = r.varint()
        if h & 1:  # bit-packed: (h>>1) groups of 8 values, LSB first
            n_groups = h >> 1
            total_bits = n_groups * 8 * bit_width
            raw = r.data[r.pos : r.pos + (total_bits + 7) // 8]
            r.pos += (total_bits + 7) // 8
            acc = int.from_bytes(raw, "little")
            mask = (1 << bit_width) - 1
            for i in range(n_groups * 8):
                out.append((acc >> (i * bit_width)) & mask)
        else:  # RLE run
            run = h >> 1
            v = int.from_bytes(
                r.data[r.pos : r.pos + byte_w], "little"
            ) if byte_w else 0
            r.pos += byte_w
            out.extend([v] * run)
    return out[:count]


def _plain_values(data: bytes, ptype: str, count: int) -> list:
    if ptype == "INT32":
        return list(_struct.unpack_from(f"<{count}i", data))
    if ptype == "INT64":
        return list(_struct.unpack_from(f"<{count}q", data))
    if ptype == "FLOAT":
        return list(_struct.unpack_from(f"<{count}f", data))
    if ptype == "DOUBLE":
        return list(_struct.unpack_from(f"<{count}d", data))
    if ptype == "BOOLEAN":
        acc = int.from_bytes(data[: (count + 7) // 8], "little")
        return [bool((acc >> i) & 1) for i in range(count)]
    if ptype == "BYTE_ARRAY":
        out = []
        pos = 0
        for _ in range(count):
            (n,) = _struct.unpack_from("<I", data, pos)
            pos += 4
            out.append(data[pos : pos + n])
            pos += n
        return out
    raise NotImplementedError(f"PLAIN decode for {ptype!r}")


def _max_levels(schema: list[dict], path: list[str]) -> tuple[int, int]:
    """(max_definition_level, max_repetition_level) for a FLAT column:
    walk the schema elements to the leaf named path[-1] at depth 1.

    Only DIRECT children of the root are considered: each group's
    subtree is skipped via its num_children count, so a nested leaf
    that happens to share the requested name can't shadow (or falsely
    stand in for) the top-level column.
    """
    if len(path) != 1:
        raise NotImplementedError(
            f"nested column {'.'.join(path)!r}: only flat columns decode"
        )
    i = 1
    while i < len(schema):
        e = schema[i]
        if e["name"] != path[0]:
            # skip this element's entire subtree (depth-first layout)
            pending = e["num_children"] or 0
            i += 1
            while pending:
                pending -= 1
                pending += schema[i]["num_children"] or 0
                i += 1
            continue
        if e["num_children"]:
            raise NotImplementedError(
                f"{path[0]!r} is a group: only flat columns decode"
            )
        if e["repetition"] == "REPEATED":
            raise NotImplementedError("repeated fields not supported")
        return (1 if e["repetition"] == "OPTIONAL" else 0), 0
    raise ValueError(f"column {path[0]!r} not in schema")


def read_column(data: bytes, column: str) -> list:
    """Decode a flat column from raw parquet FILE bytes, from spec all
    the way down; returns Python values with None for nulls."""
    meta = parse_parquet_footer(data)
    max_def, _ = _max_levels(meta["schema"], [column])
    out: list = []
    for g in meta["row_groups"]:
        chunks = [
            c for c in g["columns"] if c["path_in_schema"] == [column]
        ]
        if len(chunks) != 1:
            raise ValueError(f"column {column!r} not in a row group")
        out.extend(_read_chunk(data, chunks[0], max_def))
    return out


def _read_chunk(data: bytes, chunk: dict, max_def: int) -> list:
    ptype = chunk["type"]
    codec = chunk["codec"]
    start = chunk["dictionary_page_offset"]
    if start is None or start <= 0:
        start = chunk["data_page_offset"]
    end = start + chunk["total_compressed_size"]
    pos = start
    dictionary: list | None = None
    out: list = []
    values_left = chunk["num_values"]
    while pos < end and values_left > 0:
        r = _Reader(data, pos)
        header = _read_struct(r)
        page_type = header.get(1)
        comp_size = header.get(3)
        unc_size = header.get(2)
        body = data[r.pos : r.pos + comp_size]
        pos = r.pos + comp_size
        if page_type == 2:  # DICTIONARY_PAGE (PLAIN-encoded values)
            dph = header.get(7, {})
            dictionary = _plain_values(
                _decompress(codec, body, unc_size), ptype, dph.get(1)
            )
            continue
        if page_type == 0:  # DATA_PAGE v1
            h = header.get(5, {})
            n = h.get(1)
            enc = h.get(2)
            page = _decompress(codec, body, unc_size)
            vpos = 0
            defs = [max_def] * n
            if max_def > 0:
                (lvl_len,) = _struct.unpack_from("<I", page, 0)
                defs = _read_hybrid(page[4 : 4 + lvl_len], 1, n)
                vpos = 4 + lvl_len
            out.extend(
                _decode_values(
                    page[vpos:], ptype, enc, defs, dictionary, max_def
                )
            )
            values_left -= n
            continue
        if page_type == 3:  # DATA_PAGE_V2: levels sit OUTSIDE the
            h = header.get(8, {})  # compressed region
            n = h.get(1)
            enc = h.get(4)
            dll = h.get(5) or 0
            rll = h.get(6) or 0
            is_comp = h.get(7)
            levels = body[: rll + dll]
            vals = body[rll + dll :]
            if is_comp is not False:
                vals = _decompress(
                    codec, vals, unc_size - rll - dll
                )
            defs = [max_def] * n
            if max_def > 0 and dll:
                defs = _read_hybrid(levels[rll:], 1, n)
            out.extend(
                _decode_values(vals, ptype, enc, defs, dictionary, max_def)
            )
            values_left -= n
            continue
        raise NotImplementedError(f"page type {page_type!r}")
    return out


def _decode_values(vals, ptype, enc, defs, dictionary, max_def):
    # a value is PRESENT iff its definition level reaches max_def —
    # for REQUIRED columns max_def is 0 and every level is 0, so a
    # hard-coded `d == 1` would drop every value (ADVICE r10).
    n_present = sum(1 for d in defs if d == max_def)
    # encodings: 0 PLAIN; 2 PLAIN_DICTIONARY / 8 RLE_DICTIONARY share
    # the <bit_width byte><hybrid indices> wire format
    if enc == 0:
        present = _plain_values(vals, ptype, n_present)
    elif enc == 3 and ptype == "BOOLEAN":
        # v2 writers emit BOOLEAN values RLE-encoded:
        # <LE32 length><hybrid runs at bit width 1>
        (ln,) = _struct.unpack_from("<I", vals, 0)
        present = [
            bool(v) for v in _read_hybrid(vals[4 : 4 + ln], 1, n_present)
        ]
    elif enc in (2, 8):
        if dictionary is None:
            raise ValueError("dictionary-encoded page before dict page")
        bw = vals[0]
        idx = _read_hybrid(vals[1:], bw, n_present) if bw else [0] * n_present
        present = [dictionary[i] for i in idx]
    else:
        raise NotImplementedError(f"value encoding {enc!r}")
    it = iter(present)
    return [next(it) if d == max_def else None for d in defs]
