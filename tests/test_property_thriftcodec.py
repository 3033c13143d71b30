"""Property test for the generic thrift compact codec
(operators/thriftcodec): emit→parse is the identity on arbitrary
typed trees (including unsorted field ids forcing the long-form
header, 15+-element lists, empty maps, deep struct nesting), and
parse→emit is the identity on every real parquet footer the repo can
produce. The bloom appender's footer rewrite stands on both."""

import os
import struct
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.operators.thriftcodec import (  # noqa: E402
    emit_struct,
    parse_struct,
    set_field,
)

I64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


def _values(depth: int):
    scalar = st.one_of(
        st.just((1, True)),
        st.just((2, False)),
        st.tuples(st.just(5), I64),
        st.tuples(st.just(6), I64),
        st.tuples(
            st.just(7),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
        ),
        st.tuples(st.just(8), st.binary(max_size=40)),
    )
    if depth <= 0:
        return scalar
    inner = _values(depth - 1)
    lists = st.tuples(st.just(5), st.lists(I64, max_size=20)).map(
        lambda t: (9, (t[0], t[1]))
    )
    structs = st.builds(lambda f: (12, f), _fields(depth - 1))
    return st.one_of(scalar, lists, structs)


def _fields(depth: int):
    return st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3000),
            _values(depth),
        ),
        max_size=6,
        unique_by=lambda t: t[0],
    ).map(
        lambda items: [
            (fid, wire, val) for fid, (wire, val) in items
        ]
    )


@settings(max_examples=200, deadline=None)
@given(_fields(2))
def test_emit_parse_identity(fields):
    blob = emit_struct(fields)
    parsed, end = parse_struct(blob)
    assert end == len(blob)
    assert parsed == fields


@settings(max_examples=100, deadline=None)
@given(_fields(1), st.integers(min_value=1, max_value=3000), I64)
def test_set_field_upserts_and_preserves_rest(fields, fid, value):
    out = set_field(fields, fid, 6, value)
    ids = [f[0] for f in out]
    assert ids == sorted(set(ids)) or [
        f for f in fields if f[0] != fid
    ] == [f for f in out if f[0] != fid]
    # the upserted field is present with the new value, exactly once
    assert [(w, v) for i, w, v in out if i == fid] == [(6, value)]
    # and the result still round-trips
    parsed, _ = parse_struct(emit_struct(out))
    assert parsed == out


def test_real_footer_roundtrip_after_patch(tmp_path):
    """set_field deep in a real pyarrow footer re-emits every other
    byte unchanged (the exact operation the bloom appender does)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bazof_spark.operators.thriftcodec import get_field

    p = str(tmp_path / "f.parquet")
    pq.write_table(
        pa.table({"key": ["a", "b", "c"], "v": [1, 2, 3]}),
        p,
        write_page_index=True,
    )
    data = open(p, "rb").read()
    (n,) = struct.unpack("<I", data[-8:-4])
    blob = data[-8 - n : -8]
    fields, _ = parse_struct(blob)
    rg_elem, rgs = get_field(fields, 4)
    cols_elem, cols = get_field(rgs[0], 1)
    md = get_field(cols[0], 3)
    md2 = set_field(md, 14, 6, 12345)
    cols2 = [set_field(cols[0], 3, 12, md2)] + cols[1:]
    rgs2 = [set_field(rgs[0], 1, 9, (cols_elem, cols2))] + rgs[1:]
    fields2 = set_field(fields, 4, 9, (rg_elem, rgs2))
    blob2 = emit_struct(fields2)
    # removing the patch restores the original bytes exactly
    fields3, _ = parse_struct(blob2)
    rg_elem3, rgs3 = get_field(fields3, 4)
    cols_elem3, cols3 = get_field(rgs3[0], 1)
    md3 = [f for f in get_field(cols3[0], 3) if f[0] != 14]
    cols4 = [set_field(cols3[0], 3, 12, md3)] + cols3[1:]
    rgs4 = [set_field(rgs3[0], 1, 9, (cols_elem3, cols4))] + rgs3[1:]
    assert emit_struct(set_field(fields3, 4, 9, (rg_elem3, rgs4))) == blob
