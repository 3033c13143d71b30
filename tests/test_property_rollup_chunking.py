"""Property-based checks for the round-2 operators.

- Rollup: for ANY event set, ANY split into initial/late batches and
  ANY watermark, ``build(initial) + reconcile(late) + read(all)``
  equals the one-shot full aggregate — the exactness contract that
  lets a 100 TB log never re-scan history.
- Chunking: for ANY token sequence, chunks tile the document exactly —
  first chunk starts at 0, consecutive chunks overlap by exactly
  ``overlap`` (or end the doc), and stripping the overlaps
  reconstructs the original text.
"""

import shutil
import tempfile
from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bazof_spark.operators.chunking import chunk_documents
from bazof_spark.operators.rollup import Rollup, aggregate_bucketed

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

_event = st.tuples(
    st.integers(min_value=0, max_value=96),  # hour offset (4 days)
    st.sampled_from(["a", "b", "c"]),
    st.integers(min_value=-50, max_value=50),
)

_events_lists = st.tuples(
    st.lists(_event, min_size=1, max_size=12),  # initial
    st.lists(_event, min_size=0, max_size=6),   # late batch
    st.integers(min_value=1, max_value=96),     # watermark hour
)


def _measures():
    return {
        "n": (F.count(F.lit(1)), "sum"),
        "s": (F.sum(F.col("v").cast("decimal(18,2)")), "sum"),
        "mx": (F.max("v"), "max"),
    }


def _df(spark, rows):
    return spark.createDataFrame(
        [(T0 + timedelta(hours=h), k, float(v)) for h, k, v in rows],
        "ts timestamp, k string, v double",
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_events_lists)
def test_rollup_build_reconcile_read_equals_full(spark, data):
    initial, late, wm_hour = data
    path = tempfile.mkdtemp(prefix="bazof_prop_rollup_")
    try:
        r = Rollup(spark, path, "ts", ["k"], _measures(), 3600)
        r.build(_df(spark, initial), T0 + timedelta(hours=wm_hour))
        if late:
            r.reconcile(_df(spark, late))
        # late rows at/above the watermark belong to the tail: read()
        # must see them via the events argument, which is the full log
        ev_all = _df(spark, initial + late)
        got = r.read(ev_all)
        exp = aggregate_bucketed(ev_all, "ts", ["k"], _measures(), 3600)
        cols = sorted(got.columns)
        g = [tuple(x) for x in got.select(*cols).orderBy(*cols).collect()]
        e = [tuple(x) for x in exp.select(*cols).orderBy(*cols).collect()]
        assert g == e
    finally:
        shutil.rmtree(path, ignore_errors=True)


_doc = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=3),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=5),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=11),
)
def test_chunking_tiles_and_reconstructs(spark, docs, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text)
         for r in out.collect())
    )
    by_doc = {}
    for doc_id, cid, n, text in rows:
        by_doc.setdefault(doc_id, []).append((cid, n, text))
    for i, words in enumerate(docs):
        chunks = by_doc[i]
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        # each chunk is exactly the slice starting at cid*step
        for cid, n, text in chunks:
            piece = words[cid * step : cid * step + chunk]
            assert text.split(" ") == piece and n == len(piece)
        # stripping overlaps reconstructs the document
        rebuilt = chunks[0][2].split(" ")
        for _, _, text in chunks[1:]:
            rebuilt += text.split(" ")[overlap:]
        assert rebuilt == words
