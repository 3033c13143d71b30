"""Round-11 workload extensions.

``multimodal_table_asof`` — the ``Binary`` column extension exercised
end-to-end: image blobs live INSIDE a versioned azof table
(``sources/media.py``) and are decoded at two as-of instants, proving
media payloads get the same time-travel semantics as scalar columns.
The v1 instant must decode only first-generation imagery; Current must
see the re-encoded third (the v2 upsert shadows v1 in the same
one-shuffle as-of merge) and first-generation blobs elsewhere. The
DuckDB oracle recomputes every stat from the deterministic pixel
formulas — a wrong merge result, a corrupted blob byte, or a BMP
layout mistake all change the position-weighted checksum.

Same contract as workload.py: identical column aliases in both
engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def multimodal_table_asof_q(spark, sf_dir):
    """Op: Binary column + as-of time travel + upsert shadowing.

    Two legs, one per instant: scan ``media_versioned`` as-of BETWEEN
    (only v1 visible) and Current (v2 shadows v1 for doc_id % 3 == 0),
    decode the BMP blobs executor-side (Arrow-batched mapInPandas,
    zero exchanges per leg beyond the as-of merge itself), reduce to
    position-weighted pixel stats. ``rev`` rides along so the oracle
    also pins WHICH version won the merge at each instant."""
    import numpy as np
    import pandas as pd

    from bazof_spark.operators.multimodal import decode_bmp
    from bazof_spark.sources.media import BETWEEN, media_lakehouse

    lh = media_lakehouse(spark, sf_dir)

    schema = StructType(
        [
            StructField("instant", StringType(), False),
            StructField("media_id", LongType(), False),
            StructField("rev", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("checksum", LongType(), False),
            StructField("pos_checksum", LongType(), False),
        ]
    )

    def stats_for(tag):
        def batches(it):
            for pdf in it:
                out = []
                for mid, rev, blob in zip(
                    pdf["media_id"], pdf["rev"], pdf["content"]
                ):
                    px = decode_bmp(bytes(blob)).astype(np.int64)
                    h, w, _ = px.shape
                    y = np.arange(h).reshape(h, 1, 1)
                    x = np.arange(w).reshape(1, w, 1)
                    c = np.arange(3).reshape(1, 1, 3)
                    weights = y * 1_000_000 + x * 1_000 + c + 1
                    out.append(
                        (
                            tag,
                            int(mid),
                            int(rev),
                            w,
                            h,
                            int(px.sum()),
                            int((px * weights).sum()),
                        )
                    )
                yield pd.DataFrame(out, columns=[f.name for f in schema])

        return batches

    legs = []
    for tag, as_of in (("v1", BETWEEN), ("current", None)):
        df = lh.scan("media_versioned", as_of=as_of).select(
            F.col("key").cast("long").alias("media_id"), "rev", "content"
        )
        legs.append(df.mapInPandas(stats_for(tag), schema))
    return legs[0].unionAll(legs[1])


def _bmp_stat_sql(instant, formula, w, h, rev, where=""):
    """One oracle leg: recompute the pixel-formula stats directly."""
    return f"""
        SELECT '{instant}' AS instant,
               CAST(doc_id AS BIGINT) AS media_id,
               CAST({rev} AS BIGINT) AS rev,
               CAST({w} AS INT) AS width,
               CAST({h} AS INT) AS height,
               CAST(list_sum(list_transform(range(0, {h}), y ->
                   list_sum(list_transform(range(0, {w}), x ->
                       list_sum(list_transform(range(0, 3), c ->
                           ({formula}) % 256))))))
                   AS BIGINT) AS checksum,
               CAST(list_sum(list_transform(range(0, {h}), y ->
                   list_sum(list_transform(range(0, {w}), x ->
                       list_sum(list_transform(range(0, 3), c ->
                           (({formula}) % 256)
                           * (y*1000000 + x*1000 + c + 1)))))))
                   AS BIGINT) AS pos_checksum
        FROM documents {where}
    """


_F1 = "2*doc_id + 5*y + 11*x + c"
_W1, _H1 = "3 + doc_id % 6", "2 + doc_id % 5"
_F2 = "doc_id + 13*y + 3*x + 2*c"
_W2, _H2 = "4 + doc_id % 4", "3 + doc_id % 3"

QUERIES_R11 = {
    "multimodal_table_asof": multimodal_table_asof_q,
}

ORACLES_R11 = {
    # as-of BETWEEN sees every doc at rev 1 (formula f1); Current sees
    # rev 2 (f2) exactly where the upsert re-encoded (doc_id % 3 == 0)
    # and rev 1 elsewhere — the azof precedence rules re-derived from
    # the build recipe in sources/media.py
    "multimodal_table_asof": (
        _bmp_stat_sql("v1", _F1, _W1, _H1, 1)
        + " UNION ALL "
        + _bmp_stat_sql(
            "current", _F1, _W1, _H1, 1, "WHERE doc_id % 3 <> 0"
        )
        + " UNION ALL "
        + _bmp_stat_sql(
            "current", _F2, _W2, _H2, 2, "WHERE doc_id % 3 = 0"
        )
    ),
}
