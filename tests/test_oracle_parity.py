"""Mimic the driver's correctness gate locally: run every queries()
entry and its oracle_sql() twin at sf0.001, compare row count + sorted
values. Catches cross-engine drift before the driver does.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("BAZOF_PARITY_SF", "/root/testdata/sf0.001")
# data-derived oracles (embedding_ann_ivf_trained) read this env var at
# workload import to build literals from the SAME sf the queries run at
os.environ["BAZOF_PARITY_SF"] = SF_DIR

import __spark_entry__ as entrymod  # noqa: E402
from bazof_spark import workload as _workload  # noqa: E402

# another test module may have imported the registry BEFORE this module
# set BAZOF_PARITY_SF (pytest imports follow command-line order), which
# would freeze data-derived oracle literals from the wrong sf dir
_workload.refresh_env_dependent_oracles()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pd.to_datetime(pdf[c], utc=True).dt.tz_localize(None)
        elif pdf[c].dtype == object:
            # The DRIVER's canonicalizer pandas-sorts RAW cells: a
            # list/array cell is unhashable there and the whole query
            # turns red (embedding_pca_project, r7). astype(str) here
            # used to mask exactly that class — fail the same way the
            # driver does instead: no query may emit array-typed cells.
            sample = pdf[c].dropna().head(50)
            bad = [
                v for v in sample
                if isinstance(v, (list, tuple, set, dict))
                or type(v).__module__ == "numpy" and getattr(v, "ndim", 0)
            ]
            if bad:
                raise AssertionError(
                    f"column {c!r} carries array-typed cells "
                    f"(e.g. {bad[0]!r:.60}) — the driver's canonicalizer "
                    "cannot hash these; emit scalar columns instead"
                )
            pdf[c] = pdf[c].astype(str)
        else:
            try:
                pdf[c] = pd.to_numeric(pdf[c])
            except (ValueError, TypeError):
                pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(got) >= 0  # rows-only check, like the driver
        return
    exp = ddb.sql(oracle).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: column names differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    g, e = normalize(got), normalize(exp)
    assert len(g) == len(e), f"{name}: row count {len(g)} != {len(e)}"
    # The driver hashes stringified values, where 1677 != 1677.0 — so an
    # int column on one side and float on the other (e.g. DuckDB HUGEINT
    # sums → float64 in pandas) is a real failure, not a tolerable dtype
    # difference. Catch the int-vs-float split explicitly.
    for c in g.columns:
        gk, ek = g[c].dtype.kind, e[c].dtype.kind
        int_float = {"i", "u", "f"}
        if gk in int_float and ek in int_float and ("f" in (gk, ek)) != (
            gk == ek == "f"
        ):
            raise AssertionError(
                f"{name}: column {c} is {g[c].dtype} in Spark but "
                f"{e[c].dtype} in the oracle — the driver's value hash "
                "treats 1 and 1.0 as different; align the types "
                "(CAST(... AS BIGINT/DOUBLE) on both sides)"
            )
    pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["key", "value", "event_type"]
