"""Property-based check of schema evolution (round 7): random
sequences of upsert / ADD / DROP / RENAME / WIDEN / checkpoint against
a driver-side Python model of the expected table state.

What it guards: the ``formers`` machinery (renamed columns coalescing
across files that store different spellings — including rename CHAINS
a -> b -> c and mixed pre/post-rename files), the widen rewrite's
value preservation, null-filling of added columns, and the interaction
of all of those with a mid-sequence checkpoint (which migrates Current
to the newest spellings while archived files keep the old ones).

The model is exact: a dict key -> {column -> value}; after every
operation the real Current scan must equal the model's projection onto
the current schema. Any silent coalesce/rename/cast bug — e.g. a
former-name collision aliasing an old file's values into a new column
— shows up as a value mismatch, not just a crash.
"""

import uuid
from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bazof_spark.lakehouse import Lakehouse
from bazof_spark.maintenance import checkpoint_table, evolve_table_schema
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
from bazof_spark.writer import TableWriter, append_delta

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

# operations: ("upsert", [(key, value-int)...]) | ("rename",) |
# ("add",) | ("drop",) | ("widen",) | ("checkpoint",)
_op = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.lists(
            st.tuples(
                st.sampled_from(["k1", "k2", "k3"]),
                st.integers(min_value=0, max_value=99),
            ),
            min_size=1,
            max_size=3,
            unique_by=lambda kv: kv[0],
        ),
    ),
    st.tuples(st.just("rename")),
    st.tuples(st.just("add")),
    st.tuples(st.just("drop")),
    st.tuples(st.just("widen")),
    st.tuples(st.just("checkpoint")),
)

ops_seq = st.lists(_op, min_size=1, max_size=6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_seq)
def test_evolution_sequences_match_model(spark, tmp_path, ops):
    root = tmp_path / uuid.uuid4().hex[:10]
    root.mkdir()
    schema = TableSchema((ColumnDef("v0", ColumnType.INT, True),))
    w = TableWriter(spark, str(root / "t"), schema)
    w.add_segment(
        "s1",
        T0,
        base_df=spark.createDataFrame(
            [("k1", T0, 1)], schema.to_struct_type()
        ),
    )
    w.commit()
    lh = Lakehouse(spark, str(root))

    # model: current column list (name, type-str) and per-key values
    cols = [("v0", "int")]
    state = {"k1": {"v0": 1}}
    n_renames = 0
    n_adds = 0
    step = 0

    def project(row_vals):
        return tuple(row_vals.get(c, None) for c, _ in cols)

    for op in ops:
        step += 1
        at = T0 + timedelta(days=step)
        kind = op[0]
        if kind == "upsert":
            rows = [
                (
                    k,
                    at,
                    *[
                        float(val + i) if ty == "float" else val + i
                        for i, (c, ty) in enumerate(cols)
                    ],
                )
                for k, val in op[1]
            ]
            struct = TableSchema(
                tuple(
                    ColumnDef(
                        c,
                        ColumnType.FLOAT if ty == "float" else ColumnType.INT,
                        True,
                    )
                    for c, ty in cols
                )
            ).to_struct_type()
            append_delta(
                spark,
                str(root / "t"),
                spark.createDataFrame(rows, struct),
                create_segment=True,
            )
            for k, val in op[1]:
                state[k] = {
                    c: (float(val + i) if ty == "float" else val + i)
                    for i, (c, ty) in enumerate(cols)
                }
        elif kind == "rename":
            old = cols[0][0]
            new = f"r{n_renames}_{old}"[:16]
            n_renames += 1
            evolve_table_schema(lh, "t", rename={old: new})
            cols[0] = (new, cols[0][1])
            for kv in state.values():
                if old in kv:
                    kv[new] = kv.pop(old)
        elif kind == "add":
            name = f"a{n_adds}"
            n_adds += 1
            evolve_table_schema(
                lh, "t", add=[ColumnDef(name, ColumnType.INT, True)]
            )
            cols.append((name, "int"))
            # existing rows null-fill; model leaves the key absent
        elif kind == "drop":
            if len(cols) < 2:
                continue  # keep at least one column
            name = cols[-1][0]
            evolve_table_schema(lh, "t", drop=[name])
            cols.pop()
            for kv in state.values():
                kv.pop(name, None)
        elif kind == "widen":
            # widen the first Int column, if any
            target = next((c for c, ty in cols if ty == "int"), None)
            if target is None:
                continue
            evolve_table_schema(lh, "t", widen={target: ColumnType.FLOAT})
            cols[:] = [
                (c, "float" if c == target else ty) for c, ty in cols
            ]
            for kv in state.values():
                if kv.get(target) is not None:
                    kv[target] = float(kv[target])
        else:  # checkpoint
            checkpoint_table(lh, "t", at)

        got = {
            r["key"]: tuple(r[c] for c, _ in cols)
            for r in lh.scan("t").collect()
        }
        want = {k: project(v) for k, v in state.items()}
        assert got == want, (step, op, cols, got, want)
