"""The independent token-level MERGE validator (bazof_spark/sqlcheck.py)
— round 9's checked-invariant upgrade of the regex clause extraction:
every successful _parse_merge_clauses result is re-derived by a second
implementation (paren/CASE-depth tracking, no regex anchors) and any
divergence raises. These tests pin the validator's own grammar and
prove the crosscheck actually trips on wrong extractions."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.sql import SqlRewriteError, parse_dml  # noqa: E402
from bazof_spark.sqlcheck import (  # noqa: E402
    canon,
    crosscheck_merge_clauses,
    parse_merge_tail,
    tokenize,
)


def test_tokenizer_strings_comments_operators():
    toks = tokenize("a >= 'x -- not a comment' -- real\n/*c*/ b.c <> 1.5")
    assert toks == [
        ("word", "a"),
        ("punct", ">="),
        ("str", "'x -- not a comment'"),
        ("word", "b.c"),
        ("punct", "<>"),
        ("word", "1.5"),
    ]
    # '' escape stays inside one string token
    assert tokenize("'a''b'") == [("str", "'a''b'")]
    assert canon("x   =\n1") == "x = 1"


def test_parse_merge_tail_tracks_case_and_paren_depth():
    r = parse_merge_tail(
        "SELECT * FROM s ON key "
        "WHEN MATCHED AND CASE WHEN x THEN true ELSE false END "
        "THEN UPDATE SET v = CASE WHEN a THEN 1 ELSE 2 END, "
        "w = f(a, b) "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert r["src"] == "SELECT * FROM s"
    c0, c1 = r["clauses"]
    assert c0["pred"] == "CASE WHEN x THEN true ELSE false END"
    assert c0["action"] == (
        "update_set",
        (("v", "CASE WHEN a THEN 1 ELSE 2 END"), ("w", "f ( a , b )")),
    )
    assert c1 == {
        "neg": True, "by_src": False, "pred": "", "action": "INSERT *"
    }
    # WHEN MATCHED inside parens (a subquery) is NOT a clause start
    r = parse_merge_tail(
        "SELECT * FROM s ON key WHEN MATCHED AND x IN "
        "(SELECT k FROM log WHERE note = 'WHEN MATCHED') THEN DELETE"
    )
    assert len(r["clauses"]) == 1
    # no ON key before the first WHEN → not a clause list
    assert parse_merge_tail("SELECT * FROM s WHEN MATCHED THEN DELETE") is None


def test_crosscheck_trips_on_wrong_extraction():
    sel = (
        "SELECT * FROM s ON key WHEN MATCHED AND a THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    # correct extraction passes
    crosscheck_merge_clauses(
        sel, "SELECT * FROM s", (("delete", "a"),), True, ()
    )
    # wrong predicate
    with pytest.raises(ValueError, match="WHEN MATCHED clauses disagree"):
        crosscheck_merge_clauses(
            sel, "SELECT * FROM s", (("delete", "b"),), True, ()
        )
    # wrong action kind
    with pytest.raises(ValueError, match="disagree"):
        crosscheck_merge_clauses(
            sel, "SELECT * FROM s", (("update", "a"),), True, ()
        )
    # dropped insert clause
    with pytest.raises(ValueError, match="WHEN NOT MATCHED clauses"):
        crosscheck_merge_clauses(
            sel, "SELECT * FROM s", (("delete", "a"),), False, ()
        )
    # wrong source split
    with pytest.raises(ValueError, match="source split"):
        crosscheck_merge_clauses(
            sel, "SELECT * FROM other", (("delete", "a"),), True, ()
        )


def test_validator_is_live_in_parse_dml():
    """End-to-end: a statement whose clause list parses fine passes the
    crosscheck inside parse_dml; the ambiguous shape the two
    implementations READ DIFFERENTLY (a clause-starting keyword pair
    inside an unparenthesized CASE) errors loudly instead of compiling
    different semantics."""
    d = parse_dml(
        "MERGE INTO t USING SELECT * FROM s ON key "
        "WHEN MATCHED AND v = CASE WHEN x THEN 1 ELSE 2 END THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert d.clauses == (("delete", "v = CASE WHEN x THEN 1 ELSE 2 END"),)
    # a column literally named `matched` inside CASE WHEN: the regex
    # pass would split a clause there; the depth-tracking validator
    # would not — the disagreement must surface, not silently pick one
    with pytest.raises(SqlRewriteError):
        parse_dml(
            "MERGE INTO t USING SELECT * FROM s ON key "
            "WHEN MATCHED AND CASE WHEN matched THEN 1 ELSE 0 END = 1 "
            "THEN DELETE WHEN NOT MATCHED THEN INSERT *"
        )


# ---------------------------------------------------------------------------
# UPDATE-body validator (round 9 follow-through)
# ---------------------------------------------------------------------------

from bazof_spark.sqlcheck import (  # noqa: E402
    crosscheck_update_body,
    parse_update_body,
)


def test_parse_update_body_grammar():
    sets, pred = parse_update_body(
        "a = coalesce(b, ',WHERE'), c = CASE WHEN x IN (1,2) THEN 'w, z' "
        "ELSE f(y, 2) END WHERE note = 'WHERE a = 1, b = 2' AND k > 3"
    )
    assert sets == (
        ("a", "coalesce ( b , ',WHERE' )"),
        ("c", "CASE WHEN x IN ( 1 , 2 ) THEN 'w, z' ELSE f ( y , 2 ) END"),
    )
    assert pred == "note = 'WHERE a = 1, b = 2' AND k > 3"
    # no WHERE
    sets, pred = parse_update_body("v = v + 1")
    assert sets == (("v", "v + 1"),) and pred == ""
    with pytest.raises(ValueError, match="column = expression"):
        parse_update_body("not-an-assignment")


def test_crosscheck_update_trips_on_wrong_extraction():
    body = "a = 1, b = 2 WHERE k = 'x'"
    # correct extraction passes
    crosscheck_update_body(body, (("a", "1"), ("b", "2")), "k = 'x'")
    # a mis-split (string-blind regex would glue b=2 into a's expr)
    with pytest.raises(ValueError, match="disagree"):
        crosscheck_update_body(body, (("a", "1 , b = 2"),), "k = 'x'")
    with pytest.raises(ValueError, match="predicate"):
        crosscheck_update_body(body, (("a", "1"), ("b", "2")), "k = 'y'")


def test_update_validator_is_live_in_parse_dml():
    """parse_dml routes every UPDATE through the crosscheck; a
    statement whose strings contain WHERE/comma/assignment text must
    still extract cleanly (both parsers agree), and the checked
    invariant is observable by monkeypatching one side."""
    st = parse_dml(
        "UPDATE t SET note = 'WHERE v = 1, w = 2', v = CASE WHEN "
        "v IN (1,2) THEN v + 1 ELSE 0 END WHERE tag = ', WHERE '"
    )
    assert st is not None and st.kind == "update"
    assert st.sets == (
        ("note", "'WHERE v = 1, w = 2'"),
        ("v", "CASE WHEN v IN (1,2) THEN v + 1 ELSE 0 END"),
    )
    assert st.select == "tag = ', WHERE '"


def test_update_fuzz_both_parsers_agree():
    """Generative: random assignment lists with string/paren/CASE
    booby traps round-trip identically through the regex pass (which
    self-crosschecks) for 200 seeds."""
    import random

    exprs = [
        "1", "v + 1", "coalesce(a, b, ',')", "'WHERE x = 1, y = 2'",
        "CASE WHEN a IN (1,2) THEN ',' ELSE 'THEN' END",
        "f(g(h(x, 'WHERE')), 2)", "a || ', b = 9'",
        # round-10 authority shapes: scientific literals the tokenizer
        # reads as three tokens (span slicing must return them intact)
        # and block comments inside expressions (slices keep interior
        # trivia; canon comparison ignores it on both sides)
        "v * 1.5e-3", "v + /* bump, WHERE */ 1",
    ]
    preds = [None, "k = 1", "note = ', WHERE ' AND v > 2",
             "CASE WHEN k = 1 THEN true ELSE false END"]
    rng = random.Random(909)
    for _ in range(200):
        cols = [f"c{i}" for i in range(rng.randint(1, 5))]
        sets = [(c, rng.choice(exprs)) for c in cols]
        body = ", ".join(f"{c} = {e}" for c, e in sets)
        pred = rng.choice(preds)
        stmt = f"UPDATE t SET {body}" + (f" WHERE {pred}" if pred else "")
        st = parse_dml(stmt)
        assert st is not None and st.kind == "update"
        assert st.sets == tuple(sets)
        assert st.select == (pred or "")


# ---------------------------------------------------------------------------
# Time-travel extraction validator (round 9 follow-through)
# ---------------------------------------------------------------------------

from bazof_spark.sql import rewrite_and_extract_tables  # noqa: E402
from bazof_spark.sqlcheck import parse_time_travel_tables  # noqa: E402


def test_parse_time_travel_tables_all_forms():
    keys = parse_time_travel_tables(
        "WITH c AS (SELECT 1) "
        "SELECT * FROM t AT ('2024-01-01T00:00:00Z') a "
        "JOIN t FOR SYSTEM_TIME AS OF '2024-02-01T00:00:00Z' b ON a.k = b.k "
        "JOIN u FOR VERSION AS OF 3 ON 1=1 "
        "JOIN v AT(VERSION => '7') ON 1=1 "
        "JOIN c ON 1=1 "
        "JOIN CHANGES('w', '2024-01-01T00:00:00Z', '2024-03-01T00:00:00Z') "
        "ON 1=1 JOIN x, y ON 1=1"
    )
    at1 = 1704067200000
    at2 = 1706745600000
    assert keys == {
        ("at", "t", at1),
        ("at", "t", at2),
        ("version", "u", "3"),
        ("version", "v", "7"),
        ("changes", "w", at1, "1709251200000"),
        ("current", "x"),
        ("current", "y"),
    }
    # strings/comments never produce references
    assert parse_time_travel_tables(
        "SELECT ' FROM fake AT (''2024-01-01T00:00:00Z'') ' AS s "
        "-- FROM ghost\n FROM real"
    ) == {("current", "real")}


def test_time_travel_crosscheck_is_live():
    """rewrite_and_extract_tables self-validates: the full query above
    round-trips, and both sides agree on every form at once."""
    sql = (
        "SELECT * FROM fin AT ('2019-01-17T00:00:00.000Z') f, extra "
        "JOIN fin ON 1=1"
    )
    rewritten, tables = rewrite_and_extract_tables(sql)
    assert "fin__1547683200000" in rewritten
    assert {t.versioned_name for t in tables} == {
        "fin__1547683200000", "fin", "extra"
    }


def test_time_travel_fuzz_both_extractors_agree():
    """Generative: 300 random query skeletons mixing versioned forms,
    CTE shadows, aliases, comma lists, and booby-trapped strings; every
    one must pass the live crosscheck inside rewrite_and_extract_tables."""
    import random

    rng = random.Random(4242)
    TS = ["2024-01-01T00:00:00Z", "2023-06-15T12:30:00Z"]
    factor_forms = [
        lambda t: t,
        lambda t: f"{t} AT ('{rng.choice(TS)}')",
        lambda t: f"{t} AT(TIMESTAMP => '{rng.choice(TS)}')",
        lambda t: f"{t} FOR SYSTEM_TIME AS OF '{rng.choice(TS)}'",
        lambda t: f"{t} FOR VERSION AS OF {rng.randint(1, 9)}",
        lambda t: f"{t} AT(VERSION => {rng.randint(1, 9)})",
        lambda t: f"CHANGES('{t}', '{rng.choice(TS)}')",
        lambda t: f"CHANGES('{t}', '{TS[0]}', '{TS[1]}')",
    ]
    traps = [
        "' FROM ghost AT (''2024-01-01T00:00:00Z'') '",
        "', fake2'",
        "'JOIN j2'",
    ]
    for _ in range(300):
        tables = [f"t{rng.randint(0, 4)}" for _ in range(rng.randint(1, 4))]
        parts = [factor_forms[rng.randrange(len(factor_forms))](t) for t in tables]
        head = "WITH shadow AS (SELECT 1) " if rng.random() < 0.3 else ""
        q = (
            f"{head}SELECT {rng.choice(traps)} AS s FROM "
            + parts[0]
            + ("" if rng.random() < 0.5 else " z")
        )
        for p in parts[1:]:
            q += rng.choice([f" JOIN {p} ON 1=1", f", {p}"])
        if rng.random() < 0.3:
            q += " JOIN shadow ON 1=1"
        rewrite_and_extract_tables(q)  # crosscheck raises on divergence


# ---------------------------------------------------------------------------
# Round-10 authority functions (the span-aware parsers that now DRIVE
# the rewrite; the regex pass checks them)
# ---------------------------------------------------------------------------

from bazof_spark.sqlcheck import (  # noqa: E402
    bare_factor_candidates,
    merge_tail_ast,
    time_travel_ops,
    tokenize_spans,
    update_body_ast,
)


def test_tokenize_spans_offsets_slice_back_to_source():
    src = "a >= 'x -- s' /*c*/ b.c <> 1.5e-3"
    toks = tokenize_spans(src)
    for kind, text, start, end in toks:
        assert src[start:end] == text, (kind, text)
    # scientific notation splits into word/punct/word — the reason the
    # authority hands back SLICES, never token re-joins
    assert [t[1] for t in toks[-3:]] == ["1.5e", "-", "3"]
    assert src[toks[-3][2]:toks[-1][3]] == "1.5e-3"


def test_merge_tail_ast_returns_original_spelling():
    ast = merge_tail_ast(
        "SELECT  *  FROM s ON key "
        "WHEN MATCHED AND v > 1.5e-3 THEN UPDATE SET v = f( a , 1 ), "
        "w = 'a,b' WHEN NOT MATCHED THEN INSERT *"
    )
    assert ast["src"] == "SELECT  *  FROM s"  # interior spacing kept
    c0 = ast["clauses"][0]
    assert c0["pred"] == "v > 1.5e-3"
    assert c0["action"] == (
        "update_set", (("v", "f( a , 1 )"), ("w", "'a,b'"))
    )


def test_update_body_ast_returns_original_spelling():
    sets, pred = update_body_ast(
        "v = v * 1.5e-3, w = coalesce(a,  b) WHERE k = 'x WHERE y'"
    )
    assert sets == (("v", "v * 1.5e-3"), ("w", "coalesce(a,  b)"))
    assert pred == "k = 'x WHERE y'"


def test_time_travel_ops_spans_and_family_order():
    sql = (
        "SELECT * FROM t AT ('2024-01-01T00:00:00Z') "
        "JOIN CHANGES('w', '2024-01-01T00:00:00Z') ON 1=1 "
        "JOIN u FOR VERSION AS OF 3 ON 1=1"
    )
    ops = time_travel_ops(sql)
    # family order mirrors the checker's substitution passes:
    # CHANGES, then versions, then AT
    assert [op["kind"] for op in ops] == ["changes", "version", "at"]
    for op in ops:
        frag = sql[op["start"]:op["end"]]
        assert op["name"] in frag or op["kind"] == "changes"
    at = ops[-1]
    assert sql[at["start"]:at["end"]] == "t AT ('2024-01-01T00:00:00Z')"
    with pytest.raises(ValueError, match="invalid time-travel timestamp"):
        time_travel_ops("SELECT * FROM t AT ('junk')")
    with pytest.raises(ValueError, match="invalid CHANGES timestamp"):
        time_travel_ops("SELECT * FROM CHANGES('t', 'junk')")


def test_bare_factor_candidates_order_and_filters():
    got = bare_factor_candidates(
        "WITH shadow AS (SELECT 1) "
        "SELECT ' FROM ghost ' FROM a x, b JOIN shadow ON 1=1 "
        "JOIN select_free ON 1=1"
    )
    # positional order, CTE 'shadow' filtered, string content ignored
    assert got == ["a", "b", "select_free"]
    # a comma continuation AFTER a JOIN's ON clause is outside both
    # derivations' factor walks — the invariant is that they agree
    # (the regex checker's _COMMA_FACTOR_RE stops there too), so the
    # relation simply stays unregistered rather than mis-scanned
    assert bare_factor_candidates("SELECT 1 FROM a, b, c") == [
        "a", "b", "c"
    ]
