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
