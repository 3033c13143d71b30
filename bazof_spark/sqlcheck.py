"""Independent token-level validator for the MERGE clause extraction.

The reference visits a real sqlparser AST
(crates/azof-datafusion/src/parse.rs:17-118); this repo's rewrite is a
span-aware regex pre-pass (sql.py). The multi-clause MERGE grammar is
the one place where regex extraction carries structural risk (embedded
CASE WHEN/THEN, strings containing keywords, nested commas), so this
module re-parses every multi-clause statement with a SECOND,
independently-written implementation — a tokenizer + single-pass
clause splitter that tracks parenthesis and CASE…END nesting instead
of regex anchors — and ``sql._parse_merge_clauses`` raises loudly when
the two disagree. The fuzz suites (tests/test_sql_rewrite_fuzz.py)
drive both implementations on every generated statement, converting
"the regex happens to match the AST" from a tested observation into a
checked runtime invariant.

No external parser dependency (sqlglot is not available in-sandbox);
the token grammar here is deliberately tiny — exactly the MERGE clause
tail, nothing else.
"""

from __future__ import annotations

_PUNCT2 = ("<=", ">=", "<>", "!=", "||", "=>")


def tokenize(text: str) -> list[tuple[str, str]]:
    """(kind, text) tokens: 'str' single-quoted literals ('' escape,
    verbatim), 'word' identifiers/keywords/numbers (with dotted parts),
    'punct' single/double-char operators. Comments are skipped. An
    unterminated string tokenizes to its remainder (the caller's
    downstream SQL engine will reject it; splitting must not)."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "'":
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            end = min(j + 1, n)
            out.append(("str", text[i:end]))
            i = end
            continue
        if text.startswith("--", i):
            j = text.find("\n", i)
            i = n if j == -1 else j + 1
            continue
        if text.startswith("/*", i):
            j = text.find("*/", i + 2)
            i = n if j == -1 else j + 2
            continue
        if ch.isalnum() or ch in "_$":
            j = i
            while j < n and (text[j].isalnum() or text[j] in "_$."):
                j += 1
            out.append(("word", text[i:j]))
            i = j
            continue
        two = text[i : i + 2]
        if two in _PUNCT2:
            out.append(("punct", two))
            i += 2
            continue
        out.append(("punct", ch))
        i += 1
    return out


def _tok_join(tokens: list[tuple[str, str]]) -> str:
    """Canonical single-space spelling of a token run — the comparison
    key both implementations are normalized through."""
    return " ".join(t for _, t in tokens)


def canon(text: str) -> str:
    """Canonicalize an expression string for comparison (whitespace
    squashed OUTSIDE strings, verbatim inside)."""
    return _tok_join(tokenize(text))


def _is_kw(tok: tuple[str, str], kw: str) -> bool:
    return tok[0] == "word" and tok[1].upper() == kw


def parse_merge_tail(text: str):
    """Token-level parse of ``<src> ON key WHEN …`` (the text after
    ``MERGE INTO t USING``). Returns None when there is no top-level
    ``WHEN [NOT] MATCHED`` clause list; otherwise a dict::

        {"src": canonical source text,
         "clauses": [  # statement order, all WHEN clauses
            {"neg": bool, "by_src": bool,
             "pred": canonical predicate ("" = none),
             "action": "DELETE" | "INSERT *" | "UPDATE SET *"
                       | ("update_set", ((col, canonical expr), …))}
         ]}

    Raises ValueError on structurally-broken clause tails (no THEN, a
    malformed head) — the cross-check treats ValueError vs
    SqlRewriteError as AGREEMENT that the statement is bad.

    Top-level = parenthesis depth 0 AND CASE…END depth 0, computed on
    the token stream — the property the regex pass approximates with
    string spans + end-anchored search.
    """
    toks = tokenize(text)
    while toks and toks[-1] == ("punct", ";"):  # statement terminator
        toks.pop()
    # depth-annotated positions of clause-starting WHENs
    depth = 0
    case_depth = 0
    whens: list[int] = []
    for idx, tok in enumerate(toks):
        kind, t = tok
        if kind == "punct":
            if t == "(":
                depth += 1
            elif t == ")":
                depth = max(0, depth - 1)
            continue
        if kind != "word":
            continue
        u = t.upper()
        if u == "CASE":
            case_depth += 1
        elif u == "END":
            case_depth = max(0, case_depth - 1)
        elif (
            u == "WHEN"
            and depth == 0
            and case_depth == 0
            and idx + 1 < len(toks)
            and (
                _is_kw(toks[idx + 1], "MATCHED")
                or (
                    _is_kw(toks[idx + 1], "NOT")
                    and idx + 2 < len(toks)
                    and _is_kw(toks[idx + 2], "MATCHED")
                )
            )
        ):
            whens.append(idx)
    if not whens:
        return None
    head = toks[: whens[0]]
    # the clause list is only in play when the source ends in ON key
    if len(head) < 2 or not _is_kw(head[-2], "ON") or not (
        head[-1][0] == "word" and head[-1][1].lower() == "key"
    ):
        return None
    src = _tok_join(head[:-2])
    bounds = whens + [len(toks)]
    clauses = []
    for ci in range(len(whens)):
        seg = toks[bounds[ci] : bounds[ci + 1]]
        clauses.append(_parse_clause(seg))
    return {"src": src, "clauses": clauses}


def _parse_clause(seg: list[tuple[str, str]]):
    """One ``WHEN …`` clause from its token run (seg[0] is WHEN)."""
    i = 1
    neg = False
    if i < len(seg) and _is_kw(seg[i], "NOT"):
        neg = True
        i += 1
    if i >= len(seg) or not _is_kw(seg[i], "MATCHED"):
        raise ValueError("clause head is not [NOT] MATCHED")
    i += 1
    by_src = False
    if (
        i + 1 < len(seg)
        and _is_kw(seg[i], "BY")
        and _is_kw(seg[i + 1], "SOURCE")
    ):
        by_src = True
        i += 2
    # locate the top-level THEN separating head from action
    depth = 0
    case_depth = 0
    then_at = None
    for j in range(i, len(seg)):
        kind, t = seg[j]
        if kind == "punct":
            if t == "(":
                depth += 1
            elif t == ")":
                depth = max(0, depth - 1)
            continue
        if kind != "word":
            continue
        u = t.upper()
        if u == "CASE":
            case_depth += 1
        elif u == "END":
            case_depth = max(0, case_depth - 1)
        elif u == "THEN" and depth == 0 and case_depth == 0:
            then_at = j
            break
    if then_at is None:
        raise ValueError("MERGE clause has no top-level THEN")
    pred_toks = seg[i:then_at]
    if pred_toks:
        if not _is_kw(pred_toks[0], "AND"):
            raise ValueError("predicate must start with AND")
        pred_toks = pred_toks[1:]
        if not pred_toks:
            raise ValueError("empty predicate after AND")
    act = seg[then_at + 1 :]
    if not act:
        raise ValueError("empty MERGE action")
    return {
        "neg": neg,
        "by_src": by_src,
        "pred": _tok_join(pred_toks),
        "action": _parse_action(act),
    }


def _parse_action(act: list[tuple[str, str]]):
    if len(act) == 1 and _is_kw(act[0], "DELETE"):
        return "DELETE"
    if (
        len(act) == 2
        and _is_kw(act[0], "INSERT")
        and act[1] == ("punct", "*")
    ):
        return "INSERT *"
    if (
        len(act) >= 2
        and _is_kw(act[0], "UPDATE")
        and _is_kw(act[1], "SET")
    ):
        body = act[2:]
        if len(body) == 1 and body[0] == ("punct", "*"):
            return "UPDATE SET *"
        # assignment list split at top-level commas
        depth = 0
        case_depth = 0
        pieces: list[list[tuple[str, str]]] = [[]]
        for tok in body:
            kind, t = tok
            if kind == "punct":
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth = max(0, depth - 1)
                elif t == "," and depth == 0 and case_depth == 0:
                    pieces.append([])
                    continue
            elif kind == "word":
                u = t.upper()
                if u == "CASE":
                    case_depth += 1
                elif u == "END":
                    case_depth = max(0, case_depth - 1)
            pieces[-1].append(tok)
        sets = []
        for piece in pieces:
            if (
                len(piece) < 3
                or piece[0][0] != "word"
                or piece[1] != ("punct", "=")
            ):
                raise ValueError("assignment is not 'column = expression'")
            sets.append((piece[0][1], _tok_join(piece[2:])))
        return ("update_set", tuple(sets))
    raise ValueError(f"unknown MERGE action: {_tok_join(act)!r}")


def crosscheck_merge_clauses(
    select: str,
    src: str,
    matched: tuple,
    insert_unmatched: bool,
    by_source: tuple,
) -> None:
    """Compare the regex pass's extraction against this module's
    independent parse of the same text; raise ValueError naming the
    first divergence. Called by sql._parse_merge_clauses on every
    successfully-extracted multi-clause MERGE."""
    ast = parse_merge_tail(select)
    if ast is None:
        raise ValueError(
            "validator found no ON key WHEN clause list where the "
            "regex pass extracted one"
        )
    if ast["src"] != canon(src):
        raise ValueError(
            f"source split disagrees: validator {ast['src']!r} vs "
            f"regex {canon(src)!r}"
        )
    # rebuild the regex result in the validator's shape
    expect = []
    for cl in matched:
        if cl[0] == "delete":
            expect.append((False, False, canon(cl[1]), "DELETE"))
        elif cl[0] == "update":
            expect.append((False, False, canon(cl[1]), "UPDATE SET *"))
        else:
            expect.append(
                (
                    False,
                    False,
                    canon(cl[1]),
                    (
                        "update_set",
                        tuple((c, canon(e)) for c, e in cl[2]),
                    ),
                )
            )
    if insert_unmatched:
        expect.append((True, False, "", "INSERT *"))
    for cl in by_source:
        if cl[0] == "delete":
            expect.append((True, True, canon(cl[1]), "DELETE"))
        else:
            expect.append(
                (
                    True,
                    True,
                    canon(cl[1]),
                    (
                        "update_set",
                        tuple((c, canon(e)) for c, e in cl[2]),
                    ),
                )
            )
    got = [
        (c["neg"], c["by_src"], c["pred"], c["action"])
        for c in ast["clauses"]
    ]
    # the regex pass groups clauses by kind; order WITHIN each kind is
    # preserved, so compare as (matched list, insert flag, by_src list)
    got_matched = [c for c in got if not c[0]]
    got_insert = [c for c in got if c[0] and not c[1]]
    got_bysrc = [c for c in got if c[0] and c[1]]
    exp_matched = [c for c in expect if not c[0]]
    exp_insert = [c for c in expect if c[0] and not c[1]]
    exp_bysrc = [c for c in expect if c[0] and c[1]]
    for label, g, e in (
        ("WHEN MATCHED", got_matched, exp_matched),
        ("WHEN NOT MATCHED", got_insert, exp_insert),
        ("WHEN NOT MATCHED BY SOURCE", got_bysrc, exp_bysrc),
    ):
        if g != e:
            raise ValueError(
                f"{label} clauses disagree: validator {g!r} vs regex "
                f"{e!r}"
            )


# ---------------------------------------------------------------------------
# UPDATE t SET … [WHERE …] body (round 9): the second regex surface
# with comma/keyword splitting, validated the same way as MERGE
# ---------------------------------------------------------------------------


def parse_update_body(text: str):
    """Independent token-level parse of an UPDATE body (everything
    after ``SET``) -> ((col, canon_expr), …), canon_pred. Splits the
    first top-level WHERE and top-level commas by walking tokens with
    parenthesis + CASE…END depth, never regex anchors."""
    toks = tokenize(text)
    depth = case_depth = 0
    where_at = None
    for i, (kind, t) in enumerate(toks):
        if kind == "punct":
            if t == "(":
                depth += 1
            elif t == ")":
                depth = max(0, depth - 1)
            continue
        if kind != "word":
            continue
        u = t.upper()
        if u == "CASE":
            case_depth += 1
        elif u == "END":
            case_depth = max(0, case_depth - 1)
        elif u == "WHERE" and depth == 0 and case_depth == 0:
            where_at = i
            break
    pred_toks = [] if where_at is None else toks[where_at + 1 :]
    body_toks = toks if where_at is None else toks[:where_at]
    parts: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    depth = case_depth = 0
    for tok in body_toks:
        kind, t = tok
        if kind == "punct":
            if t == "(":
                depth += 1
            elif t == ")":
                depth = max(0, depth - 1)
            elif t == "," and depth == 0 and case_depth == 0:
                parts.append(cur)
                cur = []
                continue
        elif kind == "word":
            u = t.upper()
            if u == "CASE":
                case_depth += 1
            elif u == "END":
                case_depth = max(0, case_depth - 1)
        cur.append(tok)
    parts.append(cur)
    sets = []
    for p in parts:
        if len(p) < 3 or p[0][0] != "word" or p[1] != ("punct", "="):
            raise ValueError(
                f"assignment is not 'column = expression': {_tok_join(p)!r}"
            )
        sets.append((p[0][1], _tok_join(p[2:])))
    return tuple(sets), _tok_join(pred_toks)


def crosscheck_update_body(body: str, sets: tuple, pred: str) -> None:
    """Compare the regex pass's UPDATE-body extraction against this
    module's independent token parse; raise ValueError naming the
    first divergence. Called by sql._parse_update_body on every
    successfully-extracted UPDATE / merge-update body."""
    got_sets, got_pred = parse_update_body(body)
    exp_sets = tuple((c, canon(e)) for c, e in sets)
    if got_sets != exp_sets:
        raise ValueError(
            f"SET assignments disagree: validator {got_sets!r} vs "
            f"regex {exp_sets!r}"
        )
    if got_pred != canon(pred):
        raise ValueError(
            f"WHERE predicate disagrees: validator {got_pred!r} vs "
            f"regex {canon(pred)!r}"
        )


# ---------------------------------------------------------------------------
# Time-travel rewrite extraction (round 9): the OLDEST regex surface —
# AT / FOR SYSTEM_TIME / FOR VERSION / CHANGES clauses and bare table
# factors — re-derived by a positional token walk and compared as a
# canonical key set.
# ---------------------------------------------------------------------------

import re as _re

_IDENT_RE = _re.compile(
    r"[A-Za-z_][A-Za-z0-9_$]*(?:\.[A-Za-z_][A-Za-z0-9_$]*)*\Z"
)
# deliberately duplicated from sql._KEYWORDS: the keyword skip-list is
# part of the behavior under check — if one side learns a keyword the
# other didn't, the crosscheck trips loudly and both get updated
_FACTOR_KEYWORDS = frozenset(
    {"select", "lateral", "unnest", "values", "table", "generate_series"}
)


def parse_time_travel_tables(sql: str) -> set:
    """Independent token-level extraction of every table reference the
    rewrite must register: returns a set of canonical keys
    ("at", name, epoch_millis) | ("version", name, ver) |
    ("changes", name, m1, m2) | ("current", name)."""
    from bazof_spark.asof import epoch_millis, parse_rfc3339

    toks = tokenize(sql)
    n = len(toks)
    keys: set = set()
    clause_end: dict[int, int] = {}  # factor-name token idx -> idx after clause

    def is_word(i, kw=None):
        return (
            0 <= i < n
            and toks[i][0] == "word"
            and (kw is None or toks[i][1].upper() == kw)
        )

    def is_punct(i, p):
        return 0 <= i < n and toks[i] == ("punct", p)

    def is_str(i):
        return 0 <= i < n and toks[i][0] == "str"

    def str_val(i):
        s = toks[i][1]
        return s[1:-1].replace("''", "'")

    def word_ver(i):
        """The \\w+ version literal at token i (bare or quoted), else
        None — mirroring the regex pass's '?(\\w+)'? capture."""
        if is_word(i) and _re.fullmatch(r"\w+", toks[i][1]):
            return toks[i][1]
        if is_str(i):
            sv = str_val(i)
            if _re.fullmatch(r"\w+", sv):
                return sv
        return None

    # pass 1: versioned forms, positional
    i = 0
    while i < n:
        kind, t = toks[i]
        if (
            kind == "word"
            and t.upper() == "CHANGES"
            and is_punct(i + 1, "(")
            and is_str(i + 2)
            and is_punct(i + 3, ",")
            and is_str(i + 4)
        ):
            name = str_val(i + 2)
            if _IDENT_RE.match(name):
                since = str_val(i + 4)
                j, until = i + 5, None
                if is_punct(j, ",") and is_str(j + 1):
                    until, j = str_val(j + 1), j + 2
                if is_punct(j, ")"):
                    m1 = epoch_millis(parse_rfc3339(since))
                    m2 = (
                        "current"
                        if until is None
                        else str(epoch_millis(parse_rfc3339(until)))
                    )
                    keys.add(("changes", name, m1, m2))
                    clause_end[i] = j + 1
                    i = j + 1
                    continue
        if kind == "word" and _IDENT_RE.match(t):
            if is_word(i + 1, "AT") and is_punct(i + 2, "("):
                j = i + 3
                if is_word(j, "VERSION") and is_punct(j + 1, "=>"):
                    ver = word_ver(j + 2)
                    if ver is not None and is_punct(j + 3, ")"):
                        keys.add(("version", t, ver))
                        clause_end[i] = j + 4
                        i = j + 4
                        continue
                else:
                    if is_word(j, "TIMESTAMP") and is_punct(j + 1, "=>"):
                        j += 2
                    if is_str(j) and is_punct(j + 1, ")"):
                        keys.add(
                            ("at", t, epoch_millis(parse_rfc3339(str_val(j))))
                        )
                        clause_end[i] = j + 2
                        i = j + 2
                        continue
            if is_word(i + 1, "FOR"):
                if (
                    is_word(i + 2, "SYSTEM_TIME")
                    and is_word(i + 3, "AS")
                    and is_word(i + 4, "OF")
                    and is_str(i + 5)
                ):
                    keys.add(
                        ("at", t, epoch_millis(parse_rfc3339(str_val(i + 5))))
                    )
                    clause_end[i] = i + 6
                    i += 6
                    continue
                if (
                    is_word(i + 2, "VERSION")
                    and is_word(i + 3, "AS")
                    and is_word(i + 4, "OF")
                ):
                    ver = word_ver(i + 5)
                    if ver is not None:
                        keys.add(("version", t, ver))
                        clause_end[i] = i + 6
                        i += 6
                        continue
        i += 1

    # pass 2: CTE / named-window definitions shadow table names
    cte: set[str] = set()
    for i in range(n):
        head = None
        if is_word(i, "WITH"):
            head = i + 2 if is_word(i + 1, "RECURSIVE") else i + 1
        elif is_punct(i, ","):
            head = i + 1
        if (
            head is not None
            and is_word(head)
            and _IDENT_RE.match(toks[head][1])
            and is_word(head + 1, "AS")
            and is_punct(head + 2, "(")
        ):
            cte.add(toks[head][1])

    # pass 3: bare factors after FROM/JOIN plus comma continuations
    def register(idx):
        name = toks[idx][1]
        if idx in clause_end:
            return clause_end[idx]
        if name.lower() not in _FACTOR_KEYWORDS and name not in cte:
            keys.add(("current", name))
        return idx + 1

    i = 0
    while i < n:
        if is_word(i) and toks[i][1].upper() in ("FROM", "JOIN"):
            j = i + 1
            if not (is_word(j) and _IDENT_RE.match(toks[j][1])):
                i += 1
                continue
            j = register(j)
            while True:
                # optional alias then comma, mirroring the regex walk:
                # try (AS x ,) then (x ,) then bare (,)
                if (
                    is_word(j, "AS")
                    and is_word(j + 1)
                    and is_punct(j + 2, ",")
                    and is_word(j + 3)
                    and _IDENT_RE.match(toks[j + 3][1])
                ):
                    j = register(j + 3)
                elif (
                    is_word(j)
                    and is_punct(j + 1, ",")
                    and is_word(j + 2)
                    and _IDENT_RE.match(toks[j + 2][1])
                ):
                    j = register(j + 2)
                elif (
                    is_punct(j, ",")
                    and is_word(j + 1)
                    and _IDENT_RE.match(toks[j + 1][1])
                ):
                    j = register(j + 1)
                else:
                    break
            i = j
            continue
        i += 1
    return keys


def crosscheck_time_travel(sql: str, tables) -> None:
    """Compare rewrite_and_extract_tables' result against the token
    walk; raise ValueError naming the divergence. Called on every
    successful rewrite."""
    from bazof_spark.asof import epoch_millis

    expect = set()
    for vt in tables:
        if vt.changes is not None:
            m1, m2 = vt.versioned_name.rsplit("_", 2)[-2:]
            expect.add(("changes", vt.name, int(m1), m2))
        elif vt.version is not None:
            expect.add(("version", vt.name, vt.version))
        elif not vt.as_of.is_current:
            expect.add(("at", vt.name, epoch_millis(vt.as_of.event_time_at)))
        else:
            expect.add(("current", vt.name))
    got = parse_time_travel_tables(sql)
    if got != expect:
        raise ValueError(
            f"table extraction disagrees: validator-only "
            f"{sorted(got - expect)!r}, regex-only {sorted(expect - got)!r}"
        )
