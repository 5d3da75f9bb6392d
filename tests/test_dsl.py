"""Query-DSL coverage: python-eval and SQL-compiled modes must agree.

Mirrors the scenario space of ``/root/reference/tests/test_dsl.py``:
every expression is evaluated through BOTH backends — DictionaryStore
(python eval over ``PY_GLOBALS``) and SQLiteStore (compilation through
``SQL_GLOBALS`` into a WHERE clause run by sqlite with the registered
functions) — and the matching key sets must be identical.
"""

from __future__ import annotations

import pytest

from tiatoolbox_tpu.annotation.geometry import Point
from tiatoolbox_tpu.annotation.storage import (
    Annotation,
    DictionaryStore,
    SQLiteStore,
)

SAMPLES = [
    {"i": 0, "name": "alpha", "prob": 0.1, "tags": [1, 2, 3], "deep": {"x": 1}},
    {"i": 1, "name": "beta", "prob": 0.6, "tags": [4, 5], "deep": {"x": 2}},
    {"i": 2, "name": "Gamma", "prob": 0.9, "tags": [], "extra": None,
     "with.period": 7, "deep": {"x": 3}},
    {"i": 3, "name": "delta4", "prob": 0.25, "tags": [9], "deep": {"y": 0}},
]


def build_stores():
    stores = []
    for cls in (DictionaryStore, SQLiteStore):
        store = cls()
        for n, props in enumerate(SAMPLES):
            store[f"k{n}"] = Annotation(Point(n, n).buffer(1), dict(props))
        stores.append(store)
    return stores


def agree(where) -> set:
    """Run the predicate through both backends; assert identical keys."""
    dict_store, sql_store = build_stores()
    d = set(dict_store.iquery((-10, -10, 10, 10), where=where))
    s = set(sql_store.iquery((-10, -10, 10, 10), where=where))
    assert d == s, f"backend disagreement for {where!r}: {d} vs {s}"
    return d


EXPRESSIONS = [
    # binary number operations
    ('props["i"] + 1 == 2', {"k1"}),
    ('props["i"] - 1 == 0', {"k1"}),
    ('props["i"] * 2 == 4', {"k2"}),
    ('props["i"] / 2 == 1', {"k2"}),
    ('props["i"] // 2 == 1', {"k2", "k3"}),
    ('props["i"] % 2 == 0', {"k0", "k2"}),
    # negative operands: sqlite truncates `/` and `%` toward zero while
    # python floors — the SQL compiler must emit python semantics
    ('(props["i"] - 7) // 2 == -4', {"k0"}),
    ('(props["i"] - 7) % 2 == 1', {"k0", "k2"}),
    ('(7 - props["i"]) % -2 == -1', {"k0", "k2"}),
    ('props["i"] ** 2 == 9', {"k3"}),
    ('props["prob"] > 0.5', {"k1", "k2"}),
    ('props["prob"] >= 0.6', {"k1", "k2"}),
    ('props["prob"] < 0.2', {"k0"}),
    ('props["prob"] <= 0.25', {"k0", "k3"}),
    ('props["prob"] != 0.6', {"k0", "k2", "k3"}),
    # reversed operand order
    ('1 + props["i"] == 2', {"k1"}),
    ('4 - props["i"] == 1', {"k3"}),
    ('2 * props["i"] == 6', {"k3"}),
    # prefix operations
    ('-props["i"] == -3', {"k3"}),
    ('+props["i"] == 2', {"k2"}),
    ('abs(props["i"] - 2) == 1', {"k1", "k3"}),
    # logic (DSL convention: & / | with parenthesized comparisons —
    # python `and`/`or`/`not` cannot be overloaded for SQL compilation)
    ('(props["i"] > 0) & (props["prob"] < 0.5)', {"k3"}),
    ('(props["i"] == 0) | (props["i"] == 3)', {"k0", "k3"}),
    ('((props["i"] > 0) & (props["i"] < 3)) | (props["prob"] == 0.1)',
     {"k0", "k1", "k2"}),
    # string equality
    ('props["name"] == "beta"', {"k1"}),
    ('(props["name"] == "alpha") | (props["name"] == "delta4")', {"k0", "k3"}),
    # regex (reference form: regexp(pattern, value))
    ('is_not_none(regexp("a$", props["name"]))', {"k0", "k1", "k2"}),
    ('is_not_none(regexp("^[a-z]+[0-9]$", props["name"]))', {"k3"}),
    ('is_not_none(regexp("gamma", props["name"]))', set()),
    # has_key / none-ness (has_key counts keys holding null)
    ('has_key(props, "extra")', {"k2"}),
    ('has_key(props, "tags")', {"k0", "k1", "k2", "k3"}),
    ('is_none(props.get("extra"))', {"k0", "k1", "k2", "k3"}),
    ('is_not_none(props.get("i"))', {"k0", "k1", "k2", "k3"}),
    # props.get default
    ('props.get("missing", 5) == 5', {"k0", "k1", "k2", "k3"}),
    ('props.get("i", -1) == 1', {"k1"}),
    # nested json access
    ('props["deep"]["x"] == 2', {"k1"}),
    ('has_key(props["deep"], "y")', {"k3"}),
    # list aggregation + containment (membership via contains())
    ('sum(props["tags"]) == 9', {"k1", "k3"}),
    ('contains(props["tags"], 2)', {"k0"}),
    # keys containing a period
    ('props["with.period"] == 7', {"k2"}),
]


@pytest.mark.parametrize(("expr", "expected"), EXPRESSIONS)
def test_expression_agreement(expr: str, expected: set) -> None:
    assert agree(expr) == expected


def test_callable_where_matches_dsl() -> None:
    dict_store, sql_store = build_stores()
    fn = lambda p: p["prob"] > 0.5  # noqa: E731
    for store in (dict_store, sql_store):
        assert set(store.iquery((-10, -10, 10, 10), where=fn)) == {"k1", "k2"}


def test_invalid_where_type_raises() -> None:
    for store in build_stores():
        with pytest.raises(TypeError):
            store.query((-10, -10, 10, 10), where=123)


def test_regexp_ignore_case_python_mode() -> None:
    """Flagged regex (python re flags) — python-eval backend."""
    dict_store, _ = build_stores()
    import re

    got = set(
        dict_store.iquery(
            (-10, -10, 10, 10),
            where=lambda p: bool(re.search("gamma", p["name"], re.IGNORECASE)),
        )
    )
    assert got == {"k2"}


def test_sql_compilation_produces_sql_string() -> None:
    from tiatoolbox_tpu.annotation import dsl

    compiled = eval(  # noqa: S307
        'props["i"] > 1 and props["name"] == "x"',
        dsl.SQL_GLOBALS,
        {"props": dsl.SQLJSONDictionary()},
    )
    text = str(compiled)
    assert "json_extract" in text or "properties" in text
