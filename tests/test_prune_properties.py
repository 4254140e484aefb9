"""Property tests for the r15 pruning machinery's pure functions:
hive escape/unescape roundtrip (against arbitrary strings) and
conjunct-parser robustness (never raises, bounds always implied)."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from empdia_iceberg_spark.tables.manager import (
    HIVE_DEFAULT_PARTITION,
    hive_escape_value,
    hive_unescape_value,
)
from empdia_iceberg_spark.tables.sqlprune import (
    bounds_from_condition,
    conjuncts,
)

_FAST = settings(max_examples=200, deadline=None)


@_FAST
@given(st.text(min_size=1, max_size=40))
def test_hive_escape_roundtrip(s):
    """unescape(escape(s)) == s for every non-empty string (empty and
    None map to the hive default sentinel by design)."""
    esc = hive_escape_value(s)
    assert esc is not None
    if esc == HIVE_DEFAULT_PARTITION:
        assert s == ""
    else:
        assert hive_unescape_value(esc) == s
        # escaped output never contains a path separator or '='
        assert "/" not in esc and "=" not in esc and "\\" not in esc


@_FAST
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_hive_escape_ints_identity(n):
    assert hive_escape_value(n) == str(n)
    assert hive_unescape_value(str(n)) == str(n)


@_FAST
@given(st.text(max_size=80))
def test_parser_never_raises_on_garbage(s):
    """Arbitrary condition text: the parser may extract nothing, but it
    must never raise and never return a malformed bounds dict."""
    b = bounds_from_condition(s, allow_float=True)
    assert isinstance(b, dict)
    for col, (lo, hi) in b.items():
        assert isinstance(col, str) and col
        assert lo is not None or hi is not None
    cs = conjuncts(s)
    assert isinstance(cs, list) and cs


@_FAST
@given(
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=-1000, max_value=1000),
    st.sampled_from([">", ">=", "<", "<=", "="]),
)
def test_int_bounds_are_implied(v, probe, op):
    """For every integer conjunct `k <op> v` and every probe value: if
    the probe SATISFIES the conjunct, it must fall inside the
    extracted bounds (bounds admit a superset — the soundness
    contract)."""
    b = bounds_from_condition(f"(k {op} {v})")
    assert "k" in b
    lo, hi = b["k"]
    sat = {
        ">": probe > v,
        ">=": probe >= v,
        "<": probe < v,
        "<=": probe <= v,
        "=": probe == v,
    }[op]
    if sat:
        assert (lo is None or probe >= lo) and (hi is None or probe <= hi)


@_FAST
@given(st.lists(st.integers(min_value=-99, max_value=99), min_size=1, max_size=6))
def test_in_list_bounds_are_implied(vals):
    b = bounds_from_condition(f"(k IN ({', '.join(map(str, vals))}))")
    lo, hi = b["k"]
    assert lo == min(vals) and hi == max(vals)


@_FAST
@given(
    st.datetimes(
        min_value=datetime.datetime(2000, 1, 1),
        max_value=datetime.datetime(2030, 1, 1),
    ),
    st.sampled_from([">", ">=", "<", "<="]),
)
def test_ts_strictness_tightening_exact(ts, op):
    """Strict timestamp bounds tighten by exactly 1 microsecond — the
    precision of Spark timestamps, so no value is ever excluded."""
    lit = ts.isoformat(sep=" ", timespec="microseconds")
    b = bounds_from_condition(f"(ts {op} TIMESTAMP '{lit}')")
    lo, hi = b["ts"]
    us = datetime.timedelta(microseconds=1)
    if op == ">":
        assert lo == ts + us
    elif op == ">=":
        assert lo == ts
    elif op == "<":
        assert hi == ts - us
    else:
        assert hi == ts
