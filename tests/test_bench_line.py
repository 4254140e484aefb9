"""Guard the bench one-line contract (VERDICT r11 what's-wrong #1):
the driver captures a 2,000-char stdout TAIL and parses the final JSON
line — BENCH_r11.parsed was null because the line grew to ~3k chars and
the window started mid-line. The contract line must stay under
bench.LINE_BUDGET for the CURRENT headline list at worst-case field
widths, and the shedding ladder must keep per-query data."""

from __future__ import annotations

import json

import bench


def _worst_case_out() -> dict:
    # every value at its widest plausible serialization (xx.xxx)
    return {
        "metric": "headline-queries total wall time",
        "value": 99999.999,
        "unit": "sec",
        "queries": {q: 99.999 for q in bench.HEADLINE},
        "overhead_sec": 99.999,
        "anchor": {
            "runs_sec": [99.999, 99.999, 99.999],
            "ref_sec": 0.116,
            "ratio_vs_ref": 99.999,
        },
        "anchor_mid": {
            "runs_sec": [99.999, 99.999, 99.999],
            "ref_sec": 1.17,
            "ratio_vs_ref": 99.999,
        },
        "stream_overhead_sec": 99.999,
        "recall_at_5": {
            "scope": "full-corpus",
            "knn_cosine_lsh": 0.9999,
            "knn_cosine_ivf": 0.9999,
        },
        "skipped": [],
        "sf": 0.1,
    }


def test_contract_line_fits_driver_capture_window_at_worst_case():
    line = bench.final_line(_worst_case_out())
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["queries"], "per-query data is the contract — never shed"
    assert line.startswith('{"metric"'), (
        "adjudication's prior-line scan anchors on this prefix"
    )


def test_shedding_keeps_per_query_data_under_pressure():
    out = _worst_case_out()
    # moderate future growth (~50 typically-named queries) must fit by
    # shedding optional fields, never the per-query dict
    out["queries"] = {f"events_typical_name_{i:03d}": 99.999 for i in range(50)}
    line = bench.final_line(out)
    assert len(line) <= bench.LINE_BUDGET
    assert len(json.loads(line)["queries"]) == 50


def test_guard_trips_instead_of_emitting_an_unparseable_line():
    import pytest

    out = _worst_case_out()
    out["queries"] = {f"some_quite_long_query_name_{i:03d}": 99.999 for i in range(90)}
    with pytest.raises(AssertionError):
        bench.final_line(out)


def test_mid_anchor_ratio_survives_shedding():
    """r14: queries_adjusted divides by the MID anchor's ratio, so the
    contract line must carry at least anchor_mid.ratio_vs_ref even when
    the budget forces the runs/ref detail out."""
    out = _worst_case_out()
    out["queries"] = {f"events_typical_name_{i:03d}": 99.999 for i in range(50)}
    parsed = json.loads(bench.final_line(out))
    assert parsed["anchor_mid"]["ratio_vs_ref"] == 99.999
