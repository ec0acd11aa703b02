"""Pin the bench stdout-headline contract.

The driver captures only a 2,000-char TAIL of bench.py's stdout; a JSON
line longer than that truncates mid-object and records `parsed: null`
(this hid the headline number for rounds 1-4).  bench.build_headline must
therefore stay under 1,500 chars for any realistic record — including the
committed BENCH.json / BENCH_LAST.json on disk — and degrade rather than
overflow on adversarial inputs.
"""

from __future__ import annotations

import json
import os

import pytest

from bench import build_headline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _record(n_queries: int = 96, metric: str = "catalog wall time") -> dict:
    return {
        "metric": metric,
        "value": 69.009,
        "unit": "sec",
        "sf": 0.1,
        "queries": {
            f"query_with_a_reasonably_long_name_{i:03d}": round(
                0.25 + 0.037 * i, 3
            )
            for i in range(n_queries)
        },
        "canary_sec": 0.382,
        "warmup_sec": 140.9,
        "reruns": 2,
        "reruns_final": 0,
        "load_1m_start": 1.09,
        "load_max": 14.47,
        "load_1m_end": 6.95,
        "value_extended": 65.865,
        "pages_docs_per_sec": 236602.5,
        "pages2m_docs_per_sec": 446971.5,
        "pages_bloom_fpp_est": 0.01012,
    }


def test_headline_is_valid_json_under_limit():
    line = build_headline(_record())
    assert len(line) <= 1500
    head = json.loads(line)
    assert head["value"] == 69.009
    assert head["n_queries"] == 96
    assert len(head["queries"]) == 8
    assert head["queries_omitted"] == 88
    # the 8 kept entries are the slowest ones
    assert min(head["queries"].values()) >= 0.25 + 0.037 * 88 - 1e-9


def test_headline_single_line_no_newlines():
    line = build_headline(_record())
    assert "\n" not in line


def test_headline_drops_query_map_rather_than_overflow():
    # 8 slowest of 500 long-named queries still fit; force overflow with
    # a pathologically long metric string instead
    rec = _record(metric="x" * 1400)
    line = build_headline(rec)
    assert len(line) <= 1500
    head = json.loads(line)
    assert "queries" not in head or len(json.dumps(head)) <= 1500


def test_headline_extreme_metric_still_parses():
    rec = _record(metric="m" * 5000)
    line = build_headline(rec)
    assert len(line) <= 1500
    head = json.loads(line)
    assert head["value"] == 69.009


def test_headline_missing_extras_tolerated():
    rec = {"metric": "m", "value": 1.0, "sf": 0.1, "queries": {}}
    head = json.loads(build_headline(rec))
    assert head["n_queries"] == 0
    assert head["reruns"] == 0


@pytest.mark.parametrize("fname", ["BENCH.json", "BENCH_LAST.json"])
def test_committed_records_produce_short_headline(fname):
    path = os.path.join(REPO, fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} absent")
    with open(path) as f:
        out = json.load(f)
    line = build_headline(out)
    assert len(line) <= 1500
    head = json.loads(line)
    assert head["value"] == out["value"]
