"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs_and_has_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    r = rows[0].asDict()
    assert r["false_negatives"] == 0
    assert r["fp_rate_ok"] is True


def test_catalog_is_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 9
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"
