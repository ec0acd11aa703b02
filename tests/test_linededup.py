"""Duplicate-line (boilerplate) removal — RefinedWeb/MassiveText rule."""

from __future__ import annotations

import pytest

from bloomfilter_spark.operators.linededup import (
    line_dedup_stats,
    remove_duplicate_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_boilerplate_removed_everywhere(spark):
    # the banner differs by indentation/case across pages -> must still match
    rows = [
        (1, "Accept our cookies\nreal content one\nfooter menu"),
        (2, "  accept   our cookies\nreal content two\nfooter menu"),
        (3, "ACCEPT OUR COOKIES\nunique line three"),
    ]
    out = {
        r["id"]: r
        for r in remove_duplicate_lines(
            _docs(spark, rows), "doc_id", "text", min_docs=2
        ).collect()
    }
    assert out[1]["text_clean"] == "real content one"
    assert out[2]["text_clean"] == "real content two"
    assert out[3]["text_clean"] == "unique line three"
    assert out[1]["n_removed"] == 2 and out[3]["n_removed"] == 1
    # survivors keep ORIGINAL bytes: normalization is for matching only
    assert "real content two" in out[2]["text_clean"]


def test_within_doc_repetition_is_not_boilerplate(spark):
    # df counts DISTINCT documents: a line repeated 3x inside one doc stays
    rows = [
        (1, "chorus line\nchorus line\nchorus line\nverse"),
        (2, "something else entirely"),
    ]
    out = remove_duplicate_lines(
        _docs(spark, rows), "doc_id", "text", min_docs=2
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["n_removed"] == 0
    assert by_id[1]["text_clean"] == rows[0][1]


def test_blank_lines_never_match(spark):
    rows = [
        (1, "a\n\nb"),
        (2, "c\n\nd"),
        (3, "e\n   \nf"),
    ]
    out = remove_duplicate_lines(
        _docs(spark, rows), "doc_id", "text", min_docs=2
    ).collect()
    assert all(r["n_removed"] == 0 for r in out)
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["text_clean"] == "a\n\nb"
    assert by_id[3]["text_clean"] == "e\n   \nf"


def test_order_preserved_and_all_copies_dropped(spark):
    rows = [
        (1, "keep1\nboiler\nkeep2\nboiler\nkeep3"),
        (2, "boiler\nother"),
    ]
    out = {
        r["id"]: r
        for r in remove_duplicate_lines(
            _docs(spark, rows), "doc_id", "text", min_docs=2
        ).collect()
    }
    assert out[1]["text_clean"] == "keep1\nkeep2\nkeep3"
    assert out[1]["n_removed"] == 2
    assert out[2]["text_clean"] == "other"


def test_null_and_empty_text(spark):
    rows = [(1, None), (2, ""), (3, "x\ny"), (4, "x\nz")]
    stats = {
        r["id"]: r
        for r in line_dedup_stats(
            _docs(spark, rows), "doc_id", "text", min_docs=2
        ).collect()
    }
    assert stats[1]["n_lines"] == 0 and stats[1]["dup_line_ratio"] == 0.0
    assert stats[2]["n_lines"] == 0
    assert stats[3]["n_dup_lines"] == 1  # shared "x"
    clean = {
        r["id"]: r["text_clean"]
        for r in remove_duplicate_lines(
            _docs(spark, rows), "doc_id", "text", min_docs=2
        ).collect()
    }
    assert clean[1] == "" and clean[2] == ""
    assert clean[3] == "y" and clean[4] == "z"


def test_stats_and_removal_agree(spark, documents):
    # on the real fixture (reflowed to lines) the two passes must agree
    from pyspark.sql import functions as F

    docs = documents.select(
        "doc_id",
        F.regexp_replace(F.coalesce("text", F.lit("")), r"((\S+\s+){4}\S+)\s+", "$1\n").alias(
            "text"
        ),
    )
    s = line_dedup_stats(docs, "doc_id", "text").selectExpr(
        "id", "n_dup_lines"
    )
    r = remove_duplicate_lines(docs, "doc_id", "text").selectExpr(
        "id", "n_removed"
    )
    bad = (
        s.join(r, "id")
        .filter(F.col("n_dup_lines") != F.col("n_removed"))
        .count()
    )
    assert bad == 0


def test_fully_boilerplate_doc_becomes_empty(spark):
    rows = [(1, "same\nsame2"), (2, "same\nsame2"), (3, "same")]
    out = {
        r["id"]: r
        for r in remove_duplicate_lines(
            _docs(spark, rows), "doc_id", "text", min_docs=2
        ).collect()
    }
    assert out[1]["text_clean"] == "" and out[1]["n_removed"] == 2
    assert out[3]["text_clean"] == ""


def test_null_id_rows_pass_through_unchanged(spark):
    # no identity -> no dedup accounting: the row keeps its boilerplate
    # lines AND its lines don't vote in the document-frequency count
    rows = [
        (None, "banner here\nnull doc content"),
        (1, "banner here\nreal one"),
        (2, "banner here\nreal two"),
        (None, "only in null docs\nmore"),
        (3, "only in null docs\nreal three"),  # df(non-null)=1 -> kept
    ]
    out = remove_duplicate_lines(
        _docs(spark, rows), "doc_id", "text", min_docs=2
    ).collect()
    by_key = {(r["id"], r["text_clean"]) for r in out}
    assert (None, "banner here\nnull doc content") in by_key
    assert (None, "only in null docs\nmore") in by_key
    assert (1, "real one") in by_key and (2, "real two") in by_key
    assert (3, "only in null docs\nreal three") in by_key


def test_min_docs_validation(spark):
    with pytest.raises(ValueError, match="min_docs"):
        line_dedup_stats(None, "id", "t", min_docs=1)
