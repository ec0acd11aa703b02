"""Differential oracle tests on an ADVERSARIAL documents table — shapes
the driver fixture never contains (NULL doc_id/text, empty text, sources
outside the mix weights, zero-size sources).  Runs each new catalog query
on Spark and its DuckDB oracle on the same table and compares canonized
frames, exactly like the driver's gate."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from scripts.check_oracle import canon


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    rows = [
        (0, "hello world common tokens here", "en", "src0", 31),
        (1, "   ", "en", "src1", 3),
        (None, None, "en", "src2", None),  # null id AND null text
        (3, "a b c d e f g", "de", "mystery", 13),  # source not in weights
        (4, "x y", "de", "mystery0", None),  # unlisted AND zero total chars
        (5, "", "fr", "src3", 0),
        (6, "hello world common tokens here", "fr", "src0", 31),  # dup text
    ] + [
        (10 + i, f"filler doc {i} with some shared words", "en", f"src{i % 20}", 36)
        for i in range(40)
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "Int64", "n_chars": "Int64"})
    d = tmp_path_factory.mktemp("edgefix")
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d), pdf


def _compare(spark, edge_dir, qname):
    from bloomfilter_spark import queries_dataops as q

    sf_dir, pdf = edge_dir
    got = canon(q.QUERIES2[qname](spark, sf_dir).toPandas())
    con = duckdb.connect()
    con.register("documents", pdf)
    want = canon(con.execute(q.ORACLES2[qname]).df())
    con.close()
    assert list(got.columns) == list(want.columns), qname
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)


@pytest.mark.parametrize(
    "qname",
    ["pack_shards", "mix_corpus", "classifier_score", "ngram_counts",
     "sample_k_per_lang", "dedup_incremental", "dedup_clusters_best",
     "filter_top_quality",
     # pre-existing documents-only queries, pinned against null regressions
     "text_token_stats", "text_quality", "text_repetition", "lang_id_counts",
     "tfidf_vectors", "url_normalize", "sample_stratified",
     "dedup_ngram_jaccard", "dedup_simhash", "doc_fingerprints",
     "dup_span_stats", "dedup_span_removal", "decontaminate_ngrams",
     "dedup_minhash_verified",
     "dedup_clusters"],
)
def test_queries_match_oracle_on_adversarial_table(spark, edge_dir, qname):
    _compare(spark, edge_dir, qname)
