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
        # >200 distinct rare words push the corpus past token_budget's
        # top_k=200 vocabulary, so the OOV ceil(len/4) branch — the part
        # of the Spark/SQL pair most likely to diverge — is exercised
        # under the adversarial shapes too (plus one very long word)
        (7, "pneumonoultramicroscopicsilicovolcanoconiosis "
            + " ".join(f"gibberish{j}word" for j in range(220)),
         "en", "src4", 58),
        # NULL id with REAL text sharing 4-grams/8-token lines with docs
        # 0/6: identity-less rows must pass through span/line dedup
        # UNCHANGED (no per-doc accounting without a key).  For SPAN dedup
        # they still vote in the corpus-frequency count (COUNT(*) over
        # occurrences); for LINE dedup both engines exclude them from the
        # vote too (COUNT(DISTINCT doc_id) skips NULL) — r4 latent-bug
        # class this row was added to pin, scope corrected per ADVICE r4
        (None, "hello world common tokens here", "en", "src7", 31),
        # leading-TAB near-dup pair (ADVICE r4): trim strips only spaces,
        # so "\tcommon …" reflows with a leading empty token and its raw
        # 8-token line carries a leading space.  The operator matches on
        # the collapsed-whitespace NORMALIZED line and removes it from
        # BOTH docs; an oracle grouping raw lines removes it from neither.
        (9, "\tcommon banner line here repeated verbatim", "en", "src8", 42),
        (52, "common banner line here repeated verbatim", "en", "src9", 41),
        # whitespace-only pair: reflows to the line " " whose normalized
        # form is BLANK — blank lines are structure, not boilerplate, so
        # the operator never removes them even at document frequency 2;
        # the oracle must exclude normalized-blank lines from the vote
        (53, "\t", "en", "src8", 1),
        (54, "\t", "en", "src9", 1),
        # vertical tab: Java \s splits on \x0B, RE2 \s does not — the
        # library's WS_SPLIT_PATTERN pins the RE2 class, so both engines
        # must read "alpha\x0Bbeta" as ONE token
        (8, "alpha\x0bbeta gamma delta words", "en", "src5", 28),
    ] + [
        # planted \x0B near-dup pair: under the pinned RE2 class
        # "alpha\x0Bbeta" is ONE token → J = 8/9 = 0.888889; a python
        # str.split() tokenizer (splits on \x0B) would score 9/10 = 0.9
        # — so any pandas-path tokenizer drift (the _shingle_sets bug
        # class) flips this VALUE and fails dedup_minhash_verified /
        # dedup_ngram_jaccard against their oracles
        (50, "alpha\x0bbeta " + " ".join(f"shared{j}" for j in range(9)),
         "en", "src6", 60),
        (51, "alpha\x0bbeta " + " ".join(f"shared{j}" for j in range(9))
         + " tail", "en", "src6", 65),
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


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    rows = []
    base = pd.Timestamp("2024-01-01")
    for i in range(60):
        rows.append(
            (i, base + pd.Timedelta(minutes=7 * i), i % 5,
             ["click", "view", "error"][i % 3], round(1.5 * i, 2),
             f'{{"k": {i}}}')
        )
    rows += [
        (100, None, 1, "click", 5.0, '{"k": 1}'),        # NULL ts
        (101, base + pd.Timedelta(hours=40), None, "view", None, "not json"),
        (102, base + pd.Timedelta(hours=41), 2, None, 7.0, None),  # NULL type
        (103, base + pd.Timedelta(hours=41), 2, "click", float("nan"),
         '{"k": "str"}'),                                 # NaN value
        (104, base + pd.Timedelta(hours=42), 3, "view", -5.0, None),  # negative
        (105, base + pd.Timedelta(hours=43), 3, "view", float("inf"), None),
        # NULL-key right row + later NULL-key probe: asof must NOT pair
        # them (equality semantics never match NULL keys); r3 ADVICE case
        (106, base + pd.Timedelta(hours=44), None, "error", 1.0, None),
        (107, base + pd.Timedelta(hours=45), None, "click", 2.0, None),
        # NULL-user purchase + the NULL-user click above: set-algebra
        # oracles must NOT count the NULL user in INTERSECT/EXCEPT (SQL
        # set ops treat NULLs as equal; countDistinct and the sketch
        # builds skip them) — plus real purchases so the sets are
        # non-trivial (the r5 COUNT(user_id) fix's trigger shape)
        (108, base + pd.Timedelta(hours=46), None, "purchase", 3.0, None),
        (109, base + pd.Timedelta(hours=47), 1, "purchase", 4.0, None),
        (110, base + pd.Timedelta(hours=48), 4, "purchase", 6.0, None),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"]
    ).astype({"event_id": "Int64", "user_id": "Int64"})
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark rejects NANOS
    d = tmp_path_factory.mktemp("edgeev")
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d), pdf


def _compare(spark, edge_dir, qname, table="documents"):
    # full catalog (graded window + extended) — adversarial coverage must
    # not shrink when a query moves out of the 50-entry driver window
    from bloomfilter_spark.queries import ALL_ORACLES as oracles
    from bloomfilter_spark.queries import ALL_QUERIES as queries
    sf_dir, pdf = edge_dir
    got = canon(queries[qname](spark, sf_dir).toPandas())
    con = duckdb.connect()
    con.register(table, pdf)
    want = canon(con.execute(oracles[qname]).df())
    con.close()
    assert list(got.columns) == list(want.columns), qname
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)


@pytest.mark.parametrize(
    "qname",
    ["sessionize_events", "asof_click_error", "json_props_stats",
     "hll_users_by_day", "hll_users_by_type_salted", "cms_event_type_counts",
     "heavy_hitters_event_types", "heavy_hitters_users",
     "tdigest_quantiles_value", "dds_quantiles_value",
     "topk_users_freqitems", "hll_rollup_weekly",
     # r5: set algebra + join-size replayed on NULL-user click/purchase
     # rows (the COUNT(user_id)-vs-COUNT(*) and NULL-group divergences)
     "hll_set_ops", "theta_set_ops", "cms_join_size"],
)
def test_event_queries_match_oracle_on_adversarial_table(
    spark, edge_events_dir, qname
):
    """NULL ts / NULL user / NULL type / NaN value / malformed JSON —
    shapes the fixture lacks; policy: sketch aggregates skip NULL keys
    and non-finite values, group keys get explicit '(none)' buckets,
    NULL-ts rows never as-of match."""
    _compare(spark, edge_events_dir, qname, table="events")


@pytest.mark.parametrize(
    "qname",
    ["pack_shards", "mix_corpus", "classifier_score", "ngram_counts",
     "sample_k_per_lang", "dedup_incremental", "dedup_clusters_best",
     "filter_top_quality", "chunk_documents", "snapshot_diff", "pii_redaction",
     # pre-existing documents-only queries, pinned against null regressions
     "text_token_stats", "text_quality", "text_repetition", "lang_id_counts",
     "tfidf_vectors", "url_normalize", "sample_stratified",
     "dedup_ngram_jaccard", "dedup_simhash", "doc_fingerprints",
     "dup_span_stats", "dedup_span_removal", "decontaminate_ngrams",
     "dedup_minhash_verified",
     "dedup_clusters", "token_budget", "corpus_overlap", "extract_text",
     "sample_weighted", "line_dedup_removal", "lm_perplexity",
     # r5: NULL doc_id rows must land in the APPENDED snapshot (the mod-3
     # predicate excludes them from snap1) and NULL n_chars sums as 0
     "iceberg_snapshot_read"],
)
def test_queries_match_oracle_on_adversarial_table(spark, edge_dir, qname):
    _compare(spark, edge_dir, qname)


def test_table_profile_over_mg_capacity(spark, tmp_path):
    """Pin the over-capacity Misra-Gries regime (the sf0.1 latent bug this
    test was added for): with more distinct texts than MG counters the
    sketch decrements, so its top-1 counter UNDERESTIMATES the planted
    duplicate's true count (2) and its surviving item is not replayable —
    the query must report the EXACT top-1 (value + count) from its replay
    pass and gate the sketch through top1_ok instead."""
    from bloomfilter_spark.queries import ALL_ORACLES, ALL_QUERIES

    n = 4200  # > freq_capacity=4096 distinct texts once the dup collapses
    rows = {
        "doc_id": list(range(n)),
        # ~n distinct texts; doc 0 and doc n-1 share one planted dup text
        "text": ["planted dup text alpha beta"]
        + [f"unique text body number {i} gamma" for i in range(1, n - 1)]
        + ["planted dup text alpha beta"],
        "lang": ["en"] * n,
        "source": [f"src{i % 7}" for i in range(n)],
        # spread values: the q50_ok KLL gate assumes a non-degenerate
        # distribution (rank(median)≈0.5 breaks under one massive tie)
        "n_chars": [20 + i for i in range(n)],
    }
    pdf = pd.DataFrame(rows)
    d = tmp_path / "sfprof"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet", index=False)

    got = canon(ALL_QUERIES["table_profile"](spark, str(d)).toPandas())
    con = duckdb.connect()
    con.register("documents", pdf)
    want = canon(con.execute(ALL_ORACLES["table_profile"]).df())
    con.close()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)
    text_row = got[got["col_name"] == "text"].iloc[0]
    assert text_row["top1_value"] == "planted dup text alpha beta"
    assert int(text_row["top1_count"]) == 2
    assert bool(got["top1_ok"].all())
