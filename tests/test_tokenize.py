"""Byte-level BPE token counting (functions/tokenize.py).

The library encoder applies the lowest-ranked available pair first (GPT-2
bpe() semantics); the reference here applies merges sequentially in rank
order (one full pass per merge).  For any trained merge list the two are
equivalent — a merge's component symbols are created by strictly
lower-ranked merges — and that equivalence IS the differential contract.
"""

from __future__ import annotations

import random
import re

import pytest

from bloomfilter_spark.functions.tokenize import (
    PRETOKEN_PATTERN,
    _encode,
    bpe_token_stats,
    merges_from_lines,
    merges_to_lines,
    pretoken_count,
    pretoken_count_sql,
    train_bpe_merges,
)

_RE = re.compile(PRETOKEN_PATTERN)


def _encode_sequential(word: bytes, merges) -> list[bytes]:
    """Independent reference: apply merges in rank order, one pass each."""
    syms = [word[i : i + 1] for i in range(len(word))]
    for a, b in merges:
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _count_reference(text: str, merges) -> tuple[int, int, int]:
    """Scalar per-document reference for the Spark encoder's counts."""
    pts = _RE.findall(text)
    n_bpe = sum(len(_encode_sequential(pt.encode("utf-8"), merges)) for pt in pts)
    return len(text.encode("utf-8")), len(pts), n_bpe


_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "she'll have finished, won't she? it's 2024 already...",
    "aaa aaab aaabac banana bandana",
    "Straße émile — café 中文 \U0001f600 mixed",
    "x\x0by vertical\ttab\nnewline\fform\rfeed",
    "",
    "    ",
    "123,456.78 $99 100%",
]


class TestTrainer:
    def test_deterministic_and_well_formed(self):
        m1 = train_bpe_merges(_CORPUS, 64)
        m2 = train_bpe_merges(list(_CORPUS), 64)
        assert m1 == m2
        # well-formedness: every non-byte component was created earlier
        seen = {bytes([i]) for i in range(256)}
        for a, b in m1:
            assert a in seen and b in seen, (a, b)
            seen.add(a + b)

    def test_most_frequent_pair_first(self):
        # 'aa' is the most frequent adjacent pair in pure-'a' runs
        merges = train_bpe_merges(["aaaa aaaa aaaa bc"], 1)
        assert merges == [(b"a", b"a")]

    def test_tie_break_lexicographic(self):
        # 'xy' and 'pq' tie at one occurrence each -> smaller pair wins
        merges = train_bpe_merges(["xy", "pq"], 1)
        assert merges == [(b"p", b"q")]

    def test_n_merges_guard(self):
        with pytest.raises(ValueError, match="n_merges"):
            train_bpe_merges(["x"], -1)
        with pytest.raises(ValueError, match="n_merges"):
            train_bpe_merges(["x"], 1 << 21)

    def test_stops_when_fully_merged(self):
        merges = train_bpe_merges(["ab"], 100)
        assert merges == [(b"a", b"b")]  # nothing left to merge after 1


class TestEncoder:
    def test_dynamic_equals_sequential_on_trained_vocab(self):
        merges = train_bpe_merges(_CORPUS, 128)
        ranks = {p: i for i, p in enumerate(merges)}
        rng = random.Random(3)
        words = [pt.encode("utf-8") for t in _CORPUS for pt in _RE.findall(t)]
        words += [
            bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
            for _ in range(200)
        ]
        for w in words:
            assert _encode(w, ranks) == _encode_sequential(w, merges), w

    def test_roundtrip_reconstructs_bytes(self):
        merges = train_bpe_merges(_CORPUS, 128)
        ranks = {p: i for i, p in enumerate(merges)}
        for t in _CORPUS:
            for pt in _RE.findall(t):
                w = pt.encode("utf-8")
                assert b"".join(_encode(w, ranks)) == w

    def test_training_words_compress(self):
        # a word seen often in training should encode to few symbols
        merges = train_bpe_merges(["banana " * 50], 16)
        ranks = {p: i for i, p in enumerate(merges)}
        assert len(_encode(b"banana", ranks)) == 1

    def test_empty_vocab_yields_bytes(self):
        assert _encode(b"abc", {}) == [b"a", b"b", b"c"]

    def test_merges_lines_roundtrip(self):
        merges = train_bpe_merges(_CORPUS, 32)
        assert merges_from_lines(merges_to_lines(merges)) == merges
        assert merges_from_lines(["", "  "]) == []
        with pytest.raises(ValueError, match="malformed"):
            merges_from_lines(["61 62 63"])


class TestPretokenizerPortability:
    def test_catalyst_equals_python_equals_duckdb(self, spark):
        import duckdb

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(_CORPUS)], "i long, text string"
        )
        cat = {
            r["i"]: r["c"]
            for r in df.select("i", pretoken_count("text").alias("c")).collect()
        }
        py = {i: len(_RE.findall(t)) for i, t in enumerate(_CORPUS)}
        con = duckdb.connect()
        dd = dict(
            con.execute(
                f"SELECT i, {pretoken_count_sql('t')} FROM "
                "(SELECT UNNEST(range(8)) AS i, UNNEST(?) AS t)",
                [list(_CORPUS)],
            ).fetchall()
        )
        assert cat == py == dd


class TestSparkTokenStats:
    @pytest.fixture(scope="class")
    def merges(self, documents):
        sample = [
            r["text"]
            for r in documents.filter("text IS NOT NULL")
            .orderBy("doc_id")
            .limit(48)
            .collect()
        ]
        return train_bpe_merges(sample, 128)

    def test_counts_match_scalar_reference(self, spark, documents, merges):
        got = {
            r["doc_id"]: (r["n_bytes"], r["n_pretokens"], r["n_bpe_tokens"])
            for r in bpe_token_stats(documents, merges).collect()
            if r["doc_id"] is not None
        }
        truth = {
            r["doc_id"]: _count_reference(r["text"], merges)
            for r in documents.filter(
                "text IS NOT NULL AND doc_id IS NOT NULL"
            )
            .select("doc_id", "text")
            .collect()
        }
        assert got == truth

    def test_partitioning_invariance(self, spark, documents, merges):
        one = sorted(
            map(tuple, bpe_token_stats(documents.coalesce(1), merges).collect()),
            key=str,
        )
        many = sorted(
            map(
                tuple,
                bpe_token_stats(documents.repartition(7), merges).collect(),
            ),
            key=str,
        )
        assert one == many

    def test_null_text_dropped_null_id_kept(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world"), (2, None), (None, "keep me")],
            "doc_id long, text string",
        )
        rows = bpe_token_stats(df, []).collect()
        assert len(rows) == 2
        by_bytes = {r["n_bytes"]: r for r in rows}
        assert by_bytes[11]["doc_id"] == 1
        assert by_bytes[7]["doc_id"] is None  # null id passes through

    def test_no_merge_degenerates_to_byte_count(self, documents):
        bad = (
            bpe_token_stats(documents, [])
            .filter("n_bpe_tokens != n_bytes OR NOT recon_ok")
            .count()
        )
        assert bad == 0

    def test_passthrough_and_column_guard(self, spark, documents, merges):
        rows = bpe_token_stats(
            documents, merges, passthrough=("lang",)
        ).collect()
        assert {r["lang"] for r in rows} <= {
            r["lang"] for r in documents.select("lang").distinct().collect()
        }
        with pytest.raises(ValueError, match="column 'nope'"):
            bpe_token_stats(documents, merges, passthrough=("nope",))


def test_cache_eviction_mid_partition_keeps_counts_correct(spark):
    """When the per-partition pre-token cache overflows mid-partition, the
    eviction must not orphan pre-tokens the CURRENT batch still reads —
    force a tiny cap (closure-captured, so it reaches the workers) over a
    multi-batch partition and check counts equal the uncapped run."""
    import bloomfilter_spark.functions.tokenize as tk

    # many docs + tiny arrow batches => several batches per partition,
    # with common words ('doc', 'two') cached by earlier batches
    texts = [(i, f"doc number {i} two common words plus unique{i}")
             for i in range(300)]
    df = spark.createDataFrame(texts, "doc_id long, text string").coalesce(1)
    merges = [(b"o", b"n"), (b"t", b"w")]

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "20")  # several batches per partition: the bug
    try:  # needs batch N+1 to reuse entries cached by batch N
        want = tk.bpe_token_stats(df, merges).toPandas().sort_values("doc_id")
        got = (
            tk.bpe_token_stats(df, merges, cache_cap=5)
            .toPandas()
            .sort_values("doc_id")
        )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    for c in ("n_bytes", "n_pretokens", "n_bpe_tokens", "recon_ok"):
        assert list(got[c]) == list(want[c]), c


def test_duplicate_passthrough_rejected_on_driver(spark):
    import pytest

    from bloomfilter_spark.functions.tokenize import bpe_token_stats

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="more than once"):
        bpe_token_stats(df, [], passthrough=("doc_id",))
