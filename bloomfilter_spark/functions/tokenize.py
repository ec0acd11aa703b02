"""Tokenizer-aware token counting — byte-level BPE with a pluggable vocab.

Training-data budgeting (mix ratios, shard packing, context-length
planning) counts MODEL tokens, not whitespace tokens.  This module
provides the full loop:

  pre-tokenize -> train merges on a bounded sample -> apply distributed

**Pre-tokenizer** (`PRETOKEN_PATTERN`): a GPT-2-family split — leading-
space word/number/punct runs plus the common English contraction tails —
deliberately written lookahead-free with explicit ASCII classes so THE
SAME pattern string runs identically on Java regex (Catalyst), RE2
(DuckDB oracles), and Python `re` (the Arrow batch encoder).  The
whitespace class is spelled `[ \\t\\n\\f\\r]` for the same reason as
textstats.WS_SPLIT_PATTERN (Java's \\s includes \\x0B, RE2's does not).

**Trainer** (`train_bpe_merges`): classic Sennrich-style byte-level BPE —
count pre-token frequencies, repeatedly merge the most frequent adjacent
symbol pair (ties broken by lexicographically smallest pair, so the vocab
is a pure function of the sample).  Runs driver-side on a bounded sample:
tokenizer training on a corpus sample is standard practice (HuggingFace
tokenizers, GPT-2); the APPLY side is what must scale, not the trainer.
An externally-trained vocab drops in via `merges_from_lines` (hex pairs,
one merge per line).

**Encoder** (`bpe_token_stats`): map-only `mapInPandas`, no shuffle.  The
merge loop is inherently sequential per pre-token, so vectorization comes
from Zipf: each Arrow batch is reduced to its UNIQUE pre-tokens (pandas
value_counts), each unique pre-token is encoded once through a
per-partition cache, and per-document counts are recovered by a dict
lookup over the (small) unique set.  At web scale the cache hit rate
approaches the type/token ratio (≪ 1), which is exactly the trick
tiktoken/tokenizers use.

Encoding applies the lowest-ranked available pair first (GPT-2 `bpe()`
semantics).  For any trained merge list this equals applying merges
sequentially in rank order, because a merge's component symbols are
always created by strictly lower-ranked merges — the pytest differential
(tests/test_tokenize.py) checks the two independent implementations
against each other.

Oracle strategy (q_bpe_token_stats): byte counts, pre-token counts, and
the no-merge degenerate case (0 merges => tokens == bytes, exercised
through the SAME UDF) are FULL-value-checked against DuckDB; the merge
loop itself is not SQL-expressible and is covered by the differential +
roundtrip pytest contracts, the same split the sketch queries use.

Reference analog: none (out of the reference's sketch scope) — this is
the driver brief's training-data token-budgeting surface.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

# One pattern, three engines (Java / RE2 / Python re): no lookahead, no
# capturing groups, ASCII classes, explicit whitespace class.
PRETOKEN_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)"  # English contraction tails ('s 'll 've ...)
    r"| ?[A-Za-z]+"          # optional leading space + letter run
    r"| ?[0-9]+"             # optional leading space + digit run
    r"| ?[^A-Za-z0-9 \t\n\f\r]+"  # other runs (unicode lands here)
    r"|[ \t\n\f\r]+"         # residual whitespace runs
)

_PRETOKEN_RE = re.compile(PRETOKEN_PATTERN)

# refuse absurd vocab sizes up front (a merge list is driver/broadcast
# state; 2^20 merges is already far past any practical BPE vocab)
_MAX_MERGES = 1 << 20


def pretokens(col) -> Column:
    """Catalyst pre-token array (whole-stage codegen, no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(PRETOKEN_PATTERN), 0)


def pretoken_count(col) -> Column:
    """Catalyst pre-token count; 0 for empty, null for null."""
    return F.size(pretokens(col))


def pretoken_count_sql(col: str) -> str:
    """DuckDB expression replaying `pretoken_count` exactly (RE2 runs the
    same pattern string; DuckDB standard literals pass backslashes through
    uninterpreted, so '\\t' reaches RE2 as the regex escape, same as Java
    and Python receive it)."""
    pat = PRETOKEN_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pat}'))"


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


def train_bpe_merges(
    texts: Iterable[str], n_merges: int
) -> list[tuple[bytes, bytes]]:
    """Deterministic byte-level BPE trainer (driver-side, bounded sample).

    Returns the ranked merge list: merges[i] = the i-th pair (a, b) of
    byte-string symbols to be replaced by a+b.  Most-frequent pair first;
    ties broken by lexicographically smallest (a, b), so the result is a
    pure function of the sample's pre-token multiset.
    """
    if not isinstance(n_merges, int) or n_merges < 0 or n_merges > _MAX_MERGES:
        raise ValueError(
            f"bpe: n_merges must be an integer in [0, 2^20], got {n_merges}"
        )
    freq: Counter[bytes] = Counter()
    for t in texts:
        if t:
            for pt in _PRETOKEN_RE.findall(t):
                freq[pt.encode("utf-8")] += 1
    words: dict[bytes, list[bytes]] = {
        w: [w[i : i + 1] for i in range(len(w))] for w in freq
    }
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pair_counts: Counter[tuple[bytes, bytes]] = Counter()
        for w, syms in words.items():
            f = freq[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in words.items():
            if len(syms) < 2:
                continue
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def merges_to_lines(merges: list[tuple[bytes, bytes]]) -> list[str]:
    """Portable vocab format: one merge per line, two hex byte-strings."""
    return [f"{a.hex()} {b.hex()}" for a, b in merges]


def merges_from_lines(lines: Iterable[str]) -> list[tuple[bytes, bytes]]:
    merges = []
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        parts = ln.split()
        if len(parts) != 2:
            raise ValueError(f"bpe: malformed merge line {ln!r}")
        merges.append((bytes.fromhex(parts[0]), bytes.fromhex(parts[1])))
    return merges


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode(word: bytes, ranks: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    """GPT-2 bpe(): repeatedly merge every occurrence of the lowest-ranked
    adjacent pair present."""
    syms = [word[i : i + 1] for i in range(len(word))]
    while len(syms) > 1:
        best_rank, best = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        a, b = best
        ab = a + b
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_CACHE_CAP = 1 << 18  # per-partition unique-pretoken cache bound


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[bytes, bytes]],
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
    cache_cap: int = _CACHE_CAP,
) -> DataFrame:
    """Per-document token accounting: map-only, no shuffle.

    Output: (id_col, *passthrough, n_bytes, n_pretokens, n_bpe_tokens,
    recon_ok) — one row per non-null-text input row (null-text rows carry
    no tokens to budget and are dropped, the library-wide null-row
    policy).  recon_ok asserts the decode roundtrip: the encoded symbols
    concatenate back to the pre-token's exact bytes.  `passthrough`
    columns (e.g. lang for per-language budgets) ride along so no join is
    needed downstream.

    n_merges = 0 degenerates to n_bpe_tokens == n_bytes, which the oracle
    value-checks through this same code path.
    """
    for c in (text_col, id_col, *passthrough):
        if c not in df.columns:
            raise ValueError(f"bpe: column {c!r} not in DataFrame")
    cols = [text_col, id_col, *passthrough]
    dupes = {c for c in cols if cols.count(c) > 1}
    if dupes:
        # a duplicated select gives the pandas batch duplicate columns and
        # pdf[col] then returns a DataFrame — fail here with a clear error
        # instead of an AttributeError inside the executor
        raise ValueError(
            f"bpe: column(s) {sorted(dupes)} passed more than once across "
            "text_col/id_col/passthrough"
        )
    if len(merges) > _MAX_MERGES:
        raise ValueError(f"bpe: merge list too large ({len(merges)})")
    ranks = {pair: i for i, pair in enumerate(merges)}
    id_field = df.select(id_col).schema.fields[0]
    # nullable-int passthrough: a NULL id arrives as NaN in a float column
    # unless re-widened to pandas Int64 (same contract as textstats)
    from pyspark.sql import types as T

    _int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    id_is_int = isinstance(id_field.dataType, _int_types)
    int_passthrough = {
        f.name
        for f in df.schema.fields
        if f.name in passthrough and isinstance(f.dataType, _int_types)
    }

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (n_tokens, recon_ok) per unique pre-token, kept across batches
        cache: dict[str, tuple[int, bool]] = {}
        for pdf in batches:
            pdf = pdf[pdf[text_col].notna()]
            if not len(pdf):
                continue
            pretoks = pdf[text_col].map(_PRETOKEN_RE.findall)
            # Zipf: encode each UNIQUE pre-token once per partition
            uniq = {pt for pts in pretoks for pt in pts if pt not in cache}
            if len(cache) + len(uniq) > cache_cap:
                # eviction must not orphan pre-tokens the CURRENT batch
                # still reads from the cache: re-collect uniq from scratch
                # after the clear, else the count loop KeyErrors on any
                # pre-token cached by an earlier batch
                cache.clear()
                uniq = {pt for pts in pretoks for pt in pts}
            for pt in uniq:
                w = pt.encode("utf-8")
                syms = _encode(w, ranks)
                cache[pt] = (len(syms), b"".join(syms) == w)
            n_bpe, recon = [], []
            for pts in pretoks:
                tot, ok = 0, True
                for pt in pts:
                    t, r = cache[pt]
                    tot += t
                    ok = ok and r
                n_bpe.append(tot)
                recon.append(ok)
            ids = pdf[id_col]
            if id_is_int:
                ids = ids.astype("Int64")
            out = {id_col: ids.array}
            for c in passthrough:
                col = pdf[c]
                if c in int_passthrough:
                    col = col.astype("Int64")
                out[c] = col.array
            out.update(
                {
                    "n_bytes": pdf[text_col].str.encode("utf-8").str.len(),
                    "n_pretokens": pretoks.str.len(),
                    "n_bpe_tokens": n_bpe,
                    "recon_ok": recon,
                }
            )
            yield pd.DataFrame(out)

    pt_fields = {
        f.name: f.dataType.simpleString()
        for f in df.select(id_col, *passthrough).schema.fields
    }
    schema = (
        ", ".join(f"`{c}` {t}" for c, t in pt_fields.items())
        + ", n_bytes long, n_pretokens long, n_bpe_tokens long, "
        "recon_ok boolean"
    )
    return df.select(id_col, *passthrough, text_col).mapInPandas(
        fn, schema=schema
    )
