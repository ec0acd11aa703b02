"""Deterministic, versioned HTML→text extraction.

The north rule requires "extracted text fed into the sketches is
byte-identical per url to the reference extraction" (BASELINE.json:6,15).
The reference library has no extraction (it hashes caller-supplied bytes),
so the contract we enforce is *self-consistency*: `extract_text` is a pure,
versioned function, the synthetic `pages` fixture generates its `text`
column BY this function, and tests pin sha256(text) per url as golden
values.  Any change to extraction must bump EXTRACTION_VERSION, which is
also stamped into the pages cache path so fixtures regenerate.

Vectorized: pandas .str regex ops over whole Arrow batches — no per-row
Python (input_hint, BASELINE.json:15).
"""

from __future__ import annotations

import pandas as pd

EXTRACTION_VERSION = 1

_HEAD_RE = r"(?is)<head\b.*?</head>"
_SCRIPT_RE = r"(?is)<(script|style)\b.*?</\1>"
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"\s+"


def extract_text_series(html: pd.Series) -> pd.Series:
    """bytes html -> extracted text, one deterministic pass per Arrow batch.

    Pipeline: UTF-8 decode (invalid bytes replaced) → drop <head> block →
    drop <script>/<style> blocks → strip remaining tags → collapse
    whitespace → strip.  Every step is a vectorized pandas .str op.
    """
    if len(html) == 0:
        return pd.Series([], dtype="object")
    first = html.dropna()
    if len(first) and isinstance(first.iloc[0], str):
        # a StringType html column (decoded HTML stored as text): encode
        # rather than silently coercing every row to b'' — which would
        # emit empty text for the whole table with no error
        txt = html.fillna("")
    else:
        if len(first) and not isinstance(first.iloc[0], (bytes, bytearray)):
            raise TypeError(
                "extract_text: html column must be binary or string, got "
                f"{type(first.iloc[0]).__name__}"
            )
        txt = html.fillna(b"").str.decode("utf-8", errors="replace")
    txt = txt.str.replace(_HEAD_RE, " ", regex=True)
    txt = txt.str.replace(_SCRIPT_RE, " ", regex=True)
    txt = txt.str.replace(_TAG_RE, " ", regex=True)
    txt = txt.str.replace(_WS_RE, " ", regex=True)
    return txt.str.strip()


def extract_text(html: bytes) -> str:
    """Scalar convenience wrapper (tests / golden hashes)."""
    return extract_text_series(pd.Series([html])).iloc[0]


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """DataFrame transformer: adds `out_col` = extract_text(html_col) via a
    vectorized pandas UDF (Arrow batches, JVM→Python once per batch)."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.StringType())
    def _extract(h: pd.Series) -> pd.Series:
        return extract_text_series(h)

    return df.withColumn(out_col, _extract(html_col))
