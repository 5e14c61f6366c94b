"""Sliding-window document chunking — the tokenize-and-chunk step that
turns curated documents into fixed-size training windows.

Reference scope: the reference ETL (av_etl.py) has no text pipeline; this
is part of the large-scale training-data surface (SURVEY.md section 2.9+)
alongside pack_bins / epoch_shuffle. Where ``pack_bins`` packs whole short
documents into a token budget, ``chunk_documents`` is the complementary
path for LONG documents: split each one into overlapping windows of
``window`` tokens advanced by ``stride`` (< window for overlap, = window
for disjoint), so no span of text is lost at chunk boundaries.

Scale design (100 TB): one narrow projection per document — tokenize once
(`split`), generate the start offsets in-plan (`sequence`), `posexplode`,
and `slice` per offset. No shuffle, no window function, no UDF: the whole
operator is a single whole-stage-codegen `Generate` over the scan, so it
scales with input bytes and parallelizes per file split. Chunk ids are
content-addressed (doc id + chunk index), append-stable under corpus
growth.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 16,
    stride: int = 8,
    delimiter: str = " ",
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Emits one row per (document, window start) with
    ``chunk_idx`` (0-based), ``n_tokens`` (== window except for the final
    partial chunk), and ``chunk_text`` (tokens re-joined with
    ``delimiter``). Start offsets are 0, stride, 2*stride, ... while the
    offset lies inside the token array, so every token is covered by at
    least one chunk and (when stride < window) boundary context is
    repeated in the next chunk.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    # split takes a Java regex; escape so the delimiter is literal (the
    # boilerplate.py convention) and matches the oracle's string_split
    toks = F.split(F.col(text_col), _re.escape(delimiter))
    out = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            id_col,
            "_toks",
            F.posexplode(
                F.sequence(
                    F.lit(0), F.size("_toks") - F.lit(1), F.lit(stride)
                )
            ).alias("chunk_idx", "_start"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long"),
            F.least(
                F.lit(window), F.size("_toks") - F.col("_start")
            ).cast("long").alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(window)),
                delimiter,
            ).alias("chunk_text"),
        )
    )
    return out
