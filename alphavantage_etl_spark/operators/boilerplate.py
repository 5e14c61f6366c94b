"""Cross-corpus boilerplate segment removal (C4/RefinedWeb-style).

Web-scale corpora repeat navigation chrome, cookie banners, license
footers, and template sentences across millions of pages; document-level
dedup never sees them (each PAGE is unique), so curation pipelines remove
SEGMENTS that recur in too many distinct documents (C4 drops lines
repeated three-plus times; RefinedWeb/Dolma ship the same pass). The
reference has no text layer — this extends the north-star curation suite
(SURVEY.md §2.11) alongside dedup/contamination.

Spark-first shape, no UDFs:

1. ``posexplode(split(text, delim))`` into (doc, position, segment) rows;
   empty segments are dropped. The exploded view is evaluated TWICE —
   once for the document-frequency counts, once for the rebuild (Spark
   cannot CSE the two consumers of a lazy subtree); per-doc totals ride a
   narrow ``size(filter(split()))`` projection, never a third explode.
2. distinct-document count per segment — two-phase hash aggregate on the
   segment key (map-side partial, one Exchange).
3. segments at-or-above the threshold anti-join back onto the exploded
   rows. The boilerplate table is vocabulary-sized (like TF-IDF's DF
   table), so the join side is left to AQE: broadcast iff it fits —
   the same conditional policy as contamination's bench table.
4. rebuild each document with ``array_sort`` over (position, segment)
   structs + ``array_join`` — original segment order restored without a
   window function; one final shuffle on the document key.

At 100 TB: two explode passes + two shuffles of the exploded corpus
(segment-count agg, per-doc rebuild) plus one vocabulary-sized aggregate
— the same cost profile as ``operators/tfidf.py``. A caller looping over
thresholds should persist the exploded frame; one-shot curation should
not (the second pass is cheaper than materializing corpus x segments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_boilerplate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    delim: str = "\n",
    min_docs: int = 3,
    normalize: bool = False,
    min_doc_frac: float | None = None,
) -> DataFrame:
    """Drop every segment occurring in >= ``min_docs`` DISTINCT documents;
    rebuild the remaining text in original order.

    ``delim`` is a literal delimiter (split + rejoin round-trip must agree,
    so it is escaped, not treated as a regex). ``normalize`` lowercases and
    trims segments for the repetition COUNT only — the surviving text keeps
    its original bytes (C4 normalizes the dedup key the same way). A
    document whose every segment is boilerplate survives with empty text —
    dropping rows is the caller's policy (filter on ``n_kept``), not the
    operator's.

    ``min_doc_frac`` (when set) overrides ``min_docs`` with
    ``ceil(frac * |corpus|)`` computed PLAN-SIDE (a count aggregate
    cross-joined into the threshold predicate — one job, no driver
    ``.count()`` round-trip; the same scalar-in-plan pattern as TF-IDF's
    N), so the threshold tracks corpus growth without re-tuning.

    Output: one row per input document —
    ``(id_col, <text_col> clean text, n_kept, n_removed)``.
    """
    import re as _re

    seg_raw = F.col("__seg")
    key = F.trim(F.lower(seg_raw)) if normalize else seg_raw

    segs = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(delim))).alias(
            "__pos", "__seg"
        ),
    ).where(F.col("__seg") != "")

    counts = (
        segs.select(key.alias("__key"), F.col(id_col))
        .groupBy("__key")
        .agg(F.countDistinct(id_col).alias("__nd"))
    )
    if min_doc_frac is not None:
        ndocs = df.agg(F.count(F.lit(1)).alias("__ndocs"))
        boiler = (
            counts.crossJoin(ndocs)
            .where(
                F.col("__nd")
                >= F.ceil(F.lit(float(min_doc_frac)) * F.col("__ndocs"))
            )
            .select("__key")
        )
    else:
        boiler = counts.where(F.col("__nd") >= min_docs).select("__key")

    # vocabulary-sized right side: AQE broadcasts iff it fits (no forced
    # hint — a 100 TB corpus's boilerplate table can exceed driver memory)
    kept = segs.join(boiler, key == F.col("__key"), "left_anti")

    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
                lambda s: s["__seg"],
            ),
            delim,
        ).alias("__clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )

    # re-attach documents whose every segment was removed (or empty input).
    # Per-doc segment totals need no second explode: size(filter(split()))
    # is a narrow projection over the base scan.
    base = df.select(
        F.col(id_col),
        F.coalesce(  # NULL text -> 0 segments (size(NULL) is NULL)
            F.size(
                F.filter(
                    F.split(F.col(text_col), _re.escape(delim)),
                    lambda x: x != "",
                )
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("__total"),
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("__clean", F.lit("")).alias(text_col),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("__total") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
