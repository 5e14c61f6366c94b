"""Log/document template mining (Drain-lite): mask the variable parts
of semi-structured text, group by the masked signature, and surface the
dominant templates — the first step of log analytics ("which 20 message
shapes are 99% of the volume") and a cheap boilerplate detector for
curation (a template carried by thousands of docs is a layout, not
content).

Reference scope: none (north-star family X85); the masking idea is the
public Drain/Spell log-parsing lineage reduced to its deterministic
core: digit runs -> '#', whitespace runs -> one space, case-folded.

Scale design (100 TB): one projection builds the masked signature
(regexp chain, codegen, no shuffle), one hash aggregation groups it
(map-side combine on the signature), and the top-k lowers to
TakeOrderedAndProject — per-partition heads then a k-sized merge, never
a global sort. Example doc ids are min() aggregates: deterministic and
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mask_template(col) -> "F.Column":
    """The masked signature expression: lower-case, digit runs -> '#',
    whitespace runs -> single space, trimmed. Pure regexp chain —
    identical semantics in DuckDB's regexp_replace(..., 'g')."""
    c = F.lower(col) if not isinstance(col, str) else F.lower(F.col(col))
    c = F.regexp_replace(c, "[0-9]+", "#")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def mine_templates(
    df: DataFrame, text_col: str, id_col: str, top_k: int = 20
) -> DataFrame:
    """(template, n_docs, example_id): the ``top_k`` most frequent
    masked templates with a deterministic example document (min id).
    Ties on count break on the template string; empty-after-masking
    texts are excluded (a template must have content)."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    t = df.select(
        mask_template(F.col(text_col)).alias("template"),
        F.col(id_col).alias("__id"),
    ).where(F.length("template") > 0)
    return (
        t.groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("__id").alias("example_id"),
        )
        .orderBy(F.desc("n_docs"), F.col("template"))
        .limit(top_k)
    )
