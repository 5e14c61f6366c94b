"""In-engine BPE merge learning (X67) — tokenizer vocabulary induction.

Byte-pair encoding training is the canonical "learn the tokenizer from
the corpus" step of an LLM data pipeline. The algorithm is inherently
iterative (k greedy merges), but each iteration is pure DataFrame work
over the WORD-FREQUENCY table — which is VOCABULARY-bounded, not
corpus-bounded — so the expensive corpus is scanned exactly once and the
k rounds run over bounded model-adjacent state:

    corpus --one scan--> (word, freq) grid --k rounds--> merge table

Per round: adjacent-pair counts (one explode + partial-agg over the
vocab table, weighted by word frequency), a deterministic argmax
(count DESC, then lexicographic pair — TakeOrdered of ONE row), and a
greedy left-to-right rewrite of each word's token array expressed as a
``F.aggregate`` fold (replace-last-when-pair-matches — the merged symbol
differs from its parts, so non-overlap falls out naturally: "aaa" with
merge (a,a) -> [aa, a]). The per-round state is ``localCheckpoint``'d:
k nested fold expressions would otherwise stack in one plan and blow up
analysis/codegen (the iterative-lineage rule from connected components).

The learned merge table (k rows) and the final vocabulary segmentation
(|vocab| rows) are BOUNDED MODEL STATE — the centroid/codebook class.
Encoding a corpus with the learned model is a broadcast join of words
against the vocabulary segmentation (never a per-document fold), which
is how production BPE encoders work too (the segmentation of a word is
a pure function of the word).

Cross-engine exactness: pure integer counts, lexicographic tie-breaks,
string concatenation — no floats anywhere. The DuckDB oracle unrolls
the same k rounds as chained CTE stages with ``list_reduce`` replaying
the identical greedy fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    from ..functions.text import tokens as _tokens

    return (
        docs.select(
            F.explode(_tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(state: DataFrame) -> DataFrame:
    """(x, y, c): frequency-weighted adjacent-pair counts over the
    current token arrays. sequence(1, 0) steps DOWN (the repo-wide
    gotcha), so single-token words are guarded to an empty index list.
    """
    t = F.col("toks")
    n = F.size(t)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pair = F.explode(
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(t, i).alias("x"),
                F.element_at(t, i + 1).alias("y"),
            ),
        )
    )
    return (
        state.select("freq", pair.alias("p"))
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("freq").alias("c"))
    )


def _merge_fold(x: "F.Column", y: "F.Column", xy: "F.Column") -> "F.Column":
    """Greedy left-to-right rewrite of ``toks`` merging pair (x, y).

    Column-parameterized (r15): callers pass literals OR attribute
    references. A NULL ``x``/``y`` (the in-plan argmax of an exhausted
    pair table) makes the WHEN condition NULL for every element, so the
    fold is the identity — rounds past vocabulary exhaustion are no-ops,
    matching the collect-loop's early break.
    """
    return F.aggregate(
        F.col("toks"),
        F.array().cast("array<string>"),
        lambda acc, cur: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == x)
            & (cur == y),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(xy),
            ),
        ).otherwise(F.concat(acc, F.array(cur))),
    )


def _best_pair(state: DataFrame) -> DataFrame:
    """ONE row (__mx, __my, __mc): the argmax pair (count DESC, then
    lexicographic x, y) as an in-plan aggregate — ``min`` over the
    ``(-c, x, y)`` struct is exactly the ``ORDER BY c DESC, x, y LIMIT
    1`` ordering (struct comparison is field-by-field, strings binary —
    the same collation the sort used). All-NULL row when no adjacent
    pairs remain (aggregate over zero rows), never zero rows — so a
    crossJoin against it cannot wipe the state."""
    return (
        _adjacent_pairs(state)
        .agg(
            F.min(
                F.struct(
                    (-F.col("c")).alias("nc"),
                    F.col("x").alias("x"),
                    F.col("y").alias("y"),
                )
            ).alias("m")
        )
        .select(
            F.col("m.x").alias("__mx"),
            F.col("m.y").alias("__my"),
            (-F.col("m.nc")).alias("__mc"),
        )
    )


def _learn(docs: DataFrame, text_col: str, k: int):
    """Run k merge rounds; returns (merges frame, final state frame).

    The merges frame has columns (merge_rank, lhs, rhs, merged,
    pair_count) with fewer than k rows when the vocabulary runs out of
    adjacent pairs.

    r15 optimization (guide §2.1/§5 — no driver round-trips in the model
    loop): when the vocabulary grid fits ``spark.graft.modelLoopRows``
    (the pagerank/markov gate — row-count-based, never core-count-tied),
    the per-round argmax is an IN-PLAN one-row aggregate joined back to
    the SinglePartition state with a merge hint: every round is one
    single-task checkpoint job with no exchange, no broadcast stage and
    no collect latency (the r14 form paid a 32-task pair aggregation +
    TakeOrdered collect + 32-task rewrite per round — 22 jobs for k=6).
    Values are identical: the struct-min argmax replays the identical
    (c DESC, x, y) ordering, and the column-parameterized fold is the
    same expression with the collected literals replaced by the joined
    attributes. Large vocabularies keep the collect loop (a single-task
    fold over 10^8 words would straggle; the partitioned rewrite is the
    scale shape).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    chars = F.filter(
        F.split(F.col("word"), ""), lambda ch: ch != ""
    )
    state = (
        _word_freq(docs, text_col)
        .select("word", "freq", chars.alias("toks"))
        .localCheckpoint(eager=True)
    )
    spark = docs.sparkSession
    loop_cap = int(spark.conf.get("spark.graft.modelLoopRows", "262144"))
    # the count is free: it reads the checkpoint blocks just materialized
    if state.count() <= loop_cap:
        return _learn_inplan(state, k)
    merges: list[tuple] = []
    for r in range(1, k + 1):
        best = (
            _adjacent_pairs(state)
            .orderBy(F.desc("c"), F.col("x"), F.col("y"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        x, y, c = best[0]["x"], best[0]["y"], best[0]["c"]
        merges.append((r, x, y, x + y, c))
        prev = state
        state = state.select(
            "word", "freq",
            _merge_fold(F.lit(x), F.lit(y), F.lit(x + y)).alias("toks"),
        ).localCheckpoint(eager=True)
        prev.unpersist()
    from ..functions.vectors import inline_rows_df

    fields = [("merge_rank", "BIGINT"), ("lhs", "STRING"),
              ("rhs", "STRING"), ("merged", "STRING"),
              ("pair_count", "BIGINT")]
    try:
        mdf = inline_rows_df(spark, merges, fields)
    except ValueError:
        mdf = spark.createDataFrame(
            merges,
            "merge_rank long, lhs string, rhs string, merged string, "
            "pair_count long",
        )
    return mdf, state


def _learn_inplan(state: DataFrame, k: int):
    """The small-vocab merge loop: SinglePartition state, in-plan argmax,
    constant-key merge join — one single-task job per round. See
    :func:`_learn`."""
    from .dedup import free_blocks

    seed = state  # the vocab-grid checkpoint from _learn
    state = state.coalesce(1)
    rounds: list[DataFrame] = []  # per-round state checkpoints
    bests: list[DataFrame] = []
    for r in range(1, k + 1):
        best = _best_pair(state)
        bests.append(best)
        st = (
            state.withColumn("__k", F.lit(1))
            .hint("merge")
            .join(best.withColumn("__k", F.lit(1)), "__k")
        )
        state = st.select(
            "word", "freq",
            _merge_fold(
                F.col("__mx"), F.col("__my"), F.concat("__mx", "__my")
            ).alias("toks"),
        ).localCheckpoint(eager=True)
        rounds.append(state)
    merges = None
    for r, best in enumerate(bests, start=1):
        row = best.select(
            F.lit(r).cast("long").alias("merge_rank"),
            F.col("__mx").alias("lhs"),
            F.col("__my").alias("rhs"),
            F.concat("__mx", "__my").alias("merged"),
            F.col("__mc").alias("pair_count"),
        )
        merges = row if merges is None else merges.unionByName(row)
    # materialize the k one-row argmaxes once (they re-read each round's
    # checkpoint), then drop every intermediate round's blocks — only the
    # final state (returned) stays cached
    merges = (
        merges.where(F.col("lhs").isNotNull())
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    free_blocks(seed)
    for prev in rounds[:-1]:
        free_blocks(prev)
    return merges, state


def bpe_learn(docs: DataFrame, text_col: str, k: int = 8) -> DataFrame:
    """(merge_rank, lhs, rhs, merged, pair_count): the first ``k`` BPE
    merges learned from the corpus's word-frequency table, in learning
    order. Fewer than k rows when the vocabulary runs out of adjacent
    pairs. The table IS the tokenizer model — apply it with
    :func:`bpe_segment_vocab` + a broadcast join.
    """
    merges, state = _learn(docs, text_col, k)
    state.unpersist()
    return merges


def bpe_segment_vocab(
    docs: DataFrame, text_col: str, k: int = 8
) -> DataFrame:
    """(word, freq, segmentation): every vocabulary word's token
    sequence after the learned ``k`` merges, space-joined (engine-
    portable scalar output). Encoding a corpus is then one broadcast
    join of exploded words against this |vocab|-bounded table — the
    production-encoder shape; no per-document fold ever touches the
    corpus.
    """
    _, state = _learn(docs, text_col, k)
    out = state.select(
        "word",
        "freq",
        F.array_join("toks", " ").alias("segmentation"),
    )
    return out
