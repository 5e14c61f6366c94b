"""Schema evolution & keyed upsert (X129-X131): drift-tolerant reader
conformance, a schema drift audit, and a MERGE INTO-shaped upsert plan.

The ingest-robustness layer a long-lived 100 TB pipeline needs: upstream
producers rename columns, drop columns, add columns, and change types
between batch generations, and the lakehouse table the pipeline maintains
needs keyed in-place upserts (update / insert / delete in one pass), not
just the append + anti-join protocol the engine already has (ST1,
operators/incremental.py).

Design positions:
  * conformance is an EXPLICIT policy (a rename map + a missing/extra
    disposition), never an implicit best-effort union — ``mergeSchema``
    guesses; a policy table is reviewable, testable, and diffable. The
    conformer is a pure projection (typed NULL fill, casts, column
    pruning) that fuses into the scan at any scale.
  * the drift report is the decision artifact: per target/extra column,
    what the reader would do (ok / retyped / renamed / missing / extra)
    plus the observed non-null count after conformance — schema-level
    facts joined with ONE map-side-combinable aggregation, output
    bounded at |columns|. Composes with the X46 table profile and X23
    dataset diff for full before/after audits.
  * the upsert is the Delta/Iceberg ``MERGE INTO`` shape (WHEN MATCHED
    [AND delete] DELETE / WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED
    INSERT *) expressed as a composition the optimizer can prune:
    target-side rows pass through ONE anti-join on the key (broadcast
    when the source delta is small — the 100 TB path never shuffles the
    target), source rows arrive deduplicated-and-guarded. With a
    partition column, untouched partitions bypass even that anti-join
    via a partition-value semi/anti split — the logical analog of a
    table format rewriting only the files of touched partitions.

No reference analogue (the reference pandas ETL assumes fixed wire
formats, av_etl.py; schema drift there is a KeyError at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MISSING_POLICIES = ("null", "error")
_EXTRA_POLICIES = ("drop", "keep", "error")


def _as_struct(target) -> T.StructType:
    if isinstance(target, T.StructType):
        return target
    if isinstance(target, str):
        return T.StructType.fromDDL(target)
    raise TypeError(f"target must be a StructType or DDL string, got {type(target)}")


def _plan_conformance(
    df: DataFrame, target, renames: dict[str, str] | None
) -> list[tuple[str, str | None, str, T.DataType]]:
    """Resolve the per-column conformance plan: a list of
    ``(target_name, source_name | None, status, target_type)`` for every
    target field, followed by ``(source_name, source_name, 'extra',
    source_type)`` for unconsumed source columns. Pure schema
    computation — no data touched."""
    struct = _as_struct(target)
    renames = dict(renames or {})
    bad = [o for o, n in renames.items() if n not in {f.name for f in struct.fields}]
    if bad:
        raise ValueError(f"renames map to columns absent from the target: {bad}")
    targets = list(renames.values())
    dupes = sorted({t for t in targets if targets.count(t) > 1})
    if dupes:
        # two sources claiming one target is an ambiguous policy — the
        # silent alternative (last-writer wins, loser dropped as
        # 'extra') hides a data-loss decision nobody reviewed
        raise ValueError(
            f"renames map multiple source columns to the same target: {dupes}"
        )
    have = {f.name: f.dataType for f in df.schema.fields}
    by_new = {n: o for o, n in renames.items()}
    plan: list[tuple[str, str | None, str, T.DataType]] = []
    consumed: set[str] = set()
    for f in struct.fields:
        if f.name in have:
            src, status = f.name, (
                "ok" if have[f.name] == f.dataType else "retyped"
            )
        elif f.name in by_new and by_new[f.name] in have:
            src, status = by_new[f.name], "renamed"
        else:
            src, status = None, "missing"
        if src is not None:
            consumed.add(src)
        plan.append((f.name, src, status, f.dataType))
    for f in df.schema.fields:
        if f.name not in consumed:
            plan.append((f.name, f.name, "extra", f.dataType))
    return plan


def conform_schema(
    df: DataFrame,
    target,
    renames: dict[str, str] | None = None,
    on_missing: str = "null",
    on_extra: str = "drop",
) -> DataFrame:
    """Conform a drifted batch to ``target`` (a ``StructType`` or DDL
    string) under an explicit policy: ``renames`` maps source column ->
    target column; a target column absent from the source (after
    renames) is filled with a typed NULL (``on_missing='null'``) or
    rejected (``'error'``); unconsumed source columns are dropped,
    kept after the target columns, or rejected (``on_extra``).
    Every kept target column is ``try_cast`` to the target type — a
    malformed VALUE degrades to NULL (visible in the drift report's
    ``n_nonnull``) instead of aborting the batch; identical behavior
    under ANSI and legacy modes, and to DuckDB's TRY_CAST, which keeps
    the policy oracle-checkable.

    Pure projection — zero shuffle, fuses into the scan; at 100 TB the
    conformance costs nothing beyond the read it prunes."""
    if on_missing not in _MISSING_POLICIES:
        raise ValueError(f"on_missing must be one of {_MISSING_POLICIES}")
    if on_extra not in _EXTRA_POLICIES:
        raise ValueError(f"on_extra must be one of {_EXTRA_POLICIES}")
    plan = _plan_conformance(df, target, renames)
    missing = [name for name, src, status, _t in plan if status == "missing"]
    extra = [name for name, _src, status, _t in plan if status == "extra"]
    if missing and on_missing == "error":
        raise ValueError(f"target columns missing from the batch: {missing}")
    if extra and on_extra == "error":
        raise ValueError(f"batch columns absent from the target: {extra}")
    cols = []
    for name, src, status, dtype in plan:
        if status == "extra":
            if on_extra == "keep":
                cols.append(F.col(name))
        elif src is None:
            cols.append(F.lit(None).cast(dtype).alias(name))
        else:
            cols.append(F.col(src).try_cast(dtype).alias(name))
    return df.select(*cols)


def schema_drift_report(
    df: DataFrame, target, renames: dict[str, str] | None = None
) -> DataFrame:
    """Audit what :func:`conform_schema` would do to this batch: one row
    per target column (and per extra source column) with ``col_name``,
    ``status`` in {ok, retyped, renamed, missing, extra}, the resolved
    ``source_name`` (NULL for missing), and ``n_nonnull`` — the
    post-conformance non-null count (0 for missing: that is exactly the
    data loss the policy is accepting; for extra columns, the count the
    drop is discarding).

    Plan: the statuses are schema facts; the counts are ONE map-side-
    combinable aggregation producing a single row, exploded to the
    bounded |columns| report — no collect, no shuffle beyond the final
    single-row agg."""
    plan = _plan_conformance(df, target, renames)
    aggs = []
    for i, (_name, src, status, dtype) in enumerate(plan):
        if src is None:
            aggs.append(F.lit(0).cast("long").alias(f"__c{i}"))
        elif status == "extra":
            aggs.append(F.count(F.col(src)).alias(f"__c{i}"))
        else:
            aggs.append(F.count(F.col(src).try_cast(dtype)).alias(f"__c{i}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.lit(status).alias("status"),
                F.lit(src).cast("string").alias("source_name"),
                F.col(f"__c{i}").alias("n_nonnull"),
            )
            for i, (name, src, status, _t) in enumerate(plan)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def upsert_merge(
    target_df: DataFrame,
    source_df: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Post-state of a ``MERGE INTO`` upsert: source rows replace
    matched target rows (UPDATE SET *), unmatched source rows are
    inserted (INSERT *), and — when ``delete_col`` names a boolean
    source column — flagged rows delete their key instead. Target rows
    whose key the source never mentions pass through unchanged.

    Source keys must be unique (multiple source rows matching one
    target row is the ambiguity Delta's MERGE rejects); an in-plan
    ``assert_true`` raises at action time on violation — the guard
    shuffles only the SOURCE (the small delta side by construction).

    Scale shape: the target — the 100 TB side — flows through exactly
    ONE anti-join against the deduplicated source key set, which the
    planner broadcasts when the delta is small (no hint forced: AQE
    degrades to a shuffle join for a huge delta). With
    ``partition_col``, target partitions the source never touches skip
    even that: a broadcast semi/anti split on the bounded
    touched-partition values routes them straight to the output — the
    logical analog of a lakehouse MERGE rewriting only touched files,
    and the plan partition pruning eliminates at the scan.

    Partition-scoped PRECONDITION: ``partition_col`` must be immutable
    per key (the standard partition-pruned MERGE contract — partition
    by a function of the key, e.g. creation date). A source row that
    moved a key to a different partition would leave the old row
    untouched in its unvisited partition while inserting the new one —
    a silent duplicate. Detecting that requires reading target
    partitions the source does NOT touch, which is exactly the work
    partition scoping exists to skip — so the condition is a declared
    constraint, not an in-plan guard. Callers unsure of their layout
    should run :func:`validate_partition_stability` (one key-level
    pass) or use ``partition_col=None`` (one global anti-join, handles
    cross-partition moves correctly).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    src = source_df
    if delete_col is not None:
        # NULL flag = not flagged (a bare ~NULL would silently DROP the
        # row — the fail-open trap the engine's NULL discipline forbids)
        deletes = F.coalesce(F.col(delete_col), F.lit(False))
    else:
        deletes = F.lit(False)
    w = Window.partitionBy(*key_cols)
    src = src.withColumn("__kn", F.count(F.lit(1)).over(w))
    src = src.where(
        F.assert_true(
            F.col("__kn") == 1,
            F.lit(
                "upsert_merge: source contains duplicate keys — a MERGE "
                "with multiple source matches per target row is ambiguous"
            ),
        ).isNull()
    ).drop("__kn")
    src_keys = src.select(*key_cols)
    surviving = src.where(~deletes)
    if delete_col is not None:
        surviving = surviving.drop(delete_col)

    if partition_col is None:
        kept = target_df.join(src_keys, on=key_cols, how="left_anti")
        return kept.unionByName(surviving)

    # the touched/untouched split must be NULL-SAFE: a plain equi-join
    # never matches a NULL partition value, so a NULL-partition target
    # row would always route to 'untouched' even when the source updates
    # or deletes its key — the old row survives next to the new one (the
    # module's NULL-join discipline: cf. domain_caps' sentinel key and
    # cdc_apply_stream's eqNullSafe). left_semi/left_anti emit only the
    # left side, so the aliased probe column never leaks.
    touched = src.select(F.col(partition_col).alias("__touched_part")).distinct()
    part_match = F.col(partition_col).eqNullSafe(F.col("__touched_part"))
    untouched = target_df.join(touched, on=part_match, how="left_anti")
    in_touched = target_df.join(touched, on=part_match, how="left_semi")
    kept = in_touched.join(src_keys, on=key_cols, how="left_anti")
    return untouched.unionByName(kept).unionByName(surviving)


def validate_partition_stability(
    target_df: DataFrame,
    source_df: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> DataFrame:
    """Violations of the partition-scoped MERGE precondition: source
    rows whose key exists in the target under a DIFFERENT
    ``partition_col`` value. Returns the violating keys with both
    partition values (empty = safe to use ``upsert_merge(...,
    partition_col=...)``). One key-level inner join — the full-target
    pass the partition-scoped merge itself deliberately skips; run it
    when the layout's key->partition immutability is not known by
    construction."""
    t = target_df.select(
        *key_cols, F.col(partition_col).alias("target_part")
    )
    s = source_df.select(
        *key_cols, F.col(partition_col).alias("source_part")
    )
    return (
        s.join(t, on=key_cols)
        .where(~F.col("source_part").eqNullSafe(F.col("target_part")))
        .select(*key_cols, "target_part", "source_part")
    )


def apply_changelog(
    target_df: DataFrame,
    changes_df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """Post-state of applying an ORDERED changelog (Debezium/Delta-CDF
    shape) to a keyed table: ``changes_df`` carries row images plus an
    operation column (``'I'``/``'U'``/``'D'``) and a monotone sequence
    column; a key may appear many times, and only its LATEST event
    matters — insert/update land the row image, delete removes the key.
    The ordered counterpart of :func:`upsert_merge` (which takes one
    deduplicated, unordered delta).

    Net-effect reduction is ONE map-side-combinable ``max_by`` over the
    (sequence, op-rank) order — no window, no per-key sort, so a key
    with 10^6 churn events costs a partial-aggregated shuffle, never a
    single-task sort (the url_dedup discipline). Ties on (key, seq) are
    the changelog corruption CDC systems reject — detected in the SAME
    aggregation (distinct-sequence count vs event count) and RAISED
    in-plan, never resolved silently. A NULL sequence sorts below every
    real sequence (an undated event never wins a dated one); more than
    one NULL-seq event per key is ambiguous and raises like a duplicate.
    Unknown op codes raise per-row. The target then flows through
    exactly ONE anti-join on the net key set (planner/AQE broadcast for
    a small changelog), and net non-deletes are appended.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    net = _net_changes(changes_df, key_cols, seq_col, op_col)
    net_keys = net.select(*key_cols)
    upserts = (
        net.where(F.col("__op") != "D")
        .select(*key_cols, "__row.*")
        .select(*target_df.columns)
    )
    kept = target_df.join(net_keys, on=key_cols, how="left_anti")
    return kept.unionByName(upserts)


def _net_changes(
    changes_df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """Net-effect reduction shared by :func:`apply_changelog` (batch)
    and the streaming CDC apply: one row per key with the winning
    event's payload as struct ``__row``, its op as ``__op``, and its
    ORIGINAL sequence (nullable) as ``__seq`` — via one
    map-side-combinable ``max_by`` on (has-sequence, sequence). The
    ordering is sequence-only: a NULL sequence sorts below EVERY real
    sequence (including a genuine seq of -2^63 — the has-sequence flag,
    not a sentinel value, carries the distinction), and among real
    sequences ties are impossible because duplicate (key, seq) raises
    before ``max_by`` could see one. Carries the in-plan corruption
    guards: duplicate (key, seq), more than one NULL-seq event per key,
    unknown op codes (raised per-row via the guard field)."""
    op_guard = F.when(F.col(op_col).isin(["I", "U", "D"]), F.lit(0)).otherwise(
        F.assert_true(
            F.lit(False),
            F.lit(
                f"apply_changelog: unknown op in '{op_col}' — expected "
                "I/U/D"
            ),
        ).cast("int")
    )
    payload = [
        c
        for c in changes_df.columns
        if c not in (seq_col, op_col) and c not in key_cols
    ]
    ordkey = F.struct(
        # explicit null-flag field: max_by would otherwise skip
        # NULL-keyed structs entirely and an all-NULL-seq key would
        # drop; a coalesce-to-MIN_LONG sentinel would instead collide
        # with a real seq of -2^63 and pass the distinct-seq dup guard
        F.col(seq_col).isNotNull().cast("int").alias("n"),
        F.coalesce(F.col(seq_col).cast("long"), F.lit(0)).alias("s"),
        # constant 0 for every valid op — a per-row validity guard that
        # rides the aggregation, NOT a tiebreak (ties raise above)
        op_guard.alias("g"),
    )
    return (
        changes_df.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(*[F.col(c).alias(c) for c in payload]), ordkey
            ).alias("__row"),
            F.max_by(F.col(op_col), ordkey).alias("__op"),
            F.max_by(F.col(seq_col).cast("long"), ordkey).alias("__seq"),
            F.sum(
                F.when(F.col(seq_col).isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("__null_seq"),
            F.count(F.lit(1)).alias("__n"),
            F.count_distinct(F.col(seq_col)).alias("__n_seq"),
        )
        .withColumn(
            "__dup_guard",
            F.assert_true(
                (F.col("__n") == F.col("__n_seq") + F.col("__null_seq"))
                & (F.col("__null_seq") <= 1),
                F.lit(
                    "apply_changelog: duplicate (key, seq) events — "
                    "corrupt changelog, refusing to resolve silently"
                ),
            ),
        )
        .where(F.col("__dup_guard").isNull())
        .drop("__null_seq", "__n", "__n_seq", "__dup_guard")
    )
