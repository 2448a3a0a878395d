"""Salted two-phase per-group top-k — a tightening of the
``row_number() <= k`` idiom for GROUP KEYS of small cardinality.

What Catalyst already does: a rank-function filter gets a map-side
WindowGroupLimit (pinned by test_sample_topk_gets_window_group_limit),
so each input partition forwards at most k rows per group and the final
G-key window sorts ≤ input_partitions·k rows per group — NOT corpus-sized
input. (r7 initially claimed otherwise; measured plans corrected it.)

What this helper adds: the per-group final-sort input becomes a CONSTANT
≤ _SALT·k instead of growing with the scan's partition count — the
difference between a 1280-row and a 10M-row single-task sort at the
1e5-partition scan widths a 100 TB corpus implies. Phase 1 ranks inside
(group, pmod(salt_col, _SALT)) at full parallelism (itself
WindowGroupLimit-protected); phase 2 ranks the ≤ |groups|·_SALT·k
survivors.

The two-phase form is EXACT, not approximate, whenever the ORDER is a
total order on each group's rows (every call site orders by a unique
tiebreak column): every global top-k row ranks ≤ k inside its own
(group, salt) slice too, so phase 1 provably retains the global top-k,
and result rows AND rank numbers are identical to the single-window form
under any partitioning. The salt derives from a data column (not
spark_partition_id), so the intermediate — not just the result — is
partitioning-independent.

High-cardinality group keys (custkey, user_id, the bulk classifier's
query_id) don't need any of this and keep the plain window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Phase-1 parallelism is |groups|·_SALT rank slices; phase-2 input is
# ≤ |groups|·_SALT·k rows — constant in corpus size and scan width. 64
# saturates the 32-core local box and spreads a 1000-executor cluster.
_SALT = 64


def salted_survivors(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_col: str,
) -> DataFrame:
    """Phase 1 only: the ≤ k rows per (group, salt) slice — a provable
    superset of each group's global top-k under the same total order
    (callers that need several rank flavors — window_rank's
    rank/dense_rank — re-rank the survivors themselves; any row ranked
    ≤ k globally has ALL rows above it surviving too, so ranks computed
    on survivors match the full-input ranks for the kept rows)."""
    w1 = W.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    return (
        df.withColumn("_salt", F.pmod(F.col(salt_col).cast("long"), F.lit(_SALT)))
        .withColumn("_prk", F.row_number().over(w1))
        .filter(F.col("_prk") <= k)
        .drop("_salt", "_prk")
    )


def salted_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str,
    salt_col: str,
) -> DataFrame:
    """Exact per-group top-k with rank numbers, as the two-phase rank.
    ``order_cols`` MUST totally order each group's rows (include a unique
    tiebreak) — that is what makes the phase-1 cut lossless."""
    w2 = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        salted_survivors(df, group_cols, order_cols, k, salt_col)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def bucketed_global_rank(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    bucket_width: int,
    rank_col: str = "rn",
    count_col: str = "n",
) -> DataFrame:
    """Exact 1-based global rank per group ordered by (value_col ASC,
    tiebreak_col ASC), plus the group's total count — WITHOUT a
    group-keyed window over the full input. Rank-producing windows get no
    WindowGroupLimit protection (every row is output), so on a small-key
    group (o_orderpriority: 5, c_mktsegment: 5) the plain form sorts
    corpus/G rows per task at scale.

    Two-level form (the pack_sequences prefix-sum pattern with the sort
    key as the bucket axis): rows bucket by floor(value/bucket_width) —
    monotone in the sort order, needs NO domain bound and no
    repartitionByRange sampling job — level 1 ranks inside
    (group, bucket) at full parallelism, level 2 cumulates per-bucket
    counts per group (tiny), and rank = bucket offset + local rank.
    Value-identical to row_number() OVER (PARTITION BY group ORDER BY
    value, tiebreak) under any partitioning (ties on value break by the
    unique tiebreak INSIDE one bucket, since equal values share a
    bucket). NULL values rank FIRST (Spark's ASC NULLS FIRST default) via
    a sentinel bucket below every real one, and the offsets join back
    null-safely so NULL group keys keep forming their own group — both
    NULL behaviors are equivalence-pinned (r7 review: the first cut
    silently dropped NULL rows while still counting them). Callers
    wanting DESC order pre-negate value_col. Value skew concentrates a
    bucket; its local sort is still bounded by that value-range's rows.
    Parallelism is |groups|·|occupied buckets| — pick bucket_width so the
    value domain yields well over the cluster's core count; the level-2
    table stays tiny either way. Columns named _bkt/_lrn/_off/_bn are
    RESERVED (raises) and rank_col/count_col must be fresh."""
    reserved = {"_bkt", "_lrn", "_off", "_bn", "_obkt", rank_col, count_col}
    reserved.update(f"_og_{g}" for g in group_cols)
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(f"bucketed_global_rank: input columns collide: {sorted(clash)}")
    sized = df.withColumn(
        "_bkt",
        F.when(F.col(value_col).isNull(), F.lit(-(1 << 62))).otherwise(
            F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
        ),
    )
    wcum = W.partitionBy(*group_cols).orderBy("_bkt").rowsBetween(
        W.unboundedPreceding, -1
    )
    offs = (
        sized.groupBy(*group_cols, "_bkt")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .select(
            *group_cols,
            F.col("_bkt").alias("_obkt"),
            F.coalesce(F.sum("_bn").over(wcum), F.lit(0)).cast("long").alias("_off"),
            F.sum("_bn").over(W.partitionBy(*group_cols)).cast("long").alias(count_col),
        )
        .withColumnsRenamed({c: f"_og_{c}" for c in group_cols})
    )
    wloc = W.partitionBy(*group_cols, "_bkt").orderBy(
        F.asc(value_col), F.asc(tiebreak_col)
    )
    cond = F.col("_bkt") == F.col("_obkt")
    for g in group_cols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"_og_{g}"))
    return (
        sized.withColumn("_lrn", F.row_number().over(wloc))
        .join(offs, cond)
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_bkt", "_obkt", "_off", "_lrn", *[f"_og_{g}" for g in group_cols])
    )
