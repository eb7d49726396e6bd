"""As-of join — the canonical operator Spark's DataFrame API lacks.

``asof_join(left, right, on, by, payload)``: for each left row, attach the
single most recent right row with ``right.on <= left.on`` within the same
``by`` group (backward as-of). Implemented as a tagged UNION + grouped-map
``applyInPandas``: both sides are stacked into one frame (right columns
pre-renamed), grouped on ``by`` (ONE shuffle total), and each group is
split back apart in pandas where ``merge_asof`` runs the linear
two-pointer merge.

Why not ``cogroup``: under some terminal plans (e.g. ``count()``) Catalyst
prunes the cogroup's right child down to the grouping key before it
reaches the Python worker (verified on Spark 4.1.2: the right frame
arrives with only ``[key]``), silently breaking the UDF. Grouped-map over
a union does not exhibit the pruning and uses one shuffle instead of two.

Scale shape: one hash shuffle on ``by`` + O(n log n) per-group sorts;
skewed ``by`` keys are the hazard (one user with millions of events lands
in one group) — :func:`asof_join_salted` pre-splits every group on a time
bucket and patches the boundary with a carry-in row, producing identical
output (property-tested) with the hot key spread across tasks.

Determinism: callers should ensure the right side has unique ``(by, on)``
pairs (dedupe first) — equal-timestamp ties resolve differently across
engines, so the oracle contract requires uniqueness.

The DuckDB oracle uses its native ``ASOF JOIN`` — two independent
implementations of the same semantics.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "asof_join_salted"]


def _output_shape(left, right, on, by, payload, suffix):
    """Shared output-schema derivation: left columns + matched right
    timestamp + suffixed payload columns (all right side nullable)."""
    left_fields = list(left.schema.fields)
    r_on = on + suffix
    right_out_fields = [T.StructField(r_on, right.schema[on].dataType, True)] + [
        T.StructField(c + suffix, right.schema[c].dataType, True) for c in payload
    ]
    out_fields = left_fields + right_out_fields
    return (
        left_fields,
        [f.name for f in left_fields],
        r_on,
        [c + suffix for c in payload],
        right_out_fields,
        T.StructType(out_fields),
        [f.name for f in out_fields],
    )


def _make_merge(by, on, r_on, left_names, r_payload, right_out_fields, out_names):
    """Grouped-map kernel shared by the plain and salted paths: split the
    tagged union back into sides and run pandas merge_asof."""

    def _no_match(lpdf: pd.DataFrame) -> pd.DataFrame:
        out = lpdf.copy()
        for f in right_out_fields:
            out[f.name] = None
        return out[out_names]

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["_side"] == 0][left_names]
        if len(lpdf) == 0:
            return pd.DataFrame(columns=out_names)
        # SQL join semantics for NULLs: a NULL key or NULL timestamp never
        # matches — merge_asof would instead RAISE on null keys (pandas
        # 'Merge keys contain null values'), so nulls are split out up
        # front: null-ts left rows get a no-match result, null-ts right
        # rows are dropped, and the all-null `by` group matches nothing
        key_is_null = pdf[by].isna().any()
        l_null = lpdf[lpdf[on].isna()]
        lpdf = lpdf[lpdf[on].notna()].sort_values([on] + left_names).reset_index(drop=True)
        rpdf = pdf[pdf["_side"] == 1][[r_on] + r_payload]
        rpdf = rpdf[rpdf[r_on].notna()]
        parts = []
        if len(l_null):
            parts.append(_no_match(l_null))
        if len(lpdf):
            if key_is_null or len(rpdf) == 0:
                parts.append(_no_match(lpdf))
            else:
                rpdf = rpdf.sort_values(r_on).reset_index(drop=True)
                parts.append(
                    pd.merge_asof(
                        lpdf, rpdf, left_on=on, right_on=r_on, direction="backward"
                    )[out_names]
                )
        return pd.concat(parts) if parts else pd.DataFrame(columns=out_names)

    return merge


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    payload: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join.

    Output = all left columns + ``on+suffix`` (the matched right timestamp)
    + each payload column as ``col+suffix``; NULLs when no right row at or
    before the left timestamp exists.
    """
    (left_fields, left_names, r_on, r_payload,
     right_out_fields, out_schema, out_names) = _output_shape(
        left, right, on, by, payload, suffix
    )

    # tagged union: left rows carry NULL right columns and vice versa
    lpart = left.withColumn("_side", F.lit(0))
    for f in right_out_fields:
        lpart = lpart.withColumn(f.name, F.lit(None).cast(f.dataType))
    rpart = right.select(
        F.col(by),
        F.col(on).alias(r_on),
        *[F.col(c).alias(c + suffix) for c in payload],
    ).withColumn("_side", F.lit(1))
    for f in left_fields:
        if f.name != by:
            rpart = rpart.withColumn(f.name, F.lit(None).cast(f.dataType))
    cols = left_names + [r_on] + r_payload + ["_side"]
    union = lpart.select(*cols).unionByName(rpart.select(*cols))
    merge = _make_merge(by, on, r_on, left_names, r_payload, right_out_fields, out_names)
    return union.groupBy(by).applyInPandas(merge, out_schema)


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    payload: list[str],
    suffix: str = "_r",
    bucket_width: str = "1 hour",
) -> DataFrame:
    """Backward as-of join with hot-key mitigation — identical output
    contract to :func:`asof_join` (property-tested equal).

    A skewed ``by`` key (one user holding most events) lands an entire
    group on one task in the plain path. Here each group is pre-split on a
    TIME BUCKET (``F.window(on, bucket_width)``), so a hot key's events
    spread across (key, bucket) tasks, and correctness across the split is
    restored by a boundary patch: for every left bucket, the single most
    recent right row from any EARLIER bucket (the carry-in) is replicated
    into that bucket's group, so a backward match can still reach across
    the boundary. The carry-in is a RUNNING lexicographic struct max over
    the per-(key, bucket) aggregates (window ``rowsBetween(unboundedPreceding,
    -1)``) — O(B log B) total per key in the bucket count, never O(B²)
    join rows and never the event stream; right ``(by, on)`` uniqueness
    makes the argmax exact.

    Shuffle shape: one big hash shuffle on ``(by, bucket)`` for the
    events (the split one), plus one small aggregate + one window sort
    for the patch.
    """
    (left_fields, left_names, r_on, r_payload,
     right_out_fields, out_schema, out_names) = _output_shape(
        left, right, on, by, payload, suffix
    )

    def bucket_of(col: str):
        return F.window(F.col(col), bucket_width)["start"]

    lpart = left.withColumn("_side", F.lit(0)).withColumn("_b", bucket_of(on))
    for f in right_out_fields:
        lpart = lpart.withColumn(f.name, F.lit(None).cast(f.dataType))

    rbase = right.select(
        F.col(by),
        F.col(on).alias(r_on),
        *[F.col(c).alias(c + suffix) for c in payload],
    ).withColumn("_b", bucket_of(r_on))

    # boundary patch: latest right row per (by, bucket), then for each LEFT
    # bucket the latest of those from strictly earlier buckets. Computed as
    # a RUNNING max over the per-bucket aggregates, not a (R._b < L._b)
    # theta join: the join materializes O(B²/2) intermediate rows per key
    # (a hot key spanning 3 years of 1-hour buckets ≈ 26k buckets → ~340M
    # rows — the very blowup the salt exists to avoid), while the window
    # scan is O(B log B) per key with identical semantics. Left markers
    # order BEFORE same-bucket right aggregates so "preceding rows" sees
    # only strictly-earlier right buckets; max() skips the markers' NULLs.
    last_per = (
        rbase.where(F.col(r_on).isNotNull())  # null ts never carries (SQL <)
        .groupBy(by, "_b")
        .agg(F.max(F.struct(F.col(r_on), *[F.col(c) for c in r_payload])).alias("_last"))
    )
    null_last = F.lit(None).cast(last_per.schema["_last"].dataType)
    marks = (
        lpart.select(by, "_b").distinct()
        .withColumn("_last", null_last).withColumn("_ord", F.lit(0))
        .unionByName(last_per.withColumn("_ord", F.lit(1)))
    )
    w = (
        Window.partitionBy(by)
        .orderBy("_b", "_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        marks.withColumn("_carry", F.max("_last").over(w))
        .where((F.col("_ord") == 0) & F.col("_carry").isNotNull())
        .select(
            F.col(by),
            F.col("_b"),
            F.col("_carry").getField(r_on).alias(r_on),
            *[F.col("_carry").getField(c).alias(c) for c in r_payload],
        )
    )
    rpart = rbase.unionByName(carry).withColumn("_side", F.lit(1))
    for f in left_fields:
        if f.name != by:
            rpart = rpart.withColumn(f.name, F.lit(None).cast(f.dataType))

    cols = left_names + [r_on] + r_payload + ["_side", "_b"]
    union = lpart.select(*cols).unionByName(rpart.select(*cols))
    merge = _make_merge(by, on, r_on, left_names, r_payload, right_out_fields, out_names)
    return union.groupBy(by, "_b").applyInPandas(merge, out_schema)
