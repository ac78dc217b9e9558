"""Mergeable sketch operators for corpus statistics at 100 TB.

KMV (k-minimum-values) distinct-count sketch: keep the k smallest
hashes of the values seen; estimate distinct = (k-1) / u_(k) where
u_(k) is the k-th smallest hash mapped into (0, 1].  The sketch state
is k doubles per group REGARDLESS of input size, partial states merge
by "union then keep k smallest" (associative + commutative — the same
algebra HyperLogLog/theta sketches formalize), and because the base
hash is the portable md5 prefix shared with the dedup operators, a SQL
oracle replays the sketch EXACTLY: k-min-of-distinct is a deterministic
function of the value set, independent of partitioning and arrival
order — an approximate estimator with an exact replay, so the driver
hash-gate applies to it like to any exact operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmv_distinct(df: DataFrame, value_col: str, group_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate via a KMV sketch.

    Plan: values hash JVM-side to u in (0, 1]; an Arrow-batched
    ``mapInPandas`` keeps the k smallest DISTINCT u per (partition,
    group) — bounded state, no shuffle of the raw values — and one
    groupBy merges the partial lists (flatten -> distinct -> sort ->
    slice k).  Shuffle volume is partitions * groups * k doubles, not
    the corpus.  Groups with fewer than k distinct hashes report the
    exact count.  NULL values are ignored (count-distinct semantics) —
    the NULL drop happens INSIDE the partial, so a group whose values
    are all NULL still surfaces, with est_distinct = 0 and n_mins = 0;
    a NULL group is its own group.

    Returns (group_col, est_distinct, n_mins): the estimate (rounded
    to 4) and the number of retained minima (= min(k, distinct)).

    Numeric/bool/date/timestamp group keys round-trip through their
    canonical STRING form across the Python kernel: Spark's
    Arrow->pandas conversion turns a nullable int64 column into
    float64, which silently rounds ids >= 2^53 (merging distinct
    groups) and folds genuine NaN double groups into the NULL group
    (r10 review finding).  The string cast is exact both ways (integer
    parse; shortest-repr doubles; NaN keeps its own identity) and the
    original type is restored on output.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    gdt = df.schema[group_col].dataType
    roundtrip = isinstance(gdt, (T.NumericType, T.BooleanType,
                                 T.DateType, T.TimestampType))
    gtype = "string" if roundtrip else gdt.simpleString()
    gexpr = (F.col(group_col).cast("string") if roundtrip
             else F.col(group_col))
    # base hash REUSED from dedup.md5_int (r11 review: this was the
    # third inline copy of the portable md5-prefix contract; a prefix-
    # width change must hit every engine-and-oracle pair at once)
    from cantera_table_spark.functions.dedup import md5_int
    hashed = df.select(
        gexpr.alias("g"),
        ((md5_int(F.col(value_col).cast("string")).cast("double") + 1) /
         F.lit(float(1 << 32))).alias("u"))

    def partial(batches):
        state: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g", dropna=False, sort=False):
                gk = None if (not isinstance(g, str) and pd.isna(g)) else g
                mins = np.unique(sub["u"].dropna().to_numpy())[:k]
                prev = state.get(gk)
                state[gk] = (mins if prev is None else
                             np.unique(np.concatenate([prev, mins]))[:k])
        if state:
            yield pd.DataFrame({"g": list(state.keys()),
                                "us": [s.tolist() for s in state.values()]})

    sk = hashed.mapInPandas(partial, f"g {gtype}, us array<double>")
    merged = sk.groupBy("g").agg(
        F.slice(F.array_sort(F.array_distinct(
            F.flatten(F.collect_list("us")))), 1, k).alias("us"))
    n = F.size("us")
    gout = F.col("g").cast(gdt) if roundtrip else F.col("g")
    return merged.select(
        gout.alias(group_col),
        F.when(n < k, n.cast("double"))
        .otherwise(F.round(F.lit(float(k - 1)) / F.element_at("us", k), 4))
        .alias("est_distinct"),
        n.alias("n_mins"))
