"""Time-series operators: prediction bands and band-aware export.

The reference stores optional per-posting percentile "probability
bands" (ca_offset_score.score_pct5/25/75/95, ca-table.h:89-106) that are
precomputed upstream and carried through load/dump.  Spark-first, the
engine also *generates* them: per-series percentiles over history, the
numbers an upstream job would have computed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prediction_bands(ts: DataFrame, key_col: str = "key",
                     value_col: str = "value") -> DataFrame:
    """Per-series percentile bands (pct5/25/75/95) from history —
    exact linear-interpolation percentiles (matches DuckDB
    quantile_cont)."""
    v = F.col(value_col)
    return (ts.groupBy(key_col)
            .agg(F.round(F.percentile(v, F.lit(0.05)), 4).alias("pct5"),
                 F.round(F.percentile(v, F.lit(0.25)), 4).alias("pct25"),
                 F.round(F.percentile(v, F.lit(0.75)), 4).alias("pct75"),
                 F.round(F.percentile(v, F.lit(0.95)), 4).alias("pct95")))


def with_bands(ts: DataFrame, key_col: str = "key",
               value_col: str = "value") -> DataFrame:
    """Attach the series-level bands to every posting — the shape the
    reference stores (nullable band columns per row) and dumps
    (ca-dump.cc:148-216).  No broadcast hint: the bands table is one
    row per series key, unbounded at scale — Catalyst/AQE broadcasts
    it automatically when (and only when) it is actually small."""
    bands = prediction_bands(ts, key_col, value_col)
    return ts.join(bands, key_col)


def band_outliers(ts: DataFrame, key_col: str = "key",
                  value_col: str = "value") -> DataFrame:
    """Values outside their series' 5-95 band — the monitoring query the
    bands exist for."""
    banded = with_bands(ts, key_col, value_col)
    v = F.col(value_col)
    return (banded
            .filter((v < F.col("pct5")) | (v > F.col("pct95")))
            .withColumn("direction",
                        F.when(v < F.col("pct5"), F.lit("low"))
                        .otherwise(F.lit("high"))))


def asof_prior(events: DataFrame, anchor_filter,
               key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """A11 as-of filter (correlate.cc:360-462 semantics family): keep
    rows strictly older than their key's earliest anchor row, and attach
    that anchor timestamp as ``p_ts``.

    Formulated as a window, not a join: ONE shuffle of the events by
    ``key_col`` computes the per-key anchor minimum in-place.  The
    equivalent aggregate-then-join plan shuffles the events for the join
    AND the anchor subset for the aggregation, and at scale AQE cannot
    rescue it with a broadcast: the runtime stat it sees is the
    pre-final-aggregation map output (one partial row per key per map
    task), which crosses the broadcast threshold long before the true
    aggregate does — measured on 64x events it stays a SortMergeJoin.
    Keys with no anchor row get a NULL ``p_ts`` and are dropped by the
    strict < filter, matching the join's inner semantics.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(key_col)
    p_ts = F.min(F.when(anchor_filter, F.col(ts_col))).over(w)
    return (events.withColumn("p_ts", p_ts)
            .filter(F.col(ts_col) < F.col("p_ts")))
