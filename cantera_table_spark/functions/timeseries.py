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
    (ca-dump.cc:148-216).

    Window formulation: the four percentiles compute IN PLACE over one
    hash shuffle of the postings by series key (a single Window node).
    The former aggregate-then-join carried a one-row-per-SERIES table —
    broadcastable in tests, but past the threshold at corpus scale it
    flips to a sort-merge join that shuffles the postings a second
    time (the asof_prior/bm25 failure class).  Contract: parallelism
    is bounded by DISTINCT SERIES COUNT (each key's rows land in one
    window group) — with many series (the band use case) that exceeds
    the cluster; for a handful of giant series, pre-aggregate
    per-series instead (measured: 64x volume over 5 keys ratio 7.5,
    window-group bound, vs 2-3 for the key-rich operators).

    Rows with a NULL series key are dropped — they belong to no
    series (the former join formulation dropped them as inner-join
    non-matches, and a window would otherwise lump them into one
    meaningless NULL group)."""
    from pyspark.sql import Window
    ts = ts.filter(F.col(key_col).isNotNull())
    w = Window.partitionBy(key_col)
    v = F.col(value_col)
    return ts.select(
        "*",
        F.round(F.percentile(v, F.lit(0.05)).over(w), 4).alias("pct5"),
        F.round(F.percentile(v, F.lit(0.25)).over(w), 4).alias("pct25"),
        F.round(F.percentile(v, F.lit(0.75)).over(w), 4).alias("pct75"),
        F.round(F.percentile(v, F.lit(0.95)).over(w), 4).alias("pct95"))


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
    strict < filter, matching the join's inner semantics.  NULL keys
    are dropped too: an equi-join never matches them, while a window
    would lump them into one group and anchor unrelated rows.
    """
    from pyspark.sql import Window
    events = events.filter(F.col(key_col).isNotNull())
    w = Window.partitionBy(key_col)
    p_ts = F.min(F.when(anchor_filter, F.col(ts_col))).over(w)
    return (events.withColumn("p_ts", p_ts)
            .filter(F.col(ts_col) < F.col("p_ts")))


def funnel(events: DataFrame, stages: list[str],
           key_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Ordered funnel analysis: for each key, how far through the
    ``stages`` sequence it progressed, where stage k counts only if it
    happened strictly AFTER the key's qualifying stage k-1 time.
    Semantics: t_0 = min ts of stage 0; t_k = min ts of stage-k events
    with ts > t_{k-1}; depth = largest k+1 with t_k defined.  Keys
    that never reach stage 0 are omitted (depth would be 0).

    Plan shape: SINGLE PASS — the events are filtered to funnel stages
    before the shuffle, grouped once by the funnel key, and folded in
    timestamp order with a higher-order ``aggregate`` whose state is
    one timestamp per stage.  The events are scanned and shuffled
    exactly once regardless of stage count (the earlier formulation
    joined the events once per stage, re-reading them k-1 times).
    Per-key memory is that key's own funnel events — bounded by user
    activity, not corpus size — and the fold stays in codegen (no
    Python).  Fold correctness: events arrive ts-ascending, so the
    first stage-k event satisfying ts > t_{k-1} IS min(ts > t_{k-1}),
    and any such event sorts after the event that set t_{k-1}.

    Returns (key_col, stage_<k>_ts ..., funnel_depth).
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    n = len(stages)
    ts_type = events.schema[ts_col].dataType.simpleString()
    idx = F.when(F.col(type_col) == stages[0], F.lit(0))
    for k, s in enumerate(stages[1:], start=1):
        idx = idx.when(F.col(type_col) == s, F.lit(k))
    # funnel is an event-time operator over per-key journeys: rows
    # with no event time or no key cannot advance any user's funnel
    # (a NULL key would otherwise fold into one meaningless group)
    ev = (events
          .select(F.col(key_col), F.col(ts_col).alias("_ts"),
                  idx.alias("_s"))
          .filter(F.col("_s").isNotNull() & F.col("_ts").isNotNull() &
                  F.col(key_col).isNotNull()))
    grouped = ev.groupBy(key_col).agg(
        F.sort_array(F.collect_list(F.struct("_ts", "_s"))).alias("_evs"))
    init = F.array(*[F.lit(None).cast(ts_type) for _ in range(n)])

    def _step(acc, e):
        ts, s = e["_ts"], e["_s"]
        slots = []
        for k in range(n):
            open_k = acc[k].isNull() & (s == F.lit(k))
            if k > 0:
                open_k = open_k & acc[k - 1].isNotNull() & (ts > acc[k - 1])
            slots.append(F.when(open_k, ts).otherwise(acc[k]))
        return F.array(*slots)

    folded = grouped.select(
        key_col, F.aggregate("_evs", init, _step).alias("_t"))
    out = (folded
           .select(key_col, *[F.col("_t")[k].alias(f"stage_{k}_ts")
                              for k in range(n)])
           .filter(F.col("stage_0_ts").isNotNull()))
    depth = None
    for k in range(n):
        c = F.when(F.col(f"stage_{k}_ts").isNotNull(), k + 1)
        depth = c if depth is None else F.greatest(depth, c)
    return out.withColumn("funnel_depth", F.coalesce(depth, F.lit(0)))


def retention_cohorts(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts",
                      period_days: int = 7) -> DataFrame:
    """Cohort retention: keys are cohorted by their first-activity
    period; for each (cohort, periods-since-cohort) cell, the count of
    distinct active keys.  The standard activation/retention matrix.

    ONE shuffle of the events carries the whole computation: the
    per-key active-period SET is a map-side-combinable collect_set
    (bounded by the calendar, not the event count), the cohort period
    is its array_min, and the matrix cells count the exploded unique
    (key, period) pairs.  The former formulation joined a
    one-row-per-KEY first-activity aggregate back to the activity
    pairs — broadcastable in tests, a second corpus shuffle at scale
    (the asof_prior/bm25 failure class).  Period =
    floor(epoch_days / period_days).  NULL-timestamp events contribute
    no activity (collect_set skips NULL; the oracle filters the same).
    """
    per = (F.floor(F.unix_micros(F.col(ts_col)) /
                   F.lit(86_400_000_000 * period_days))).cast("long")
    # NULL keys are no user — drop them (collect_set already skips
    # NULL periods; a NULL key would otherwise form its own cohort)
    per_key = (events.filter(F.col(key_col).isNotNull())
               .select(F.col(key_col).alias("k"), per.alias("p"))
               .groupBy("k").agg(F.collect_set("p").alias("__ps")))
    # rows after the explode are unique (k, p) pairs by construction,
    # so count(*) per cell IS the distinct-key count
    return (per_key.select("k",
                           F.array_min("__ps").alias("cohort_p"),
                           F.explode("__ps").alias("p"))
            .groupBy(F.col("cohort_p").alias("cohort_period"),
                     (F.col("p") - F.col("cohort_p"))
                     .alias("periods_since"))
            .agg(F.count("*").alias("n_active")))
