"""CORRELATE — supervised feature mining (reference correlate.cc).

``CORRELATE QUERY (a), (b)`` finds the index keywords most predictive of
membership in set A vs set B:

1. A = ProcessQuery(query_a, use_max=False); B = ProcessQuery(query_b)
   minus A (correlate.cc:495-500).
2. prior_logit = log((|A|+1)/(|B|+1)); min-support limits = 5 % of each
   set (correlate.cc:506-518).
3. Per keyword: boolean features (all scores zero) score their mere
   presence; continuous features search the single best split point by
   |logit gain| over the cumulative class distribution
   (ProcessSeries, correlate.cc:197-358), then re-count on the chosen
   sub-range(s).
4. Contingency counting dedups docs and keeps keywords with
   match_A >= limit_A or match_B >= limit_B and |log_odds| >= log(.55/.45)
   (ProcessRange, correlate.cc:84-147).

Spark-first: the reference loops keywords over a thread pool; here every
stage is a single DataFrame pipeline partitioned by keyword — the
per-keyword cumulative scan is a Window.partitionBy(keyword)
.orderBy(score) with rangeBetween (ties collapse exactly like the
reference's ``agg`` array), and the split argmax is one row_number.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cantera_table_spark.dsl import ast as _ast

LOGIT_CUTOFF = math.log(0.55 / 0.45)   # correlate.cc:141-142
# The output filter compares the ROUNDED 3-decimal log-odds (the output
# contract's precision) against the rounded cutoff, a deliberate
# micro-divergence from correlate.cc's unrounded comparison: the raw
# cutoff is a transcendental, so an input whose true log-odds equals it
# exactly is decided by the last ulp of whichever libm evaluated it
# (JVM Math.log vs glibc), and the two engines legitimately disagree.
# Comparing exact 3-decimal doubles removes the knife edge — both
# engines (and the DuckDB gate oracles) decide the boundary
# identically; the only remaining float hazard is the rounding itself,
# which the property-test guard rejects.  Semantics shift only for
# |log_odds| in [0.2005, ln(11/9)) — a 1.7e-4-wide band below the
# reference's cutoff that now emits.
LOGIT_CUTOFF_R3 = math.floor(LOGIT_CUTOFF * 1000.0 + 0.5) / 1000.0  # 0.201
MIN_GAIN = math.log(1.05)              # correlate.cc:346

# Broadcast the qualifying-keyword list into the split-search join
# (local default): AQE cannot re-plan the cached-histogram side, so
# without the hint the join executes sort-merge even when the keyword
# list is tiny.  Set =0 when the vocabulary itself is too large to
# broadcast (web-scale corpora) — the planner then keeps its
# size-based fallback.  Read per call (not at import) so a long-lived
# session can toggle it (r12 ADVICE).
def _broadcast_kw() -> bool:
    return os.environ.get(
        "SPARK_GRAFT_CORRELATE_BROADCAST_KW", "1") != "0"


def _persist(df: DataFrame) -> DataFrame:
    """Persist policy for the class-joined postings (SCALE.md).

    ``CANTERA_CORRELATE_PERSIST`` picks the StorageLevel by name
    (MEMORY_AND_DISK default — the table is read by four downstream
    branches; recomputing it means four full postings scans), or NONE
    to skip persisting entirely (the at-100 TB choice when the postings
    working set exceeds cluster cache and recompute-from-columnar-scan
    is cheaper than disk-spilled cache blocks)."""
    level = os.environ.get("CANTERA_CORRELATE_PERSIST", "MEMORY_AND_DISK")
    if level.upper() == "NONE":
        return df
    from pyspark import StorageLevel
    return df.persist(getattr(StorageLevel, level.upper()))

_POS_INF = float("inf")
_NEG_INF = float("-inf")


def correlate_sets(postings: DataFrame, set_a: DataFrame, set_b: DataFrame,
                   caches: list | None = None,
                   unique_docs: bool = False,
                   presplit: bool = False) -> DataFrame:
    """Core pipeline given resolved doc sets.

    postings: (keyword, doc_id, score) — the feature space.
    set_a / set_b: (doc_id, score) — deduped result sets; B is made
    disjoint from A here.
    unique_docs: promise that ``postings`` has at most one row per
    (keyword, doc_id) — true for an Engine with ``unique_postings``
    (and preserved by the timestamp filters, which group per doc).
    The contingency count then uses a plain conditional count instead
    of countDistinct, skipping Spark's expand + second shuffle.
    presplit: promise that set_a / set_b are each already one row per
    doc_id AND mutually disjoint (corr02 builds them by splitting one
    grouped table on a score predicate) — skips the two distinct
    shuffles and the disjointing anti-join.

    Returns (log_odds, match_count_a, match_count_b, keyword, min_score,
    max_score) with null min/max for unbounded ends.

    Scale shape (r12, guide §2.3-2.4): the postings cross the network
    ONCE — into the per-(keyword, score) histogram ``h`` — and every
    downstream stage (feature-kind detection, the min-support
    prefilter, the cumulative split search, and the unique-docs
    contingency count) consumes the histogram, whose size is the
    number of DISTINCT score values per keyword, not the posting
    count.  The r11 shape shuffled the postings four times (kw_ok
    groupBy + join, kind groupBy, per_score groupBy, counted groupBy).
    The reference's min-support keyword prefilter (correlate.cc:
    541-543) is applied on the histogram rollup: output-identical,
    because a keyword with fewer postings than min(limit_a, limit_b)
    can never reach either limit in the final match-count filter.
    Only the exact-doc contingency count without the ``unique_docs``
    promise still needs the raw class-joined rows (countDistinct over
    doc_id).

    Intermediates (the histogram and the tiny per-keyword kind/split
    tables) are Spark-cached because several downstream branches reuse
    them; pass ``caches`` (a list) to receive the cached DataFrames so
    a long-lived session can ``unpersist()`` them after consuming the
    result (Engine.release_caches does this).
    """
    if caches is None:
        caches = []
    if presplit:
        a = set_a.select("doc_id")
        b = set_b.select("doc_id")
    else:
        a = set_a.select("doc_id").distinct()
        b = set_b.select("doc_id").distinct().join(a, "doc_id", "left_anti")

    n_a = a.count()
    n_b = b.count()
    if n_a == 0 or n_b == 0:
        # Reference short-circuit (correlate.cc:501: ``if
        # (offsets_A.empty() || offsets_B.empty()) return;`` — B
        # checked AFTER the disjoint subtraction, as here): an empty
        # class emits NOTHING.  The +1-smoothed math would be
        # well-defined with n=0 and features concentrated in the
        # non-empty class would clear the cutoff (count_b=0 rows),
        # but the reference deliberately declines to rank against an
        # empty contrast class, and parity wins (r11 review finding —
        # the earlier comment here argued the math without citing the
        # reference's early return; ref_model mirrors this return).
        return set_a.sparkSession.createDataFrame(
            [], "log_odds double, match_count_a long, "
                "match_count_b long, keyword string, "
                "min_score double, max_score double")
    prior_logit = math.log((n_a + 1.0) / (n_b + 1.0))
    limit_a = max(n_a // 20, 1)
    limit_b = max(n_b // 20, 1)
    min_limit = min(limit_a, limit_b)

    # Class membership per posting row: +1 in A, -1 in B, null otherwise
    # (disjoint after subtraction, correlate.cc:246-265).
    k = (postings
         .join(a.withColumn("__in_a", F.lit(1)), "doc_id", "left")
         .join(b.withColumn("__in_b", F.lit(1)), "doc_id", "left")
         .withColumn("cls", F.when(F.col("__in_a") == 1, F.lit(1))
                     .when(F.col("__in_b") == 1, F.lit(-1)))
         .select("keyword", "doc_id", "score", "cls"))
    if not unique_docs:
        # the exact-doc contingency count below re-consumes the raw
        # class-joined rows; without the persist that branch re-runs
        # the postings scan + class joins
        k = _persist(k)
        caches.append(k)

    # THE one postings-scale shuffle: per-(keyword, distinct score)
    # class histogram.  Collapses ties exactly like the reference's
    # ``agg`` array (correlate.cc:282-300); map-side combinable, so a
    # score repeated a billion times combines per input partition.
    h = (k.groupBy("keyword", "score")
         .agg(F.count(F.when(F.col("cls") == 1, 1)).alias("__n_a"),
              F.count(F.when(F.col("cls") == -1, 1)).alias("__n_b"),
              F.count(F.col("cls")).alias("__n_cls"),
              F.count("*").alias("__n_all")))
    h = _persist(h)
    caches.append(h)

    # --- split search on continuous keywords --------------------------
    # boolean feature <=> every score is zero (correlate.cc:211-217).
    # kind / split are tiny (one row per keyword) but feed four task
    # branches each — cache them so the histogram rollup runs once, not
    # once per branch.  __n_rows carries the reference's min-support
    # keyword prefilter (correlate.cc:541-543), now a histogram rollup
    # instead of a postings-scale groupBy + join.
    kind = h.groupBy("keyword").agg(
        (F.max(F.abs(F.col("score"))) > 0.0).alias("__continuous"),
        F.sum("__n_cls").alias("__n_classes"),
        F.sum("__n_all").alias("__n_rows")).cache()
    caches.append(kind)

    # per-(keyword, score) rows restricted to CLASS rows of qualifying
    # continuous keywords — the r11 per_score table, read straight off
    # the histogram (__n_cls >= 1 drops score values seen only on
    # class-less postings, which the r11 groupBy over class rows never
    # produced; n_classes >= min_limit implies n_rows >= min_limit, so
    # the keyword prefilter is subsumed here)
    # broadcast hint on the per-keyword metadata (one short row per
    # qualifying keyword — the same relation the r11 planner already
    # broadcast by size estimate): without it the histogram side is a
    # cached relation AQE cannot re-plan around, and the initial
    # SortMergeJoin survives to execution.  Env-gated, NOT forced: the
    # qualifying set is vocabulary-scale, and a web-scale vocabulary
    # must keep the planner's sort-merge fallback — set
    # SPARK_GRAFT_CORRELATE_BROADCAST_KW=0 there (the hint removes the
    # size-based safety net a plain join keeps).
    kw_q = (kind.filter(F.col("__continuous") &
                        (F.col("__n_classes") >= min_limit))
            .select("keyword"))
    if _broadcast_kw():
        kw_q = F.broadcast(kw_q)
    per_score = (h.filter(F.col("__n_cls") >= 1)
                 .join(kw_q, "keyword")
                 .select("keyword", "score", "__n_a", "__n_b",
                         F.col("__n_cls").alias("__n_ab")))
    w_cum = (Window.partitionBy("keyword").orderBy("score")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy("keyword")
    cum = (per_score
           .withColumn("cum_a", F.sum("__n_a").over(w_cum))
           .withColumn("cum_b", F.sum("__n_b").over(w_cum))
           .withColumn("cum_ab", F.sum("__n_ab").over(w_cum))
           .withColumn("tot_a", F.sum("__n_a").over(w_tot))
           .withColumn("tot_b", F.sum("__n_b").over(w_tot))
           .withColumn("tot_ab", F.sum("__n_ab").over(w_tot))
           .select("keyword", "score", "cum_a", "cum_b", "cum_ab",
                   "tot_a", "tot_b", "tot_ab"))

    def abs_logit(ca, cab):
        # log(P/(1-P)) with P=(ca+1)/(cab+2) simplifies to the form below;
        # the simplified form is used on both engines so floats agree.
        return F.abs(F.log((ca + 1.0) / (cab - ca + 1.0)) -
                     F.lit(prior_logit))

    left_ok = (F.col("cum_a") >= limit_a) | (F.col("cum_b") >= limit_b)
    right_ok = ((F.col("tot_a") - F.col("cum_a") >= limit_a) |
                (F.col("tot_b") - F.col("cum_b") >= limit_b))
    cand = (cum
            .withColumn("__left", F.when(left_ok, abs_logit(
                F.col("cum_a"), F.col("cum_ab"))).otherwise(F.lit(0.0)))
            .withColumn("__right", F.when(right_ok, abs_logit(
                F.col("tot_a") - F.col("cum_a"),
                F.col("tot_ab") - F.col("cum_ab"))).otherwise(F.lit(0.0)))
            .withColumn("__gain", F.greatest("__left", "__right")))

    # first/last distinct score per keyword + the next distinct score
    # (the split emits ranges (-inf, mid] and [next, inf),
    # correlate.cc:344-356)
    w_ord = Window.partitionBy("keyword").orderBy("score")
    w_all = Window.partitionBy("keyword")
    cand = (cand
            .withColumn("__next", F.lead("score").over(w_ord))
            .withColumn("__pos", F.row_number().over(w_ord))
            .withColumn("__npos", F.count("*").over(w_all)))
    best = (cand
            .withColumn("__rk", F.row_number().over(
                Window.partitionBy("keyword")
                .orderBy(F.col("__gain").desc(), F.col("score").asc())))
            .filter(F.col("__rk") == 1))

    split = (best
             .withColumn("__use_split",
                         (F.col("__pos") > 1) &
                         (F.col("__pos") < F.col("__npos")) &
                         (F.col("__gain") >= MIN_GAIN))
             .select("keyword", "__use_split",
                     F.col("score").alias("__mid"),
                     F.col("__next").alias("__next_score"))).cache()
    caches.append(split)

    # --- assemble range tasks -----------------------------------------
    # whole-range: boolean keywords + continuous without a useful split;
    # continuous keywords with too few class rows are dropped entirely
    # (correlate.cc:271: classes.empty() || < min_limit -> return).
    # Boolean keywords additionally carry the min-support prefilter
    # (the continuous branches inherit it through __n_classes).
    bool_tasks = (kind.filter(~F.col("__continuous") &
                              (F.col("__n_rows") >= min_limit))
                  .select("keyword", F.lit(None).cast("double").alias("lo"),
                          F.lit(None).cast("double").alias("hi")))
    nosplit_tasks = (split.filter(~F.col("__use_split"))
                     .select("keyword", F.lit(None).cast("double").alias("lo"),
                             F.lit(None).cast("double").alias("hi")))
    left_tasks = (split.filter(F.col("__use_split"))
                  .select("keyword", F.lit(None).cast("double").alias("lo"),
                          F.col("__mid").alias("hi")))
    right_tasks = (split.filter(F.col("__use_split"))
                   .select("keyword", F.col("__next_score").alias("lo"),
                           F.lit(None).cast("double").alias("hi")))
    tasks = (bool_tasks.unionByName(nosplit_tasks)
             .unionByName(left_tasks).unionByName(right_tasks))

    # --- ProcessRange: contingency counts per (keyword, range) --------
    # with unique postings, counting matching docs = counting matching
    # rows = summing the histogram's per-score class counts, so the
    # count consumes the (cached) histogram instead of the raw
    # postings; only exact doc dedup (countDistinct) needs the rows
    in_range = ((F.col("lo").isNull() | (F.col("score") >= F.col("lo"))) &
                (F.col("hi").isNull() | (F.col("score") <= F.col("hi"))))
    if unique_docs:
        counted = (h.join(tasks, "keyword")
                   .filter(in_range)
                   .groupBy("keyword", "lo", "hi")
                   .agg(F.sum("__n_a").alias("match_count_a"),
                        F.sum("__n_b").alias("match_count_b")))
    else:
        # exact doc dedup without unique postings: collapse the raw
        # class rows to ONE row per (keyword, doc_id) carrying the
        # doc's class (cls joins on doc_id alone, so it is constant
        # within the group) and its score envelope — a map-side
        # combinable aggregate, so ties collapse before the shuffle.
        # A doc then has a posting inside a task's range iff the range
        # overlaps [min_s, max_s]: exact because every task assembled
        # above is one-sided or unbounded (bool/nosplit: whole range;
        # left: (-inf, mid]; right: [next, +inf)) — a two-sided task
        # would need per-score data and must not reuse this test.
        # Replaces the r12 countDistinct over raw class rows, whose
        # two-distinct-aggregate Expand doubled the postings-scale
        # shuffle and re-shuffled every posting occurrence per
        # matching task (guide §2.3: shuffle fewer bytes; §2.4).
        kd = (k.filter(F.col("cls").isNotNull())
              .groupBy("keyword", "doc_id")
              .agg(F.first("cls").alias("cls"),
                   F.min("score").alias("__min_s"),
                   F.max("score").alias("__max_s")))
        overlaps = ((F.col("lo").isNull() |
                     (F.col("__max_s") >= F.col("lo"))) &
                    (F.col("hi").isNull() |
                     (F.col("__min_s") <= F.col("hi"))))
        counted = (kd.join(tasks, "keyword")
                   .filter(overlaps)
                   .groupBy("keyword", "lo", "hi")
                   .agg(F.count(F.when(F.col("cls") == 1, 1))
                        .alias("match_count_a"),
                        F.count(F.when(F.col("cls") == -1, 1))
                        .alias("match_count_b")))

    out = (counted
           .filter((F.col("match_count_a") >= limit_a) |
                   (F.col("match_count_b") >= limit_b))
           .withColumn("log_odds",
                       F.round(F.log((F.col("match_count_a") + 1.0) /
                                     (F.col("match_count_b") + 1.0)) -
                               F.lit(prior_logit), 3))
           .filter(F.abs(F.col("log_odds")) >= F.lit(LOGIT_CUTOFF_R3))
           .select("log_odds",
                   "match_count_a", "match_count_b", "keyword",
                   F.col("lo").alias("min_score"),
                   F.col("hi").alias("max_score")))
    return out


def filter_by_timestamp_sets(keys: DataFrame, set_a: DataFrame,
                             set_b: DataFrame,
                             unique_rows: bool = False) -> DataFrame:
    """FilterByTimestamp(keys, A, B) (correlate.cc:400-462): for docs in
    A (preferred) or B, keep one row per doc when the doc's earliest key
    timestamp precedes its earliest set timestamp; score becomes the age
    delta.  Docs in neither set are dropped.

    unique_rows: promise that ``keys`` already has one row per
    (keyword, doc_id) and each set one row per doc_id (corr02 feeds
    all three from one per-(keyword, doc) min-aggregate) — the three
    min-groupBys are then identity maps and their shuffles are skipped
    (guide §2.4: a distinct/groupBy on data that is already unique is
    an accidental exchange)."""
    if unique_rows:
        kmin = keys.select("keyword", "doc_id",
                           F.col("score").alias("k_score"))
        amin = set_a.select("doc_id", F.col("score").alias("a_score"))
        bmin = set_b.select("doc_id", F.col("score").alias("b_score"))
    else:
        kmin = keys.groupBy("keyword", "doc_id").agg(
            F.min("score").alias("k_score"))
        amin = set_a.groupBy("doc_id").agg(F.min("score").alias("a_score"))
        bmin = set_b.groupBy("doc_id").agg(F.min("score").alias("b_score"))
    j = (kmin.join(amin, "doc_id", "left").join(bmin, "doc_id", "left")
         .withColumn("ref_score", F.coalesce("a_score", "b_score"))
         .filter(F.col("ref_score").isNotNull())
         .filter(F.col("k_score") < F.col("ref_score")))
    return j.select("keyword", "doc_id",
                    (F.col("ref_score") - F.col("k_score")).alias("score"))


def filter_by_timestamp_now(keys: DataFrame, set_a: DataFrame,
                            now_days: float) -> DataFrame:
    """FilterByTimestamp(keys, adj, now) (correlate.cc:360-398): docs in
    the set keep one age-delta row; docs outside keep every row scored
    ``now - score`` — but only docs *below the set's last offset*: the
    reference merge loop exits when the adj cursor is exhausted and
    erases every remaining key row, so unmatched docs beyond max(adj
    doc_id) are dropped.  Transcribed faithfully, quirk included."""
    amin = set_a.groupBy("doc_id").agg(F.min("score").alias("a_score"))
    kmin = keys.groupBy("keyword", "doc_id").agg(
        F.min("score").alias("k_score"))
    matched = (kmin.join(amin, "doc_id")
               .filter(F.col("k_score") < F.col("a_score"))
               .select("keyword", "doc_id",
                       (F.col("a_score") - F.col("k_score")).alias("score")))
    max_a = amin.agg(F.max("doc_id").alias("__max_a"))
    unmatched = (keys.join(amin.select("doc_id"), "doc_id", "left_anti")
                 .crossJoin(F.broadcast(max_a))
                 .filter(F.col("doc_id") < F.col("__max_a"))
                 .select("keyword", "doc_id",
                         (F.lit(now_days) - F.col("score")).alias("score")))
    return matched.unionByName(unmatched)


def primary_keyword(q) -> str:
    """PrimaryKeywordForQuery (correlate.cc:464-471), faithfully: a
    Leaf returns its identifier; ANY other node commits to its lhs
    subtree UNCONDITIONALLY when one exists — even when that subtree
    bottoms out in a non-Leaf terminal (``KEY=x``) and yields '' —
    then rhs, then ''.  The previous any-subtree fallback kept
    searching rhs after an empty lhs, so ``CORRELATE (KEY=x AND
    ts:date), (b)`` wrongly inherited rhs's timestamped kind and
    silently switched on event-prediction filtering (r11 review
    finding)."""
    if isinstance(q, _ast.Leaf):
        return q.identifier
    lhs = getattr(q, "lhs", None)
    if lhs is not None:
        return primary_keyword(lhs)
    rhs = getattr(q, "rhs", None)
    if rhs is not None:
        return primary_keyword(rhs)
    return ""


def correlate(engine, query_a, query_b) -> DataFrame:
    """Statement entry: resolve the two queries through the engine's
    compiler, apply timestamped-feature filtering when query A's primary
    keyword is timestamped (correlate.cc:486-491, 560-566), and run the
    pipeline over the whole index."""
    import time as _time


    comp = engine._compiler()
    set_a = comp.process_query(query_a, use_max=False)
    set_b = comp.process_query(query_b, use_max=False)

    def kind_match_col(meta, kind):
        """Column expression for keyword-kind matching (JVM-side — a
        Python UDF here would both unpickle-crash on the captured
        catalog and drop the filter out of codegen).  Regex patterns are
        anchored to FULL matches, mirroring Catalog._match_kind and the
        reference's RE2::FullMatch (keywords.cc:66-92)."""
        conds = [
            F.col("keyword").rlike(f"^(?:{pat})$") if is_re
            else F.col("keyword").startswith(pat)
            for pat, is_re, k in meta if k == kind
        ]
        out = F.lit(False)
        for c in conds:
            out = out | c
        return out

    cat = engine.catalog
    postings = cat.index().select("keyword", "doc_id", "score")
    a_ts = cat.is_timestamped(primary_keyword(query_a))
    b_ts = cat.is_timestamped(primary_keyword(query_b))
    if a_ts:
        # Event prediction discards ephemeral keywords entirely — their
        # values change daily so they leak the future (correlate.cc:536).
        postings = postings.filter(
            ~kind_match_col(cat.keyword_meta, "ephemeral"))
        ts_match = kind_match_col(cat.keyword_meta, "timestamped")
        ts_keys = postings.filter(ts_match)
        # negating the same deterministic predicate splits the index
        # without the distinct + anti-join shuffle an id-set join costs
        plain = postings.filter(~ts_match)
        if b_ts:
            ts_filtered = filter_by_timestamp_sets(ts_keys, set_a, set_b)
        else:
            ts_filtered = filter_by_timestamp_now(
                ts_keys, set_a, _time.time() / 86400.0)
        postings = plain.unionByName(ts_filtered)
    return correlate_sets(postings, set_a, set_b,
                          caches=engine._correlate_caches,
                          unique_docs=engine.unique_postings)
