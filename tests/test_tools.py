"""Smoke tests for the dev tooling that the round workflow depends on
(the rotation planner feeds gate.py's _DRIVER_ORDER each round)."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rotate_window_proposal_invariants():
    rw = _load("rotate_window")
    from cantera_table_spark import gate
    order, stats = rw.propose(window=50, n_sentinels=12)
    registry = set(gate._QUERIES)
    # a full permutation of the registry, no inventions or duplicates
    assert len(order) == len(registry)
    assert set(order) == registry
    assert stats["registry"] == len(registry)
    head = set(order[:50])
    hist = rw.load_history(os.path.join(ROOT))
    never = registry - set(hist)
    # never-checked gates fill the window first; when debt exceeds the
    # non-sentinel capacity the overflow legitimately waits a round
    assert len(never & head) >= min(len(never), 50 - 12)
    # red-at-last-check gates are next in priority under the same cap
    red = {n for n, rs in hist.items()
           if n in registry and rs and not rs[max(rs)]}
    assert len((never | red) & head) >= min(len(never | red), 50 - 12)
    # every chosen sentinel sits inside the window (the reservation
    # the planner promises, regression-prone against truncation)
    assert set(stats["sentinels"]) <= head, \
        set(stats["sentinels"]) - head


def test_gate_cache_registry_bounded_without_release(spark):
    """r7 verdict stretch item: a third-party caller that materializes
    caching gates without ever calling release_gate_caches() must see
    bounded cache storage — the registry caps itself by unpersisting
    the oldest entry past maxlen."""
    from cantera_table_spark import gate as g
    g.release_gate_caches()          # clean slate
    n = g._BoundedCacheList.maxlen + 5
    frames = [spark.range(i + 1).cache() for i in range(n)]
    for f in frames:
        f.count()                    # materialize the cache
        g._GATE_CACHES.append(f)
    assert len(g._GATE_CACHES) == g._BoundedCacheList.maxlen
    # the evicted oldest frames are no longer cached; the newest are
    assert all(f.storageLevel.useMemory is False for f in frames[:5])
    assert all(f.storageLevel.useMemory for f in frames[5:])
    g.release_gate_caches()
    assert len(g._GATE_CACHES) == 0
    assert all(f.storageLevel.useMemory is False for f in frames)


def test_gate_cache_registry_caps_every_mutation_path(spark):
    """r8 advisory: the cap must hold for extend/insert/+=/slice
    assignment too, not just append — any growth path a third-party
    caller uses trims (and unpersists) down to maxlen."""
    from cantera_table_spark import gate as g
    g.release_gate_caches()
    cap = g._BoundedCacheList.maxlen
    frames = [spark.range(i + 1).cache() for i in range(cap + 4)]
    for f in frames:
        f.count()
    g._GATE_CACHES.extend(frames)            # bulk registration
    assert len(g._GATE_CACHES) == cap
    assert all(f.storageLevel.useMemory is False for f in frames[:4])
    extra = spark.range(100).cache()
    extra.count()
    g._GATE_CACHES += [extra]                 # __iadd__
    assert len(g._GATE_CACHES) == cap
    g._GATE_CACHES.insert(0, extra)           # insert
    assert len(g._GATE_CACHES) == cap
    g.release_gate_caches()
    assert len(g._GATE_CACHES) == 0


def test_gate_cache_registry_eviction_and_replacement(spark):
    """r9 review findings: trim must never evict the frame the current
    mutation just registered (insert at the front included), replaced
    entries (item/slice assignment) are unpersisted as they leave the
    registry, and ``*=`` cannot grow past the cap either."""
    from cantera_table_spark import gate as g
    g.release_gate_caches()
    cap = g._BoundedCacheList.maxlen
    frames = [spark.range(i + 1).cache() for i in range(cap)]
    for f in frames:
        f.count()
        g._GATE_CACHES.append(f)
    fresh = spark.range(200).cache()
    fresh.count()
    g._GATE_CACHES.insert(0, fresh)           # at capacity, at front
    assert len(g._GATE_CACHES) == cap
    # the just-inserted frame SURVIVES; the oldest other entry went
    assert fresh.storageLevel.useMemory
    assert g._GATE_CACHES[0] is fresh
    assert frames[0].storageLevel.useMemory is False
    # scalar replacement unpersists the displaced frame
    repl = spark.range(300).cache()
    repl.count()
    displaced = g._GATE_CACHES[1]
    g._GATE_CACHES[1] = repl
    assert displaced.storageLevel.useMemory is False
    assert repl.storageLevel.useMemory
    # slice replacement unpersists the whole displaced run
    r2 = spark.range(400).cache()
    r2.count()
    displaced_run = list(g._GATE_CACHES[2:4])
    g._GATE_CACHES[2:4] = [r2]
    assert all(e.storageLevel.useMemory is False for e in displaced_run)
    # *= enforces the cap too (docstring's every-growth-path claim)
    g._GATE_CACHES *= 3
    assert len(g._GATE_CACHES) == cap
    g.release_gate_caches()
    assert len(g._GATE_CACHES) == 0


def test_native_state_store_conflict_raises(spark):
    """r9 review finding: an EXPLICIT different provider already on the
    session must raise a conflict, not be silently replaced — the conf
    is session-global and a checkpointed query cannot change provider
    between restarts."""
    import pytest

    from cantera_table_spark.streaming.sessionize import (
        _STATE_STORE_KEY, ensure_state_store_provider)
    prev = spark.conf.get(_STATE_STORE_KEY, None)
    try:
        spark.conf.set(_STATE_STORE_KEY, "com.example.OtherProvider")
        with pytest.raises(RuntimeError, match="already set"):
            ensure_state_store_provider(spark)
        # matching value: no-op, no raise
        from cantera_table_spark.streaming.sessionize import (
            ROCKSDB_STATE_STORE_PROVIDER)
        spark.conf.set(_STATE_STORE_KEY, ROCKSDB_STATE_STORE_PROVIDER)
        ensure_state_store_provider(spark)
    finally:
        if prev:
            spark.conf.set(_STATE_STORE_KEY, prev)
        else:
            try:
                spark.conf.unset(_STATE_STORE_KEY)
            except Exception:
                pass


def test_plan_lint_fold_recompute_detector(spark):
    """r10 verdict item 4: the sim01 defect class — a filter on the
    computed pair cosine re-inlines the whole O(d) fold into the join
    condition (Catalyst substitutes the alias's defining expression
    into every predicate; no new exchange, no new operator kind, so
    only bench medians noticed the 1.7x) — must now trip plan_lint
    structurally.  The shipped per-side _rankable form stays within
    the measured budget; the reverted form exceeds it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cantera_table_spark.functions.similarity import (brute_force_topk,
                                                          cosine)
    pl = _load("plan_lint")

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (i + 3)).cast("float")
                  for i in range(4)]).alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 2)

    good = brute_force_topk(emb, queries, k=5)
    n_good = pl.fold_count(pl.explain_str(good, "simple"))
    assert 0 < n_good <= pl.FOLD_BUDGET["sim01_brute_topk"], n_good
    # per-SIDE folds (_rankable norms) are exempt by design: the good
    # plan still prints them, only the PAIR fold is budgeted
    assert not [h for h in pl.lint_one("sim01_brute_topk", good)
                if h.startswith("FoldRecompute")]

    # the reverted (defect) form: no per-side prefilters, validity
    # decided by filtering the COMPUTED cosine column
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("cv"))
    scored = (c.join(F.broadcast(q),
                     F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(cosine(F.col("qv"),
                                                F.col("cv")), 6))
              .filter(F.col("cos").isNotNull() & ~F.isnan("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    bad = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 5)
           .select("query_id", "neighbor_id", "cos", "rank"))
    n_bad = pl.fold_count(pl.explain_str(bad, "simple"))
    assert n_bad > pl.FOLD_BUDGET["sim01_brute_topk"], (n_bad, n_good)
    assert [h for h in pl.lint_one("sim01_brute_topk", bad)
            if h.startswith("FoldRecompute")]


def test_oracle_shared_fragments_in_lockstep():
    """r11 gate-registry review: the CORRELATE mining tail and the IVF
    probe replay now live in shared constants (byte-identity enforced
    here); the PQ ADC chain intentionally remains three contextual
    copies (their common suffix is only ~230 bytes — no clean
    boundary), so this test pins the INVARIANTS a drift would break:
    every copy carries the same deterministic `ORDER BY d, code`
    codebook tie-break and the same shared ADC-rank suffix."""
    from cantera_table_spark import gate

    o = gate.oracle_sql()
    assert gate.ORACLE_CORRELATE_TAIL in o["corr01_feature_mining"]
    assert gate.ORACLE_CORRELATE_TAIL in o["corr02_event_prediction"]
    assert gate.ORACLE_IVF_PROBE_TAIL in o["sim02_ivf_topk"]
    assert gate.ORACLE_IVF_PROBE_TAIL in o["sim08_quantized_ivf"]

    pq = [o[k] for k in ("sim09_pq_topk", "sim10_ivfpq_topk",
                         "sim11_pq_trained")]
    assert all("ORDER BY d, code" in s for s in pq)

    def common_suffix(a, b):
        i = 0
        while i < min(len(a), len(b)) and a[-1 - i] == b[-1 - i]:
            i += 1
        return i

    n = min(common_suffix(pq[0], pq[1]), common_suffix(pq[0], pq[2]))
    # the shared ADC-rank suffix (GROUP BY + final approx_d2 select)
    assert n >= 200 and "approx_d2" in pq[0][-n:], (n, pq[0][-50:])


def test_gate_cache_trim_keeps_duplicate_registrations_cached(spark):
    """r11 review: evicting ONE of a frame's duplicate registrations
    must not unpersist the copy still tracked by the registry."""
    from cantera_table_spark import gate as g
    g.release_gate_caches()
    cap = g._BoundedCacheList.maxlen
    dup = spark.range(123).cache()
    dup.count()
    g._GATE_CACHES.append(dup)
    g._GATE_CACHES.append(dup)          # duplicate registration
    for i in range(cap - 1):            # overflow -> trims oldest (dup)
        f = spark.range(i + 2).cache()
        f.count()
        g._GATE_CACHES.append(f)
    assert g._GATE_CACHES.count(dup) == 1     # one copy evicted
    assert dup.storageLevel.useMemory         # ...but still cached
    g.release_gate_caches()
    assert not dup.storageLevel.useMemory     # final copy unpersists
