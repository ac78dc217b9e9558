"""End-to-end QUERY statement tests: JSON envelope, overrides,
external-document expansion, thresholds headers."""

import pytest

from cantera_table_spark.engine import Engine
from cantera_table_spark.model import Catalog


@pytest.fixture()
def catalog(spark):
    postings = spark.createDataFrame(
        [("alpha", 0, 2.0), ("alpha", 1, 1.0), ("alpha", 2, 5.0),
         ("beta", 1, 4.0), ("beta", 2, 1.0),
         ("name:example.com", 0, 0.0), ("name:other.org", 2, 0.0),
         ("days", 0, 19000.0), ("days", 1, 19010.0), ("days", 2, 19020.0)],
        "keyword string, doc_id long, score double")
    docs = spark.createDataFrame(
        [(0, "d0", '{"title":"zero","rank":3}'),
         (1, "d1", '{"title":"one"}'),
         (2, "d2", '{"title":"two","rank":9}')],
        "doc_id long, key string, doc string")
    overrides = spark.createDataFrame(
        [("d1", '{"title":"ONE-PATCHED","extra":true}')],
        "key string, doc string")
    return Catalog(summaries=[docs], indexes=[postings],
                   overrides=[overrides],
                   keyword_meta=[("days", False, "timestamped")])


def test_envelope_and_override_patching(spark, catalog):
    eng = Engine(catalog, unique_postings=True)
    res = eng.execute_script("QUERY (alpha) LIMIT 2;")[0]
    assert res["result-count"] == 3
    assert [r["_key"] for r in res["result"]] == ["d2", "d0"]
    assert res["result"][0]["title"] == "two"

    res = eng.execute_script("QUERY (beta) LIMIT 1;")[0]
    # doc 1 (score 4) tops; its override patches title and adds a field
    r = res["result"][0]
    assert r["_key"] == "d1" and r["title"] == "ONE-PATCHED"
    assert r["extra"] is True


def test_keys_only_and_offset_beyond(spark, catalog):
    eng = Engine(catalog, unique_postings=True)
    assert eng.execute_script(
        "QUERY KEYS FOR (alpha) LIMIT 2;")[0] == ["d2", "d0"]
    assert eng.execute_script("QUERY (alpha) LIMIT 2 OFFSET 99;")[0] == []


def test_count_mode_envelopes(spark, catalog, monkeypatch):
    """count_mode policies (SURVEY §4 sampling short-circuit): exact is
    reference-faithful; approx returns an integer estimate; none omits
    result-count AND never runs a count job (pinned by poisoning
    DataFrame.count)."""
    from pyspark.sql import DataFrame

    exact = Engine(catalog, unique_postings=True).execute_script(
        "QUERY (alpha) LIMIT 2;")[0]
    assert exact["result-count"] == 3

    approx = Engine(catalog, unique_postings=True,
                    count_mode="approx").execute_script(
        "QUERY (alpha) LIMIT 2;")[0]
    assert isinstance(approx["result-count"], int)
    assert [r["_key"] for r in approx["result"]] == ["d2", "d0"]

    eng_none = Engine(catalog, unique_postings=True, count_mode="none")
    monkeypatch.setattr(
        DataFrame, "count",
        lambda self: (_ for _ in ()).throw(
            AssertionError("count_mode=none must not run a count job")))
    none = eng_none.execute_script("QUERY (alpha) LIMIT 2;")[0]
    assert "result-count" not in none
    assert [r["_key"] for r in none["result"]] == ["d2", "d0"]
    # offset beyond the result set still degrades to the bare [] form
    assert eng_none.execute_script(
        "QUERY (alpha) LIMIT 2 OFFSET 99;")[0] == []
    # per-call override beats the engine default
    monkeypatch.undo()
    env = eng_none.query_stmt(
        __import__("cantera_table_spark.dsl.parser",
                   fromlist=["parse_script"]).parse_script(
            "QUERY (alpha) LIMIT 2;")[0], count_mode="exact")
    assert env["result-count"] == 3

    with pytest.raises(ValueError):
        Engine(catalog, count_mode="bogus")


def test_limit_zero_keeps_envelope_in_all_modes(spark, catalog):
    """LIMIT 0 over a non-empty result at offset 0 is an empty PAGE, not
    an empty RESULT: exact mode returns {result-count, result: []} and
    approx/none must not degrade it to the bare [] (reference prints
    bare [] only when offset >= result size, query.cc:795-798)."""
    exact = Engine(catalog, unique_postings=True).execute_script(
        "QUERY (alpha) LIMIT 0;")[0]
    assert exact == {"result-count": 3, "result": []}

    approx = Engine(catalog, unique_postings=True,
                    count_mode="approx").execute_script(
        "QUERY (alpha) LIMIT 0;")[0]
    assert approx["result"] == [] and "result-count" in approx

    none = Engine(catalog, unique_postings=True,
                  count_mode="none").execute_script(
        "QUERY (alpha) LIMIT 0;")[0]
    assert none == {"result": []}


def test_threshold_headers_numeric_and_date(spark, catalog):
    eng = Engine(catalog, unique_postings=True)
    res = eng.execute_script(
        "QUERY (alpha) THRESHOLDS 0,3,6 FOR KEY 'alpha' LIMIT 10;")[0]
    headers = {r["_key"]: (r["_header"], r["_header_key"])
               for r in res["result"]}
    assert headers["d0"] == ("0–3", "AAAAB")
    assert headers["d2"] == ("3–6", "AAAAC")

    # timestamped key -> date-formatted headers (X2)
    res = eng.execute_script(
        "QUERY (alpha) THRESHOLDS 18990,19015,19030 FOR KEY 'days' "
        "LIMIT 10;")[0]
    hdrs = {r["_key"]: r["_header"] for r in res["result"]}
    # day 18990 = 1970-01-01 + 18990d = December 2021
    assert hdrs["d0"].startswith("December") and "–" in hdrs["d0"]
    assert hdrs["d2"].startswith("January")


def test_external_expansion_with_fake_fetcher(spark, catalog):
    """S3 FIELD-in:KEY (query.cc:222-305) with an injected blob."""
    blob = "{Section One} www.example.com junk...\nother.org trailing"
    eng = Engine(catalog, unique_postings=True,
                 blob_fetcher=lambda key: blob)
    res = eng.execute_script("QUERY (name-in:someblob) LIMIT 10;")[0]
    keys = {r["_key"] for r in res["result"]}
    assert keys == {"d0", "d2"}
    by_key = {r["_key"]: r for r in res["result"]}
    # example.com carried the "{Section One}" header
    assert by_key["d0"]["_header"] == "Section One"
    assert by_key["d0"]["_header_key"] == "000000"
    # other.org appeared after the header section ended -> same header
    # state per reference semantics (header persists until next '{')
    assert "_header" in by_key["d2"]


def test_parse_statement_echo(spark, catalog):
    eng = Engine(catalog, unique_postings=True)
    out = eng.execute_script("PARSE MAX(alpha) ORDER BY beta;")[0]
    assert out == "(MAX(alpha) ORDER BY beta)"


def test_f32_score_fidelity(spark):
    """SURVEY.md §7 hard-item 3: float32 quantization mode.  The value
    1.00000012 is representable in float32; 1.000000121 is not — in
    fidelity mode both compare equal to the stored float32."""
    f64 = 1.000000121            # rounds to 1.00000012f in float32
    postings = spark.createDataFrame(
        [("q", 0, f64)], "keyword string, doc_id long, score double")
    docs = spark.createDataFrame([(0, "d0", "{}")],
                                 "doc_id long, key string, doc string")
    cat = Catalog(summaries=[docs], indexes=[postings])

    import struct
    f32 = struct.unpack("f", struct.pack("f", f64))[0]

    eng64 = Engine(cat, unique_postings=True)
    eng32 = Engine(cat, unique_postings=True, f32_scores=True)
    import cantera_table_spark.dsl.parser as P

    def score(eng):
        df = eng.query_df(P.parse_query("q"), limit=-1)
        return df.collect()[0].score

    assert score(eng64) == f64
    assert score(eng32) == f32 != f64


def test_golden_envelope_pagination(spark, catalog):
    """SURVEY.md §5(c): golden JSON envelopes for QUERY pagination —
    byte-stable serialized output across pages."""
    import json
    eng = Engine(catalog, unique_postings=True)
    page1 = eng.execute_script("QUERY (alpha) LIMIT 2;")[0]
    page2 = eng.execute_script("QUERY (alpha) LIMIT 2 OFFSET 2;")[0]
    assert json.dumps(page1, sort_keys=True) == (
        '{"result": [{"_key": "d2", "rank": 9, "title": "two"}, '
        '{"_key": "d0", "rank": 3, "title": "zero"}], "result-count": 3}')
    assert json.dumps(page2, sort_keys=True) == (
        '{"result": [{"_key": "d1", "extra": true, '
        '"title": "ONE-PATCHED"}], "result-count": 3}')


def test_register_views_sql_surface(spark, catalog):
    eng = Engine(catalog, unique_postings=True)
    eng.register_views()
    out = spark.sql(
        "SELECT p.keyword, count(*) AS n, d.key "
        "FROM postings p JOIN documents d USING (doc_id) "
        "WHERE p.keyword = 'alpha' GROUP BY p.keyword, d.key "
        "ORDER BY d.key").collect()
    assert [(r.key, r.n) for r in out] == [("d0", 1), ("d1", 1), ("d2", 1)]
    assert spark.sql("SELECT count(*) FROM overrides").collect()[0][0] == 1


def test_export_results_distributed_json(spark, catalog):
    """Distributed full-result export must agree with the collected
    envelope objects (same keys, same merged fields) without any
    driver-side assembly."""
    import json
    from cantera_table_spark.dsl.parser import parse_query
    eng = Engine(catalog, unique_postings=True)
    out = {r.doc_id: json.loads(r.result_json)
           for r in eng.export_results(parse_query("alpha")).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["_key"] == "d0" and out[0]["title"] == "zero"
    # override patch for d1 appended after the base body -> later key
    # wins when parsed (reference client contract)
    assert out[1]["title"] == "ONE-PATCHED" and out[1]["extra"] is True


def test_concurrent_statement_execution(spark, catalog):
    """Four threads sharing one Engine must get independent, correct
    results (Spark job submission is thread-safe; the engine holds no
    per-query mutable state)."""
    from concurrent.futures import ThreadPoolExecutor
    eng = Engine(catalog, unique_postings=True)
    scripts = ["QUERY KEYS FOR (alpha) LIMIT 3;",
               "QUERY KEYS FOR (beta) LIMIT 3;",
               "QUERY KEYS FOR (alpha - beta) LIMIT 3;",
               "QUERY KEYS FOR (alpha AND beta) LIMIT 3;"]
    with ThreadPoolExecutor(4) as pool:
        results = list(pool.map(
            lambda s: eng.execute_script(s)[0], scripts))
    assert results[0] == ["d2", "d0", "d1"]
    assert results[1] == ["d1", "d2"]
    assert results[2] == ["d0"]
    assert results[3] == ["d2", "d1"]


# --- fuzz: unique-postings shuffle elision == general path + dedup ---

import random

from hypothesis import given, settings, strategies as st

from cantera_table_spark.dsl import ast as A
from cantera_table_spark.dsl.compiler import QueryCompiler

_KW = ["kwa", "kwb", "kwc"]

_ast_st = st.recursive(
    st.sampled_from(_KW).map(A.Leaf),
    lambda q: st.one_of(
        st.tuples(st.sampled_from(["or", "and", "subtract", "orderby"]),
                  q, q).map(lambda t: A.Binary(t[0], t[1], t[2])),
        st.tuples(st.sampled_from(["gt", "lt"]), q, q)
        .map(lambda t: A.Binary(t[0], t[1], t[2])),
        st.tuples(st.sampled_from(["eq", "gt", "ge", "lt", "le"]), q,
                  st.integers(-2, 9))
        .map(lambda t: A.Binary(t[0], t[1], None, value=float(t[2]))),
        st.tuples(q, st.integers(-2, 9), st.integers(-2, 9))
        .map(lambda t: A.Binary("range", t[0], None, value=float(t[1]),
                                value2=float(t[2]))),
        st.tuples(q, st.integers(0, 9))
        .map(lambda t: A.Binary("sample", t[0], None,
                                value=float(t[1]))),
        st.tuples(st.sampled_from(["max", "min", "negate"]), q)
        .map(lambda t: A.Unary(t[0], t[1]))),
    max_leaves=5)


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(tree=_ast_st, seed=st.integers(0, 999), use_max=st.booleans())
def test_unique_elision_fuzz_matches_general_path(spark, tree, seed,
                                                  use_max):
    """The unique_postings compiler promise (every operator preserves
    at-most-one-row-per-doc, so the statement-level dedup shuffle is
    elided, compiler.py process_query) must be semantics-preserving for
    ANY composed query over a duplicate-free index: the unique path's
    result equals the general path's, and is itself duplicate-free."""
    rng = random.Random(seed)
    rows = [(k, d, float(rng.randrange(-2, 10)))
            for k in _KW for d in range(12) if rng.random() < 0.7]
    if not rows:
        rows = [("kwa", 0, 1.0)]
    postings = spark.createDataFrame(
        rows, "keyword string, doc_id long, score double")
    docs = spark.createDataFrame([(d, f"d{d}", "{}") for d in range(12)],
                                 "doc_id long, key string, doc string")
    cat = Catalog(summaries=[docs], indexes=[postings])
    uniq = QueryCompiler(cat, unique_postings=True)
    gen = QueryCompiler(cat, unique_postings=False)
    got_u = sorted(tuple(r) for r in
                   uniq.process_query(tree, use_max=use_max).collect())
    got_g = sorted(tuple(r) for r in
                   gen.process_query(tree, use_max=use_max).collect())
    assert got_u == got_g
    assert len({d for d, _ in got_u}) == len(got_u)   # duplicate-free


def test_multi_override_tables_merge_one_row_per_key(spark):
    """r9 review finding: a key present in SEVERAL override tables (or
    streamed correction batches) must patch as ONE page row with every
    body applied in table order (later wins — the reference appends all
    bodies and the client's JSON last-key-wins resolves:
    query.cc:862-890), never multiply the page/export rows."""
    postings = spark.createDataFrame(
        [("alpha", 0, 2.0), ("alpha", 1, 1.0)],
        "keyword string, doc_id long, score double")
    docs = spark.createDataFrame(
        [(0, "d0", '{"title":"zero","rank":3}'), (1, "d1", '{}')],
        "doc_id long, key string, doc string")
    ov1 = spark.createDataFrame(
        [("d0", '{"title":"patch-1","first":1}')], "key string, doc string")
    ov2 = spark.createDataFrame(
        [("d0", '{"title":"patch-2","second":2}')], "key string, doc string")
    cat = Catalog(summaries=[docs], indexes=[postings],
                  overrides=[ov1, ov2])
    eng = Engine(cat, unique_postings=True)
    res = eng.execute_script("QUERY (alpha) LIMIT 2;")[0]
    # exactly two rows (LIMIT respected, no join multiplication) and
    # the count agrees with the materialized result
    assert res["result-count"] == 2 and len(res["result"]) == 2
    r0 = next(r for r in res["result"] if r["_key"] == "d0")
    # later table wins on the collision; both non-colliding fields land
    assert r0["title"] == "patch-2"
    assert r0["first"] == 1 and r0["second"] == 2
    assert r0["rank"] == 3                      # base summary retained
    # export: one line per doc, both bodies appended in table order
    import json as _json
    lines = {r.doc_id: r.result_json
             for r in eng.export_results(
                 __import__("cantera_table_spark.dsl.parser",
                            fromlist=["parse_query"])
                 .parse_query("alpha")).collect()}
    assert len(lines) == 2
    obj = _json.loads(lines[0])
    assert obj["title"] == "patch-2" and obj["first"] == 1 \
        and obj["second"] == 2


def test_override_breaks_at_first_missing_table(spark):
    """Reference parity (query.cc:876-877): the override walk BREAKS at
    the first table lacking the key — a later table's body applies only
    when every earlier table contains the key, and a key absent from
    table 0 gets no override at all.  Empty bodies still count as 'key
    present' for the walk (the seek succeeds regardless of payload)."""
    postings = spark.createDataFrame(
        [("alpha", i, float(10 - i)) for i in range(4)],
        "keyword string, doc_id long, score double")
    docs = spark.createDataFrame(
        [(i, f"d{i}", '{"base":true}') for i in range(4)],
        "doc_id long, key string, doc string")
    # d0: in both tables -> both apply; d1: only in table 0 -> applies;
    # d2: only in table 1 -> break at table 0, NO override;
    # d3: empty body in table 0, real body in table 1 -> table 1 applies
    ov1 = spark.createDataFrame(
        [("d0", '{"a":1}'), ("d1", '{"b":2}'), ("d3", '{}')],
        "key string, doc string")
    ov2 = spark.createDataFrame(
        [("d0", '{"c":3}'), ("d2", '{"x":9}'), ("d3", '{"d":4}')],
        "key string, doc string")
    cat = Catalog(summaries=[docs], indexes=[postings],
                  overrides=[ov1, ov2])
    eng = Engine(cat, unique_postings=True)
    res = eng.execute_script("QUERY (alpha) LIMIT 4;")[0]
    by_key = {r["_key"]: r for r in res["result"]}
    assert by_key["d0"].get("a") == 1 and by_key["d0"].get("c") == 3
    assert by_key["d1"].get("b") == 2
    assert "x" not in by_key["d2"]           # break-at-first-miss
    assert by_key["d3"].get("d") == 4        # empty body keeps the walk


def test_approx_count_underfull_page_is_exact(spark, catalog):
    """r9 review finding: when the page comes back under-full (or
    LIMIT -1 dumps everything), the result ended inside it — the
    approx envelope must report the proven exact total, not an
    inflated Bernoulli estimate."""
    eng = Engine(catalog, unique_postings=True, count_mode="approx")
    eng.approx_count_fraction = 0.05
    # 3 alpha docs, LIMIT 10: page proves total == 3
    res = eng.execute_script("QUERY (alpha) LIMIT 10;")[0]
    assert res["result-count"] == 3 and len(res["result"]) == 3
    # dump-all proves it too
    res = eng.execute_script("QUERY (alpha);")[0]
    assert res["result-count"] == 3


def test_random_sample_survives_huge_doc_ids(spark):
    """r9 review finding (confirmed live): doc_id * 2654435761 threw
    ARITHMETIC_OVERFLOW under default ANSI mode for doc_id >= ~3.47e9
    — any corpus past ~3.5B documents crashed every RANDOM_SAMPLE.
    The split hash must (a) not throw on huge ids and (b) stay
    value-identical to (doc_id*K + seed) mod 2^32 everywhere."""
    import cantera_table_spark.operators.set_algebra as sa
    ids = [0, 1, 65535, 65536, 3_470_000_000, 3_500_000_000,
           2**32 - 1, 2**32, 2**40 + 12345, 2**62 + 7]
    df = spark.createDataFrame([(d, float(i)) for i, d in enumerate(ids)],
                               "doc_id long, score double")
    got = {r.doc_id for r in sa.sample(df, 4).collect()}
    model = sorted(ids, key=lambda d: ((d * 2654435761 + 1234) % 2**32,
                                       d))[:4]
    assert got == set(model)


def test_r11_core_review_engine_pins(spark, catalog, monkeypatch):
    """r11 core-path review findings, pinned: (a) KEYS FOR never runs
    a count job even under count_mode=exact (its output carries no
    result-count; the offset-beyond-total bare [] falls out of the
    empty page); (b) a catalog mixing BUCKETED and unbucketed index
    tables returns postings from both on a plain lookup (the bucket
    prune filter is null-safe — a bare equality silently dropped every
    NULL-bucket row of the unbucketed table)."""
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from cantera_table_spark.model import bucket_expr

    eng = Engine(catalog, unique_postings=True)   # default: exact
    monkeypatch.setattr(
        DataFrame, "count",
        lambda self: (_ for _ in ()).throw(
            AssertionError("KEYS FOR must not run a count job")))
    assert eng.execute_script(
        "QUERY KEYS FOR (alpha) LIMIT 2;")[0] == ["d2", "d0"]
    assert eng.execute_script(
        "QUERY KEYS FOR (alpha) LIMIT 2 OFFSET 99;")[0] == []
    monkeypatch.undo()

    bucketed = spark.createDataFrame(
        [("alpha", 10, 9.0), ("beta", 11, 1.0)],
        "keyword string, doc_id long, score double").withColumn(
        "bucket", bucket_expr(F.col("keyword"), 16))
    plain = spark.createDataFrame(
        [("alpha", 20, 7.0)],
        "keyword string, doc_id long, score double")
    cat = Catalog(summaries=catalog.summaries,
                  indexes=[bucketed, plain], postings_buckets=16)
    from cantera_table_spark.dsl.parser import parse_query
    res = Engine(cat, unique_postings=True,
                 count_mode="none").query_df(parse_query("alpha"))
    assert {(r.doc_id, r.score) for r in res.collect()} == \
        {(10, 9.0), (20, 7.0)}
