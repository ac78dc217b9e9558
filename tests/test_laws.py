"""Algebraic-law property tests over the set algebra (SURVEY.md §5:
"property tests on the set-algebra laws"), hypothesis-generated.

Laws hold on *doc-id sets* (scores carry provenance-dependent values,
so score equality is only asserted where the semantics pin it down).
"""

from hypothesis import given, settings, strategies as st

from cantera_table_spark.operators import set_algebra as sa

postings = st.lists(
    st.tuples(st.integers(0, 15), st.floats(-4, 4, width=16)),
    max_size=12,
).map(lambda v: sorted({(d, float(s)) for d, s in v}))


def to_df(spark, p):
    return spark.createDataFrame(
        [(int(d), float(s)) for d, s in p] or [],
        "doc_id long, score double")


def docs(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def rows(df):
    return sorted((r.doc_id, r.score) for r in df.collect())


@settings(max_examples=12, deadline=None)
@given(a=postings, b=postings)
def test_and_is_subset_and_not_is_complement(spark, a, b):
    da, db = to_df(spark, a), to_df(spark, b)
    inter = docs(sa.intersect_and(da, db))
    diff = docs(sa.subtract(da, db))
    base = {d for d, _ in a}
    assert inter | diff == base
    assert inter & diff == set()
    assert inter == base & {d for d, _ in b}


@settings(max_examples=12, deadline=None)
@given(a=postings, b=postings)
def test_or_covers_union_and_de_morgan(spark, a, b):
    da, db = to_df(spark, a), to_df(spark, b)
    assert docs(sa.union_or(da, db)) == \
        {d for d, _ in a} | {d for d, _ in b}
    # De Morgan over a universe u: u - (a OR b) == (u - a) AND (u - b)
    u = [(d, 0.0) for d in range(16)]
    du = to_df(spark, u)
    lhs = docs(sa.subtract(du, sa.union_or(da, db)))
    rhs = docs(sa.intersect_and(sa.subtract(du, da), sa.subtract(du, db)))
    assert lhs == rhs


@settings(max_examples=10, deadline=None)
@given(a=postings)
def test_dedup_idempotent_and_negate_involution(spark, a):
    da = to_df(spark, a)
    once = sa.dedup(da, use_max=True)
    assert rows(sa.dedup(once, use_max=True)) == rows(once)
    assert rows(sa.negate(sa.negate(da))) == rows(da)


@settings(max_examples=10, deadline=None)
@given(a=postings, b=postings)
def test_and_keeps_lhs_scores(spark, a, b):
    da, db = to_df(spark, a), to_df(spark, b)
    got = rows(sa.intersect_and(da, db))
    bdocs = {d for d, _ in b}
    assert got == sorted((d, s) for d, s in a if d in bdocs)


@settings(max_examples=10, deadline=None)
@given(a=postings)
def test_sample_is_deterministic_subset(spark, a):
    da = to_df(spark, a)
    s1, s2 = rows(sa.sample(da, 5)), rows(sa.sample(da, 5))
    assert s1 == s2
    assert len(s1) == min(5, len(a))
    assert {d for d, _ in s1} <= {d for d, _ in a}
