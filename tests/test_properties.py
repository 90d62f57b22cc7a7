"""Property-based tests (hypothesis): upsert algebra and dedup
normalization invariants hold for arbitrary inputs, not just the
hand-picked unit cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tiki_webscraping_spark.operators.dedup import exact_dedup
from etl_tiki_webscraping_spark.sinks.upsert import upsert_dataframes

KV = st.dictionaries(
    st.text(alphabet="abcdef", min_size=1, max_size=3),  # keys
    st.integers(min_value=-100, max_value=100),          # values
    max_size=6,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, kv):
    rows = [(k, v) for k, v in kv.items()]
    return spark.createDataFrame(rows, "k string, v int") if rows else spark.createDataFrame([], "k string, v int")


@given(target=KV, updates=KV)
@SETTINGS
def test_upsert_is_dict_merge(spark, target, updates):
    """DataFrame upsert == python dict merge {**target, **updates}."""
    out = upsert_dataframes(_df(spark, target), _df(spark, updates), ["k"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {**target, **updates}
    assert out.count() == len(got)  # PK uniqueness always holds


@given(tokens=st.lists(st.text(alphabet="xyz", min_size=1, max_size=4), min_size=1, max_size=6))
@SETTINGS
def test_exact_dedup_collapses_formatting_variants(spark, tokens):
    """Case / whitespace variants of one token stream always collapse
    to a single survivor (the lowest id)."""
    base = " ".join(tokens)
    variants = [base, base.upper(), "  " + base.replace(" ", "   ") + " ", base.title()]
    df = spark.createDataFrame(list(enumerate(variants)), "doc_id long, text string")
    out = exact_dedup(df, "text", "doc_id")
    assert out.count() == 1
    assert out.collect()[0]["doc_id"] == 0
