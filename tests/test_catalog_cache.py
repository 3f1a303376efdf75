"""Focused tests for the r16 catalog-metadata memoizations.

Both optimizations cache METADATA bindings per session, never data:
``catalog.table`` memoizes the bound relation per (session, sf_dir,
table) and ``ensure_fixture_views`` registers the fixture temp views
once per (session, sf_dir). Queries still scan the parquet inputs on
every execution — these tests pin the cache-keying semantics (same key
→ same binding; different sf_dir → fresh binding with that tier's data).
"""

from __future__ import annotations

from s3_kinesis_replay_spark.catalog import (
    _FIXTURE_VIEWS,
    ensure_fixture_views,
    table,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_table_relation_memoized_per_key(spark, sf_dir):
    a = table(spark, "nation", sf_dir)
    b = table(spark, "nation", sf_dir)
    assert a is b, "same (session, sf_dir, table) must bind once"
    # trailing-slash-normalized key: the same directory spelled with a
    # slash is the same binding
    c = table(spark, "nation", sf_dir + "/")
    assert c is a


def test_table_relation_distinct_per_sf_dir(spark, sf_dir):
    big = table(spark, "region", sf_dir)
    small = table(spark, "region", SF_SMALL)
    assert big is not small
    # and each binding serves ITS tier's data (no cross-tier bleed)
    assert small.count() == 5 and big.count() == 5  # region is 5 rows at every sf
    li_small = table(spark, "lineitem", SF_SMALL)
    li_big = table(spark, "lineitem", sf_dir)
    assert li_small.count() != li_big.count()


def test_table_memo_returns_live_scannable_values(spark, sf_dir):
    # the memo caches the unresolved relation, not results: a second use
    # in a brand-new query still computes from parquet
    n1 = table(spark, "customer", sf_dir).count()
    n2 = (
        table(spark, "customer", sf_dir)
        .where("c_custkey % 2 = 0")
        .count()
    )
    assert 0 < n2 < n1


def test_fixture_views_registered_once_then_switch(spark, sf_dir):
    ensure_fixture_views(spark, sf_dir)
    assert _FIXTURE_VIEWS.get(spark) == sf_dir
    n_big = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    # same sf_dir: a no-op (memo hit leaves the recorded key unchanged)
    ensure_fixture_views(spark, sf_dir)
    assert _FIXTURE_VIEWS.get(spark) == sf_dir
    # switching tiers re-registers under the shared names
    ensure_fixture_views(spark, SF_SMALL)
    assert _FIXTURE_VIEWS.get(spark) == SF_SMALL
    n_small = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert n_small != n_big
    # restore for sibling tests in the same session
    ensure_fixture_views(spark, sf_dir)
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
        == n_big
    )
