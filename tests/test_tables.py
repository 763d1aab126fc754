"""Table-catalog cache semantics (tables.load_tables).

The cache is a pure driver-time optimization — it must never change
which data a query or a temp view reads, including when one session
alternates between scale-factor directories (bench warms at sf0.001
then times sf0.1 through the same session).
"""

from __future__ import annotations

from event_to_lakehouse_spark.tables import load_tables

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def test_cache_returns_same_plan_handles(spark):
    t1 = load_tables(spark, SF_A)
    t2 = load_tables(spark, SF_A)
    assert t1["lineitem"] is t2["lineitem"]  # cached, not re-read


def test_views_follow_sf_dir_switches(spark):
    load_tables(spark, SF_A)
    n_a = spark.sql("SELECT count(*) c FROM lineitem").first()["c"]
    load_tables(spark, SF_B)
    n_b = spark.sql("SELECT count(*) c FROM lineitem").first()["c"]
    # switching back must repoint the views again, not leave sf0.01
    load_tables(spark, SF_A)
    n_a2 = spark.sql("SELECT count(*) c FROM lineitem").first()["c"]
    assert n_a == n_a2
    assert n_b > n_a  # sf0.01 really is the bigger directory


def test_dataframes_unaffected_by_view_switch(spark):
    ta = load_tables(spark, SF_A)
    load_tables(spark, SF_B)  # views now point at sf0.01
    # ...but previously returned DataFrames still read their own files
    assert ta["region"].count() == load_tables(spark, SF_A)["region"].count()


def test_caller_mutation_does_not_pollute_cache(spark):
    t1 = load_tables(spark, SF_A)
    t1["lineitem"] = None  # caller abuse
    t2 = load_tables(spark, SF_A)
    assert t2["lineitem"] is not None


def test_dropped_view_is_restored(spark):
    load_tables(spark, SF_A)
    spark.catalog.dropTempView("region")
    load_tables(spark, SF_A)  # same sf_dir: fast path must re-validate
    assert spark.sql("SELECT count(*) c FROM region").first()["c"] == 5
