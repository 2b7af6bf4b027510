"""Smoke: every registered query runs and returns a stable schema."""

import pytest

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.slow  # heavy sweep/equivalence proof (r13): round-close suite only
def test_every_query_has_unique_columns(spark, sf_dir):
    qs = entrymod.queries()
    assert len(qs) >= 50
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        cols = df.columns
        assert len(cols) == len(set(cols)), f"{name} duplicate columns {cols}"


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # all but explicitly non-SQL-expressible ops carry an oracle
    assert len(os_) >= len(qs) - 2
