"""Oracle-differential tests (SURVEY.md §5.1): every declared query
must match its DuckDB oracle at the test scale factor."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable():
    # the driver's correctness gate records only the first 50 entries —
    # the registry must fit inside that window (and stay substantial)
    assert 45 <= len(QUERIES) <= 50, len(QUERIES)
    missing_oracle = set(QUERIES) - set(ORACLES)
    assert missing_oracle == set(), missing_oracle
    assert set(ORACLES) <= set(QUERIES), "oracle without a query"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, ducks):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(srows) > 0, f"{name}: rows-only query returned 0 rows"
        return
    res = ducks.sql(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = compare(sdf.columns, srows, ocols, orows)
    assert not problems, f"{name}: " + " | ".join(problems)
    assert len(srows) > 0, f"{name}: matched but empty result"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"hour_ts_us", "content_type", "event_type", "cnt", "total_score"}
