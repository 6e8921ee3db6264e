"""Registry-tail oracle gate: the external correctness driver only
checks the first ``DRIVER_PREFIX`` (50) entries of the query registry,
so every entry past that bound would otherwise ship with no machine
check at all. This test runs the driver's exact compare (row count,
sorted columns, order-insensitive value hash) over the ENTIRE tail at
sf0.001, so `python -m pytest` fails if any non-prefix query drifts
from its DuckDB oracle — "all registry entries hash-exact" is now
structural, not a per-round manual sweep.
"""

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TAIL_SF", "/root/testdata/sf0.001")


def _registry_tail():
    import __spark_entry__ as e
    from extract_text_spark.oraclecompare import DRIVER_PREFIX

    qs = e.queries()
    return list(qs.items())[DRIVER_PREFIX:]


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason=f"{SF_DIR} testdata absent")
def test_registry_tail_oracle_parity(spark):
    import __spark_entry__ as e
    from extract_text_spark.oraclecompare import (
        compare_query, duckdb_views)

    tail = _registry_tail()
    assert tail, "registry no longer exceeds the driver prefix"
    oracles = e.oracle_sql()
    con = duckdb_views(duckdb.connect(), SF_DIR)
    failures = []
    for name, fn in tail:
        res = compare_query(spark, con, fn, oracles.get(name), SF_DIR)
        ok = (res["err"] is None and res["rows_match"]
              and res["schema_match"] in (True, None)
              and res["hash_match"] in (True, None))
        if not ok:
            failures.append((name, res))
    assert not failures, f"registry-tail oracle drift: {failures}"


def test_every_query_has_an_oracle():
    """Every registry entry must keep its oracle twin — a queries()
    entry silently losing its oracle_sql() row would downgrade it to
    the driver's weaker rows-only check."""
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"queries without oracles: {missing}"
    orphans = [n for n in oracles if n not in qs]
    assert not orphans, f"oracles without queries: {orphans}"
