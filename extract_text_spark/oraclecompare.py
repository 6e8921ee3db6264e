"""Driver-style Spark-vs-DuckDB parity compare, shared by the
``tools/check_oracles.py`` CLI and the registry-tail pytest gate
(tests/test_oracle_tail.py).

The external correctness driver checks a bounded PREFIX of the query
registry (historically 50 entries); everything here mirrors its compare
exactly — row count, sorted column names, and an order-insensitive
value hash — so the in-repo gates and the driver can never disagree
about what "hash-exact" means.
"""

from __future__ import annotations

import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

#: How many registry entries the external driver's correctness gate
#: checks (it truncates the dict TAIL past this bound — see the
#: registry-order comment in queries.py). Entries at or past this index
#: are only ever checked in-repo, which is why test_oracle_tail.py
#: exists.
DRIVER_PREFIX = 50


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def duckdb_views(con, sf_dir: str):
    """Register the standard table views on a DuckDB connection."""
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, fn, sql, sf_dir: str,
                  keep_rows: bool = False) -> dict:
    """Run one queries() entry on Spark and its oracle on DuckDB; return
    the driver-shaped result dict. ``sql`` may be None (rows-only).
    ``keep_rows`` additionally returns the exact collected rows/columns
    under "_spark"/"_oracle" so a caller diagnosing a mismatch diffs the
    VERY rows that were hashed instead of re-executing the query (a
    second run of an unstable query could contradict the failing
    hash)."""
    out = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        out["spark_rows"] = len(srows)
    except Exception as exc:            # noqa: BLE001 — report, don't die
        out["err"] = f"SPARK ERROR {exc}"
        return out
    if keep_rows:
        out["_spark"] = (scols, srows)
    if sql is None:
        out["rows_match"] = len(srows) >= 0
        return out
    try:
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        out["oracle_rows"] = len(drows)
    except Exception as exc:            # noqa: BLE001
        out["err"] = f"DUCKDB ERROR {exc}"
        return out
    if keep_rows:
        out["_oracle"] = (dcols, drows)
    out["rows_match"] = len(srows) == len(drows)
    out["schema_match"] = sorted(scols) == sorted(dcols)
    out["hash_match"] = (out["schema_match"]
                         and value_hash(scols, srows)
                         == value_hash(dcols, drows))
    return out
