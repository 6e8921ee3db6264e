"""Driver-style parity check: run each queries() entry on Spark and its
oracle_sql() on DuckDB over the same sf dir; compare row count, column
names, and an order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]

The compare itself lives in extract_text_spark.oraclecompare (shared
with the registry-tail pytest gate) so the CLI, the pytest, and the
external driver can never disagree about what "hash-exact" means.
"""

from __future__ import annotations

import sys


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import duckdb

    import __spark_entry__ as e
    from extract_text_spark.oraclecompare import (
        _norm, compare_query, duckdb_views)
    from extract_text_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb_views(duckdb.connect(), sf_dir)

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        res = compare_query(spark, con, fn, oracles.get(name), sf_dir,
                            keep_rows=True)
        if res["err"]:
            failures.append((name, res["err"]))
            print(f"{name:24s} {res['err'][:220]}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {res['spark_rows']} rows OK")
            continue
        ok = (res["rows_match"] and res["schema_match"]
              and res["hash_match"])
        status = "OK" if ok else "FAIL"
        print(f"{name:24s} {status}  "
              f"rows={res['spark_rows']}/{res['oracle_rows']} "
              f"cols={'=' if res['schema_match'] else 'DIFF'} "
              f"hash={'=' if res['hash_match'] else 'DIFF'}")
        if not ok:
            failures.append((name, "mismatch"))
            if res["schema_match"] and not res["hash_match"]:
                # diff the EXACT rows that were hashed (no re-run: a
                # second execution of an unstable query could contradict
                # the failing hash)
                scols, srows = res["_spark"]
                dcols, drows = res["_oracle"]
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {tuple(_norm(r[i]) for i in so) for r in srows}
                dset = {tuple(_norm(r[i]) for i in do) for r in drows}
                print("   spark-only:", list(sset - dset)[:2])
                print("   duck-only :", list(dset - sset)[:2])
    spark.stop()
    print(f"\n{len(failures)} failures: {[f[0] for f in failures]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
