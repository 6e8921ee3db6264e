"""Driver-style parity check: run each queries() entry on Spark and its
oracle_sql() on DuckDB over the same sf dir; compare row count, column
names, and an order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from extract_text_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append((name, f"SPARK ERROR {exc}"))
            print(f"{name:24s} SPARK ERROR: {str(exc)[:200]}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows "
                  f"({'OK' if len(srows) >= 0 else '??'})")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append((name, f"DUCKDB ERROR {exc}"))
            print(f"{name:24s} DUCKDB ERROR: {str(exc)[:200]}")
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        ok_h = ok_c and value_hash(scols, srows) == value_hash(dcols, drows)
        status = "OK" if (ok_n and ok_c and ok_h) else "FAIL"
        print(f"{name:24s} {status}  rows={len(srows)}/{len(drows)} "
              f"cols={'=' if ok_c else scols} hash={'=' if ok_h else 'DIFF'}")
        if status == "FAIL":
            failures.append((name, "mismatch"))
            if ok_c and not ok_h:
                sset = {tuple(_norm(v) for v in r) for r in srows}
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {tuple(_norm(r[i]) for i in order) for r in srows}
                dset = {tuple(_norm(r[i]) for i in
                              sorted(range(len(dcols)), key=lambda i: dcols[i]))
                        for r in drows}
                print("   spark-only:", list(sset - dset)[:2])
                print("   duck-only :", list(dset - sset)[:2])
    spark.stop()
    print(f"\n{len(failures)} failures: {[f[0] for f in failures]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
