"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (when present) its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted by their stringified tuple).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")


def norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gorilla_tsc_spark.session import get_spark
    from gorilla_tsc_spark.sources.tables import TABLES

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} spark error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok-   {name:28s} rows={len(rows):7d} (rows-only) "
                  f"spark={t1 - t0:5.1f}s")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} vs {sorted(ocols)}")
        else:
            hs, ho = table_hash(cols, rows), table_hash(ocols, orows)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
        if problems:
            print(f"FAIL  {name:28s} {'; '.join(problems)}")
            failures.append(name)
            if not len(rows) == len(orows) or True:
                so = {tuple(norm_cell(v) for v in sorted(zip(cols, r)))
                      for r in rows}
                oo = {tuple(norm_cell(v) for v in sorted(zip(ocols, r)))
                      for r in orows}
                diff_s = list(so - oo)[:2]
                diff_o = list(oo - so)[:2]
                if diff_s:
                    print(f"        spark-only: {diff_s}")
                if diff_o:
                    print(f"        duck-only:  {diff_o}")
        else:
            print(f"OK    {name:28s} rows={len(rows):7d} "
                  f"spark={t1 - t0:5.1f}s duck={time.time() - t1:4.1f}s")
    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nall green")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
