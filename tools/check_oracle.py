"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 on Spark AND its oracle_sql() twin on DuckDB; compare row count,
schema (column names), and an order-insensitive value hash.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive: sort columns by name, stringify rows, sort, hash."""
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        d[c] = d[c].map(lambda v: repr(v))
    rows = sorted(",".join(r) for r in d.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as E
    from facematch_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        # normalize dtypes for hashing: floats → round repr, ints → int
        def norm(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            for c in out.columns:
                if out[c].dtype.kind == "f":
                    out[c] = out[c].astype(float).round(9)
                elif out[c].dtype.kind in "iu":
                    out[c] = out[c].astype("int64")
                elif out[c].dtype.kind == "M":
                    out[c] = out[c].astype(str)
            return out

        h_s = value_hash(norm(sdf))
        h_o = value_hash(norm(odf))
        ok = ok_rows and ok_schema and h_s == h_o
        status = "OK  " if ok else "FAIL"
        print(f"{status}  {name}: rows {len(sdf)}/{len(odf)} schema={ok_schema} hash={'=' if h_s == h_o else 'DIFF'} [{t_spark:.1f}s]")
        if not ok:
            failures += 1
            if ok_schema and ok_rows:
                cols = sorted(sdf.columns)
                a = norm(sdf)[cols].sort_values(cols).reset_index(drop=True)
                b = norm(odf)[cols].sort_values(cols).reset_index(drop=True)
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(a[bad].head(3))
                print(b[bad].head(3))
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
