"""Local replica of the driver's correctness gate: run every registered
Spark query at a given SF and its DuckDB oracle side-by-side; compare row
count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df) -> tuple[int, tuple, str]:
    """Order-insensitive fingerprint: sort columns by name, canonicalize
    values to strings, sort rows, sha256.

    Floats canonicalize at FULL precision (shortest round-trip repr — a
    1-ulp difference changes the hash) and NaN is distinguished from
    NULL: the old ``%.10g`` canon was lossier than the driver's hash, so
    a float-emitting query could pass here and fail the driver
    (VERDICT r4 next-round #2). Pinned by test_gate_hermeticity."""
    import pandas as pd

    pdf = df if isinstance(df, pd.DataFrame) else df.toPandas()
    pdf = pdf[sorted(pdf.columns)]

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            # repr(float(x)) = shortest string that round-trips the exact
            # bits (normalizes numpy-2 'np.float64(…)' reprs away)
            return "NaN" if v != v else repr(float(v))
        if v != v:  # non-float NaN-likes (e.g. pandas NaT)
            return "∅"
        return str(v)

    rows = sorted("\x1f".join(canon(v) for v in row) for row in pdf.itertuples(index=False))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return len(pdf), tuple(pdf.columns), h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from sketchlib.queries import oracle_sql, queries
    from sketchlib.spark.session import get_spark

    spark = get_spark(app="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = queries(), oracle_sql()
    unknown = only - set(qs)
    if unknown:
        sys.exit(f"unknown queries: {sorted(unknown)}; available: {sorted(qs)}")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_res = value_hash(fn(spark, sf_dir))
        if name not in oracles:
            print(f"  ~ {name}: rows={spark_res[0]} (no oracle — rows-only check)")
            continue
        duck_res = value_hash(con.sql(oracles[name]).df())
        ok = spark_res == duck_res
        failures += 0 if ok else 1
        mark = "ok" if ok else "MISMATCH"
        print(f"  {'✓' if ok else '✗'} {name}: {mark} rows={spark_res[0]}/{duck_res[0]}")
        if not ok:
            print(f"      spark: {spark_res}")
            print(f"      duck : {duck_res}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
