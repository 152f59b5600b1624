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


def _canon_arrow_type(t) -> str:
    """Canonical logical-type token for an Arrow type: distinguishes
    int32 from int64 and date from timestamp (the driver's schema_match
    does — VERDICT r5 #2) while collapsing engine noise (large_string vs
    string, timestamp unit/tz, decimal precision)."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"array<{_canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            f"{f.name}:{_canon_arrow_type(f.type)}" for f in t
        ) + ">"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _canon_pandas_dtype(s) -> str:
    """Canonical token for a pandas column (unit-test path only — the
    gate itself compares Arrow schemas from both engines)."""
    import numpy as np

    dt = s.dtype
    if np.issubdtype(dt, np.integer):
        return f"int{dt.itemsize * 8}"
    if np.issubdtype(dt, np.floating):
        return f"float{dt.itemsize * 8}"
    if np.issubdtype(dt, np.bool_):
        return "bool"
    if np.issubdtype(dt, np.datetime64):
        return "timestamp"
    return "object"


def canon(v):
    """Canonical string for one value: full-precision floats (1 ulp flips
    the hash), NaN distinct from NULL, engine-neutral renderings for
    decimals / tz-aware timestamps / nested arrays."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        # repr(float(x)) = shortest string that round-trips the exact
        # bits (normalizes numpy-2 'np.float64(…)' reprs away)
        return "NaN" if v != v else repr(float(v))
    if isinstance(v, decimal.Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, pd.Timestamp):
        if v.tz is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat() if v.tzinfo is None else canon(pd.Timestamp(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, np.floating):
        x = float(v)
        return "NaN" if x != x else repr(x)
    try:
        if v != v:  # non-float NaN-likes (e.g. pandas NaT)
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def value_hash(df) -> tuple[int, tuple, tuple, str]:
    """Order-insensitive fingerprint: (row count, sorted column names,
    canonical column TYPES, sha256 of canonicalized sorted rows).

    Accepts a Spark DataFrame (compared via ``toArrow()``), a pyarrow
    Table (the DuckDB side passes ``rel.arrow()``), or a plain pandas
    DataFrame (unit tests). Types ride both in the returned tuple and in
    the hash, so an int32-vs-int64 or date-vs-timestamp divergence that
    renders identical values still mismatches — the driver's
    schema_match would catch it, so the replica must too (VERDICT r5 #2).
    Floats canonicalize at FULL precision (a 1-ulp difference changes
    the hash) and NaN is distinguished from NULL. Pinned by
    test_gate_hermeticity."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(df, pd.DataFrame):
        pdf = df[sorted(df.columns)]
        types = tuple(_canon_pandas_dtype(pdf[c]) for c in pdf.columns)
    else:
        tbl = df if isinstance(df, pa.Table) else df.toArrow()
        tbl = tbl.select(sorted(tbl.column_names))
        types = tuple(_canon_arrow_type(f.type) for f in tbl.schema)
        pdf = tbl.to_pandas(date_as_object=True)

    rows = sorted(
        "\x1f".join(canon(v) for v in row) for row in pdf.itertuples(index=False)
    )
    payload = "\x1e".join(types) + "\n" + "\n".join(rows)
    h = hashlib.sha256(payload.encode()).hexdigest()
    return len(pdf), tuple(pdf.columns), types, h


def container_types(types) -> list[str]:
    """Canonical type tokens the DRIVER's canonicalizer cannot hash
    (pandas sort_values raises `unhashable type` on list/dict cells —
    the r6 4-red-row failure class). The replica fails such results even
    when both engines agree (replica ≥ driver strictness, VERDICT r6 #2)."""
    return [t for t in types if t.startswith(("array<", "struct<", "map<"))]


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
        bad = container_types(spark_res[2])
        if bad:
            failures += 1
            print(f"  ✗ {name}: CONTAINER-TYPED output {bad} — the driver "
                  "canon cannot hash it; serialize to scalars")
            continue
        if name not in oracles:
            print(f"  ~ {name}: rows={spark_res[0]} (no oracle — rows-only check)")
            continue
        duck_res = value_hash(con.sql(oracles[name]).arrow())
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
