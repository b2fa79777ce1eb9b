"""Mimic the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() in DuckDB (row count, schema
names, order-insensitive value comparison).

Usage: PYTHONPATH=/root/repo python scripts/check_oracles.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(norm_cell(row[i]) for i in order))
    return sorted(out)


def arrow_kind(t):
    """Collapse an arrow type to the equivalence class the driver's
    value-hash is sensitive to: integer width family, float, decimal,
    string, bool, temporal.  DECIMAL vs BIGINT vs DOUBLE is exactly the
    class of mismatch that passed the 6-sig-fig normalizer in round 1
    but failed the driver hash (VERDICT r1 'What's wrong' #1)."""
    import pyarrow as pa
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_kind(t.value_type)}>"
    return str(t)


def dtype_mismatches(sdf, d_schema):
    """Strict dtype comparison: Spark's Arrow schema vs DuckDB's."""
    try:
        s_schema = sdf.limit(0).toArrow().schema
    except Exception as exc:  # toArrow unavailable for some types
        return [f"(dtype check skipped: {type(exc).__name__})"]
    d_by_name = {f.name: f.type for f in d_schema}
    bad = []
    for f in s_schema:
        if f.name in d_by_name:
            sk, dk = arrow_kind(f.type), arrow_kind(d_by_name[f.name])
            if sk != dk:
                bad.append(f"{f.name}: spark={sk}({f.type}) duck={dk}({d_by_name[f.name]})")
    return bad


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .appName("oracle-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {str(exc)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            dtable = res.fetch_arrow_table()
            dtype_bad = dtype_mismatches(sdf, dtable.schema)
            drows = [tuple(d[c] for c in dcols) for d in dtable.to_pylist()]
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {str(exc)[:200]}")
            failures += 1
            continue
        if dtype_bad:
            print(f"FAIL  {name}: dtype mismatch: {dtype_bad}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        a = norm_rows(scols, srows)
        b = norm_rows(dcols, drows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            failures += 1
            continue
        print(f"OK    {name}: {len(srows)} rows match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
