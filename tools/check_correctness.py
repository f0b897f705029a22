"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf parquet tables, then compares row count, sorted
column names, and the multiset of normalized row values.  Exact value
equality here implies any order-insensitive value hash matches.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from collections import Counter
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, dt.datetime):
        # Keep tz-awareness visible: a tz-aware value normalizes to UTC with an
        # explicit offset, so it can never equal a naive value.  The driver's
        # gate distinguishes TIMESTAMP from TIMESTAMPTZ; stripping tzinfo here
        # (as this tool did before round 6) hid exactly that class of oracle
        # bug (r25_sliding_window).
        if v.tzinfo is not None:
            return v.astimezone(dt.timezone.utc).isoformat(sep=" ")
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm(r[i]) for i in order) for r in rows)


def canon_spark_type(t) -> str:
    """Spark DataType -> canonical comparison string."""
    try:
        from pyspark.sql import types as T

        if isinstance(t, T.ArrayType):
            return f"array<{canon_spark_type(t.elementType)}>"
    except Exception:
        pass
    s = t.simpleString()
    return {
        "int": "int32",
        "integer": "int32",
        "bigint": "int64",
        "smallint": "int16",
        "tinyint": "int8",
        "float": "float32",
        "double": "float64",
        "string": "string",
        "date": "date",
        # Spark TimestampType collects as naive datetimes (session-tz
        # rendered); the driver pairs it with DuckDB's plain TIMESTAMP.
        "timestamp": "timestamp",
        "timestamp_ntz": "timestamp",
        "boolean": "bool",
        "binary": "binary",
    }.get(s, s)


def canon_duck_type(t) -> str:
    """DuckDB type object -> canonical comparison string."""
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return s.lower().replace(" ", "")
    base = {
        "INTEGER": "int32",
        "BIGINT": "int64",
        "HUGEINT": "int128",
        "SMALLINT": "int16",
        "TINYINT": "int8",
        "UINTEGER": "uint32",
        "UBIGINT": "uint64",
        "FLOAT": "float32",
        "DOUBLE": "float64",
        "VARCHAR": "string",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "TIMESTAMP WITH TIME ZONE": "timestamptz",
        "TIMESTAMPTZ": "timestamptz",
        "BOOLEAN": "bool",
        "BLOB": "binary",
    }
    if s in base:
        return base[s]
    if s.endswith("[]"):
        return f"array<{canon_duck_type(s[:-2])}>"
    return s.lower()


def compare_types(s_schema, d_cols, d_types):
    """Return a list of 'col: spark=X duckdb=Y' strings for type conflicts.

    Compared per column name (the name sets are checked separately).  This is
    the driver-strict check the pre-round-6 tool lacked: a Spark TIMESTAMP
    column against a DuckDB TIMESTAMPTZ oracle column is a schema failure even
    when the instants agree (the r25_sliding_window blind spot).
    """
    d_map = {c: canon_duck_type(t) for c, t in zip(d_cols, d_types)}
    bad = []
    for f in s_schema.fields:
        if f.name not in d_map:
            continue
        st, dtp = canon_spark_type(f.dataType), d_map[f.name]
        if st != dtp:
            bad.append(f"{f.name}: spark={st} duckdb={dtp}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from polars_incremental_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_schema = sdf.schema
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows, no oracle)")
            continue
        try:
            res = con.sql(sql)
            d_cols = [c for c in res.columns]
            d_types = list(res.types)
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        type_bad = compare_types(s_schema, d_cols, d_types)
        if type_bad:
            problems.append("types " + "; ".join(type_bad))
        if not problems:
            ms, md = rows_to_multiset(s_cols, s_rows), rows_to_multiset(d_cols, d_rows)
            if ms != md:
                diff_s = ms - md
                diff_d = md - ms
                ex_s = list(diff_s.items())[:3]
                ex_d = list(diff_d.items())[:3]
                problems.append(
                    f"values differ ({sum(diff_s.values())} spark-only, "
                    f"{sum(diff_d.values())} duckdb-only)\n"
                    f"    spark-only: {ex_s}\n    duckdb-only: {ex_d}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
