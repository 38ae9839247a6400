"""Local mirror of the driver's t2 differential gate.

Runs every `__spark_entry__.queries()` entry at sf0.01 next to its
`oracle_sql()` DuckDB statement and compares row count, column names,
and an order-insensitive value hash. Usage:

    python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# override with SPARK_GRAFT_CHECK_SF_DIR to run the differential gate
# at another scale (e.g. sf0.1 for scale-dependent collision paths)
SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")


def _norm_cell(v) -> str:
    """TYPE-TAGGED rendering (r12 hardening, VERDICT r11 Next #3).

    The r11 driver red (events_drift_scores / orders_constraint_audit)
    was a cell-TYPE divergence the old normalizer coerced away: DuckDB
    SUM(BIGINT/INTEGER) returns HUGEINT, which the driver's fetch path
    renders as float64 ("145.0") while Spark emits int ("145") — the
    old float branch collapsed int-valued floats to "1" so the mirror
    passed what the driver failed. The mirror must be STRICTER than
    any plausible driver normalizer: every cell carries its Python
    type as a prefix, so bool-vs-int, Decimal-vs-float,
    date-vs-midnight-timestamp, and -0.0-vs-0.0 all FAIL locally
    unless both engines emit the identical type and value. The house
    emission conventions that survive this gate are documented in
    __spark_entry__'s module docstring.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "b:1" if v else "b:0"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:" + repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    import decimal

    if isinstance(v, decimal.Decimal):
        # never coerced: a Decimal output fails against any non-Decimal
        # sibling, forcing the house convention (cast to double/bigint
        # before emission) — the driver fetch renders DECIMAL as
        # float64 on the DuckDB side but Decimal objects on the Spark
        # side, so Decimals must not reach the output surface at all
        return "dec:" + str(v)
    if isinstance(v, bytes):
        return "bytes:" + v.hex()
    if hasattr(v, "isoformat"):
        if hasattr(v, "hour"):  # datetime (tz offset included if aware)
            return "ts:" + v.isoformat(sep=" ")
        return "d:" + v.isoformat()  # bare date
    return "s:" + str(v)


# Spark simpleString / DuckDB type → canonical class for the output-
# surface police. Classes must MATCH exactly; anything mapping to a
# "never" class fails outright (the driver's pandas/arrow fetch renders
# it differently from fetchall, so no query may emit it).
_SPARK_CANON = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "double": "f64", "float": "f32", "boolean": "bool",
    "string": "str", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts",
    "binary": "bytes", "void": "null",
}
_DUCK_CANON = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
    "BIGINT": "int", "UBIGINT": "int", "UINTEGER": "int",
    "USMALLINT": "int", "UTINYINT": "int",
    "DOUBLE": "f64", "FLOAT": "f32", "BOOLEAN": "bool",
    "VARCHAR": "str", "DATE": "date", "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "tstz", "BLOB": "bytes",
    "HUGEINT": "NEVER:hugeint", "UHUGEINT": "NEVER:uhugeint",
    "TIME": "NEVER:time", '"NULL"': "null", "NULL": "null",
}


def _canon_spark(dt: str) -> str:
    dt = dt.strip()
    if dt.startswith("array<") and dt.endswith(">"):
        return "list<" + _canon_spark(dt[6:-1]) + ">"
    if dt.startswith("decimal"):
        return "NEVER:" + dt
    return _SPARK_CANON.get(dt, "UNKNOWN:" + dt)


def _canon_duck(dt: str) -> str:
    dt = dt.strip()
    if dt.endswith("[]"):
        return "list<" + _canon_duck(dt[:-2]) + ">"
    if dt.startswith("DECIMAL"):
        return "NEVER:" + dt.lower()
    return _DUCK_CANON.get(dt, "UNKNOWN:" + dt)


def type_police(
    scols: list[str], sdtypes: list[str], dcols: list[str], dtypes: list[str]
) -> list[str]:
    """Column-type gate: Spark and DuckDB output dtypes must canonize
    identically, and neither side may emit a type the driver's fetch
    path renders differently from fetchall (HUGEINT, DECIMAL, TIME).
    Returns a list of problems (empty = clean)."""
    smap = {c.lower(): _canon_spark(t) for c, t in zip(scols, sdtypes)}
    dmap = {c.lower(): _canon_duck(str(t)) for c, t in zip(dcols, dtypes)}
    problems = []
    for col in sorted(set(smap) & set(dmap)):
        sc, dc = smap[col], dmap[col]
        for side, c in (("spark", sc), ("duckdb", dc)):
            if c.startswith("NEVER:"):
                problems.append(
                    f"{col}: {side} emits {c[6:]} (driver-unsafe type)"
                )
            elif c.startswith("UNKNOWN:"):
                problems.append(f"{col}: {side} type {c[8:]} not in canon map")
        if sc != dc and not (
            sc.startswith(("NEVER:", "UNKNOWN:"))
            or dc.startswith(("NEVER:", "UNKNOWN:"))
        ):
            problems.append(f"{col}: dtype spark={sc} vs duckdb={dc}")
    return problems


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from social_media_data_pipeline_spark.session import get_spark

    only = set(sys.argv[1:])
    if os.environ.get("CHECK_PLAIN_SESSION"):
        # simulate the driver: a session WITHOUT the engine factory confs
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_plain")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            sdtypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        scols_l = [c.lower() for c in scols]
        problems = []
        if sorted(scols_l) != sorted(dcols):
            problems.append(f"columns {scols_l} vs {dcols}")
        else:
            problems.extend(
                type_police(scols, sdtypes, rel.columns, rel.types)
            )
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems:
            sh = value_hash(scols_l, srows)
            dh = value_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
                # print first diffs for debugging
                sset = {
                    "|".join(
                        _norm_cell(r[i])
                        for i in sorted(range(len(scols_l)), key=lambda i: scols_l[i])
                    )
                    for r in srows
                }
                dset = {
                    "|".join(
                        _norm_cell(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                }
                for x in sorted(sset - dset)[:3]:
                    print(f"   spark-only: {x[:200]}")
                for x in sorted(dset - sset)[:3]:
                    print(f"   duck-only:  {x[:200]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures.append(name)
        else:
            print(f"OK   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
