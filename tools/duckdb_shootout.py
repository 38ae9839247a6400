"""DuckDB engine shootout: time each HEADLINE query's ORACLE SQL in
DuckDB against the engine's steady-state Spark execution at the same
scale factor.

Why publish a number that mostly favors the other engine: the pandas
shootout already frames the small-sf story (fixed Spark overhead
floors), but pandas is a strawman for OLAP; DuckDB is the strongest
single-node baseline there is, and it executes the EXACT differential
oracle (same semantics, bit-for-bit the same results — that is what
the oracles are for). The honest reading at sf0.1 is therefore a
measured UPPER BOUND on what single-node columnar execution saves
while the data still fits one machine's RAM — and the structural
argument for Spark is unchanged: at 100 TB nothing here fits one
machine, while every Spark plan in the registry is audited for its
distributed shape (partial aggs, broadcasts, bounded windows).

Caveats printed with the table:
- DuckDB runs the oracle FORMULATION (written for differential
  checking, e.g. generated round-chain CTEs) — not hand-tuned DuckDB.
- Iterative Spark queries pay per-round job scheduling that the CTE
  chain does not; both sides compute identical results.

Usage: python tools/duckdb_shootout.py [sf_dir] [bench_json]
  bench_json: a bench.py output file for the Spark column (run
  `python bench.py > /tmp/bench.json` first on an idle machine);
  without it, only DuckDB seconds are printed.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_json = sys.argv[2] if len(sys.argv) > 2 else ""
    spark_times: dict[str, float] = {}
    iterative: set[str] = set()
    if bench_json:
        # bench.py (v3.2+) prints TWO JSON lines — the full record and
        # a compact driver-tail summary; take the richest line that
        # parses (the one carrying "queries")
        b = None
        with open(bench_json) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "queries" in cand and (b is None or "iterative" in cand):
                    b = cand
        if b is None:
            raise SystemExit(f"no parseable bench JSON in {bench_json}")
        spark_times = b["queries"]
        iterative = set(b.get("iterative", []))

    import bench as bench_mod
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    print(f"{'query':32} {'duckdb_s':>9} {'spark_s':>8} {'ratio':>7}")
    duck_total = 0.0
    spark_total = 0.0
    n = 0
    for name in bench_mod.HEADLINE:
        sql = oracles.get(name)
        if not sql:
            continue
        best = None
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        sp = spark_times.get(name)
        mark = "*" if name in iterative else ""
        if sp:
            print(f"{name + mark:32} {best:>9.3f} {sp:>8.3f} {best / sp:>6.2f}x")
            duck_total += best
            spark_total += sp
            n += 1
        else:
            print(f"{name + mark:32} {best:>9.3f} {'-':>8} {'-':>7}")
    if n:
        print(
            f"\n{n} queries: duckdb {duck_total:.1f}s vs spark {spark_total:.1f}s "
            f"(oracle formulation, single-node, data fits RAM; * = iterative)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
