"""Pin the honest same-scale 2x denominator: run the headline
queries' DuckDB oracle SQL at sf0.1 and print per-query + total
wall-clock as ONE JSON line. Results get recorded in BASELINE.md so
BENCH_r{N} has a same-data, same-machine reference point (the
reference repo publishes only production Synapse wall-clocks at
incomparable scale).

Usage: python tools/duckdb_bench.py [sf_dir] [runs] [section]
``section`` = headline (default) | extended | all — the extended list
can run alone because three HEADLINE oracles are pathological at sf1
(recursive-CTE packing 604 s etc., BASELINE.md) and dominate the wall.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import EXTENDED, HEADLINE  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    section = sys.argv[3] if len(sys.argv) > 3 else "headline"
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    timings: dict[str, float] = {}
    ext_timings: dict[str, float] = {}
    skipped = []
    names = {"headline": HEADLINE, "extended": EXTENDED,
             "all": HEADLINE + EXTENDED}[section]
    for name in names:
        if name not in oracles:
            skipped.append(name)  # rows-only: no SQL formulation exists
            continue
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        (timings if name in HEADLINE else ext_timings)[name] = round(best, 3)
    print(json.dumps({
        "metric": "duckdb_oracle_headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "extended": ext_timings,
        "skipped_rows_only": skipped,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
