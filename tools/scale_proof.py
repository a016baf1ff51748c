"""Scale-point evidence for the weak set (round-5 verdict task 1).

The 8 'correct but >2x DuckDB at sf1' queries are all flat-with-scale
job cascades; the claim that the fixed scheduling floor amortizes at
larger data needs a measured point, not extrapolation. This tool runs
each weak query AND its DuckDB oracle in the SAME session at a given
sf directory and prints one JSON line per query plus a summary —
BASELINE.md records the table.

Usage: python tools/scale_proof.py SF_DIR [runs] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import DUCKDB_TABLES  # noqa: E402
from claims_data_spark.session import get_spark  # noqa: E402

# default set = the CURRENT weak/watch list (correct but >2x DuckDB at
# the honest scale point, or floor-trend entries awaiting crossover);
# end-of-r09 state — pass query names to override. Round-9 closures:
# winnow_near_dup (1.93 -> 1.03x at sf10 after the spread() row-group
# probe), url_dedup (2.69 -> 1.45x, same single-row-group root cause)
# and corpus_diff (sf30 row published: 1.45x). Kept: the three
# decomposed-red entries whose rows of record are production layouts
# (BASELINE.md round-9 watch table) — ccw bucketed 2.1-2.6x, rda
# realistic-vocab floor row, top_causes bucketed
# (tools/top_causes_bucketed_proof.py).
WEAK_SET = [
    "ccw_two_claim",
    "rda_value_set",
    "top_causes_window",
]


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or WEAK_SET
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    spark = get_spark("scale-proof")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    import duckdb

    con = duckdb.connect()
    for t in DUCKDB_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    # INTERLEAVED protocol (round-7 revision): sub-5s walls drift
    # ~30% with host/FS-cache state ACROSS sessions, which is wider
    # than the 2x gate the ratio feeds — so both engines now run
    # back-to-back per query in the SAME session, after one untimed
    # warm-up pass each, and the ratio is min-over-runs of each
    # engine under identical host state. Cross-session drift cancels
    # out of the ratio by construction.
    spark_t: dict[str, float] = {}
    spark_rows: dict[str, int] = {}
    jobs: dict[str, int] = {}
    duck_t: dict[str, float] = {}
    duck_rows: dict[str, int] = {}
    for name in names:
        has_oracle = name in oracles
        # warm-up, untimed: page cache + plan/codegen caches
        qs[name](spark, sf_dir).count()
        spark.catalog.clearCache()
        if has_oracle:
            con.execute(oracles[name]).fetchall()
        s_best = d_best = None
        for run in range(runs):
            group = f"{name}#r{run}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            el = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            s_best = el if s_best is None else min(s_best, el)
            jobs[name] = len(tracker.getJobIdsForGroup(group))
            spark.catalog.clearCache()
            if has_oracle:
                t0 = time.perf_counter()
                rows = con.execute(oracles[name]).fetchall()
                dt = time.perf_counter() - t0
                d_best = dt if d_best is None else min(d_best, dt)
        spark_t[name] = round(s_best, 3)
        spark_rows[name] = n
        print(f"# spark {name}: {s_best:.3f}s ({n} rows, {jobs[name]} jobs)",
              file=sys.stderr)
        if has_oracle:
            duck_t[name] = round(d_best, 3)
            duck_rows[name] = len(rows)
            print(f"# duckdb {name}: {d_best:.3f}s ({len(rows)} rows)",
                  file=sys.stderr)
    spark.stop()

    out = {
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs": runs,
        "protocol": "interleaved-warm",
        "queries": {
            n: {
                "spark_sec": spark_t[n],
                "duckdb_sec": duck_t.get(n),
                "ratio": (
                    round(spark_t[n] / duck_t[n], 2) if duck_t.get(n) else None
                ),
                "jobs": jobs[n],
                "rows_match": (
                    spark_rows[n] == duck_rows[n] if n in duck_rows else None
                ),
            }
            for n in names
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
