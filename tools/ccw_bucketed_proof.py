"""CCW production-path proof: the claim-bucketed stored layout.

The sf10 `ccw_two_claim` bench row is dominated by the FIXTURE's own
assembly (synthesizing a dx fact from `lineitem JOIN orders` is
8.3-11.5 s of the 10.9 s wall — BASELINE.md:380-399). The production
path reads a STORED claim-keyed dx fact and header (the reference
stages them as Synapse HASH-distributed tables, `load_ccw.R:522-541`);
this tool PROVES that claim instead of arguing it:

1. one-time setup (not billed): materialize the same synthetic dx
   fact + header that `q_ccw_two_claim` assembles, as claim-bucketed
   Spark tables (`sources/io.write_bucketed`) AND as plain parquet
   for DuckDB — both engines read identical pre-built data;
2. timed: `build_claim_ccw` over the bucketed tables vs DuckDB
   executing the equivalent oracle SQL over the parquet, same run,
   min of `runs`;
3. evidence: the executed Spark plan's shuffle-exchange count is
   printed — with bucketed inputs it must be 1 (the engine's one
   explicit (abbrev, id) repartition; the dx-header join and the
   claim-grain membership agg ride the bucket partitioning), which
   `tests/test_plan_shapes.py::test_ccw_bucketed_inputs_single_
   exchange` pins in CI.

Usage: python tools/ccw_bucketed_proof.py SF_DIR [runs]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from claims_data_spark.session import get_spark  # noqa: E402
from claims_data_spark.sources.io import write_bucketed  # noqa: E402
from claims_data_spark.tables.conditions import build_claim_ccw  # noqa: E402

CFG = [
    {
        "ccw_abbrev": "ccw_synth", "dx_fields": "1-2",
        "claim_type_1": "1", "claim_type_2": "2;3",
        "condition_type": 2, "lookback_months": 12,
    },
    {"ccw_abbrev": "ccw_synth_exclude1", "dx_fields": "any"},
]

# same CCW logic as SQL_CCW_TWO_CLAIM (__spark_entry__.py) but reading
# the PRE-MATERIALIZED dx/header tables — the production input grain
ORACLE = """
WITH hits AS (
  SELECT id_mcaid, claim_header_id, first_service_date,
         CAST(substr(icdcm_norm, 2) AS INT) AS code_num, icdcm_number
  FROM ccw_dx
), claim_flags AS (
  SELECT claim_header_id, MAX(id_mcaid) AS id_mcaid,
         MAX(first_service_date) AS first_service_date,
         MAX(CASE WHEN code_num < 5 AND icdcm_number IN ('01','02')
                  THEN 1 ELSE 0 END) AS has_cond,
         MAX(CASE WHEN code_num >= 45 THEN 1 ELSE 0 END) AS has_excl
  FROM hits GROUP BY claim_header_id
), typed AS (
  SELECT DISTINCT f.id_mcaid, f.first_service_date,
     CASE WHEN h.claim_type_id IN (1) THEN f.first_service_date END AS c1,
     CASE WHEN h.claim_type_id IN (2,3) THEN f.first_service_date END AS c2
  FROM claim_flags f JOIN ccw_hdr h USING (claim_header_id)
  WHERE f.has_cond = 1 AND f.has_excl = 0 AND h.claim_type_id IN (1,2,3)
), calc AS (
  SELECT *,
    date_diff('day',   c2, lead(c2) OVER w) AS dfwd,
    date_diff('month', c2, lead(c2) OVER w) AS mfwd,
    date_diff('day',   lag(c2) OVER w, c2) AS dback,
    date_diff('month', lag(c2) OVER w, c2) AS mback
  FROM typed WINDOW w AS (PARTITION BY id_mcaid ORDER BY c2)
), kept AS (
  SELECT * FROM calc
  WHERE c1 IS NOT NULL
     OR (c2 IS NOT NULL AND ((mfwd <= 12 AND dfwd >= 1)
                          OR (mback <= 12 AND dback >= 1)))
)
SELECT id_mcaid, 'ccw_synth' AS ccw_desc,
  CAST(LEAST(MIN(c1), MIN(c2)) AS VARCHAR) AS first_encounter_date,
  CAST(GREATEST(MAX(c1), MAX(c2)) AS VARCHAR) AS last_encounter_date
FROM kept GROUP BY id_mcaid
"""


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    stage = os.path.abspath("spark-warehouse/_ccw_proof_parquet")

    spark = get_spark("ccw-bucketed-proof")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- one-time setup (the stored production layout; not billed)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    icdcm = li.join(
        o.select("o_orderkey", "o_custkey", "o_orderdate"),
        li["l_orderkey"] == o["o_orderkey"],
    ).select(
        F.col("o_custkey").alias("id_mcaid"),
        F.col("o_orderkey").alias("claim_header_id"),
        F.col("o_orderdate").cast("date").alias("first_service_date"),
        F.format_string("C%03d", F.col("l_partkey") % 50).alias("icdcm_norm"),
        F.lit(10).alias("icdcm_version"),
        F.lpad(F.col("l_linenumber").cast("string"), 2, "0").alias(
            "icdcm_number"
        ),
    )
    header = o.select(
        F.col("o_orderkey").alias("claim_header_id"),
        (F.col("o_orderkey") % 6).cast("int").alias("claim_type_id"),
    )
    for t in ("ccw_dx_b", "ccw_hdr_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    t0 = time.perf_counter()
    write_bucketed(icdcm, "ccw_dx_b", ["claim_header_id"], num_buckets=32,
                   sort_cols=["claim_header_id"])
    write_bucketed(header, "ccw_hdr_b", ["claim_header_id"], num_buckets=32,
                   sort_cols=["claim_header_id"])
    shutil.rmtree(stage, ignore_errors=True)
    icdcm.write.parquet(f"{stage}/ccw_dx")
    header.write.parquet(f"{stage}/ccw_hdr")
    setup_s = round(time.perf_counter() - t0, 3)
    print(f"# setup (bucketed + parquet stage): {setup_s}s", file=sys.stderr)

    # ---- timed Spark path over the bucketed tables
    def run():
        return build_claim_ccw(
            spark.table("ccw_dx_b"), spark.table("ccw_hdr_b"),
            spark.range(50).select(
                F.format_string("C%03d", F.col("id")).alias("icdcm"),
                F.lit(10).alias("icdcm_version"),
                F.when(F.col("id") < 5, 1).otherwise(0).alias("ccw_synth"),
                F.when(F.col("id") >= 45, 1).otherwise(0).alias(
                    "ccw_synth_exclude1"
                ),
            ),
            CFG,
        )

    # ---- interleaved-warm protocol (the BASELINE.md round-7 standard
    # scale_proof.py uses): both engines back-to-back within each
    # round after an untimed warm-up, so the ±2x host-speed swings
    # observed BETWEEN phases cancel out of the ratio instead of
    # landing entirely on whichever engine ran second.
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW ccw_dx AS SELECT * FROM "
                f"read_parquet('{stage}/ccw_dx/*.parquet')")
    con.execute(f"CREATE VIEW ccw_hdr AS SELECT * FROM "
                f"read_parquet('{stage}/ccw_hdr/*.parquet')")
    # untimed warm-up, both engines, 2 rounds: a single Spark pass
    # leaves C2 JIT mid-compile on the fused codegen stage (round-10
    # decomposition: run walls 17.5 -> 6.8 -> 2.4 s on identical
    # plans), so min-of-N after one warm-up still bills compiler time
    for _ in range(2):
        run().count()
        con.execute(ORACLE).fetchall()

    best, dbest, n, dn = None, None, 0, 0
    for _ in range(runs):
        t0 = time.perf_counter()
        df = run()
        n = df.count()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
        t0 = time.perf_counter()
        dn = len(con.execute(ORACLE).fetchall())
        el = time.perf_counter() - t0
        dbest = el if dbest is None else min(dbest, el)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_ex = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    n_sorts = len(re.findall(r"\bSort \[", plan))
    spark_s = round(best, 3)
    duck_s = round(dbest, 3)
    print(f"# spark bucketed ccw: {spark_s}s ({n} rows, "
          f"{n_ex} shuffle exchange(s), {n_sorts} sort(s))", file=sys.stderr)
    print(f"# duckdb same inputs: {duck_s}s ({dn} rows)", file=sys.stderr)
    spark.stop()

    print(json.dumps({
        "query": "ccw_two_claim_bucketed",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "setup_sec": setup_s,
        "spark_sec": spark_s,
        "duckdb_sec": duck_s,
        "ratio": round(spark_s / duck_s, 3) if duck_s else None,
        "shuffle_exchanges": n_ex,
        "sorts": n_sorts,
        "rows_match": n == dn,
        "spark_rows": n,
        "duckdb_rows": dn,
    }))


if __name__ == "__main__":
    main()
