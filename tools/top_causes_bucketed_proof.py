"""top_causes production-path proof: the claim-bucketed stored layout.

Same medicine as tools/ccw_bucketed_proof.py (round-7 BASELINE.md
section "top_causes production-path proof"): the fixture ratio derives
BOTH claim facts from `orders` in-flight, which production never does
— the reference reads stored claim tables laid out HASH(claim) on
Synapse (`R/top_causes.R` queries `final.mcaid_claim_header` /
`final.mcaid_claim_icdcm_header`). This tool materializes the same
synthetic facts ONCE as claim-bucketed Spark tables (one file per
bucket, sorted — `sources/io.write_bucketed`) and as plain parquet
for DuckDB, then times `api.top_causes` against the DuckDB equivalent
over the identical stored rows with the interleaved-warm protocol
(both engines back-to-back per round; host drift cancels out of the
ratio).

Usage: python tools/top_causes_bucketed_proof.py SF_DIR [runs]
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

from claims_data_spark.api import top_causes  # noqa: E402
from claims_data_spark.session import get_spark  # noqa: E402
from claims_data_spark.sources.io import write_bucketed  # noqa: E402

GF, GT = "1995-01-01", "1996-12-31"

# SQL_TOP_CAUSES_WINDOW (__spark_entry__.py) with the ev/dx CTEs
# reading the PRE-MATERIALIZED stored tables instead of deriving from
# orders — the production input grain; cohort and the 80-row CCS grid
# stay in-flight on both sides (dimension-sized).
ORACLE = """
WITH coh AS (
  SELECT DISTINCT c_custkey AS id,
    GREATEST(DATE '1995-01-01' + CAST((c_custkey % 200) * 5 AS INT),
             DATE '1995-01-01') AS f,
    LEAST(DATE '1995-01-01' + CAST((c_custkey % 200) * 5 + 180 AS INT),
          DATE '1996-12-31') AS t
  FROM customer
  WHERE NOT (DATE '1995-01-01' + CAST((c_custkey % 200) * 5 + 180 AS INT)
               < DATE '1995-01-01'
          OR DATE '1995-01-01' + CAST((c_custkey % 200) * 5 AS INT)
               > DATE '1996-12-31')
), ev AS (
  SELECT h.claim_header_id AS claim, h.ed_pophealth_id AS ed_id
  FROM tc_hdr h JOIN coh c ON h.id_mcaid = c.id
  WHERE h.first_service_date BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    AND h.primary_diagnosis IS NOT NULL
    AND h.ed_pophealth_id IS NOT NULL
    AND h.first_service_date BETWEEN c.f AND c.t
), dx AS (
  SELECT claim_header_id AS claim, icdcm_norm AS code,
         icdcm_version AS ver
  FROM tc_dx
  WHERE icdcm_number IN ('01', 'admit')
), ref AS (
  SELECT 'C' || CAST(r.range AS INT) AS code, v.ver,
         'cat' || CAST(r.range % 12 AS INT) AS cat,
         CASE WHEN r.range % 10 = 0 THEN 1
              WHEN r.range % 5 = 0 THEN NULL ELSE 0 END AS catch_all
  FROM range(40) r CROSS JOIN (VALUES (9), (10)) v(ver)
), counted AS (
  SELECT ref.cat AS ccs_detail_desc,
         COUNT(DISTINCT ev.ed_id) AS event_count
  FROM ev
  JOIN dx ON ev.claim = dx.claim
  JOIN ref ON dx.code = ref.code AND dx.ver = ref.ver
  WHERE ref.catch_all IS NULL OR ref.catch_all = 0
  GROUP BY ref.cat
)
SELECT ccs_detail_desc, CAST(event_count AS BIGINT) AS event_count,
       CAST(rk AS BIGINT) AS rk
FROM (SELECT *, RANK() OVER (ORDER BY event_count DESC) AS rk
      FROM counted)
WHERE rk <= 10
"""


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    stage = os.path.abspath("spark-warehouse/_tc_proof_parquet")

    spark = get_spark("tc-bucketed-proof")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- one-time setup (the stored production layout; not billed)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    ok = F.col("o_orderkey")
    header = o.select(
        F.col("o_custkey").alias("id_mcaid"),
        ok.alias("claim_header_id"),
        F.col("o_orderdate").cast("date").alias("first_service_date"),
        F.when(ok % 3 == 0, F.floor(ok / 3)).alias("ed_pophealth_id"),
        F.when(ok % 13 != 0, F.lit("dx")).alias("primary_diagnosis"),
    )
    ver = F.when(ok % 2 == 0, 9).otherwise(10).cast("int")
    dx_a = o.select(
        ok.alias("claim_header_id"),
        F.when(ok % 7 == 0, "admit")
        .when(ok % 11 == 0, "03")
        .otherwise("01")
        .alias("icdcm_number"),
        F.concat(F.lit("C"), (ok % 40).cast("int").cast("string"))
        .alias("icdcm_norm"),
        ver.alias("icdcm_version"),
    )
    dx_b = o.select(
        ok.alias("claim_header_id"),
        F.lit("02").alias("icdcm_number"),
        F.concat(F.lit("C"), ((ok + 17) % 40).cast("int").cast("string"))
        .alias("icdcm_norm"),
        ver.alias("icdcm_version"),
    )
    icdcm = dx_a.unionByName(dx_b)
    for t in ("tc_hdr_b", "tc_dx_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    t0 = time.perf_counter()
    write_bucketed(header, "tc_hdr_b", ["claim_header_id"], num_buckets=32,
                   sort_cols=["claim_header_id"])
    write_bucketed(icdcm, "tc_dx_b", ["claim_header_id"], num_buckets=32,
                   sort_cols=["claim_header_id"])
    shutil.rmtree(stage, ignore_errors=True)
    header.write.parquet(f"{stage}/tc_hdr")
    icdcm.write.parquet(f"{stage}/tc_dx")
    setup_s = round(time.perf_counter() - t0, 3)
    print(f"# setup (bucketed + parquet stage): {setup_s}s", file=sys.stderr)

    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    ck = F.col("c_custkey")
    cohort = c.select(
        ck.alias("id_mcaid"),
        F.date_add(F.lit(GF).cast("date"), ((ck % 200) * 5).cast("int"))
        .alias("from_date"),
        F.date_add(F.lit(GF).cast("date"), ((ck % 200) * 5 + 180).cast("int"))
        .alias("to_date"),
    )
    ref = spark.createDataFrame(
        [
            (
                f"C{i}",
                v,
                f"cat{i % 12}",
                1 if i % 10 == 0 else (None if i % 5 == 0 else 0),
            )
            for i in range(40)
            for v in (9, 10)
        ],
        "icdcm string, icdcm_version int, ccs_detail_desc string, "
        "ccs_catch_all int",
    )

    def run():
        return top_causes(
            cohort, spark.table("tc_hdr_b"), spark.table("tc_dx_b"), ref,
            GF, GT, top_n=10, type="ed", catch_all=False, primary_dx=True,
            ind_dates=True,
        )

    # ---- interleaved-warm protocol
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    for t in ("tc_hdr", "tc_dx"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{stage}/{t}/*.parquet')")
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
    n_claim_ex = len(re.findall(
        r"Exchange hashpartitioning\(claim_header_id", plan))
    spark_s, duck_s = round(best, 3), round(dbest, 3)
    print(f"# spark bucketed top_causes: {spark_s}s ({n} rows, "
          f"{n_claim_ex} claim-grain exchange(s))", file=sys.stderr)
    print(f"# duckdb same inputs: {duck_s}s ({dn} rows)", file=sys.stderr)
    spark.stop()

    print(json.dumps({
        "query": "top_causes_window_bucketed",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "setup_sec": setup_s,
        "spark_sec": spark_s,
        "duckdb_sec": duck_s,
        "ratio": round(spark_s / duck_s, 3) if duck_s else None,
        "claim_grain_exchanges": n_claim_ex,
        "rows_match": n == dn,
        "spark_rows": n,
        "duckdb_rows": dn,
    }))


if __name__ == "__main__":
    main()
