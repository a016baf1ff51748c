"""Scratch decomposition harness for the ccw_two_claim bucketed row
(round-10 perf work): rebuilds the claim-bucketed fixture tables if
the in-memory catalog lacks them, then times the full engine against
hand-assembled sub-plans so the residual above the DuckDB oracle can
be attributed to a specific stage. Not part of the driver surface.

Usage: python tools/ccw_decomp.py SF_DIR [runs]
"""

from __future__ import annotations

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
    {"ccw_abbrev": "ccw_synth", "dx_fields": "1-2", "claim_type_1": "1",
     "claim_type_2": "2;3", "condition_type": 2, "lookback_months": 12},
    {"ccw_abbrev": "ccw_synth_exclude1", "dx_fields": "any"},
]
CODES = ["C%03d" % i for i in list(range(5)) + list(range(45, 50))]


def setup(spark, sf_dir):
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
    write_bucketed(icdcm, "ccw_dx_b", ["claim_header_id"], num_buckets=32,
                   sort_cols=["claim_header_id"])
    write_bucketed(header, "ccw_hdr_b", ["claim_header_id"], num_buckets=32,
                   sort_cols=["claim_header_id"])


def ref(spark):
    return spark.range(50).select(
        F.format_string("C%03d", F.col("id")).alias("icdcm"),
        F.lit(10).alias("icdcm_version"),
        F.when(F.col("id") < 5, 1).otherwise(0).alias("ccw_synth"),
        F.when(F.col("id") >= 45, 1).otherwise(0).alias(
            "ccw_synth_exclude1"
        ),
    )


def main():
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ccw-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    setup(spark, sf_dir)
    dx = spark.table("ccw_dx_b")
    hdr = spark.table("ccw_hdr_b")

    def tm(label, mk):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            n = mk().count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        print(f"{label}: {best:.3f}s ({n} rows)", flush=True)
        return best

    def eng():
        return build_claim_ccw(dx, hdr, ref(spark), CFG)

    def filt():
        return dx.filter(F.col("icdcm_norm").isin(CODES)).select(
            "id_mcaid", "claim_header_id", "first_service_date",
            "icdcm_norm", "icdcm_number",
        )

    def hj():
        return filt().join(
            hdr.filter(F.col("claim_type_id").isin([1, 2, 3])).select(
                "claim_header_id", "claim_type_id"
            ),
            "claim_header_id",
        )

    def agg():
        return (
            hj()
            .select(
                "claim_header_id", "id_mcaid", "first_service_date",
                "claim_type_id",
                F.when(
                    F.col("icdcm_norm") < "C005",
                    F.when(
                        F.col("icdcm_number").isin("01", "02"),
                        F.lit(1).cast("long"),
                    ).otherwise(F.lit(0).cast("long")),
                ).otherwise(F.lit(0).cast("long")).alias("cb"),
                F.when(
                    F.col("icdcm_norm") >= "C045", F.lit(1).cast("long")
                ).otherwise(F.lit(0).cast("long")).alias("eb"),
            )
            .groupBy("claim_header_id")
            .agg(
                F.first("id_mcaid"),
                F.first("first_service_date"),
                F.first("claim_type_id"),
                F.bit_or("cb").alias("cb"),
                F.bit_or("eb").alias("eb"),
            )
        )

    tm("dx code-filtered scan", lambda: filt().select("claim_header_id"))
    tm("+ header zip join", hj)
    tm("+ hand-inlined claim agg", agg)
    tm("full engine", eng)
    plan = eng()._jdf.queryExecution().executedPlan().toString()
    print("engine joins:", re.findall(
        r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", plan))
    print("engine exchanges:", len(re.findall(
        r"Exchange (?:hash|range)partitioning", plan)))
    spark.stop()


if __name__ == "__main__":
    main()
