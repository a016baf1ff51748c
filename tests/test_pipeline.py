"""Master pipeline orchestrator: full DAG on the fixtures with QA
gates, and the strict-QA failure mode."""

import pytest
from pyspark.sql import functions as F

from claims_data_spark.pipeline import run_mcaid_pipeline
from tests import fixtures as fx


def test_full_pipeline_with_qa(spark):
    clean, geocode = fx.ref_address(spark)
    result = run_mcaid_pipeline(
        spark,
        fx.raw_mcaid_elig(spark),
        fx.raw_mcaid_claim(spark),
        ref_rac=fx.ref_rac_code(spark),
        ref_address=clean,
        ref_geocode=geocode,
        ref_xwalk=fx.ref_claim_type_xwalk(spark),
        ref_hedis=fx.ref_hedis(spark),
        ref_telehealth=fx.ref_telehealth(spark),
        ref_icdcm=fx.ref_icdcm_codes(spark),
        ref_rda=fx.ref_rda_value_sets(spark),
        ccw_config=[r.asDict() for r in fx.ref_ccw_lookup(spark).collect()],
    )
    assert set(result.tables) == {
        "elig_demo", "elig_timevar", "elig_month", "claim_line",
        "claim_icdcm_header", "claim_procedure", "claim_pharm",
        "claim_header", "claim_ccw", "claim_bh",
    }
    assert result.failures() == []
    log = result.qa_log(spark)
    assert log.filter(F.col("qa_result") == "FAIL").count() == 0
    assert log.count() == len(result.qa)
    # downstream tables materialize
    assert result.tables["claim_ccw"].count() > 0
    assert result.tables["claim_bh"].count() > 0


def test_pipeline_strict_qa_raises(spark):
    # duplicate claim-line rows with different dates break line-key
    # uniqueness -> strict gate must stop the load like the reference
    raw_claim = fx.raw_mcaid_claim(spark)
    dup = raw_claim.unionByName(
        raw_claim.limit(1).withColumn("FROM_SRVC_DATE", F.date_add("FROM_SRVC_DATE", 1))
    )
    with pytest.raises(AssertionError, match="QA FAIL claim_line"):
        run_mcaid_pipeline(
            spark, fx.raw_mcaid_elig(spark), dup,
            ref_xwalk=fx.ref_claim_type_xwalk(spark),
        )
    # non-strict: recorded, not raised
    result = run_mcaid_pipeline(
        spark, fx.raw_mcaid_elig(spark), dup,
        ref_xwalk=fx.ref_claim_type_xwalk(spark),
        strict_qa=False,
    )
    assert any(t == "claim_line" for t, _ in result.failures())
