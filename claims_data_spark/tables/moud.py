"""MOUD (medication for opioid use disorder) claim table
(reference: ``load_stage.mcaid_claim_moud.R:1-432``).

The reference builds this in 8 temp-table steps; here it is one lazy
DataFrame DAG: code-list flagging (broadcast ref joins), the H0033
methadone-vs-buprenorphine monthly-sum disambiguation (person-month
window), same-day HCPCS-vs-NDC dedup (two windows), and the
next-service-date methadone days-supply estimator (lead + per-quarter
exact median). Every shuffle is on the person id or the claim id; the
code lists are literals compiled into the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# HCPCS code lists (load_stage.mcaid_claim_moud.R:31-46)
MOUD_PROC_TBD = ["H0033"]
METH_PROC = ["H0020", "S0109", "G2078", "G2067"]
BUP_PROC = [
    "J0571", "J0572", "J0573", "J0574", "J0575", "G2068", "G2079",
    "Q9991", "Q9992", "G2069", "G2070", "G2072", "J0570", "J0577",
]
BUP_PROC_TBD = ["96372", "11981", "11983", "G0516", "G0518"]
NAL_PROC = ["G2073", "J2315"]
UNSPEC_PROC = [
    "G2074", "G2075", "G2076", "G2077", "G2080", "G2086", "G2087",
    "G2088", "G2213",
]
ALL_MOUD_PROC = (
    MOUD_PROC_TBD + METH_PROC + BUP_PROC + BUP_PROC_TBD + NAL_PROC
    + UNSPEC_PROC
)

# days-supply per code (R:47-52)
_SUPPLY_1 = ["H0033", "H0020", "S0109", "J0571", "J0572", "J0573",
             "J0574", "J0575"]
_SUPPLY_7 = ["G2078", "G2067", "G2068", "G2079", "J0577"]
_SUPPLY_30 = ["Q9991", "Q9992", "G2069", "G2073", "J2315", "96372"]
_SUPPLY_180 = ["G2070", "G2072", "J0570", "11981", "11983", "G0516",
               "G0518"]

# administration method (R:53-57)
_ADMIN_ORAL = ["H0033", "H0020", "S0109", "G2078", "G2067", "J0571",
               "J0572", "J0573", "J0574", "J0575", "G2068", "G2079",
               "G2073"]
_ADMIN_INJ = ["Q9991", "Q9992", "G2069", "G2070", "G2072", "J0570",
              "11981", "11983", "G0516", "G0518", "G2073", "J2315",
              "J0577", "96372"]

# codes whose MOUD status needs a primary OUD diagnosis (R:103-113)
_NEEDS_OUD_DX = MOUD_PROC_TBD + BUP_PROC_TBD + NAL_PROC


def _in(vals) -> str:
    """SQL IN-list text for a code list (codes are plain literals;
    compiling to text instead of Column .isin calls keeps the builder's
    driver time off the py4j socket — ~5.6k crossings profiled)."""
    return "(" + ", ".join(
        "'" + v.replace("'", "''") + "'" for v in vals
    ) + ")"


def _proc_step(
    procedure: DataFrame,
    header: DataFrame,
    oud_dx_codes: DataFrame,
    id_col: str,
    start_date: str,
) -> DataFrame:
    """Steps 1-3: flag MOUD procedure claims, attach the primary-OUD
    diagnosis flag, apply the needs-dx subset rules."""
    p = F.col("procedure_code")
    flagged = procedure.filter(
        (F.col("last_service_date") >= start_date)
        & F.expr(f"procedure_code IN {_in(ALL_MOUD_PROC)}")
    ).selectExpr(
        id_col,
        "claim_header_id",
        "first_service_date",
        "last_service_date",
        "procedure_code",
        f"CAST(procedure_code IN {_in(MOUD_PROC_TBD)} AS INT)"
        " AS moud_proc_flag_tbd",
        f"CAST(procedure_code IN {_in(METH_PROC)} AS INT)"
        " AS meth_proc_flag",
        f"CAST(procedure_code IN {_in(BUP_PROC + BUP_PROC_TBD)} AS INT)"
        " AS bup_proc_flag",
        f"CAST(procedure_code IN {_in(NAL_PROC)} AS INT)"
        " AS nal_proc_flag",
        f"CAST(procedure_code IN {_in(UNSPEC_PROC)} AS INT)"
        " AS unspec_proc_flag",
        f"CASE WHEN procedure_code IN {_in(_SUPPLY_1)} THEN 1"
        f" WHEN procedure_code IN {_in(_SUPPLY_7)} THEN 7"
        f" WHEN procedure_code IN {_in(_SUPPLY_30)} THEN 30"
        f" WHEN procedure_code IN {_in(_SUPPLY_180)} THEN 180"
        " ELSE 0 END AS moud_days_supply",
        f"CASE WHEN procedure_code IN {_in(_ADMIN_ORAL)} THEN 'oral'"
        f" WHEN procedure_code IN {_in(_ADMIN_INJ)}"
        " THEN 'injection/implant' END AS admin_method",
    )
    # no claim-grain DISTINCT here: the step-5 union is DISTINCTed
    # after claim_header_id is dropped (R:145-185), which collapses
    # strictly more — one wide shuffle instead of two

    # step 2: oud_dx1_flag = primary diagnosis in the sud_opioid set,
    # aggregated per claim (R:74-80). Join the big header only against
    # the already-filtered claim set; the code list is broadcast.
    hdr = header.select(
        "claim_header_id", "primary_diagnosis", "icdcm_version"
    ).join(
        flagged.select("claim_header_id").distinct(), "claim_header_id"
    )
    dx_hit = hdr.join(
        F.broadcast(
            oud_dx_codes.select(
                F.col("code").alias("primary_diagnosis"),
                F.col("icdcm_version"),
            ).distinct()
        ),
        ["primary_diagnosis", "icdcm_version"],
        "left_semi",
    ).select("claim_header_id").distinct().withColumn(
        "oud_dx1_flag", F.lit(1)
    )
    flagged = flagged.join(dx_hit, "claim_header_id", "left").withColumn(
        "oud_dx1_flag", F.coalesce("oud_dx1_flag", F.lit(0))
    )

    # step 3 (R:100-113): keep codes not requiring a primary OUD dx,
    # or requiring ones when the flag is present
    return flagged.filter(
        (~p.isin(_NEEDS_OUD_DX)) | (F.col("oud_dx1_flag") == 1)
    )


def _pharm_step(
    pharm: DataFrame,
    rda_pharm: DataFrame,
    ndc_ref: DataFrame | None,
    id_col: str,
    start_date: str,
) -> DataFrame:
    """Step 4 (R:118-141): buprenorphine / naltrexone pharmacy fills
    with admin method derived from the NDC dosage form."""
    matched = pharm.filter(F.col("rx_fill_date") >= start_date).join(
        F.broadcast(
            rda_pharm.select(
                F.col("code").alias("ndc"), "sub_group_pharmacy"
            ).distinct()
        ),
        "ndc",
    )
    if ndc_ref is not None:
        matched = matched.join(
            F.broadcast(ndc_ref.select("ndc", "dosage_form")), "ndc", "left"
        )
    else:
        matched = matched.withColumn(
            "dosage_form", F.lit(None).cast("string")
        )
    dose = F.upper(F.col("dosage_form"))
    return matched.select(
        id_col,
        "claim_header_id",
        F.col("rx_fill_date").alias("first_service_date"),
        F.col("rx_fill_date").alias("last_service_date"),
        "ndc",
        F.col("sub_group_pharmacy")
        .isin("pharm_buprenorphine", "pharm_buprenorphine_naloxone")
        .cast("int")
        .alias("bup_rx_flag"),
        (F.col("sub_group_pharmacy") == "pharm_naltrexone_rx")
        .cast("int")
        .alias("nal_rx_flag"),
        F.when(
            dose.startswith("FILM")
            | dose.startswith("TABLET")
            | dose.startswith("POWDER"),
            "oral",
        )
        .when(
            dose.startswith("KIT")
            | dose.startswith("SOLUTION")
            | dose.startswith("INJECTION"),
            "injection/implant",
        )
        .alias("admin_method"),
        F.col("rx_days_supply").cast("decimal(8,1)").alias(
            "moud_days_supply"
        ),
    )  # dedup deferred to the step-5 union DISTINCT (see _proc_step)


def build_claim_moud(
    procedure: DataFrame,
    header: DataFrame,
    pharm: DataFrame | None,
    oud_dx_codes: DataFrame,
    rda_pharm: DataFrame | None = None,
    ndc_ref: DataFrame | None = None,
    id_col: str = "id_mcaid",
    start_date: str = "2016-01-01",
) -> DataFrame:
    """The full MOUD event table (one row per person × service date ×
    flag combination × admin method, with estimated days supply).

    Inputs: ``procedure`` (claim procedure grain), ``header``
    (claim_header_id, primary_diagnosis, icdcm_version), ``pharm``
    (rx fills; optional), ``oud_dx_codes`` (code, icdcm_version of the
    sud_opioid diagnosis set), ``rda_pharm`` (code,
    sub_group_pharmacy for bup/naltrexone NDCs), ``ndc_ref`` (ndc,
    dosage_form).
    """
    proc = _proc_step(procedure, header, oud_dx_codes, id_col, start_date)
    # step 5 union (R:145-185), removing oral naltrexone on both sides
    proc_side = proc.filter(
        (F.col("moud_proc_flag_tbd") == 1)
        | (F.col("bup_proc_flag") == 1)
        | (F.col("meth_proc_flag") == 1)
        | (F.col("unspec_proc_flag") == 1)
        | (
            (F.col("nal_proc_flag") == 1)
            & (F.col("admin_method") == "injection/implant")
        )
    ).select(
        id_col,
        "first_service_date",
        "last_service_date",
        "procedure_code",
        "moud_proc_flag_tbd",
        "meth_proc_flag",
        "bup_proc_flag",
        "nal_proc_flag",
        "unspec_proc_flag",
        "admin_method",
        F.lit(None).cast("int").alias("bup_rx_flag"),
        F.lit(None).cast("int").alias("nal_rx_flag"),
        F.col("moud_days_supply").cast("decimal(8,1)").alias(
            "moud_days_supply"
        ),
    )
    if pharm is not None and rda_pharm is not None:
        rx = _pharm_step(pharm, rda_pharm, ndc_ref, id_col, start_date)
        rx_side = rx.filter(
            (F.col("bup_rx_flag") == 1)
            | (
                (F.col("nal_rx_flag") == 1)
                & (F.col("admin_method") == "injection/implant")
            )
        ).select(
            id_col,
            "first_service_date",
            "last_service_date",
            F.lit(None).cast("string").alias("procedure_code"),
            F.lit(None).cast("int").alias("moud_proc_flag_tbd"),
            F.lit(None).cast("int").alias("meth_proc_flag"),
            F.lit(None).cast("int").alias("bup_proc_flag"),
            F.lit(None).cast("int").alias("nal_proc_flag"),
            F.lit(None).cast("int").alias("unspec_proc_flag"),
            "admin_method",
            "bup_rx_flag",
            "nal_rx_flag",
            "moud_days_supply",
        )
        union = proc_side.unionByName(rx_side).distinct()
    else:
        union = proc_side.distinct()

    # step 6 (R:195-250): H0033 could be methadone or buprenorphine —
    # decide per person-month by comparing monthly counts of each.
    # Person-month flag sums for the H0033 disambiguation. Partition
    # on the person id ONLY and use a range frame over the month key —
    # every per-month sum then reuses the single id exchange instead
    # of re-shuffling on (id, month).
    ym = F.year("last_service_date") * 100 + F.month("last_service_date")
    union = union.withColumn("_ym", ym)
    wym = (
        Window.partitionBy(id_col)
        .orderBy("_ym")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    union = (
        union.withColumn(
            "_meth_m", F.sum(F.coalesce("meth_proc_flag", F.lit(0))).over(wym)
        )
        .withColumn(
            "_bup_m", F.sum(F.coalesce("bup_proc_flag", F.lit(0))).over(wym)
        )
        .withColumn(
            "_bup_rx_m", F.sum(F.coalesce("bup_rx_flag", F.lit(0))).over(wym)
        )
    )
    # H0033 disambiguation CASEs as parsed SQL text (py4j-crossing
    # argument as above); the trees are identical to the when() chains
    h = "procedure_code = 'H0033'"
    meth_new = F.expr(
        f"CASE WHEN {h} AND _meth_m = 0 AND _bup_m = 0 AND _bup_rx_m = 0"
        " THEN 1"
        f" WHEN {h} AND _meth_m = 0 AND _bup_m = 0 AND _bup_rx_m > 0"
        " THEN 0"
        f" WHEN {h} AND _meth_m >= _bup_m AND _meth_m <> 0 THEN 1"
        f" WHEN {h} AND _meth_m < _bup_m THEN 0"
        " ELSE meth_proc_flag END"
    )
    bup_new = F.expr(
        f"CASE WHEN {h} AND _meth_m = 0 AND _bup_m = 0 AND _bup_rx_m = 0"
        " THEN 0"
        f" WHEN {h} AND _meth_m = 0 AND _bup_m = 0 AND _bup_rx_m > 0"
        " THEN 1"
        f" WHEN {h} AND _meth_m >= _bup_m AND _meth_m <> 0 THEN 0"
        f" WHEN {h} AND _meth_m < _bup_m THEN 1"
        " ELSE bup_proc_flag END"
    )
    union = union.withColumns(
        {"meth_proc_flag": meth_new, "bup_proc_flag": bup_new}
    )

    # step 6b collapse (R:253-272): one row per person/date/flag
    # combo/admin method, days supply summed
    grp = [
        id_col,
        "last_service_date",
        "meth_proc_flag",
        "bup_proc_flag",
        "nal_proc_flag",
        "unspec_proc_flag",
        "bup_rx_flag",
        "nal_rx_flag",
        "admin_method",
    ]
    collapsed = union.groupBy(*grp).agg(
        F.sum("moud_days_supply").alias("moud_days_supply")
    )

    # step 7 (R:274-333): same person/day/moud-type duplicates across
    # HCPCS and NDC coding — drop the HCPCS row (pharmacy fill wins)
    moudtype = (
        F.when(
            (F.col("bup_proc_flag") == 1) | (F.col("bup_rx_flag") == 1),
            "buprenorphine",
        )
        .when(
            (F.col("nal_proc_flag") == 1) | (F.col("nal_rx_flag") == 1),
            "naltrexone",
        )
    )
    codetype = (
        F.when(
            (F.col("bup_proc_flag") == 1) | (F.col("nal_proc_flag") == 1),
            "hcpcs",
        )
        .when(
            (F.col("bup_rx_flag") == 1) | (F.col("nal_rx_flag") == 1), "ndc"
        )
    )
    collapsed = collapsed.withColumn("moudtype", moudtype).withColumn(
        "codetype", codetype
    )
    # Every window from here to the end of the builder partitions on
    # the PERSON ID ONLY, with the finer grains expressed as
    # CURRENT-ROW range frames over the sort keys (peers of the sort
    # order ARE the finer group). One id exchange feeds the same-day
    # dedup, the methadone lead, and the quarter stats — partitioning
    # each on its composite key would be three more full shuffles.
    w_dup = (
        Window.partitionBy(id_col)
        .orderBy("last_service_date", "moudtype", "admin_method")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    w_type = (
        Window.partitionBy(id_col)
        .orderBy("last_service_date", "moudtype")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    collapsed = (
        collapsed.withColumn("_n_same", F.count(F.lit(1)).over(w_dup))
        .withColumn(
            "_dup_in_type",
            F.max((F.col("_n_same") > 1).cast("int")).over(w_type),
        )
        .filter(
            ~(
                F.col("moudtype").isNotNull()
                & F.col("admin_method").isNotNull()
                & (F.col("_dup_in_type") == 1)
                & (F.col("codetype") == "hcpcs")
            )
        )
        .drop("_n_same", "_dup_in_type", "moudtype", "codetype")
    )

    # step 8 (R:335-390): methadone days-supply estimation from the
    # gap to the next methadone service date, with a per-quarter exact
    # median fallback for skipped doses / last dates
    q = F.year("last_service_date") * 10 + F.quarter("last_service_date")
    collapsed = collapsed.withColumn("_yq", q)
    # id-partitioned with meth_proc_flag leading the sort: meth rows
    # group together ordered by date, so lead() within the id
    # partition sees exactly what a (id, flag) partition would — and
    # the guard on the NEXT row's flag discards the one cross-group
    # edge. Reuses the step-7 exchange instead of reshuffling.
    w_meth = Window.partitionBy(id_col).orderBy(
        "meth_proc_flag", "last_service_date"
    )
    next_diff = F.when(
        (F.col("meth_proc_flag") == 1)
        & (F.lead("meth_proc_flag").over(w_meth) == 1),
        F.datediff(
            F.lead("last_service_date").over(w_meth), F.col("last_service_date")
        ),
    )
    # per-quarter sum AND exact median as CURRENT-ROW range peers over
    # the quarter key — same id exchange, no (id, quarter) reshuffle,
    # no groupBy+join-back
    w_yq = (
        Window.partitionBy(id_col)
        .orderBy("_yq")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    collapsed = (
        collapsed.withColumn("next_meth_diff", next_diff)
        .withColumn(
            "meth_proc_sum_year_quarter",
            F.sum(F.coalesce("meth_proc_flag", F.lit(0))).over(w_yq),
        )
        .withColumn(
            "next_meth_diff_median_year_quarter",
            F.expr("percentile(next_meth_diff, 0.5)").over(w_yq),
        )
    )

    supply_new = F.expr(
        "CASE WHEN meth_proc_flag = 1 AND meth_proc_sum_year_quarter <= 2"
        " THEN moud_days_supply"
        " WHEN meth_proc_flag = 1 AND next_meth_diff >"
        " 1.5 * next_meth_diff_median_year_quarter"
        " THEN next_meth_diff_median_year_quarter"
        " WHEN meth_proc_flag = 1 AND next_meth_diff IS NULL"
        " THEN next_meth_diff_median_year_quarter"
        " WHEN meth_proc_flag = 1 THEN next_meth_diff"
        " ELSE moud_days_supply END"
    )
    z = F.lit(0)
    return collapsed.select(
        id_col,
        "last_service_date",
        F.year("last_service_date").alias("service_year"),
        F.col("_yq").alias("service_quarter"),
        (
            F.year("last_service_date") * 100 + F.month("last_service_date")
        ).alias("service_month"),
        "meth_proc_flag",
        "bup_proc_flag",
        "nal_proc_flag",
        "unspec_proc_flag",
        "bup_rx_flag",
        "nal_rx_flag",
        "admin_method",
        (
            F.coalesce("meth_proc_flag", z)
            + F.coalesce("bup_proc_flag", z)
            + F.coalesce("nal_proc_flag", z)
            + F.coalesce("bup_rx_flag", z)
            + F.coalesce("nal_rx_flag", z)
        ).alias("moud_flag_count"),
        "moud_days_supply",
        "next_meth_diff",
        "next_meth_diff_median_year_quarter",
        "meth_proc_sum_year_quarter",
        supply_new.alias("moud_days_supply_new_year_quarter"),
    )


def build_mcare_claim_moud(
    procedure: DataFrame,
    header: DataFrame,
    pharm: DataFrame | None,
    oud_dx_codes: DataFrame,
    rda_pharm: DataFrame | None = None,
    ndc_ref: DataFrame | None = None,
    start_date: str = "2016-01-01",
) -> DataFrame:
    """``load_stage.mcare_claim_moud.R``: the SAME MOUD event
    derivation over the Medicare layer, keyed by ``id_mcare``."""
    return build_claim_moud(
        procedure, header, pharm, oud_dx_codes, rda_pharm, ndc_ref,
        id_col="id_mcare", start_date=start_date,
    )
