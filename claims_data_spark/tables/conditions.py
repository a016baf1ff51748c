"""Chronic-condition engines (reference: ``load_ccw.R`` — 31
config-driven CCW conditions, 20 min-2.5 h builds — and ``claim_bh.R``
— behavioral-health conditions incl. the OUD/MOUD as-of rule, ~3 h).

Both engines compile a per-condition plan from config rows:
diagnosis match (dx position rules) -> claim-type filter -> exclusion
anti-join -> 1-vs-2-claim qualification -> (id, condition) min/max
collapse. The per-condition plans share one scan of the dx table;
each is a filter + aggregate over the same shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import tsql_datediff_month
from claims_data_spark.operators.asof import join_to_running_min


# max flag-code-set size compiled into the dx scan filter; the full
# CCW matrix is ~10-40k codes, comfortably under it, while a
# pathological ref falls back to join-only filtering
_CODE_PUSHDOWN_MAX = 32768


def _parse_claim_types(value) -> list[int]:
    if value is None or str(value).strip() == "":
        return []
    return [int(x) for x in str(value).split(";") if str(x).strip() != ""]


def _dx_fields_ok(fields_col: F.Column, number_col: F.Column) -> F.Column:
    """Generic dx-position predicate ('1' | '1-2'/'1;2' | 'any';
    ``load_ccw.R:346-360``)."""
    return (
        F.when(fields_col == "1", number_col == "01")
        .when(fields_col.isin("1-2", "1;2"), number_col.isin("01", "02"))
        .otherwise(F.lit(True))
    )


def build_claim_ccw(
    icdcm: DataFrame,
    header: DataFrame,
    ref_icdcm: DataFrame,
    ccw_lookup_rows: list[dict],
    id_col: str = "id_mcaid",
) -> DataFrame:
    """(id, condition, first_encounter_date, last_encounter_date) for
    every qualifying person × CCW condition.

    ``id_col`` parameterizes the source layer, mirroring the
    reference's per-source yaml configs which run the SAME engine over
    different id columns and input tables
    (``load_stage.mcaid_claim_ccw.yaml`` → id_mcaid,
    ``load_stage.apcd_claim_ccw.yaml`` → id_apcd,
    ``load_stage.mcare_claim_ccw.yaml`` → id_mcare,
    ``load_stage.mcaid_mcare_claim_ccw.yaml`` → id_apde). The output
    keeps the source id name.

    Config rows mirror ``ref_ccw_lookup`` (FIXTURES.md §10):
    ccw_abbrev, dx_fields, claim_type_1/2 (';'-separated), exclusion
    abbrev rows (``*_exclude``), condition_type 1|2, lookback_months.

    Reference-faithful qualification (``load_ccw.R:509-633``): each
    claim carries ``condition1`` = claim_type in claim_type_1 (valid
    encounter unconditionally) and ``condition2`` = claim_type in
    claim_type_2 (valid only when an ADJACENT condition-2 claim for
    the same person falls within ``lookback_months`` and >= 1 day
    away — the reference's lead/lag formulation, ``:580-589``).
    Encounter min/max collapse runs over the FILTERED row set, and
    first/last are LEAST/GREATEST across the two date families
    (``:620-633``). Exclusion diagnoses disqualify the whole claim
    (``:411-465``), with the exclusion rows' own dx-position rule.

    Plan (all 31 conditions in one pass): the ref flag matrix is
    melted to long (icdcm, version, condition, is_excl, dx_fields)
    and broadcast, so the dx table is scanned ONCE; claim-level
    condition/exclusion membership is one aggregation keyed by
    (claim_header_id, condition); the two-claim rule is one window
    pass per (condition, person) — no per-person self-join.

    Job-cascade shape (round 6): config frames (``ccw_lookup_rows`` is
    a driver-side list already) compile to literal map/CASE lookups
    instead of broadcast joins — each AQE broadcast materialization is
    its own blocking job, so two config joins cost two jobs each round
    for data the driver already holds. The narrow header (claim_type)
    joins the dx HITS before aggregation: hits are typically already
    partitioned by claim (they come off a claim-keyed fact), so the
    claim-grain membership groupBy reuses that partitioning with zero
    extra exchange, and the header join never becomes the scale trap
    the first cut had (a claim-grain SortMergeJoin AFTER the agg that
    re-shuffled both sides once the header outgrew the broadcast
    threshold at sf10 — measured 17 s / 11 jobs; this shape is
    9 s / 8 jobs at sf10). The distinct + two-claim window + final
    collapse still share ONE explicit (abbrev, id) repartition.
    """
    if id_col != "id_mcaid":
        out = build_claim_ccw(
            icdcm.withColumnRenamed(id_col, "id_mcaid"),
            header,
            ref_icdcm,
            ccw_lookup_rows,
        )
        return out.withColumnRenamed("id_mcaid", id_col)
    conditions = [
        r for r in ccw_lookup_rows
        if not r["ccw_abbrev"].endswith("_exclude1")
        and not r["ccw_abbrev"].endswith("_exclude2")
    ]
    excl_fields = {
        r["ccw_abbrev"]: r.get("dx_fields", "any") or "any"
        for r in ccw_lookup_rows
        if r["ccw_abbrev"].endswith("_exclude1")
        or r["ccw_abbrev"].endswith("_exclude2")
    }
    spark = icdcm.sparkSession

    # long-format flag map: one row per (flag column, role); exclusion
    # rows point at their parent condition so claim membership and
    # exclusion collapse in the same aggregation
    map_rows: list[tuple] = []
    cfg_rows: list[tuple] = []
    for cfg in conditions:
        abbrev = cfg["ccw_abbrev"]
        if abbrev not in ref_icdcm.columns:
            continue
        map_rows.append((abbrev, abbrev, 0, cfg.get("dx_fields", "any") or "any"))
        for suffix in ("_exclude1", "_exclude2"):
            excl = f"{abbrev}{suffix}"
            if excl in ref_icdcm.columns:
                map_rows.append(
                    (excl, abbrev, 1, excl_fields.get(excl, "any"))
                )
        cfg_rows.append(
            (
                abbrev,
                _parse_claim_types(cfg.get("claim_type_1")),
                _parse_claim_types(cfg.get("claim_type_2")),
                int(cfg.get("condition_type", 1)),
                int(cfg.get("lookback_months", 24)),
            )
        )

    flag_cols = sorted({m[0] for m in map_rows})
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in flag_cols)
    long_ref = (
        ref_icdcm.selectExpr(
            "icdcm", "icdcm_version",
            f"stack({len(flag_cols)}, {stack_expr}) as (flag_col, flag)",
        )
        .filter(F.col("flag") == 1)
        .select(F.col("icdcm").alias("icdcm_norm"), "icdcm_version", "flag_col")
    )
    # flag_col -> (abbrev, is_excl, dx_fields) as a LITERAL map: the
    # config is a driver-side list, so a broadcast join would spend an
    # AQE job materializing data the plan can carry as an expression
    flag_meta = F.create_map(*[
        x
        for fc, abbrev, is_excl, dxf in map_rows
        for x in (
            F.lit(fc),
            F.struct(
                F.lit(abbrev).alias("abbrev"),
                F.lit(is_excl).alias("is_excl"),
                F.lit(dxf).alias("dx_fields"),
            ),
        )
    ])

    # scan-pushdown of the flag code set: the melted flag matrix is
    # vocabulary-bounded (ICD codes x conditions, ~10-40k rows for the
    # full 31-condition CCW), so its distinct code list is driver-safe
    # metadata. Compiling it into an In() filter on the dx scan lets
    # parquet dictionary + row-group stats drop non-matching rows
    # BEFORE decode — measured at sf10 (60M dx rows, 20% flag hit
    # rate): scan+flag-join 6.1 s -> 1.1 s. The broadcast join still
    # decides per-condition membership; the pushed filter is only the
    # union of codes, so it removes no correct row. Skipped above the
    # threshold, where a giant literal In stops being a win.
    # derivation is one map-only job on the vocabulary-bounded ref —
    # no stack, no distinct exchange (dedup is a driver-side set();
    # round 9: the old melted-distinct form cost a shuffle + extra
    # stage per engine invocation)
    flag_pred = None
    for c in flag_cols:
        p = F.col(c) == 1
        flag_pred = p if flag_pred is None else (flag_pred | p)
    code_rows = (
        ref_icdcm.filter(flag_pred).select("icdcm")
        .limit(4 * _CODE_PUSHDOWN_MAX).collect()
    )
    codes = {r["icdcm"] for r in code_rows}
    if len(code_rows) < 4 * _CODE_PUSHDOWN_MAX and len(codes) <= _CODE_PUSHDOWN_MAX:
        icdcm = icdcm.filter(F.col("icdcm_norm").isin(list(codes)))

    # claim-type pushdown (round 9): a claim whose type is outside the
    # UNION of every condition's claim_type_1/claim_type_2 lists can
    # never satisfy condition1 OR condition2 below — and exclusion
    # diagnoses only act WITHIN a qualifying claim (load_ccw.R:411-465
    # disqualifies the claim, never the person) — so those claims are
    # dead weight through the header join, the membership agg, and the
    # exchange. Compiling the union (driver-side config, a handful of
    # ints) into the header scan lets parquet row-group stats drop
    # them before decode; the inner hits⋈header join then shrinks the
    # agg input by the same fraction. Measured at sf10 bucketed
    # (claim types 1-3 of 6 qualify): whole engine 3.2 → 2.4 s.
    all_types = sorted({
        t for _a, t1, t2, _ct, _lb in cfg_rows for t in (*t1, *t2)
    })
    header = header.filter(F.col("claim_type_id").isin(all_types))

    # ONE scan of the dx table -> claim-level condition membership.
    # The header join happens at HIT grain (before the agg): header is
    # one narrow row per claim, the hits keep their claim-keyed
    # partitioning, and the membership groupBy below — whose keys
    # contain claim_header_id — then needs no exchange of its own.
    # join order (round 9): header FIRST, flags second. Both fact
    # sides ride the claim bucketing (sorted zip join, no exchange, no
    # sort), and the type-pushdown-filtered header drops its share of
    # dx rows BEFORE the broadcast flag join — the per-row string-key
    # hash probe is the costliest scalar work in the pass, so it runs
    # over the intersection, not the full code-filtered scan.
    hits = (
        icdcm.select(
            "id_mcaid", "claim_header_id", "first_service_date",
            "icdcm_norm", "icdcm_version", "icdcm_number",
        )
        .join(
            header.select("claim_header_id", "claim_type_id"),
            "claim_header_id",
        )
        .join(F.broadcast(long_ref), ["icdcm_norm", "icdcm_version"])
        .withColumn("_fm", flag_meta[F.col("flag_col")])
        .select(
            "id_mcaid", "claim_header_id", "first_service_date",
            "icdcm_number", "claim_type_id",
            F.col("_fm.abbrev").alias("abbrev"),
            F.col("_fm.is_excl").alias("is_excl"),
            F.col("_fm.dx_fields").alias("dx_fields"),
        )
        .filter(_dx_fields_ok(F.col("dx_fields"), F.col("icdcm_number")))
    )
    claim_cond = (
        hits.groupBy("claim_header_id", "abbrev", "id_mcaid")
        .agg(
            F.first("first_service_date").alias("first_service_date"),
            F.first("claim_type_id").alias("claim_type_id"),
            F.max(1 - F.col("is_excl")).alias("has_cond"),
            F.max("is_excl").alias("has_excl"),
        )
        .filter((F.col("has_cond") == 1) & (F.col("has_excl") == 0))
        .drop("has_cond", "has_excl")
    )

    # claim-type split -> condition1/condition2 from-dates
    # (load_ccw.R:509-527); empty type list matches nothing, like the
    # reference's IN (''). Per-condition claim-type lists / lookback /
    # type are literal maps (driver-side config, same ruling as above).
    types_1 = F.create_map(*[
        x for a, t1, _t2, _ct, _lb in cfg_rows
        for x in (F.lit(a), F.array(*[F.lit(t) for t in t1]))
    ])
    types_2 = F.create_map(*[
        x for a, _t1, t2, _ct, _lb in cfg_rows
        for x in (F.lit(a), F.array(*[F.lit(t) for t in t2]))
    ])
    cond_type = F.create_map(*[
        x for a, _t1, _t2, ct, _lb in cfg_rows
        for x in (F.lit(a), F.lit(ct))
    ])
    lookback = F.create_map(*[
        x for a, _t1, _t2, _ct, lb in cfg_rows
        for x in (F.lit(a), F.lit(lb))
    ])
    ab = F.col("abbrev")
    typed = (
        claim_cond
        .withColumn("condition1",
                    F.array_contains(types_1[ab], F.col("claim_type_id")))
        .withColumn("condition2",
                    F.array_contains(types_2[ab], F.col("claim_type_id")))
        .filter(F.col("condition1") | F.col("condition2"))
        .select(
            "abbrev", "id_mcaid",
            cond_type[ab].alias("condition_type"),
            lookback[ab].alias("lookback_months"),
            "first_service_date",
            F.when(F.col("condition1"), F.col("first_service_date")).alias(
                "condition_1_from_date"
            ),
            F.when(F.col("condition2"), F.col("first_service_date")).alias(
                "condition_2_from_date"
            ),
        )
        # the ONE explicit exchange of the back half: (abbrev, person)
        # partitioning the distinct (keys superset), the two-claim
        # window (same keys) and the final collapse all reuse
        .repartition("abbrev", "id_mcaid")
        .distinct()  # the reference's UNION across ICD versions dedups
    )

    # adjacent-claim rule: sorted lead/lag per (condition, person) —
    # O(n log n), replaces the reference's identical window SQL and the
    # old per-person date self-join (load_ccw.R:580-589)
    w = Window.partitionBy("abbrev", "id_mcaid").orderBy("condition_2_from_date")
    c2 = F.col("condition_2_from_date")
    lead_c2 = F.lead("condition_2_from_date").over(w)
    lag_c2 = F.lag("condition_2_from_date").over(w)
    lb = F.col("lookback_months")
    two_claim_ok = c2.isNotNull() & (
        (
            (tsql_datediff_month(c2, lead_c2) <= lb)
            & (F.datediff(lead_c2, c2) >= 1)
        )
        | (
            (tsql_datediff_month(lag_c2, c2) <= lb)
            & (F.datediff(c2, lag_c2) >= 1)
        )
    )
    kept = (
        typed.withColumn("_two_claim_ok", two_claim_ok)
        .filter(
            F.col("condition_1_from_date").isNotNull()
            | ((F.col("condition_type") == 2) & F.col("_two_claim_ok"))
        )
        .drop("_two_claim_ok")
    )

    return (
        kept.groupBy("id_mcaid", F.col("abbrev").alias("ccw_desc"))
        .agg(
            F.min("condition_1_from_date").alias("c1_min"),
            F.max("condition_1_from_date").alias("c1_max"),
            F.min("condition_2_from_date").alias("c2_min"),
            F.max("condition_2_from_date").alias("c2_max"),
        )
        .select(
            "id_mcaid",
            "ccw_desc",
            F.least("c1_min", "c2_min").alias("first_encounter_date"),
            F.greatest("c1_max", "c2_max").alias("last_encounter_date"),
        )
    )


def build_claim_bh(
    icdcm: DataFrame,
    pharm: DataFrame,
    procedure: DataFrame,
    ref_rda: DataFrame,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """Behavioral-health person-condition table (``claim_bh.R``):
    dx-based ∪ NDC-based ∪ procedure-based matches per condition, with
    the MOUD as-of rule — procedure codes flagged ``oud_dx1_flag``
    qualify only when the person's earliest OUD diagnosis is on or
    before the service date (``claim_bh.R:324-347``, J14).

    ``id_col`` parameterizes the source layer exactly like
    :func:`build_claim_ccw` (reference per-source configs
    ``load_stage.{apcd,mcaid,mcare,mcaid_mcare}_claim_bh.yaml``)."""
    if id_col != "id_mcaid":
        out = build_claim_bh(
            icdcm.withColumnRenamed(id_col, "id_mcaid"),
            pharm.withColumnRenamed(id_col, "id_mcaid"),
            procedure.withColumnRenamed(id_col, "id_mcaid"),
            ref_rda,
        )
        return out.withColumnRenamed("id_mcaid", id_col)
    dx_ref = ref_rda.filter(F.col("code_set").isin("ICD9CM", "ICD10CM")).select(
        F.col("code").alias("icdcm_norm"),
        F.col("icdcm_version"),
        F.col("sub_group_condition").alias("bh_cond"),
    )
    dx_hits = icdcm.join(F.broadcast(dx_ref), ["icdcm_norm", "icdcm_version"]).select(
        "id_mcaid", F.col("first_service_date").alias("svc_date"), "bh_cond"
    )

    ndc_ref = ref_rda.filter(F.col("code_set") == "NDC").select(
        F.col("code").alias("ndc"), F.col("sub_group_condition").alias("bh_cond")
    )
    rx_hits = pharm.join(F.broadcast(ndc_ref), "ndc").select(
        "id_mcaid", F.col("rx_fill_date").alias("svc_date"), "bh_cond"
    )

    px_ref = ref_rda.filter(
        F.col("code_set").isin("HCPCS", "CPT")
    ).select(
        F.col("code").alias("procedure_code"),
        F.col("sub_group_condition").alias("bh_cond"),
        "oud_dx1_flag",
    )
    px_hits_all = procedure.join(F.broadcast(px_ref), "procedure_code").select(
        "id_mcaid", F.col("first_service_date").alias("svc_date"), "bh_cond",
        "oud_dx1_flag",
    )
    px_plain = px_hits_all.filter(
        F.coalesce("oud_dx1_flag", F.lit(0)) == 0
    ).drop("oud_dx1_flag")

    # MOUD as-of rule: earliest OUD dx must be <= procedure date
    oud_dx = dx_hits.filter(F.col("bh_cond") == "sud_opioid")
    px_moud = (
        join_to_running_min(
            px_hits_all.filter(F.col("oud_dx1_flag") == 1),
            oud_dx.withColumnRenamed("svc_date", "dx_date"),
            key="id_mcaid",
            left_date="svc_date",
            right_date="dx_date",
            min_col="first_oud_dx",
        )
        .select("id_mcaid", "svc_date", "bh_cond")
    )

    all_hits = (
        dx_hits.unionByName(rx_hits).unionByName(px_plain).unionByName(px_moud)
    )
    return all_hits.groupBy("id_mcaid", "bh_cond").agg(
        F.min("svc_date").alias("first_encounter_date"),
        F.max("svc_date").alias("last_encounter_date"),
    )


# ---------------------------------------------------------------------------
# Per-source instantiations. The reference ships one yaml per
# (source, table) pair under claims_db/phclaims/stage/tables/ — the
# engine is identical, only the id column and input tables change:
#   load_stage.apcd_claim_ccw.yaml        id_apcd  (bigint)
#   load_stage.mcare_claim_ccw.yaml       id_mcare (string)
#   load_stage.mcaid_mcare_claim_ccw.yaml id_apde  (combined xwalk id)
# and the same trio for *_claim_bh.yaml. These wrappers pin the id so
# callers can't mix a source layer with the wrong key.
# ---------------------------------------------------------------------------


def build_apcd_claim_ccw(icdcm, header, ref_icdcm, ccw_lookup_rows):
    """``load_stage.apcd_claim_ccw.yaml``: CCW over the APCD layer,
    keyed by ``id_apcd``."""
    return build_claim_ccw(
        icdcm, header, ref_icdcm, ccw_lookup_rows, id_col="id_apcd"
    )


def build_mcare_claim_ccw(icdcm, header, ref_icdcm, ccw_lookup_rows):
    """``load_stage.mcare_claim_ccw.yaml``: CCW over the Medicare
    layer, keyed by ``id_mcare``."""
    return build_claim_ccw(
        icdcm, header, ref_icdcm, ccw_lookup_rows, id_col="id_mcare"
    )


def build_mcaid_mcare_claim_ccw(icdcm, header, ref_icdcm, ccw_lookup_rows):
    """``load_stage.mcaid_mcare_claim_ccw.yaml``: CCW over the
    combined layer, keyed by the crosswalk id ``id_apde``."""
    return build_claim_ccw(
        icdcm, header, ref_icdcm, ccw_lookup_rows, id_col="id_apde"
    )


def build_apcd_claim_bh(icdcm, pharm, procedure, ref_rda):
    """``load_stage.apcd_claim_bh.yaml``: BH over the APCD layer,
    keyed by ``id_apcd``."""
    return build_claim_bh(icdcm, pharm, procedure, ref_rda, id_col="id_apcd")


def build_mcare_claim_bh(icdcm, pharm, procedure, ref_rda):
    """``load_stage.mcare_claim_bh.yaml``: BH over the Medicare layer,
    keyed by ``id_mcare``."""
    return build_claim_bh(icdcm, pharm, procedure, ref_rda, id_col="id_mcare")


def build_mcaid_mcare_claim_bh(icdcm, pharm, procedure, ref_rda):
    """``load_stage.mcaid_mcare_claim_bh.yaml``: BH over the combined
    layer, keyed by ``id_apde``."""
    return build_claim_bh(icdcm, pharm, procedure, ref_rda, id_col="id_apde")
