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

    # ---- fused bitmask membership (round 10) ----
    # The old shape melted the flag matrix to long (one broadcast row
    # per (code, flag)), fanned every dx hit out per matching flag,
    # probed a linear-scan literal map for flag metadata, and hash-
    # aggregated the fan-out keyed by (claim, abbrev-string, id).
    # This compiles the whole per-condition dx-match rule into bit
    # positions instead (the rda_value_set codegen-CASE precedent):
    # the ref carries one row per code with per-role/per-dx-position
    # masks (condition bit b set when that code flags condition b), so
    # the dx scan does ONE broadcast probe returning a handful of
    # longs, the claim-grain aggregation is bit_or keyed by the claim
    # id alone (rides the claim bucketing — no exchange, no string
    # keys, no fan-out), and qualified (claim, condition) rows only
    # materialize AFTER exclusion bits clear: qual = cond & ~excl.
    # Conditions chunk into 62-bit words so any config size compiles.
    abbrevs = [a for a, _t1, _t2, _ct, _lb in cfg_rows]
    bitpos = {a: i for i, a in enumerate(abbrevs)}
    _CHUNK = 62
    n_chunks = max(1, -(-len(abbrevs) // _CHUNK))
    # (role, dx-position class, chunk) -> {bit: [flag cols]}
    groups: dict[tuple, dict[int, list[str]]] = {}
    for fc, abbrev, is_excl, dxf in map_rows:
        b = bitpos[abbrev]
        c = (
            "pos1" if dxf == "1"
            else "pos12" if dxf in ("1-2", "1;2")
            else "any"
        )
        key = ("excl" if is_excl else "cond", c, b // _CHUNK)
        groups.setdefault(key, {}).setdefault(b % _CHUNK, []).append(fc)

    mask_names: dict[tuple, str] = {}
    mask_select: list = []
    for (role, c, ch), terms in sorted(groups.items()):
        # flat SUM of disjoint bit terms (the simhash round-9 lesson:
        # a nested bitwiseOR(when) tree re-walks per optimizer pass);
        # two flags sharing a bit (exclude1+exclude2, same class) OR
        # inside one term, so bits stay disjoint and + is exact
        parts = [
            "(case when "
            + " or ".join(f"`{fc}` = 1" for fc in fcs)
            + f" then {1 << bb}L else 0L end)"
            for bb, fcs in sorted(terms.items())
        ]
        name = f"_m_{role}_{c}_{ch}"
        mask_names[(role, c, ch)] = name
        mask_select.append(
            F.expr("cast(" + " + ".join(parts) + " as bigint)").alias(name)
        )
    _zero = F.lit(0).cast("long")

    def _eff_mask(role: str, ch: int) -> F.Column:
        """Row-effective mask: 'any' bits always, position-gated bits
        only when the dx position satisfies the flag's rule
        (_dx_fields_ok, load_ccw.R:346-360)."""
        e = None
        n = mask_names.get((role, "any", ch))
        if n:
            e = F.col(n)
        n = mask_names.get((role, "pos1", ch))
        if n:
            t = F.when(F.col("icdcm_number") == "01", F.col(n)).otherwise(_zero)
            e = t if e is None else e.bitwiseOR(t)
        n = mask_names.get((role, "pos12", ch))
        if n:
            t = F.when(
                F.col("icdcm_number").isin("01", "02"), F.col(n)
            ).otherwise(_zero)
            e = t if e is None else e.bitwiseOR(t)
        return _zero if e is None else e

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
    ref_masks = ref_icdcm.filter(flag_pred).select(
        F.col("icdcm").alias("icdcm_norm"), "icdcm_version", *mask_select
    )
    code_rows = (
        ref_icdcm.filter(flag_pred)
        .select("icdcm", "icdcm_version", *flag_cols)
        .limit(4 * _CODE_PUSHDOWN_MAX).collect()
    )
    codes = {r["icdcm"] for r in code_rows}
    pushdown_ok = (
        len(code_rows) < 4 * _CODE_PUSHDOWN_MAX
        and len(codes) <= _CODE_PUSHDOWN_MAX
    )
    if pushdown_ok:
        icdcm = icdcm.filter(F.col("icdcm_norm").isin(list(codes)))

    # literal-class compilation (round 10, the rda_value_set codegen-
    # CASE precedent): codes sharing an identical (version, mask
    # tuple) form an equivalence class — usually ≈ one per condition.
    # With few classes, a chained isin() CASE assigns each dx row a
    # class id in the SCAN stage and every mask column becomes a tiny
    # literal CASE on that id, so the per-invocation broadcast
    # materialization job AND the per-row join probe disappear from
    # the plan. Above the class threshold (a full 31-condition CCW
    # run) the broadcast-join path below stays — O(1) per-row probe
    # beats ~n_classes hash-set probes once classes are many.
    _LITERAL_CLASS_MAX = 16
    literal_classes: list[tuple[int, tuple, list[str]]] | None = None
    if pushdown_ok:
        by_class: dict[tuple, list[str]] = {}
        for r in code_rows:
            vals = []
            for key in sorted(mask_names):
                role, c, ch = key
                v = 0
                for bb, fcs in groups[key].items():
                    if any(r[fc] == 1 for fc in fcs):
                        v |= 1 << bb
                vals.append(v)
            by_class.setdefault(
                (r["icdcm_version"], tuple(vals)), []
            ).append(r["icdcm"])
        if len(by_class) <= _LITERAL_CLASS_MAX:
            literal_classes = [
                (ver, mt, sorted(cds))
                for (ver, mt), cds in sorted(by_class.items())
            ]

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
    # partitioning, and the membership groupBy below — keyed by the
    # claim id alone — then needs no exchange of its own.
    # join order (round 9): header FIRST, masks second. Both fact
    # sides ride the claim bucketing (sorted zip join, no exchange, no
    # sort), and the type-pushdown-filtered header drops its share of
    # dx rows BEFORE the broadcast mask probe — the per-row string-key
    # hash probe is the costliest scalar work in the pass, so it runs
    # over the intersection, not the full code-filtered scan.
    joined = icdcm.select(
        "id_mcaid", "claim_header_id", "first_service_date",
        "icdcm_norm", "icdcm_version", "icdcm_number",
    ).join(
        header.select("claim_header_id", "claim_type_id"),
        "claim_header_id",
    )
    if literal_classes is not None:
        cid = None
        for idx, (ver, _mt, cds) in enumerate(literal_classes):
            p = (F.col("icdcm_version") == ver) & F.col(
                "icdcm_norm"
            ).isin(cds)
            cid = F.when(p, idx) if cid is None else cid.when(p, idx)
        cid = cid.otherwise(F.lit(-1))
        mask_vals: dict[str, F.Column] = {}
        for pos, key in enumerate(sorted(mask_names)):
            e = None
            for idx, (_ver, mt, _cds) in enumerate(literal_classes):
                if mt[pos]:
                    t = F.lit(mt[pos]).cast("long")
                    e = (
                        F.when(F.col("_cid") == idx, t)
                        if e is None
                        else e.when(F.col("_cid") == idx, t)
                    )
            mask_vals[mask_names[key]] = (
                _zero if e is None else e.otherwise(_zero)
            )
        with_masks = (
            joined.withColumn("_cid", cid)
            .filter(F.col("_cid") >= 0)
            .withColumns(mask_vals)
        )
    else:
        with_masks = joined.join(
            F.broadcast(ref_masks), ["icdcm_norm", "icdcm_version"]
        )
    hits = with_masks.select(
        "id_mcaid", "claim_header_id", "first_service_date",
        "claim_type_id",
        *[_eff_mask("cond", ch).alias(f"_cb{ch}")
          for ch in range(n_chunks)],
        *[_eff_mask("excl", ch).alias(f"_eb{ch}")
          for ch in range(n_chunks)],
    )
    # bit_or per claim, then qualified conditions = cond & ~excl;
    # (claim, abbrev) rows only materialize for qualifying pairs
    claim_masks = (
        hits.groupBy("claim_header_id")
        .agg(
            F.first("id_mcaid").alias("id_mcaid"),
            F.first("first_service_date").alias("first_service_date"),
            F.first("claim_type_id").alias("claim_type_id"),
            *[F.bit_or(f"_cb{ch}").alias(f"_cb{ch}")
              for ch in range(n_chunks)],
            *[F.bit_or(f"_eb{ch}").alias(f"_eb{ch}")
              for ch in range(n_chunks)],
        )
    )
    qual_abbrevs = F.array_compact(F.array(*[
        F.when(
            F.col(f"_cb{b // _CHUNK}")
            .bitwiseAND(F.bitwise_not(F.col(f"_eb{b // _CHUNK}")))
            .bitwiseAND(F.lit(1 << (b % _CHUNK)).cast("long")) != 0,
            F.lit(a),
        )
        for a, b in bitpos.items()
    ]))
    claim_cond = claim_masks.select(
        "claim_header_id", "id_mcaid", "first_service_date",
        "claim_type_id",
        F.explode(qual_abbrevs).alias("abbrev"),
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
