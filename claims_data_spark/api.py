"""Interactive query API (reference: ``R/claims_elig.R``,
``R/claims_condition.R``, ``R/top_causes.R``,
``R/elig_timevar_collapse.R``).

The reference assembles SQL text per parameter and round-trips
R↔ODBC↔engine 5+ times per query (SURVEY.md §3.1). Here each entry
point builds ONE lazy DataFrame plan; Catalyst does the predicate
pushdown the reference writes by hand, and the cohort never leaves the
cluster (no ``##temp_ids`` literal shipping — cohorts are DataFrames).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claims_data_spark.functions.datetime import age_years
from claims_data_spark.operators.intervals import collapse_islands, coverage_stats
from claims_data_spark.operators.mode import mode_value
from claims_data_spark.plans.predicates import apply_filters

# Timevar-derived named-parameter families (R/claims_elig.R:788-1280,
# the ``timevar_gen_sql`` machinery). Two shapes:
#
# - pct=T flags: ``{var}_min``/``{var}_max`` bound the percent of the
#   denominator the person spent with flag=1 — the R's
#   ``SUM(cov_days * var)`` grouped-max (identical to a direct
#   NULL-skipping sum for a 0/1 flag), cast decimal(4,1)
#   (``:806-846``), filtered ``{var}_pct >= min`` / ``<= max``
#   (``:888-906, 958-976, 1067-1076, 1112-1190, 1270-1276``).
# - pct=F modal values: ``{param}`` is an IN-list against the
#   person's most-person-time value (rank by SUM(cov_days) DESC, then
#   value ASC — mode_value's default tiebreak), per ``:866-880`` with
#   the per-var WHERE fragments (``:980-1056, 1078-1097, 1193-1266``).
#
# Param -> candidate timevar columns (first present wins; a param
# whose column is absent from the source's timevar fails fast like
# the reference's server-side unknown-column error). geo_zip /
# geo_county_code also accept this repo's cleaned/geocoded names.
_TIMEVAR_PCT_FLAGS: dict[str, list[str]] = {
    "mcaid": ["mcaid"],
    "mcare": ["mcare"],
    "pha": ["pha"],
    "dual": ["dual"],
    "full_benefit": ["full_benefit"],
    "part_a": ["part_a"],
    "part_b": ["part_b"],
    "part_c": ["part_c"],
    "buy_in": ["buy_in"],
    "geo_kc": ["geo_kc"],
}
_TIMEVAR_MODAL_IN: dict[str, list[str]] = {
    "cov_type": ["cov_type"],
    "mco_id": ["mco_id"],
    "bsp_group_cid": ["bsp_group_cid"],
    "geo_zip": ["geo_zip", "geo_zip_clean"],
    "geo_region": ["geo_region"],
    "geo_hra_code": ["geo_hra_code", "geo_id20_hra"],
    "geo_ach_code": ["geo_ach_code"],
    "geo_school_code": ["geo_school_code"],
    "geo_county_code": ["geo_county_code", "geo_id20_county"],
    "pha_agency": ["pha_agency"],
    "pha_subsidy": ["pha_subsidy"],
    "pha_voucher": ["pha_voucher"],
    "pha_operator": ["pha_operator"],
    "pha_portfolio": ["pha_portfolio"],
}


def _flag_as_int(col: F.Column) -> F.Column:
    """Normalize a timevar flag to 0/1 for person-time weighting.

    The reference multiplies ``cov_days * var`` directly, which only
    works when the column is already numeric — but the mcaid stage
    timevar carries ``dual`` as the raw 'Y'/'N' DUALELIGIBLE_INDICATOR
    text (``load_stage.mcaid_elig_timevar.R:98``). Accept numeric
    (any non-zero is truthy, matching the reference's arithmetic on
    int flags — a double-typed flag renders '1.0' and must not fall
    through the string table to NULL), string Y/N/T/F, and boolean
    deterministically; unknown/NULL stays NULL, so SUM skips it
    exactly like the reference's NULL arithmetic. ANSI-safe: only
    try_cast, no throwing string->int cast ever happens."""
    d = col.cast("string").try_cast("double")
    s = F.upper(col.cast("string"))
    return (
        F.when(d.isNotNull(), F.when(d != 0.0, F.lit(1)).otherwise(F.lit(0)))
        .when(s.isin("Y", "YES", "T", "TRUE"), F.lit(1))
        .when(s.isin("N", "NO", "F", "FALSE"), F.lit(0))
        .otherwise(F.lit(None).cast("int"))
    )


def _canon_modal_col(col: F.Column) -> F.Column:
    """Canonical comparison rendering for modal-value IN filters:
    whole numbers (any numeric type, or numeric-looking strings)
    render as their integer string so double-typed code columns
    ('12.0') match integer params (12); everything else compares
    case-insensitively. try_cast only — ANSI-safe."""
    s = col.cast("string")
    d = s.try_cast("double")
    i = d.try_cast("bigint")
    return (
        F.when(d.isNotNull() & (d == i.cast("double")), i.cast("string"))
        .when(d.isNotNull(), d.cast("string"))
        .otherwise(F.lower(s))
    )


def _canon_modal_py(v: Any) -> str:
    """Python mirror of :func:`_canon_modal_col` for parameter values."""
    try:
        d = float(v)
    except (TypeError, ValueError):
        return str(v).lower()
    if d == int(d):
        return str(int(d))
    return repr(d)


def _resolve_timevar_col(
    timevar: DataFrame, param: str, candidates: list[str]
) -> str:
    for c in candidates:
        if c in timevar.columns:
            return c
    raise KeyError(
        f"claims_elig parameter {param!r} needs a timevar column "
        f"{candidates} which this source's timevar lacks "
        f"(available: {sorted(timevar.columns)})"
    )


def _validate_window(from_date: str, to_date: str) -> None:
    """Up-front argument validation (the reference checks its ~50 args
    before emitting SQL, ``R/claims_elig.R:237-411``). An inverted
    window would silently return an empty cohort — fail loudly."""
    import datetime as dt

    f, t = dt.date.fromisoformat(from_date), dt.date.fromisoformat(to_date)
    if f > t:
        raise ValueError(f"from_date {from_date} is after to_date {to_date}")


def claims_elig(
    demo: DataFrame,
    timevar: DataFrame,
    from_date: str,
    to_date: str,
    cov_min: float = 0.0,
    covgap_max: int | None = None,
    age_min: int | None = None,
    age_max: int | None = None,
    demo_filters: dict[str, Any] | None = None,
    timevar_values: list[str] | None = None,
    timevar_pct: list[str] | None = None,
    timevar_denom: str = "duration",
    id_col: str = "id_mcaid",
    ref_bsp_names: DataFrame | None = None,
    ref_hra_names: DataFrame | None = None,
    ref_county_names: DataFrame | None = None,
    **named_filters: Any,
) -> DataFrame:
    """Eligibility cohort query (``R/claims_elig.R:159-1452``).

    Returns one row per qualifying member with coverage stats
    (cov_days/cov_pct/pre_gap/post_gap/covgap_max — the
    ``##cov_time_part``/``##cov_time_tot`` stages as cached
    sub-plans) plus, for each requested time-varying column, the
    most-person-time value over the window (the ``timevar_gen_sql``
    pattern, ``:788-881``).

    Every reference named parameter (``:441-583``) is accepted as a
    keyword — ``race_black=1``, ``race_me=["black", "multiple"]``,
    ``lang_max=["SPANISH"]``, ``geo_kc_ever=1``, ... — scalars become
    equality predicates and lists become case-insensitive IN, exactly
    the reference's ``AND col = x`` / ``AND LOWER(col) IN (...)``
    fragments; unknown names raise up front like the reference's
    argument validation.

    The TIMEVAR-derived families (``:788-1280``, round 9) are also
    named parameters: ``{flag}_min``/``{flag}_max`` bound the percent
    of the denominator spent with the 0/1 timevar flag set
    (``dual_min=50``, ``geo_kc_min=80``, ``full_benefit_min=100``,
    ``part_a_min/...``; denominator follows ``timevar_denom``), and
    the modal-value params (``cov_type=["FFS"]``, ``mco_id``,
    ``bsp_group_cid``, ``geo_zip``, ``geo_region``,
    ``geo_hra_code``/``geo_ach_code``/``geo_school_code``/
    ``geo_county_code``, ``pha_agency``/``pha_subsidy``/
    ``pha_voucher``/``pha_operator``/``pha_portfolio``) filter on the
    person's most-person-time value (rank = person-time DESC, value
    ASC — the reference's ``rk = 1``). Comparison is case-insensitive
    for all modal params (a superset of the R, which lowers only the
    text-valued ones — digit codes are unaffected). A param whose
    backing column is missing from this source's timevar raises
    KeyError up front, mirroring the reference's per-source fragment
    gating (``:885-1110``). The ``ref_*_names`` frames reproduce the
    post-join name attachment (``:1408-1438``): bsp_group_cid ->
    bsp_group_name, geo_hra_code -> geo_hra_name, geo_county_code ->
    geo_county_name, each a broadcast left join when the code column
    was requested via ``timevar_values``.

    ``timevar_denom`` (R ``:691-696``; reference default
    ``"duration"``) picks the percentage denominator: the window
    length, or the person's covered days (``"cov_days"``).

    Divergence, on purpose: the R emits ``AND c.covgap_max >=
    {covgap_max}`` (``:687``) — keeping members whose largest gap is
    AT LEAST the cap — while its own roxygen defines the parameter as
    the "maximum gap in continuous coverage allowed" (``:31``) and
    validates it as a cap. An apparent ``>=``/``<=`` typo of the same
    family as ``top_causes``' pmax/pmin; this port filters
    ``covgap_max <= cap``, honoring the documented contract.
    """
    _validate_window(from_date, to_date)
    cov = coverage_stats(
        timevar, [id_col], "from_date", "to_date", from_date, to_date
    ).filter(F.col("cov_pct") >= cov_min)
    if covgap_max is not None:
        cov = cov.filter(F.col("covgap_max") <= covgap_max)

    out = demo.join(cov, id_col)  # J1: demo × coverage totals

    if age_min is not None or age_max is not None:
        age = age_years(F.col("dob"), F.lit(to_date).cast("date"))
        out = out.withColumn("age", age)
        if age_min is not None:
            out = out.filter(F.col("age") >= age_min)
        if age_max is not None:
            out = out.filter(F.col("age") <= age_max)

    all_filters = {**(demo_filters or {}), **named_filters}
    # reference param-name -> column mappings (R/claims_elig.R:441-459):
    # `female`/`male` filter the gender_female/gender_male ever flags,
    # and `id` is the member-cohort restriction (``AND {id_name} IN
    # ({id*})``) — a list compiles to an IN predicate, a DataFrame
    # cohort to a broadcast semi join.
    if "female" in all_filters:
        all_filters["gender_female"] = all_filters.pop("female")
    if "male" in all_filters:
        all_filters["gender_male"] = all_filters.pop("male")
    id_param = all_filters.pop("id", None)
    if id_param is not None:
        if isinstance(id_param, DataFrame):
            out = out.join(
                F.broadcast(id_param.select(id_col).distinct()),
                id_col, "left_semi",
            )
        else:
            out = out.filter(F.col(id_col).isin(list(id_param)))
    # `geo_kc_ever` (R :578-580) is a stored demo column for the
    # combined sources; the mcaid demo table doesn't carry it, so
    # derive the ever flag from timevar's geo_kc when absent — same
    # semantics, no schema invention.
    if (
        "geo_kc_ever" in all_filters
        and "geo_kc_ever" not in out.columns
        and "geo_kc" in timevar.columns
    ):
        out = out.join(
            timevar.groupBy(id_col).agg(
                # _flag_as_int, not cast('int'): a 'Y'/'N'-encoded stage
                # flag would throw under ANSI mode instead of filtering
                F.max(_flag_as_int(F.col("geo_kc"))).alias("geo_kc_ever")
            ),
            id_col, "left",
        )
    # extract the timevar-derived families before the generic demo
    # filter validation (they are not demo columns); applied below
    # once the overlap-clipped timevar frame exists
    _MISSING = object()
    tv_pct_bounds: dict[str, tuple] = {}
    for flag in _TIMEVAR_PCT_FLAGS:
        mn = all_filters.pop(f"{flag}_min", None)
        mx = all_filters.pop(f"{flag}_max", None)
        if mn is not None or mx is not None:
            tv_pct_bounds[flag] = (mn, mx)
    tv_modal_in: dict[str, list] = {}
    for param in _TIMEVAR_MODAL_IN:
        v = all_filters.pop(param, _MISSING)
        if v is not _MISSING and v is not None:
            tv_modal_in[param] = v if isinstance(
                v, (list, tuple, set, frozenset)
            ) else [v]
    if all_filters:
        out = apply_filters(out, all_filters)

    # per-variable most-person-time subqueries (A5), overlap-clipped
    win_from, win_to = F.lit(from_date).cast("date"), F.lit(to_date).cast("date")
    overlapping = timevar.filter(
        (F.col("from_date") <= win_to) & (F.col("to_date") >= win_from)
    ).withColumn(
        "_cov_days",
        F.datediff(
            F.least("to_date", win_to), F.greatest("from_date", win_from)
        )
        + 1,
    )
    for var in timevar_values or []:
        best = mode_value(
            overlapping,
            [id_col],
            var,
            weight=F.col("_cov_days"),
            keep_weight_as=f"{var}_cov_days",
        )
        out = out.join(best, id_col, "left")

    # the reference's second subquery form (R/claims_elig.R:788-881):
    # top value plus its share of the person's covered days, as a
    # percentage of the coverage denominator
    # timevar_denom (R :133, :410-411, :691-696): the percentage
    # denominator is either the WINDOW length ('duration', the
    # reference default — a constant, so the pct reads "share of the
    # whole window") or the person's covered days ('cov_days' —
    # "share of the time they were covered")
    if timevar_denom not in ("duration", "cov_days"):
        raise ValueError(
            "timevar_denom must be one of 'duration' or 'cov_days' "
            f"(R/claims_elig.R:691-696), got {timevar_denom!r}"
        )
    # --- timevar-derived named-parameter families (R :888-1280) ---
    # pct=T flags: percent of the denominator with flag=1, decimal(4,1)
    window_days = F.datediff(win_to, win_from) + 1
    for flag, (mn, mx) in tv_pct_bounds.items():
        col = _resolve_timevar_col(timevar, flag, _TIMEVAR_PCT_FLAGS[flag])
        flag_days = overlapping.groupBy(id_col).agg(
            F.sum(F.col("_cov_days") * _flag_as_int(F.col(col))).alias("_fd")
        )
        pct_denom = (
            window_days if timevar_denom == "duration" else F.col("cov_days")
        )
        out = (
            out.join(flag_days, id_col, "left")
            .withColumn(
                f"{flag}_pct",
                F.round(F.col("_fd") * 100.0 / pct_denom, 1),
            )
            .drop("_fd")
        )
        # NULL pct (flag NULL across the person's rows) fails either
        # bound, like the reference's WHERE on the LEFT-JOINed subquery
        if mn is not None:
            out = out.filter(F.col(f"{flag}_pct") >= mn)
        if mx is not None:
            out = out.filter(F.col(f"{flag}_pct") <= mx)

    # pct=F modal values: most-person-time value IN (...) —
    # mode_value's default tiebreak IS the reference's ORDER BY
    # SUM(cov_days) DESC, value ASC. Both sides of the IN are
    # canonicalized (whole numbers render as their integer string,
    # everything else lowercases) so a double-typed code column
    # rendering '12.0' still matches bsp_group_cid=[12] instead of
    # silently emptying the cohort.
    for param, vals in tv_modal_in.items():
        col = _resolve_timevar_col(timevar, param, _TIMEVAR_MODAL_IN[param])
        best = mode_value(
            overlapping, [id_col], col,
            weight=F.col("_cov_days"), out_col=f"_{param}_best",
        )
        canon = [_canon_modal_py(v) for v in vals]
        out = (
            out.join(best, id_col, "left")
            .filter(_canon_modal_col(F.col(f"_{param}_best")).isin(canon))
            .drop(f"_{param}_best")
        )

    denom = None
    if timevar_pct and timevar_denom == "cov_days":
        denom = overlapping.groupBy(id_col).agg(
            F.sum("_cov_days").alias("_denom_days")
        )
    for var in timevar_pct or []:
        if f"{var}_pct" in out.columns:
            raise ValueError(
                f"{var}_pct already produced by the {var}_min/{var}_max "
                "flag-percent parameter — request one form or the other "
                "(they compute different quantities: flag person-time "
                "share vs modal-value share)"
            )
        best = mode_value(
            overlapping,
            [id_col],
            var,
            weight=F.col("_cov_days"),
            keep_weight_as=f"_{var}_days",
        )
        value_cols = [] if var in (timevar_values or []) else [F.col(var)]
        if timevar_denom == "duration":
            window_days = F.datediff(win_to, win_from) + 1
            pct = best.select(
                id_col,
                *value_cols,
                F.round(
                    F.col(f"_{var}_days") * 100.0 / window_days, 1
                ).alias(f"{var}_pct"),
            )
        else:
            pct = best.join(denom, id_col).select(
                id_col,
                *value_cols,
                F.round(
                    F.col(f"_{var}_days") * 100.0 / F.col("_denom_days"), 1
                ).alias(f"{var}_pct"),
            )
        out = out.join(pct, id_col, "left")

    # name post-joins (R/claims_elig.R:1408-1438) — tiny reference
    # dimensions, always broadcast
    for ref, key, name_col in (
        (ref_bsp_names, "bsp_group_cid", "bsp_group_name"),
        (ref_hra_names, "geo_hra_code", "geo_hra_name"),
        (ref_county_names, "geo_county_code", "geo_county_name"),
    ):
        if ref is not None and key in out.columns:
            out = out.join(
                F.broadcast(ref.select(key, name_col).distinct()), key, "left"
            )
    return out


def claims_condition(
    condition_table: DataFrame,
    condition: str,
    from_date: str,
    to_date: str,
    cond_col: str = "ccw_desc",
    id_col: str = "id_mcaid",
    ids: list | DataFrame | None = None,
) -> DataFrame:
    """Members whose condition interval overlaps the request window
    (``R/claims_condition.R:126-132`` — J8 range predicate).

    ``condition`` is validated against the 31-condition CCW catalog
    when it carries the ``ccw_`` prefix (the R's ``match.arg`` over
    its literal list, ``:53-68`` — a typo'd condition errors instead
    of silently matching nothing); non-CCW condition tables (BH,
    MOUD) pass through unvalidated since their vocabularies live in
    the table. ``ids`` (R ``:71``, the ``id`` parameter) restricts to
    a member cohort — a Python list compiles to an IN predicate, a
    DataFrame joins (left semi, broadcast-eligible)."""
    _validate_window(from_date, to_date)
    if condition.lower().startswith("ccw_"):
        from claims_data_spark.tables.ccw_catalog import CCW_CATALOG

        known = {c["ccw_abbrev"] for c in CCW_CATALOG}
        if condition.lower() not in known:
            raise ValueError(
                f"unknown CCW condition {condition!r} "
                f"(R/claims_condition.R:53-68); known: {sorted(known)}"
            )
    out = condition_table.filter(
        (F.lower(F.col(cond_col)) == condition.lower())
        & (F.col("first_encounter_date") <= F.lit(to_date).cast("date"))
        & (F.col("last_encounter_date") >= F.lit(from_date).cast("date"))
    ).select(id_col, cond_col, "first_encounter_date", "last_encounter_date")
    if ids is not None:
        if isinstance(ids, DataFrame):
            out = out.join(
                F.broadcast(ids.select(id_col).distinct()), id_col,
                "left_semi",
            )
        else:
            out = out.filter(F.col(id_col).isin(list(ids)))
    return out


_TOP_CAUSES_TYPE_COL = {"ed": "ed_pophealth_id", "inpatient": "inpatient_id"}


def top_causes(
    cohort: DataFrame,
    header: DataFrame,
    icdcm: DataFrame,
    ref_icdcm: DataFrame,
    from_date: str,
    to_date: str,
    top_n: int = 10,
    type: str = "ed",
    override_all: bool = False,
    catch_all: bool = False,
    primary_dx: bool = True,
    ind_dates: bool = False,
    ind_from_col: str = "from_date",
    ind_to_col: str = "to_date",
    event_id_col: str | None = None,
    id_col: str = "id_mcaid",
    max_broadcast_cohort_rows: int | None = 10_000_000,
) -> DataFrame:
    """Top causes (CCS categories) among a cohort's events
    (``R/top_causes.R:55-346``): cohort ⋈ date/event-filtered headers
    ⋈ dx ⋈ CCS reference, count distinct events per category, top-N
    with rank ties (A12/O3, the R's ``top_n`` keeps ties too).

    Parameter parity with the reference:

    * ``type`` — ``"ed"`` keeps claims with a non-null
      ``ed_pophealth_id`` and counts distinct ED episodes;
      ``"inpatient"`` the same over ``inpatient_id``; ``"all"`` takes
      every claim and counts distinct ``claim_header_id``, and — like
      the R's stop() (``:182-190``) — requires ``override_all=True``
      because an unflagged pull scans the whole header. A custom
      ``event_id_col`` overrides the type→column map for bespoke
      event grains.
    * ``primary_dx`` — True restricts to ``icdcm_number IN
      ('01', 'admit')`` (``:166-170``); False uses every dx row.
    * ``catch_all`` — False drops catch-all CCS categories keeping
      NULL-flag rows (`is.na(ccs_catch_all) | ccs_catch_all == 0`,
      ``:314-316``); True keeps them.
    * ``ind_dates`` / ``ind_from_col`` / ``ind_to_col`` — per-person
      date windows (``:119-132, 173-178, 198-214, 289-306``): cohort
      rows entirely outside the global window are dropped, each
      person's window is clipped to the global one, and a claim
      counts only when ``from_date_ind <= first_service_date <=
      to_date_ind`` for THAT person (on top of the global filter, so
      the header scan still prunes on the global range). Divergence,
      on purpose: the R clips the individual END date with ``pmax``
      (``:209``), which widens it to at least the global to_date and
      silently ignores every individual end date — an apparent typo
      for ``pmin`` (the join predicate ``:175-177`` clearly intends a
      narrowing window, and the roxygen says "narrow the default date
      window"). This port clips with ``least``, honoring the
      documented intent; set ``ind_to_col`` to a column of global
      to_dates to reproduce the R's literal behavior.
    * ``max_broadcast_cohort_rows`` — the ``ind_dates`` cohort join
      broadcasts the clipped member windows (zero fact exchanges)
      only while the cohort fits this bound (probed with a bounded
      LIMIT count); above it the join falls back to shuffle_hash
      instead of hard-failing on the 8 GB / 512M-row broadcast cap.
      ``None`` skips the probe and always broadcasts.

    The cohort is a DataFrame — no 1,000-literal ``##temp_ids``
    batches (``:216-273``); the join IS the temp table. The per-person
    window rides the same equi-join on ``id`` (a post-join filter,
    not a range join), so ind_dates adds zero exchanges.
    """
    _validate_window(from_date, to_date)
    if type not in ("ed", "inpatient", "all"):
        raise ValueError(f"type must be ed|inpatient|all, got {type!r}")
    if type == "all" and not override_all:
        raise ValueError(
            "type='all' pulls every claim (slow); pass override_all=True "
            "to confirm (R/top_causes.R:186-189)"
        )
    count_col = (
        event_id_col
        if event_id_col is not None
        else _TOP_CAUSES_TYPE_COL.get(type, "claim_header_id")
    )
    gf, gt = F.lit(from_date).cast("date"), F.lit(to_date).cast("date")

    flt = (
        (F.col("first_service_date") >= gf)
        & (F.col("first_service_date") <= gt)
        & F.col("primary_diagnosis").isNotNull()
    )
    if type != "all":
        flt = flt & F.col(count_col).isNotNull()

    dx = icdcm.select("claim_header_id", "icdcm_norm", "icdcm_version")
    if primary_dx:
        dx = icdcm.filter(
            F.col("icdcm_number").isin("01", "admit")
        ).select("claim_header_id", "icdcm_norm", "icdcm_version")
    ccs = ref_icdcm.select(
        F.col("icdcm").alias("icdcm_norm"),
        "icdcm_version",
        "ccs_detail_desc",
        "ccs_catch_all",
    )
    if not catch_all:
        # filter the dimension BEFORE broadcast: the inner join then
        # drops catch-all dx rows as probe misses instead of
        # materializing them for a post-join filter
        ccs = ccs.filter(
            F.col("ccs_catch_all").isNull() | (F.col("ccs_catch_all") == 0)
        )
    ccs = ccs.drop("ccs_catch_all")
    # claim-grain joins FIRST (round 10): header⋈dx⋈ccs before the
    # cohort restriction. On the stored claim-bucketed layout both
    # fact sides ride the bucketing (zip join, zero exchange) and the
    # cohort join is a broadcast of the member cohort (zero fact
    # exchanges — see the ind_dates block below). The old cohort-first
    # order left the dx join between a cohort-partitioned events
    # frame and the claim-keyed dx fact, so the planner broadcast the
    # whole cohort's event set — a fact-sized build growing with the
    # cohort (~4M rows at sf30), the broadcast-the-fact trap.
    # Inner/semi joins: order does not change the result.
    matched = (
        header.filter(flt)
        .select(
            "claim_header_id", id_col, count_col, "first_service_date"
        )
        .join(dx, "claim_header_id")
        .join(F.broadcast(ccs), ["icdcm_norm", "icdcm_version"])
    )
    if ind_dates:
        # (id, window) rows; drop persons entirely outside the global
        # window; clip to it (R :198-214, pmax typo corrected). The
        # R's DISTINCT on the temp-id table is dropped on purpose:
        # the result feeds COUNT(DISTINCT event), which duplicate or
        # overlapping window rows cannot skew, and the dedup agg cost
        # a full extra pass over the cohort (sf30 A/B: 2.8 vs 2.6 s
        # whole-query with a shuffle_hash hint). BROADCAST the
        # clipped cohort (round 10, second pass): the build side is
        # MEMBER-grain — three narrow columns bounded by the member
        # dimension, the same cohort the engine already broadcasts in
        # claims_elig's id_param semi join, and the reference itself
        # ships driver-side as ##temp_ids literals (:216-273) — while
        # the probe side is the matched EVENT stream. Broadcasting
        # keeps the events on their claim-bucket partitioning (zero
        # fact exchanges end to end — bucketed plan: 5 exchanges → 3,
        # both id-grain fact exchanges deleted); the shuffle_hash
        # form it replaced moved every matched event through an
        # id-grain exchange that existed only to meet the cohort.
        # sf30 local walls are a measured WASH (three interleaved A/B
        # sessions: 5.70 vs 3.43, then 2.73 vs 3.21, then a best-of-6
        # ABBA tie 3.58 vs 3.54 — window noise dominates); kept on
        # the plan shape: at scale the event shuffle grows with
        # claims while the broadcast grows with members.
        ids = (
            cohort.select(
                id_col,
                F.col(ind_from_col).cast("date").alias("_ind_from"),
                F.col(ind_to_col).cast("date").alias("_ind_to"),
            )
            .filter(~((F.col("_ind_to") < gf) | (F.col("_ind_from") > gt)))
            .withColumn("_ind_from", F.greatest("_ind_from", gf))
            .withColumn("_ind_to", F.least("_ind_to", gt))
        )
        # Size-guard the broadcast (round 11): F.broadcast() overrides
        # the autoBroadcastJoinThreshold unconditionally, and the
        # cohort is caller-supplied — an unfiltered 100 TB cohort can
        # exceed the 8 GB / 512M-row broadcast-relation cap and
        # driver memory, turning a perf hint into a hard failure. A
        # bounded LIMIT probe (reads at most max_broadcast_cohort_rows
        # + 1 rows, then short-circuits) decides: in-bound cohorts
        # broadcast (zero fact exchanges, the round-10 plan);
        # oversized cohorts fall back to the shuffle_hash form, whose
        # per-partition build is |cohort|/shuffle-partitions clipped
        # window rows — bounded at any cohort size once hashed.
        fits = (
            max_broadcast_cohort_rows is None
            or ids.limit(max_broadcast_cohort_rows + 1).count()
            <= max_broadcast_cohort_rows
        )
        cohort_side = (
            F.broadcast(ids) if fits else ids.hint("shuffle_hash")
        )
        joined = (
            matched.join(cohort_side, id_col)
            .filter(
                (F.col("first_service_date") >= F.col("_ind_from"))
                & (F.col("first_service_date") <= F.col("_ind_to"))
            )
        )
    else:
        joined = matched.join(
            cohort.select(id_col).distinct(), id_col, "left_semi"
        )
    counted = joined.groupBy("ccs_detail_desc").agg(
        F.countDistinct(count_col).alias("event_count")
    )
    w = Window.orderBy(F.col("event_count").desc())
    return (
        counted.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= top_n)
        .select("ccs_detail_desc", "event_count", "rk")
    )


def elig_timevar_collapse(
    timevar: DataFrame,
    group_cols: list[str],
    id_col: str = "id_mcaid",
    from_col: str = "from_date",
    to_col: str = "to_date",
    cov_time_day: bool = True,
    ids: list | DataFrame | None = None,
) -> DataFrame:
    """Re-collapse the timevar table keeping only a user-chosen subset
    of covariates (``R/elig_timevar_collapse.R:251-283``): adjacent
    periods that agree on the kept columns merge into wider islands
    (a calendar gap breaks the island, matching the R's
    ``datediff(lag(to_date), from_date) <= 1`` group rule).

    ``cov_time_day`` (R ``:189-194``, reference default TRUE) appends
    the collapsed period's coverage days (``datediff + 1`` — exact,
    because merged periods are contiguous by construction). ``ids``
    (R ``:197-214``) restricts to a member cohort before collapsing —
    list → IN predicate, DataFrame → broadcast semi join.
    """
    if not group_cols:
        raise ValueError(
            "Choose at least one column to collapse over "
            "(R/elig_timevar_collapse.R:106)"
        )
    src = timevar.select(id_col, from_col, to_col, *group_cols)
    if ids is not None:
        if isinstance(ids, DataFrame):
            src = src.join(
                F.broadcast(ids.select(id_col).distinct()), id_col,
                "left_semi",
            )
        else:
            src = src.filter(F.col(id_col).isin(list(ids)))
    out = collapse_islands(
        src,
        [id_col],
        from_col,
        to_col,
        group_cols=group_cols,
        max_gap_days=1,
    )
    if cov_time_day:
        out = out.withColumn(
            "cov_time_day",
            F.datediff(F.col(to_col), F.col(from_col)) + 1,
        )
    return out


DEFAULT_SUMMARY_FLAGS = [
    "inpatient", "ipt_medsurg", "ipt_bh", "ed", "ed_avoid_ca",
    "ed_emergent_nyu", "ed_nonemergent_nyu", "ed_intermediate_nyu",
    "dental",
]


def claims_summary(
    cohort: DataFrame,
    claim_summary: DataFrame,
    from_date: str,
    to_date: str,
    flag_cols: list[str] | None = None,
    id_col: str = "id_mcaid",
    date_col: str = "first_service_date",
) -> DataFrame:
    """Per-person utilization counts over a window, joined to an
    eligibility cohort (``analysis/.../sp_mcaid_claims_simple_r.sql:
    27-91`` — the companion of the cohort sproc; the "detailed" form
    ``sp_mcaid_claims_detail_r.sql`` is the SAME aggregate over a
    wider flag list, reachable here via ``flag_cols``).

    The reference sums a per-(person, service-date) MAX of each event
    flag — i.e. an event counts once per distinct service DATE, not
    once per claim row. That two-level aggregate collapses to ONE
    groupBy(person) of ``COUNT(DISTINCT CASE WHEN flag=1 THEN date
    END)`` per flag: identical arithmetic, one shuffle instead of two
    (Spark's multi-distinct Expand multiplies the filtered claim rows
    by the flag count, but the exchange count — the scale cost —
    halves). Window membership is event-BEGAN-in-window (``:82``);
    persons with no claims keep their cohort row with zero counts and
    ``no_claims = 1`` (``:45``).
    """
    _validate_window(from_date, to_date)
    flags = flag_cols or [
        c for c in DEFAULT_SUMMARY_FLAGS if c in claim_summary.columns
    ]
    window_claims = claim_summary.filter(
        (F.col(date_col) >= F.lit(from_date).cast("date"))
        & (F.col(date_col) <= F.lit(to_date).cast("date"))
    ).join(cohort.select(id_col).distinct(), id_col, "left_semi")
    counts = window_claims.groupBy(id_col).agg(*[
        F.countDistinct(
            F.when(F.col(c) == 1, F.col(date_col))
        ).alias(f"{c}_cnt")
        for c in flags
    ])
    out = cohort.join(counts, id_col, "left")
    # the joined count columns are null IFF the person had no window
    # claims at all (a grouped person always gets 0s, never nulls)
    return out.withColumns({
        **{f"{c}_cnt": F.coalesce(F.col(f"{c}_cnt"), F.lit(0))
           for c in flags},
        "no_claims": F.when(
            F.coalesce(*[F.col(f"{c}_cnt") for c in flags]).isNull(), 1
        ).otherwise(0),
    })
