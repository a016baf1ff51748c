"""Noncisgender demographic flag (reference:
``claims_db/phclaims/stage/tables/load_stage.mcaid_elig_demo_extra.R``).

The reference pulls ~14 id lists to the R session (one SQL round-trip
each) and set-algebras them in memory.  Spark-first re-expression:

* ONE scan of the dx header computes every diagnosis-set membership
  as conditional flags aggregated to claim level (dysphoria, endocrine
  NOS, and the four cancer exclusion sets :24-42, 64-67, 88-91,
  115-118, 137-140),
* ONE scan of the procedure table tags the six surgery code sets
  (:44-150); the per-claim cancer exclusions become a left join on
  ``claim_header_id`` instead of temp-table anti joins,
* the hormone NDC sets (:150-215) are derived from the broadcast NDC
  reference (name LIKE filters + dose-strength parsing) and joined to
  pharmacy fills,
* the person-level set unions/intersections/differences (:246-282)
  become boolean algebra over one full-outer person frame — no ids
  ever collect to the driver.

The R script also pulls two exclusion dx sets (tbl4e/tbl4f,
:216-245) that its final id assembly never references; they are
deliberately NOT reproduced (dead sets).  The nested unions are
subsumed (``enos_transmasc`` and ``transmasc_and_hormones`` are
subsets of ``transmasc_proc``), so the surviving terms are
``proc | (endo & hormones & opposite-recorded-sex)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from claims_data_spark.functions.strings import tsql_like

# Gender-dysphoria dx (load_stage.mcaid_elig_demo_extra.R:24-30)
_DYSPHORIA = ["F64%", "F651%", "Z87890%"]
# Endocrine-disorder-NOS dx (:31-42)
_ENDO_NOS = [
    "E34[89]%", "E0[01234567]%", "E2[01234567]%", "E31%",
    "E34[01234]%", "E7%", "E8[03457]%", "E88[01234]%",
]
# Surgery code sets (:44-150)
_FTM_PROC = [
    "0W4N071", "0W4N0J1", "0W4NOK1", "15757", "53410", "55175",
    "55180", "55899", "55980", "57120", "64856",
]
_FTM_NO_UTER = ["58661"]
_FTM_NO_VAG = [
    "58661", "704", "7162", "0UTG0ZZ", "0UTG4ZZ", "0UTG7ZZ",
    "0UTG8ZZ", "0UTM0ZZ", "0UTMXZZ",
]
_MTF_PROC = [
    "0W4M070", "0W4M0J0", "0W4M0K0", "0W4M0Z0", "21209", "31899",
    "53430", "54125", "55970", "56805", "57335", "58999",
]
_MTF_NO_TEST = ["54520", "54690"]
_MTF_NO_PEN = ["643", "0VTS0ZZ", "0VTS4ZZ", "0VTSXZZ"]


def _any_like(col: Column, patterns: list[str]) -> Column:
    out = F.lit(False)
    for p in patterns:
        out = out | tsql_like(col, p)
    return out


def _dx_claim_flags(icdcm: DataFrame) -> DataFrame:
    """Claim-level dx-set flags in one scan.  ``icdcm`` needs
    id_mcaid, claim_header_id, icdcm_norm, icdcm_version."""
    dx = F.col("icdcm_norm")
    v9 = F.col("icdcm_version") == 9
    v10 = F.col("icdcm_version") == 10
    flags = {
        "dysphoria": _any_like(dx, _DYSPHORIA),
        "endo_nos": _any_like(dx, _ENDO_NOS),
        # cancer exclusions, version-specific (:64-67, 88-91, 115-118, 137-140)
        "exc_uter": (v9 & dx.like("183%"))
        | (v10 & (dx.like("C56%") | dx.like("C57%"))),
        "exc_vag": (v9 & dx.like("184%"))
        | (v10 & (dx.like("C51%") | dx.like("C52%"))),
        "exc_test": (v9 & tsql_like(dx, "187[56789]%"))
        | (v10 & tsql_like(dx, "C6[23]%")),
        "exc_pen": (v9 & tsql_like(dx, "187[1234]%")) | (v10 & dx.like("C60%")),
    }
    return icdcm.groupBy("id_mcaid", "claim_header_id").agg(
        *[
            F.max(expr.cast("int")).alias(name)
            for name, expr in flags.items()
        ]
    )


def _proc_claim_flags(procedure: DataFrame) -> DataFrame:
    code = F.col("procedure_code")
    flags = {
        "ftm_a": code.isin(_FTM_PROC),
        "ftm_b": code.isin(_FTM_NO_UTER),
        "ftm_c": code.isin(_FTM_NO_VAG),
        "mtf_d": code.isin(_MTF_PROC),
        "mtf_e": code.isin(_MTF_NO_TEST),
        "mtf_f": code.isin(_MTF_NO_PEN),
    }
    any_flag = F.lit(False)
    for expr in flags.values():
        any_flag = any_flag | expr
    return (
        procedure.filter(any_flag)
        .groupBy("id_mcaid", "claim_header_id")
        .agg(
            *[
                F.max(expr.cast("int")).alias(name)
                for name, expr in flags.items()
            ]
        )
    )


def hormone_ndc_sets(ref_ndc: DataFrame) -> DataFrame:
    """NDC -> hormone-set tags from the reference NDC table
    (:150-215).  Dose strength is the first number of the
    semicolon-joined ACTIVE_NUMERATOR_STRENGTH list."""
    name = F.upper(F.col("NONPROPRIETARYNAME"))
    form = F.col("DOSAGEFORMNAME")
    strength = F.split(
        F.split(F.col("ACTIVE_NUMERATOR_STRENGTH"), ";").getItem(0), " "
    ).getItem(0).cast("double")

    fem_no_req = (
        name.like("%ESTRAD%")
        | name.like("%ESTRO%")
        | name.like("%ESTRIOL%")
        | name.like("%ESTR/PRG%")
    )
    masc_no_req = (
        name.like("%DIHYDROTESTOSTERONE PROPIONATE%")
        | name.like("%NANDROLONE%")
        | name.like("%STANOLONE%")
        | name.like("%STANOZOLOL%")
    )
    masc_min_req = name.like("%TESTOSTERONE%") & (
        ((strength >= 7) & form.isin("INJECTION", "INJECTION, SOLUTION"))
        | ((strength >= 2) & form.isin("GEL", "PATCH", "GEL, METERED"))
    )
    fem_min_req = name.like("%SPIRONOLACTONE%") & (strength >= 50)

    return (
        ref_ndc.select(
            "ndc",
            (fem_no_req | fem_min_req).cast("int").alias("fem_hormone"),
            (masc_no_req | masc_min_req).cast("int").alias("masc_hormone"),
        )
        .filter((F.col("fem_hormone") == 1) | (F.col("masc_hormone") == 1))
        .distinct()
    )


def build_noncisgender_ids(
    icdcm: DataFrame,
    procedure: DataFrame,
    pharm: DataFrame,
    ref_ndc: DataFrame,
    demog: DataFrame,
) -> DataFrame:
    """Person ids receiving ``noncisgender = 1`` with their pathway
    category (``transmasc`` / ``transfem`` / ``unknown``).

    Mirrors the set algebra of load_stage.mcaid_elig_demo_extra.R:
    246-282: surgery-pathway ids, endocrine-NOS + qualifying hormones
    + opposite recorded sex, dysphoria-only ids; conflicting
    masc-and-fem ids are dropped entirely.
    """
    dxc = _dx_claim_flags(icdcm)
    prc = _proc_claim_flags(procedure)

    # claim-level proc pathways with same-claim cancer exclusions
    claims = prc.join(
        dxc.select(
            "claim_header_id", "exc_uter", "exc_vag", "exc_test", "exc_pen"
        ),
        "claim_header_id",
        "left",
    )
    zero = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    proc_person = claims.groupBy(prc["id_mcaid"].alias("id_mcaid")).agg(
        F.max(
            (
                (F.col("ftm_a") == 1)
                | ((F.col("ftm_b") == 1) & (zero("exc_uter") == 0))
                | ((F.col("ftm_c") == 1) & (zero("exc_vag") == 0))
            ).cast("int")
        ).alias("transmasc_proc"),
        F.max(
            (
                (F.col("mtf_d") == 1)
                | ((F.col("mtf_e") == 1) & (zero("exc_test") == 0))
                | ((F.col("mtf_f") == 1) & (zero("exc_pen") == 0))
            ).cast("int")
        ).alias("transfem_proc"),
    )

    dx_person = dxc.groupBy("id_mcaid").agg(
        F.max("dysphoria").alias("dysphoria"),
        F.max("endo_nos").alias("endo_nos"),
    )

    hormones = pharm.join(F.broadcast(hormone_ndc_sets(ref_ndc)), "ndc")
    horm_person = hormones.groupBy("id_mcaid").agg(
        F.max("masc_hormone").alias("masc_hormone"),
        F.max("fem_hormone").alias("fem_hormone"),
    )

    person = (
        dx_person.join(proc_person, "id_mcaid", "full")
        .join(horm_person, "id_mcaid", "full")
        .join(demog.select("id_mcaid", "gender_me"), "id_mcaid", "left")
        .na.fill(
            0,
            [
                "dysphoria", "endo_nos", "transmasc_proc", "transfem_proc",
                "masc_hormone", "fem_hormone",
            ],
        )
    )

    masc = (F.col("transmasc_proc") == 1) | (
        (F.col("endo_nos") == 1)
        & (F.col("masc_hormone") == 1)
        & (F.col("gender_me") == "Female")
    )
    fem = (F.col("transfem_proc") == 1) | (
        (F.col("endo_nos") == 1)
        & (F.col("fem_hormone") == 1)
        & (F.col("gender_me") == "Male")
    )
    tagged = person.select(
        "id_mcaid",
        masc.alias("masc"),
        fem.alias("fem"),
        (F.col("dysphoria") == 1).alias("dys"),
    )
    return (
        tagged.filter(F.col("masc") | F.col("fem") | F.col("dys"))
        .select(
            "id_mcaid",
            F.when(F.col("masc") & F.col("fem"), "conflict")
            .when(F.col("masc"), "transmasc")
            .when(F.col("fem"), "transfem")
            .otherwise("unknown")
            .alias("category"),
        )
        .filter(F.col("category") != "conflict")
    )


def apply_noncisgender_flag(demog: DataFrame, ids: DataFrame) -> DataFrame:
    """The UPDATE..INNER JOIN at :300-311: left semi-tag demog rows
    whose id appears in the noncisgender id set."""
    flagged = ids.select("id_mcaid").distinct().withColumn(
        "_ncg", F.lit(1)
    )
    return demog.join(flagged, "id_mcaid", "left").withColumn(
        "noncisgender", F.coalesce(F.col("_ncg"), F.lit(0))
    ).drop("_ncg")
