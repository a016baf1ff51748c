"""Pregnancy-episode table (reference:
``load_stage.mcaid_claim_preg_episode.R:1-2704``).

Implements the core episode machinery — endpoint day classification
(steps 3-4), the hierarchical timeline placement with the reference's
exact spacing matrix (steps 5A-5G), dataset-wide episode ids
(step 6), and the prenatal-window calculation (step 7). The
gestational-age corrections (steps 8A-8M: Z3A codes, NT scans, CVS,
cffDNA, term/preterm codes) refine ``preg_start_date`` from
additional claim evidence; they plug in through
``apply_start_corrections`` which takes a pre-computed
(id, episode, corrected_start) frame so each correction can be
expressed as an ordinary join against claim tables.

The timeline placement is per-person sequential by construction — a
candidate endpoint's eligibility depends on which endpoints were
ALREADY placed (the reference runs per-type WHILE loops with
cross-type prior/next lookups) — so it runs as one Arrow-batched
``applyInPandas`` scan per person: one shuffle on the id, linear
per-person work, no driver iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claims_data_spark.operators.dense_id import dense_global_id

ENDPOINTS = ["lb", "ect", "ab", "sa", "sb", "tro", "deliv"]

# processing order = outcome hierarchy (``:128-137``)
HIERARCHY = ["lb", "sb", "deliv", "tro", "ect", "ab", "sa"]

# same-type minimum spacing, days (the per-type WHILE loops'
# cumulative thresholds: ``:203,326,483,658`` ...)
SAME_TYPE_GAP = {
    "lb": 182, "sb": 168, "deliv": 168, "tro": 56,
    "ect": 56, "ab": 56, "sa": 42,
}

# cross-type minimum spacing vs already-placed endpoint types
# (candidate, placed) -> days (``:289-290,444-447,617-622,...``)
CROSS_TYPE_GAP = {
    ("sb", "lb"): 182,
    ("deliv", "lb"): 182, ("deliv", "sb"): 168,
    ("tro", "lb"): 168, ("tro", "sb"): 154, ("tro", "deliv"): 154,
    ("ect", "lb"): 168, ("ect", "sb"): 154, ("ect", "deliv"): 154,
    ("ect", "tro"): 56,
    ("ab", "lb"): 168, ("ab", "sb"): 154, ("ab", "deliv"): 154,
    ("ab", "tro"): 56, ("ab", "ect"): 56,
    ("sa", "lb"): 168, ("sa", "sb"): 154, ("sa", "deliv"): 154,
    ("sa", "tro"): 56, ("sa", "ect"): 56, ("sa", "ab"): 56,
}

# default gestation lengths for the prenatal window (step 7,
# ``:1386-1399``) and the buffer after the prior episode's outcome
GESTATION_DAYS = {
    "lb": 301, "sb": 301, "deliv": 301,
    "tro": 112, "ect": 84, "ab": 168, "sa": 133,
}
BIRTH_LIKE = ("lb", "sb", "deliv")


def classify_endpoint_days(endpoint_claims: DataFrame) -> DataFrame:
    """Steps 3-4: collapse endpoint-flagged claims to one row per
    (person, service day); drop days with >1 distinct non-DELIV
    endpoint (multiple-gestation conflict); recode DELIV to 0 when a
    specific endpoint exists; emit the mutually-exclusive
    ``preg_endpoint`` + hierarchy."""
    day = endpoint_claims.groupBy("id_mcaid", "last_service_date").agg(
        *[F.max(e).alias(e) for e in ENDPOINTS]
    )
    non_deliv = [e for e in ENDPOINTS if e != "deliv"]
    day = day.withColumn(
        "endpoint_dcount", sum(F.coalesce(F.col(e), F.lit(0)) for e in non_deliv)
    ).withColumn(
        "deliv",
        F.when(F.col("endpoint_dcount") == 0, F.col("deliv")).otherwise(0),
    ).filter(F.col("endpoint_dcount") <= 1)
    endpoint = F.when(F.col("lb") == 1, "lb")
    for e in ("ect", "ab", "sa", "sb", "tro", "deliv"):
        endpoint = endpoint.when(F.col(e) == 1, e)
    hier = F.when(F.col("lb") == 1, 1)
    for rank, e in [(2, "sb"), (3, "deliv"), (4, "tro"), (5, "ect"),
                    (6, "ab"), (7, "sa")]:
        hier = hier.when(F.col(e) == 1, rank)
    return (
        day.withColumn("preg_endpoint", endpoint)
        .withColumn("preg_hier", hier)
        .filter(F.col("preg_endpoint").isNotNull())
        .select("id_mcaid", "last_service_date", "preg_endpoint", "preg_hier")
    )


def _place_timeline(pdf):
    """Per-person hierarchical placement (steps 5A-5G): for each type
    in hierarchy order, keep candidates clear of every already-placed
    endpoint by the cross-type window, then greedy same-type thinning
    (keep when strictly more than the gap since the last KEPT)."""
    import pandas as pd

    placed: list[tuple] = []  # (date, type)
    for etype in HIERARCHY:
        cand = pdf[pdf["preg_endpoint"] == etype].sort_values(
            "last_service_date", kind="mergesort"
        )
        if cand.empty:
            continue
        survivors = []
        for d in cand["last_service_date"]:
            ok = True
            for (pd_date, pd_type) in placed:
                w = CROSS_TYPE_GAP.get((etype, pd_type))
                if w is not None and abs((d - pd_date).days) <= w:
                    ok = False
                    break
            if ok:
                survivors.append(d)
        last_kept = None
        gap = SAME_TYPE_GAP[etype]
        for d in survivors:
            if last_kept is None or (d - last_kept).days > gap:
                placed.append((d, etype))
                last_kept = d
    rows = [
        {"id_mcaid": pdf["id_mcaid"].iloc[0], "last_service_date": d,
         "preg_endpoint": t, "preg_hier": HIERARCHY.index(t) + 1}
        for d, t in sorted(placed)
    ]
    return pd.DataFrame(
        rows,
        columns=["id_mcaid", "last_service_date", "preg_endpoint", "preg_hier"],
    )


def build_preg_episodes(
    endpoint_claims: DataFrame, id_col: str = "id_mcaid"
) -> DataFrame:
    """Endpoint-flagged claims -> one row per pregnancy episode with
    ``preg_episode_id`` (globally dense), ``preg_start_date`` /
    ``preg_end_date`` (steps 4-7).

    Input: (id, last_service_date, lb, ect, ab, sa, sb, tro,
    deliv) — the union of dx- and px-matched claims (steps 1-3).
    ``id_col`` parameterizes the source: the APCD variant
    (``load_stage.apcd_claim_preg_episode.R``) runs the SAME Moll
    et al. algorithm keyed by ``id_apcd`` — pass it here and the
    output keeps that id name.
    """
    if id_col != "id_mcaid":
        out = build_preg_episodes(
            endpoint_claims.withColumnRenamed(id_col, "id_mcaid")
        )
        return out.withColumnRenamed("id_mcaid", id_col)
    days = classify_endpoint_days(endpoint_claims)
    placed = days.groupBy("id_mcaid").applyInPandas(
        _place_timeline, schema=days.schema
    )
    placed = dense_global_id(
        placed, ["id_mcaid", "last_service_date"], out_col="preg_episode_id"
    )

    # step 7: prenatal window, clamped by the prior episode + buffer
    from pyspark.sql import Window

    w = Window.partitionBy("id_mcaid").orderBy("last_service_date")
    prior_date = F.lag("last_service_date").over(w)
    prior_type = F.lag("preg_endpoint").over(w)
    days_diff_prior = F.datediff("last_service_date", prior_date)
    buffer = F.when(prior_type.isin(*BIRTH_LIKE), 28).when(
        prior_type.isNotNull(), 14
    )
    gest = F.lit(None).cast("int")
    for e, g in GESTATION_DAYS.items():
        gest = F.when(F.col("preg_endpoint") == e, g).otherwise(gest)
    out = (
        placed.withColumn("_days_diff_prior", days_diff_prior)
        .withColumn("_buffer", buffer)
        .withColumn("_gest", gest)
    )
    start = F.when(
        F.col("_days_diff_prior").isNull()
        | (F.col("_days_diff_prior") >= F.col("_gest")),
        F.date_add(F.col("last_service_date"), -F.col("_gest")),
    ).otherwise(
        F.date_add(
            F.col("last_service_date"),
            -F.col("_days_diff_prior") + F.col("_buffer"),
        )
    )
    return (
        out.withColumn("preg_start_date", start)
        .withColumn("preg_end_date", F.col("last_service_date"))
        .drop("_days_diff_prior", "_buffer", "_gest")
    )


def apply_start_corrections(
    episodes: DataFrame, corrections: DataFrame
) -> DataFrame:
    """Steps 8A-8M hook: ``corrections`` carries
    (id_mcaid, preg_episode_id, corrected_start_date, priority) rows
    from gestational-age evidence (Z3A ultrasounds, NT scans, CVS,
    cffDNA, term/preterm codes). The highest-priority correction per
    episode wins; episodes without evidence keep the default window.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("id_mcaid", "preg_episode_id").orderBy("priority")
    best = (
        corrections.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id_mcaid", "preg_episode_id", "corrected_start_date")
    )
    return episodes.join(best, ["id_mcaid", "preg_episode_id"], "left").withColumn(
        "preg_start_date",
        F.coalesce("corrected_start_date", "preg_start_date"),
    ).drop("corrected_start_date")
