"""Medicaid housing-status periods
(reference: ``load_stage.mcaid_housing_status.R:43-123``).

Status per eligibility month from two signals: a HOMELESS substring in
either street-address line, and Z59.x ICD-10-CM codes on claims whose
service date falls inside the month. The reference resolves
multi-signal months with a second pass (temp3 count-distinct join);
here the period grain is ONE groupBy — when a period saw >1 distinct
status it collapses to 'homeless', >1 distinct source to 'multiple',
exactly the reference's override, without the self-join.

Scale: the month×zcode join is an equi-join on person id with the
BETWEEN residual — both sides shuffle-partition on id, no interval
cartesian (claims hit at most a handful of covered months per person).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOMELESS_ZCODES = ("Z590", "Z5900", "Z5901", "Z5902")
UNSTABLE_ZCODES = ("Z591", "Z5910", "Z5919")
UNSTABLE_PREFIX = "Z5981"


def build_housing_status(
    elig_month: DataFrame,
    icdcm_header: DataFrame,
    id_col: str = "id_mcaid",
) -> DataFrame:
    """Periods of homeless / unstably-housed status.

    ``elig_month`` needs (id, from_date, to_date, geo_add1, geo_add2);
    ``icdcm_header`` needs (id, first_service_date, icdcm_norm).
    """
    zc = F.col("icdcm_norm")
    zcodes = icdcm_header.filter(
        zc.isin(*HOMELESS_ZCODES, *UNSTABLE_ZCODES)
        | zc.startswith(UNSTABLE_PREFIX)
    ).select(
        id_col,
        "first_service_date",
        F.when(zc.isin(*HOMELESS_ZCODES), "homeless")
        .otherwise("unstably housed")
        .alias("zcode_status"),
    )

    addr_flag = (
        F.upper(F.coalesce(F.col("geo_add1"), F.lit(""))).contains("HOMELESS")
        | F.upper(F.coalesce(F.col("geo_add2"), F.lit(""))).contains(
            "HOMELESS"
        )
    ).cast("int")

    months = elig_month.select(
        id_col, "from_date", "to_date",
        addr_flag.alias("is_homeless_addr"),
    )
    joined = months.join(
        zcodes,
        (months[id_col] == zcodes[id_col])
        & zcodes["first_service_date"].between(
            months["from_date"], months["to_date"]
        ),
        "left",
    ).select(
        months[id_col].alias(id_col),
        "from_date", "to_date", "is_homeless_addr", "zcode_status",
    )

    flagged = joined.filter(
        (F.col("is_homeless_addr") == 1)
        | F.col("zcode_status").isNotNull()
    ).select(
        id_col, "from_date", "to_date",
        F.coalesce(
            F.col("zcode_status"),
            F.when(F.col("is_homeless_addr") == 1, "homeless"),
        ).alias("housing_status"),
        F.when(
            (F.col("is_homeless_addr") == 1)
            & F.col("zcode_status").isNotNull(),
            "multiple",
        )
        .when(F.col("is_homeless_addr") == 1, "homeless_address")
        .otherwise("z_codes")
        .alias("housing_status_source"),
    )

    # one pass: >1 distinct status -> 'homeless'; >1 source -> 'multiple'
    return flagged.groupBy(id_col, "from_date", "to_date").agg(
        F.when(
            F.count_distinct("housing_status") > 1, "homeless"
        )
        .otherwise(F.max("housing_status"))
        .alias("housing_status"),
        F.when(
            F.count_distinct("housing_status_source") > 1, "multiple"
        )
        .otherwise(F.max("housing_status_source"))
        .alias("housing_status_source"),
    )
