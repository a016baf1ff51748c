"""Address cleaning + geocoding reference tables.

Mirrors the reference's address family
(``load_stage.address_clean_full.R``,
``load_stage.address_clean_partial.R``,
``load_stage.address_geocode.R``):

* raw member addresses from every source are deduped into one
  address dimension keyed by ``geo_hash_raw`` (SHA-256 of the
  ``|``-joined raw fields, ``address_clean_partial.R:289-300``);
* only addresses NOT already in the reference table are sent to the
  external cleaning service (Informatica) — a hash anti-join
  (``address_clean_partial.R:66-92``);
* the service's output is post-processed (PO-box consolidation,
  orphan-secondary-designator recovery,
  ``address_clean_partial.R:204-227`` / ``address_clean_full.R:
  180-217,295-314``), manually-corrected rows override it
  (``:240-270``), and the result lands with clean-side hashes;
* geocoder output from two providers is merged with a preference
  rule and ZIP/street-centroid flags
  (``address_geocode.R:216-248``), then region attributes are
  attached spatially (→ ``operators/spatial``).

The cleaning service itself is out of engine scope (it is a vendor
product in the reference too); the engine owns everything around it:
the incremental hash diff, the merge rules, and the hash bookkeeping.
All transforms are JVM expressions — hashing is ``sha2``, the rules
are ``when`` chains — so the table builds entirely inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RAW_COLS = [
    "geo_add1_raw", "geo_add2_raw", "geo_city_raw",
    "geo_state_raw", "geo_zip_raw",
]
CLEAN_COLS = [
    "geo_add1_clean", "geo_add2_clean", "geo_city_clean",
    "geo_state_clean", "geo_zip_clean",
]

# Secondary-designator tokens the external cleaner is known to strip
# (``address_clean_full.R:295-300``).
SECONDARY_INIT = (
    "#", "$", "APT", "APPT", "APARTMENT", "APRT", "ATPT", "BOX",
    "BLDG", "BLD", "BLG", "BUILDING", "DUPLEX", "FL ", "FLOOR",
    "HOUSE", "LOT", "LOWER", "LOWR", "LWR", "REAR", "RM", "ROOM",
    "SLIP", "STE", "SUITE", "SPACE", "SPC", "STUDIO", "TRAILER",
    "TRAILOR", "TLR", "TRL", "TRLR", "UNIT", "UPPER", "UPPR",
    "UPSTAIRS",
)


def _null_safe_join(
    left: DataFrame, right: DataFrame, keys: list[str], how: str
) -> DataFrame:
    """Equi-join where NULL == NULL (dplyr join semantics — the
    reference matches NA address parts).  ``<=>`` is still a hash
    join key for Catalyst, so the plan stays a plain shuffle join."""
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else cond & c
    out = left.join(right, on=cond, how=how)
    for k in keys:
        out = out.drop(right[k])
    return out


def blank_to_null(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """''/'NA' -> NULL on string columns so joins and hashes agree
    (every loader in the family starts with this normalization)."""
    cols = cols or [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    ]
    for c in cols:
        df = df.withColumn(
            c, F.when(~F.col(c).isin("", "NA"), F.col(c))
        )
    return df


def address_hash(cols: list[str]) -> Column:
    """Uppercase SHA-256 over ``|``-joined, null-as-empty fields —
    byte-compatible with the reference's openssl::sha256 recipe
    (``address_clean_partial.R:289-300``)."""
    return F.upper(
        F.sha2(
            F.concat_ws("|", *[F.coalesce(F.col(c), F.lit("")) for c in cols]),
            256,
        )
    )


def new_addresses(source_addresses: DataFrame, ref_clean: DataFrame) -> DataFrame:
    """Distinct source addresses whose ``geo_hash_raw`` is absent from
    the reference table — the rows that still need external cleaning
    (partial step 1A/1B).  The anti join is an equi-join on the hash,
    so at warehouse scale it shuffles on a uniform 64-hex key."""
    adds = source_addresses.select(*RAW_COLS)
    adds = blank_to_null(adds, RAW_COLS).distinct().withColumn(
        "geo_hash_raw",
        address_hash(["geo_add1_raw", "geo_add2_raw"] + RAW_COLS[2:]),
    )
    return adds.join(
        ref_clean.select("geo_hash_raw"), on="geo_hash_raw", how="anti"
    )


def clean_external_output(raw_output: DataFrame) -> DataFrame:
    """Post-process the external cleaner's rows (old_* = input
    address, add1/add2/po_box/city/state/zip = cleaned output).

    Applies the reference's repair rules in order
    (``address_clean_partial.R:204-227``):

    1. designators starting with ``#`` that the cleaner dropped are
       recovered from the old address;
    2. PO-box details are folded into add1/add2 and ``po_box``
       becomes a 0/1 flag.
    """
    out = blank_to_null(
        raw_output,
        ["add1", "add2", "po_box", "city", "state", "zip",
         "old_add1", "old_add2", "old_city", "old_state", "old_zip"],
    ).distinct()

    add1, add2, po = F.col("add1"), F.col("add2"), F.col("po_box")
    out = out.withColumn(
        "add2",
        F.when(
            add2.isNull() & F.col("old_add1").startswith("#"),
            F.col("old_add1"),
        ).otherwise(add2),
    )
    out = (
        out.withColumn(
            "add1", F.when(add1.isNull() & po.isNotNull(), po).otherwise(add1)
        )
        .withColumn(
            "add2",
            F.when(F.col("add1") == po, add2)
            .when(add2.isNull() & po.isNotNull() & F.col("add1").isNotNull(), po)
            .when(add2.isNotNull() & po.isNotNull() & F.col("add1").isNotNull(),
                  F.concat_ws(" ", add2, po))
            .otherwise(add2),
        )
        .withColumn("po_box", po.isNotNull().cast("int"))
    )
    return out


def recover_secondary(df: DataFrame) -> DataFrame:
    """Full-refresh variant of designator recovery: when the cleaner
    emptied add2 but the old address carried a recognized secondary
    token, restore it (``address_clean_full.R:302-314``)."""
    def looks_secondary(c: Column) -> Column:
        out = F.lit(False)
        for tok in SECONDARY_INIT:
            out = out | c.startswith(tok)
        return out

    add2 = F.col("add2")
    df = df.withColumn(
        "add2",
        F.when(
            add2.isNull()
            & F.col("old_add2").isNotNull()
            & looks_secondary(F.col("old_add2")),
            F.col("old_add2"),
        ).otherwise(add2),
    )
    return df.withColumn(
        "add2",
        F.when(
            F.col("add2").isNull()
            & F.col("old_add1").isNotNull()
            & looks_secondary(F.col("old_add1")),
            F.col("old_add1"),
        ).otherwise(F.col("add2")),
    ).distinct()


def build_address_clean(
    raw_addresses: DataFrame,
    cleaned: DataFrame | None = None,
    manual: DataFrame | None = None,
) -> DataFrame:
    """The ``ref.address_clean`` load: distinct raw addresses LEFT
    JOINed to the cleaner's output on the raw 5-tuple, with manual
    corrections taking precedence (``overridden=1``,
    ``address_clean_partial.R:240-284``), plus the three hash
    columns and ``geo_geocode_skip``.

    ``cleaned`` carries old_* -> clean columns as produced by
    :func:`clean_external_output`; ``manual`` carries the raw
    5-tuple plus ``geo_*_clean`` overrides.
    """
    base = blank_to_null(
        raw_addresses.select(*RAW_COLS), RAW_COLS
    ).distinct()

    if cleaned is not None:
        ext = cleaned.select(
            F.col("old_add1").alias("geo_add1_raw"),
            F.col("old_add2").alias("geo_add2_raw"),
            F.col("old_city").alias("geo_city_raw"),
            F.col("old_state").alias("geo_state_raw"),
            F.col("old_zip").alias("geo_zip_raw"),
            F.col("add1").alias("geo_add1_clean"),
            F.col("add2").alias("geo_add2_clean"),
            F.col("city").alias("geo_city_clean"),
            F.col("state").alias("geo_state_clean"),
            F.col("zip").alias("geo_zip_clean"),
            F.col("po_box").alias("geo_po_box"),
        )
        base = _null_safe_join(base, ext, RAW_COLS, "left")
    else:
        for c in CLEAN_COLS:
            base = base.withColumn(c, F.lit(None).cast("string"))
        base = base.withColumn("geo_po_box", F.lit(None).cast("int"))

    if manual is not None:
        man = blank_to_null(manual, RAW_COLS + CLEAN_COLS).select(
            *RAW_COLS,
            *[F.col(c).alias(f"__man_{c}") for c in CLEAN_COLS],
        )
        base = _null_safe_join(base, man, RAW_COLS, "left")
        overridden = F.col("__man_geo_add1_clean").isNotNull() | F.col(
            "__man_geo_city_clean"
        ).isNotNull()
        for c in CLEAN_COLS:
            base = base.withColumn(
                c, F.when(overridden, F.col(f"__man_{c}")).otherwise(F.col(c))
            )
        base = base.withColumn("overridden", overridden.cast("int")).drop(
            *[f"__man_{c}" for c in CLEAN_COLS]
        )
    else:
        base = base.withColumn("overridden", F.lit(0))

    return (
        base.withColumn("geo_add3_raw", F.lit(None).cast("string"))
        .withColumn("geo_geocode_skip", F.lit(0).cast("int"))
        .withColumn(
            "geo_hash_raw",
            address_hash(
                ["geo_add1_raw", "geo_add2_raw", "geo_add3_raw",
                 "geo_city_raw", "geo_state_raw", "geo_zip_raw"]
            ),
        )
        .withColumn("geo_hash_clean", address_hash(CLEAN_COLS))
        .withColumn(
            "geo_hash_geocode",
            address_hash(
                ["geo_add1_clean", "geo_city_clean",
                 "geo_state_clean", "geo_zip_clean"]
            ),
        )
        .select(
            "geo_add1_raw", "geo_add2_raw", "geo_add3_raw", "geo_city_raw",
            "geo_state_raw", "geo_zip_raw", "geo_hash_raw",
            *CLEAN_COLS, "geo_hash_clean", "geo_hash_geocode",
            "geo_po_box", "overridden", "geo_geocode_skip",
        )
        .distinct()
    )


def build_address_geocode(esri: DataFrame, here: DataFrame) -> DataFrame:
    """Merge two geocoders' output with the reference's preference
    rule (``address_geocode.R:216-248``).

    ``esri`` carries the clean 4-tuple + (loc_name, status,
    match_addr, geo_lon/lat/x/y); ``here`` carries the clean 4-tuple
    + (address_type, formatted_address, geo_lon/lat/x/y).  HERE wins
    when it matched a house number or ESRI found nothing; ZIP- and
    street-centroid matches are flagged so downstream joins can
    drop low-precision points.
    """
    key = CLEAN_COLS[:1] + CLEAN_COLS[2:]  # add1/city/state/zip
    e = esri.select(
        *key, "loc_name", "status", "match_addr",
        *[F.col(c).alias(f"__e_{c}") for c in ("geo_lon", "geo_lat", "geo_x", "geo_y")],
    )
    h = here.select(
        *key, "address_type", "formatted_address", "geo_check_here",
        *[F.col(c).alias(f"__h_{c}") for c in ("geo_lon", "geo_lat", "geo_x", "geo_y")],
    )
    m = _null_safe_join(e, h, key, "left")

    src = F.when(
        F.col("__h_geo_lat").isNotNull()
        & ((F.col("address_type") == "houseNumber") | F.col("loc_name").isNull()),
        "here",
    ).otherwise("esri")
    m = m.withColumn("geo_geocode_source", src)
    use_here = F.col("geo_geocode_source") == "here"

    out = m.select(
        *key,
        F.upper(
            F.when(use_here, F.col("formatted_address")).otherwise(
                F.col("match_addr")
            )
        ).alias("geo_add_geocoded"),
        F.when(
            use_here,
            F.regexp_extract(F.col("formatted_address"), r" (\d{5}),", 1),
        )
        .otherwise(F.regexp_extract(F.col("match_addr"), r"(\d{5})$", 1))
        .alias("geo_zip_geocoded"),
        F.when(use_here, F.col("address_type"))
        .otherwise(F.col("loc_name"))
        .alias("geo_add_type"),
        F.lit(1).alias("geo_check_esri"),
        F.coalesce(F.col("geo_check_here"), F.lit(0)).alias("geo_check_here"),
        "geo_geocode_source",
        (
            (~use_here & (F.col("loc_name") == "zip_5_digit_gc"))
            | (use_here & F.col("address_type").isin("postalCode", "district"))
        )
        .cast("int")
        .alias("geo_zip_centroid"),
        (use_here & (F.col("address_type") == "street"))
        .cast("int")
        .alias("geo_street_centroid"),
        *[
            F.when(use_here, F.col(f"__h_{c}"))
            .otherwise(F.col(f"__e_{c}"))
            .alias(c)
            for c in ("geo_lon", "geo_lat", "geo_x", "geo_y")
        ],
    )
    return out.withColumn("geo_hash_geocode", address_hash(key))
