"""Address clean/geocode family + spatial point-in-polygon join."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from claims_data_spark.operators.spatial import point_in_polygon_join
from claims_data_spark.tables.address import (
    blank_to_null,
    build_address_clean,
    build_address_geocode,
    clean_external_output,
    new_addresses,
    recover_secondary,
)

RAW_SCHEMA = (
    "geo_add1_raw string, geo_add2_raw string, geo_city_raw string, "
    "geo_state_raw string, geo_zip_raw string"
)


def _sha(parts):
    joined = "|".join("" if p is None else p for p in parts)
    return hashlib.sha256(joined.encode()).hexdigest().upper()


def test_new_addresses_hash_anti_join(spark):
    src = spark.createDataFrame(
        [
            ("1 MAIN ST", None, "SEATTLE", "WA", "98101"),
            ("1 MAIN ST", None, "SEATTLE", "WA", "98101"),  # dup
            ("", "NA", "KENT", "WA", "98032"),  # blanks normalize
            ("2 OAK AVE", "APT 3", "KENT", "WA", "98032"),
        ],
        RAW_SCHEMA,
    )
    known_hash = _sha(["2 OAK AVE", "APT 3", "KENT", "WA", "98032"])
    ref = spark.createDataFrame([(known_hash,)], "geo_hash_raw string")
    out = new_addresses(src, ref).collect()
    assert len(out) == 2  # dup collapsed, known address excluded
    by_add1 = {r["geo_add1_raw"]: r for r in out}
    assert by_add1["1 MAIN ST"]["geo_hash_raw"] == _sha(
        ["1 MAIN ST", None, "SEATTLE", "WA", "98101"]
    )
    blank = by_add1[None]
    assert blank["geo_add2_raw"] is None  # 'NA' -> NULL


def test_clean_external_output_po_box_rules(spark):
    cols = (
        "add1 string, add2 string, po_box string, city string, "
        "state string, zip string, old_add1 string, old_add2 string, "
        "old_city string, old_state string, old_zip string"
    )
    rows = [
        # po_box only -> add1 = po_box
        (None, None, "PO BOX 12", "KENT", "WA", "98032",
         "BOX 12", None, "KENT", "WA", "98032"),
        # street + po_box, no add2 -> add2 = po_box
        ("1 MAIN ST", None, "PO BOX 9", "KENT", "WA", "98032",
         "1 MAIN ST PO BOX 9", None, "KENT", "WA", "98032"),
        # street + add2 + po_box -> add2 = "add2 po_box"
        ("1 MAIN ST", "APT 2", "PO BOX 9", "KENT", "WA", "98032",
         "1 MAIN ST", "APT 2 PO BOX 9", "KENT", "WA", "98032"),
        # dropped '#' designator recovered from old_add1
        ("5 ELM ST", None, None, "KENT", "WA", "98032",
         "# 4", None, "KENT", "WA", "98032"),
    ]
    out = clean_external_output(spark.createDataFrame(rows, cols))
    got = {r["old_add1"]: r for r in out.collect()}
    assert got["BOX 12"]["add1"] == "PO BOX 12"
    assert got["BOX 12"]["po_box"] == 1
    assert got["1 MAIN ST PO BOX 9"]["add2"] == "PO BOX 9"
    assert got["1 MAIN ST"]["add2"] == "APT 2 PO BOX 9"
    assert got["# 4"]["add2"] == "# 4"
    assert got["# 4"]["po_box"] == 0


def test_recover_secondary(spark):
    cols = "add1 string, add2 string, old_add1 string, old_add2 string"
    df = spark.createDataFrame(
        [
            ("1 MAIN ST", None, "1 MAIN ST", "UNIT 7"),
            ("2 OAK AVE", None, "TRLR 4", None),
            ("3 PINE RD", None, "3 PINE RD", "NOT A UNIT"),
        ],
        cols,
    )
    got = {r["add1"]: r["add2"] for r in recover_secondary(df).collect()}
    assert got["1 MAIN ST"] == "UNIT 7"
    assert got["2 OAK AVE"] == "TRLR 4"
    assert got["3 PINE RD"] is None


def test_build_address_clean_manual_precedence(spark):
    raw = spark.createDataFrame(
        [
            ("1 main st", None, "seattle", "WA", "98101"),
            ("2 oak ave", None, "kent", "WA", "98032"),
        ],
        RAW_SCHEMA,
    )
    cleaned_cols = (
        "old_add1 string, old_add2 string, old_city string, "
        "old_state string, old_zip string, add1 string, add2 string, "
        "city string, state string, zip string, po_box int"
    )
    cleaned = spark.createDataFrame(
        [
            ("1 main st", None, "seattle", "WA", "98101",
             "1 MAIN ST", None, "SEATTLE", "WA", "98101", 0),
            ("2 oak ave", None, "kent", "WA", "98032",
             "WRONG", None, "KENT", "WA", "98032", 0),
        ],
        cleaned_cols,
    )
    manual = spark.createDataFrame(
        [("2 oak ave", None, "kent", "WA", "98032",
          "2 OAK AVE", None, "KENT", "WA", "98032")],
        RAW_SCHEMA + ", geo_add1_clean string, geo_add2_clean string, "
        "geo_city_clean string, geo_state_clean string, geo_zip_clean string",
    )
    out = build_address_clean(raw, cleaned, manual)
    rows = {r["geo_add1_raw"]: r for r in out.collect()}
    assert rows["1 main st"]["geo_add1_clean"] == "1 MAIN ST"
    assert rows["1 main st"]["overridden"] == 0
    assert rows["2 oak ave"]["geo_add1_clean"] == "2 OAK AVE"  # manual wins
    assert rows["2 oak ave"]["overridden"] == 1
    r = rows["1 main st"]
    assert r["geo_hash_raw"] == _sha(
        ["1 main st", None, None, "seattle", "WA", "98101"]
    )
    assert r["geo_hash_clean"] == _sha(
        ["1 MAIN ST", None, "SEATTLE", "WA", "98101"]
    )
    assert r["geo_hash_geocode"] == _sha(["1 MAIN ST", "SEATTLE", "WA", "98101"])


def test_build_address_geocode_preference(spark):
    key = ("geo_add1_clean string, geo_city_clean string, "
           "geo_state_clean string, geo_zip_clean string")
    esri = spark.createDataFrame(
        [
            ("1 MAIN ST", "SEATTLE", "WA", "98101",
             "zip_5_digit_gc", "M", "1 MAIN ST, SEATTLE, WA, 98101",
             -122.3, 47.6, 100.0, 200.0),
            ("2 OAK AVE", "KENT", "WA", "98032",
             "street_gc", "M", "2 OAK AVE, KENT, WA, 98032",
             -122.2, 47.4, 110.0, 210.0),
        ],
        key + ", loc_name string, status string, match_addr string, "
        "geo_lon double, geo_lat double, geo_x double, geo_y double",
    )
    here = spark.createDataFrame(
        [
            ("1 MAIN ST", "SEATTLE", "WA", "98101",
             "houseNumber", "1 Main St, Seattle, WA 98101, USA", 1,
             -122.31, 47.61, 101.0, 201.0),
        ],
        key + ", address_type string, formatted_address string, "
        "geo_check_here int, geo_lon double, geo_lat double, "
        "geo_x double, geo_y double",
    )
    out = {r["geo_add1_clean"]: r for r in build_address_geocode(esri, here).collect()}
    r1 = out["1 MAIN ST"]
    assert r1["geo_geocode_source"] == "here"
    assert r1["geo_x"] == 101.0
    assert r1["geo_zip_centroid"] == 0  # houseNumber beats esri zip match
    assert r1["geo_zip_geocoded"] == "98101"
    r2 = out["2 OAK AVE"]
    assert r2["geo_geocode_source"] == "esri"
    assert r2["geo_check_here"] == 0
    assert r2["geo_zip_geocoded"] == "98032"


SQUARE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
# concave L-shape: contains (1,1), excludes (3,3)
ELL = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)]


def _poly_df(spark, polys):
    rows = [
        (pid, [{"x": x, "y": y} for x, y in verts]) for pid, verts in polys
    ]
    return spark.createDataFrame(
        rows, "region string, vertices array<struct<x:double,y:double>>"
    )


@pytest.mark.parametrize("cell_size", [None, 1.5])
def test_point_in_polygon_square_and_concave(spark, cell_size):
    polys = _poly_df(spark, [("sq", SQUARE), ("ell", [(x + 10, y) for x, y in ELL])])
    pts = spark.createDataFrame(
        [
            (1, 2.0, 2.0),    # inside square
            (2, 5.0, 5.0),    # outside both
            (3, 11.0, 1.0),   # inside L (bottom arm)
            (4, 13.0, 3.0),   # inside L bbox but in the notch
            (5, 10.5, 3.5),   # inside L (left arm)
        ],
        "pid int, geo_x double, geo_y double",
    )
    out = point_in_polygon_join(pts, polys, cell_size=cell_size)
    got = {(r["pid"], r["region"]) for r in out.collect()}
    assert got == {(1, "sq"), (3, "ell"), (5, "ell")}


@pytest.mark.parametrize("cell_size", [None, 2.0])
def test_point_in_polygon_left_join(spark, cell_size):
    polys = _poly_df(spark, [("sq", SQUARE)])
    pts = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 9.0, 9.0)], "pid int, geo_x double, geo_y double"
    )
    out = point_in_polygon_join(pts, polys, how="left", cell_size=cell_size)
    got = {r["pid"]: r["region"] for r in out.collect()}
    assert got == {1: "sq", 2: None}


def test_point_in_polygon_closed_ring_equivalent(spark):
    closed = SQUARE + [SQUARE[0]]
    polys = _poly_df(spark, [("sq", closed)])
    pts = spark.createDataFrame(
        [(1, 1.0, 3.0), (2, -1.0, 3.0)], "pid int, geo_x double, geo_y double"
    )
    got = {r["pid"] for r in point_in_polygon_join(pts, polys).collect()}
    assert got == {1}


def test_blank_to_null_defaults_to_string_cols(spark):
    df = spark.createDataFrame([("", 1), ("NA", 2), ("x", 3)], "s string, i int")
    out = blank_to_null(df).collect()
    assert {(r["s"], r["i"]) for r in out} == {(None, 1), (None, 2), ("x", 3)}
