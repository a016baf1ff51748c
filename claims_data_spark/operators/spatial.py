"""Point-in-polygon spatial join.

The reference attaches census block / PUMA / ZCTA / HRA / region /
school / council-district attributes to geocoded addresses with nine
``sf::st_join`` calls over ESRI shapefiles
(``load_stage.address_geocode.R:294-338``).  That is a single-machine
GIS step; here it is a distributed join:

* polygons carry their ring as an ``array<struct<x,y>>`` column;
* a bounding-box prefilter finds candidate (point, polygon) pairs —
  either by broadcasting a dimension-sized polygon table (HRA/region:
  tens of rows) or, for large polygon sets (census blocks: ~10^5 per
  state), by equi-joining on grid cells so neither side is replicated;
* the exact test is even-odd ray casting evaluated entirely JVM-side
  with a SQL ``aggregate`` lambda over the vertex array — no explode
  (no row blow-up proportional to vertex count) and no Python UDF.

A point on a polygon edge may land either side (standard ray-casting
boundary behavior); callers needing closed boundaries should buffer
upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Even-odd ray casting: count edges (a, b) whose y-span straddles the
# point's y and whose x-intercept at py lies right of px.  nullif
# guards the horizontal-edge division (straddle test is already false
# there, but ANSI mode would still evaluate the division).
_RAYCAST = """
aggregate(
  sequence(1, size({v}) - 1),
  0,
  (acc, i) -> acc + CASE
    WHEN (element_at({v}, i).y > {py}) <> (element_at({v}, i + 1).y > {py})
     AND {px} < (element_at({v}, i + 1).x - element_at({v}, i).x)
               * ({py} - element_at({v}, i).y)
               / nullif(element_at({v}, i + 1).y - element_at({v}, i).y, 0.0D)
               + element_at({v}, i).x
    THEN 1 ELSE 0 END
) % 2 = 1
"""


def _closed_ring(vertices: str) -> Column:
    """Ring with the first vertex appended; a duplicated closing
    vertex yields a zero-length edge that adds no crossings."""
    v = F.col(vertices)
    return F.concat(v, F.array(F.element_at(v, 1)))


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    x: str = "geo_x",
    y: str = "geo_y",
    vertices: str = "vertices",
    how: str = "inner",
    cell_size: float | None = None,
) -> DataFrame:
    """Join each point to the polygon(s) containing it.

    ``points`` carries ``x``/``y`` double columns; ``polygons``
    carries a ``vertices`` ``array<struct<x:double,y:double>>`` ring
    (closed or open) plus its attribute columns, which all appear on
    the output.  ``how`` is ``inner`` (matched points only) or
    ``left`` (keep unmatched points with null attributes).

    ``cell_size=None`` broadcasts the polygon side — right for
    dimension-sized layers (HRA, region, district).  With a
    ``cell_size``, both sides are bucketed to grid cells of that
    width and equi-joined on cell id: a polygon is replicated only
    onto cells its bbox overlaps, so a census-block layer at 100 TB
    of points stays a plain shuffle join with bounded fan-out.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    ring = "__ring"
    poly = polygons.withColumn(ring, _closed_ring(vertices)).drop(vertices)
    vx = F.transform(F.col(ring), lambda p: p["x"])
    vy = F.transform(F.col(ring), lambda p: p["y"])
    poly = (
        poly.withColumn("__xmin", F.array_min(vx))
        .withColumn("__xmax", F.array_max(vx))
        .withColumn("__ymin", F.array_min(vy))
        .withColumn("__ymax", F.array_max(vy))
    )

    inside = F.expr(_RAYCAST.format(v=ring, px=x, py=y))
    bbox = (
        F.col(x).between(F.col("__xmin"), F.col("__xmax"))
        & F.col(y).between(F.col("__ymin"), F.col("__ymax"))
    )
    helper_cols = [ring, "__xmin", "__xmax", "__ymin", "__ymax"]

    if cell_size is None:
        matched = points.join(
            F.broadcast(poly), on=bbox & inside, how=how
        )
        return matched.drop(*helper_cols)

    # Grid-cell path: polygon -> every cell its bbox overlaps (explode
    # of a small int range), point -> its single cell; equi-join on
    # (cell_x, cell_y) keeps the shuffle key-based.  A point lies in
    # exactly one cell, so no post-join dedup is needed.
    cs = F.lit(float(cell_size))
    poly_cells = poly.withColumn(
        "__cell_x",
        F.explode(
            F.sequence(
                F.floor(F.col("__xmin") / cs), F.floor(F.col("__xmax") / cs)
            )
        ),
    ).withColumn(
        "__cell_y",
        F.explode(
            F.sequence(
                F.floor(F.col("__ymin") / cs), F.floor(F.col("__ymax") / cs)
            )
        ),
    )
    pts = points.withColumn(
        "__cell_x", F.floor(F.col(x) / cs)
    ).withColumn("__cell_y", F.floor(F.col(y) / cs))

    cand = pts.join(poly_cells, on=["__cell_x", "__cell_y"], how="inner")
    hits = cand.filter(bbox & inside).drop(
        *helper_cols, "__cell_x", "__cell_y"
    )
    if how == "inner":
        return hits
    # left: unmatched points re-attached with null polygon attributes
    attr_cols = [c for c in hits.columns if c not in points.columns]
    missing = points.join(
        hits.select(*points.columns), on=points.columns, how="anti"
    )
    for c in attr_cols:
        missing = missing.withColumn(c, F.lit(None).cast(hits.schema[c].dataType))
    return hits.drop("__cell_x", "__cell_y").unionByName(missing)
