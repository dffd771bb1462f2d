"""Spatial containment: point-in-region bounding-box join.

Reference analogue: pyPRIMA assigns transmission-line endpoints and
power plants to model regions with a geopandas point-in-polygon
spatial join (generate_intermediate_files.py:441-447 `containing_polygon`,
lib/spatial_functions.py). Without geo libs, the same *join shape* is a
range (inequality) join of a huge point table against a small table of
region bounding boxes.

Scale design: the region table is dimension-sized (bounded by the model
geography, thousands at most) and is BROADCAST — the point fact table
streams through in one narrow pass with zero shuffle. Spark compiles
this to BroadcastNestedLoopJoin; the per-row cost is 4 comparisons per
region, so for very large region counts the scale path is a grid-cell
equi-join (assign each point and each box to floor(lon/cell),
floor(lat/cell) cells, equi-join on cell, then verify) — same
candidate-then-verify layout as the LSH dedups. Here region count is
dim-sized, so the broadcast is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_box_join(
    points: DataFrame,
    boxes: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Inner-join each point to every box containing it.

    ``boxes`` must have lat_min/lat_max/lon_min/lon_max columns and is
    broadcast (dimension-sized by contract).
    """
    cond = (
        (F.col(lat) >= F.col("lat_min"))
        & (F.col(lat) < F.col("lat_max"))
        & (F.col(lon) >= F.col("lon_min"))
        & (F.col(lon) < F.col("lon_max"))
    )
    return points.join(F.broadcast(boxes), cond)


def point_in_box_grid_join(
    points: DataFrame,
    boxes: DataFrame,
    cell: float = 20.0,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Grid-cell variant of :func:`point_in_box_join` — the scale path
    when the box table outgrows a broadcast.

    Every point maps to exactly one (cell_lat, cell_lon); every box
    explodes to the cells it overlaps. Candidate generation is then an
    EQUI-join on the cell id (shuffle-partitionable, skew bounded by
    cell size) followed by the exact containment verify — the same
    candidate-then-verify layout as the LSH dedups. With dim-sized box
    tables the broadcast variant wins; this one exists for box tables
    in the millions (cadastral parcels, fine grids).
    """
    cells = boxes.select(
        "*",
        F.explode(
            F.expr(
                f"sequence(cast(floor(lat_min / {cell}) as int), "
                f"cast(floor((lat_max - 0.001) / {cell}) as int))"
            )
        ).alias("cell_lat"),
    ).select(
        "*",
        F.explode(
            F.expr(
                f"sequence(cast(floor(lon_min / {cell}) as int), "
                f"cast(floor((lon_max - 0.001) / {cell}) as int))"
            )
        ).alias("cell_lon"),
    )
    pts = points.withColumn(
        "cell_lat", F.floor(F.col(lat) / cell).cast("int")
    ).withColumn("cell_lon", F.floor(F.col(lon) / cell).cast("int"))
    verified = (
        pts.join(cells, ["cell_lat", "cell_lon"])
        .filter(
            (F.col(lat) >= F.col("lat_min"))
            & (F.col(lat) < F.col("lat_max"))
            & (F.col(lon) >= F.col("lon_min"))
            & (F.col(lon) < F.col("lon_max"))
        )
        .drop("cell_lat", "cell_lon")
    )
    return verified


def box_overlap_join(boxes_a: DataFrame, boxes_b: DataFrame) -> DataFrame:
    """Overlay two box layers: one row per intersecting (a, b) pair with
    the overlap extents and area.

    Reference analogue: ``intersection_subregions_countries``
    (lib/spatial_functions.py:225-277) overlays subregion and country
    polygons into intersection pieces; the piece areas then weight
    region remapping/disaggregation. With boxes the intersection is
    closed-form: ``min(max) - max(min)`` per axis.

    Both layers are dimension-sized (model geographies); ``boxes_b`` is
    broadcast so the overlay never shuffles. Columns of each input are
    prefixed ``a_`` / ``b_`` in the result.
    """
    a = boxes_a.select([F.col(c).alias(f"a_{c}") for c in boxes_a.columns])
    b = boxes_b.select([F.col(c).alias(f"b_{c}") for c in boxes_b.columns])
    joined = a.join(
        F.broadcast(b),
        (F.col("a_lat_min") < F.col("b_lat_max"))
        & (F.col("b_lat_min") < F.col("a_lat_max"))
        & (F.col("a_lon_min") < F.col("b_lon_max"))
        & (F.col("b_lon_min") < F.col("a_lon_max")),
    )
    dlat = F.least("a_lat_max", "b_lat_max") - F.greatest("a_lat_min", "b_lat_min")
    dlon = F.least("a_lon_max", "b_lon_max") - F.greatest("a_lon_min", "b_lon_min")
    return joined.withColumn("overlap_area", dlat * dlon)
