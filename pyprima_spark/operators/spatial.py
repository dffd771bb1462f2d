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
