"""Spatial / metric-space joins on 2-D coordinates.

The reference has no spatial surface; this is the standard grid-cell
(geohash/S2-style) proximity-join shape a feature pipeline needs the
moment records carry coordinates — store locations, embedding-PCA
scatter, sensor positions.

Scale design: a radius join is a non-equi predicate, and Catalyst's only
native plan for it is a nested loop. Bucketing the plane into
``radius``-sized cells turns it into an EQUI-join: a point's matches
within ``radius`` all lie in its own or the 8 surrounding cells, so the
probe side fans out to its 3×3 neighborhood (9× bounded inflation —
map-side explode of a constant array) while the build side keeps its
single home cell, and the exact distance predicate runs as a residual
filter on the equi-joined candidates. Every pair is examined exactly
once per direction (the build point lives in exactly one cell), so
symmetric self-join output needs only the ``id1 < id2`` canonical
filter, no distinct. Dense cells are the skew axis — same posture as
``max_shingle_df``/``max_basket_size``: profile with key_skew_profile on
the cell id and shrink the cell (raise the grid resolution, join on more
neighbors) or cap the hot cell explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str],
    right_cols: tuple[str, str],
    radius: float,
) -> DataFrame:
    """All (left, right) pairs with euclidean distance ≤ ``radius``
    between ``left_cols=(x, y)`` and ``right_cols=(x, y)``, as an
    equi-join on radius-sized grid cells + exact residual distance.
    Output: both sides' columns plus ``dist`` (double, NOT rounded —
    callers quantize at their output boundary).

    Non-grid column names must not collide between the sides. For a
    self-join, pass the same frame twice with renamed columns and
    filter the canonical direction (``id1 < id2``) afterwards.
    """
    lx, ly = left_cols
    rx, ry = right_cols
    r = float(radius)
    if not r > 0:
        raise ValueError(f"radius must be positive, got {radius!r}")

    def cell(x: Column, y: Column) -> tuple[Column, Column]:
        return F.floor(x / F.lit(r)), F.floor(y / F.lit(r))

    lcx, lcy = cell(F.col(lx), F.col(ly))
    # probe side: 3×3 neighborhood fan-out, map-side
    offsets = F.expr(
        "flatten(transform(sequence(-1, 1), dx -> "
        "transform(sequence(-1, 1), dy -> struct(dx, dy))))"
    )
    l = (
        left.withColumn("__o", F.explode(offsets))
        .withColumn("__cx", lcx + F.col("__o.dx"))
        .withColumn("__cy", lcy + F.col("__o.dy"))
        .drop("__o")
    )
    rcx, rcy = cell(F.col(rx), F.col(ry))
    rr = right.withColumn("__cx", rcx).withColumn("__cy", rcy)
    # plain multiplication, not **2: pow() is allowed 1 ulp of error in
    # some runtimes, x*x is a single correctly-rounded IEEE op everywhere
    dx = F.col(lx) - F.col(rx)
    dy = F.col(ly) - F.col(ry)
    dist2 = dx * dx + dy * dy
    return (
        l.join(rr, ["__cx", "__cy"])
        .filter(dist2 <= F.lit(r * r))
        .withColumn("dist", F.sqrt(dist2))
        .drop("__cx", "__cy")
    )
