"""Set-oriented spatial operators: cell join, PIP join, range join, kNN.

The reference's spatial machinery is a per-feature envelope filter pushed
into OGR (`fiona/ogrext.pyx:1818-1825`); its mask filter is documented as
envelope-accurate only (`fiona/collection.py:416-417`).  These operators
are the scale-out generalization required by BASELINE.json north_rule:
the bbox test becomes a cell-id equi-join that Catalyst executes as a
broadcast/shuffled hash join, and the exact point-in-polygon residual
runs as a vectorized numpy pandas UDF over Arrow batches (zero per-row
Python).

Scale design notes (10^12-row table, 1000 executors):
 * candidate generation is an equi-join on int64 ``cell`` — shuffle is
   hash-partitioned on the cell id; the polygon side is broadcast when
   small (the common case: zones << images).
 * skewed cells (dense polygon stacks / the fixture's hot cell) are
   salted EXPLICITLY: replicate hot zone-cell rows S ways, give the
   image side a deterministic salt — see :func:`salt_plan` /
   :func:`pip_join` ``salt=``.  AQE skew-join stays on as backstop.
 * dedup of multi-cell candidates uses the reference-point trick (the
   pair is kept only in the cell containing the intersection's
   lower-left corner) — no ``distinct`` shuffle.
 * kNN is two-phase: a disk join at a density-chosen resolution
   answers ~all images in one shuffle; the provably-unfinished
   remainder (cell-ring bound: kth-distance <= r * cell_height) falls
   back to an exact join against the full zone set.
"""

from __future__ import annotations

import pandas as pd
import numpy as np
from pyspark.sql import DataFrame, Window, functions as F, types as T

from .. import cells, geom

DEFAULT_RES = 7


# ---------------------------------------------------------------------------
# cell assignment
# ---------------------------------------------------------------------------

def with_point_cell(df: DataFrame, res: int, lng: str = "lng", lat: str = "lat",
                    out: str = "cell") -> DataFrame:
    """Add the containing cell id of a point column pair.

    Pure Catalyst arithmetic (same closed form as fiona_spark.cells) so
    the expression is codegen'd JVM-side — no Python worker at all —
    and partition pruning on a stored cell column can use it.
    """
    return df.withColumn(out, F.expr(cells.cell_id_sql(lng, lat, res)))


def with_covering_cells(df: DataFrame, res: int, out: str = "cell",
                        bbox_cols=("xmin", "ymin", "xmax", "ymax")) -> DataFrame:
    """Explode each bbox row into its covering cells at ``res``.

    Covering enumeration is data-dependent-length -> one vectorized
    pandas UDF producing an array column, then a JVM-side explode.
    Boxes reaching past +/-180 (antimeridian stradders) contribute the
    wrapped coverings of both parts.
    """
    x0, y0, x1, y1 = bbox_cols

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def covering(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
        out_arrays = []
        xminv, yminv = xmin.to_numpy(np.float64), ymin.to_numpy(np.float64)
        xmaxv, ymaxv = xmax.to_numpy(np.float64), ymax.to_numpy(np.float64)
        for i in range(len(xminv)):
            boxes = [(xminv[i], yminv[i], xmaxv[i], ymaxv[i])]
            if xmaxv[i] > 180.0:
                boxes = [(xminv[i], yminv[i], 180.0, ymaxv[i]),
                         (-180.0, yminv[i], xmaxv[i] - 360.0, ymaxv[i])]
            elif xminv[i] < -180.0:
                boxes = [(xminv[i] + 360.0, yminv[i], 180.0, ymaxv[i]),
                         (-180.0, yminv[i], xmaxv[i], ymaxv[i])]
            parts = [cells.cells_covering(np.array([b[0]]), np.array([b[1]]),
                                          np.array([b[2]]), np.array([b[3]]), res)[0]
                     for b in boxes]
            out_arrays.append(np.unique(np.concatenate(parts)))
        return pd.Series(out_arrays)

    return df.withColumn(out, F.explode(covering(x0, y0, x1, y1)))


# ---------------------------------------------------------------------------
# skew handling
# ---------------------------------------------------------------------------

def hot_cells(df: DataFrame, cell: str = "cell", threshold: int = 100_000) -> DataFrame:
    """First-pass skew detector: cells whose row count exceeds threshold.

    (SURVEY.md section 2.4 per-cell stats; feeds the salting decision.)
    """
    return df.groupBy(cell).count().filter(F.col("count") > threshold)


def salt_sides(probe: DataFrame, build: DataFrame, hot: DataFrame,
               n_salt: int, cell: str = "cell", probe_key: str = "image_id"):
    """Explicit salting of hot cells for a shuffled equi-join.

    Probe rows in hot cells get ``salt = pmod(hash(probe_key), n_salt)``;
    build rows in hot cells are replicated across all salts; everything
    else joins on salt=0.  Returns (probe', build') both carrying a
    ``_salt`` column to add to the join keys.
    """
    hot = hot.select(F.col(cell).alias("_hot_cell")).withColumn("_is_hot", F.lit(True))
    p = (probe.join(F.broadcast(hot), probe[cell] == hot["_hot_cell"], "left")
         .withColumn("_salt", F.when(F.col("_is_hot"),
                                     F.pmod(F.hash(probe_key), F.lit(n_salt)))
                     .otherwise(F.lit(0)))
         .drop("_hot_cell", "_is_hot"))
    salt_arr = F.when(F.col("_is_hot"), F.sequence(F.lit(0), F.lit(n_salt - 1))
                      ).otherwise(F.array(F.lit(0)))
    b = (build.join(F.broadcast(hot), build[cell] == hot["_hot_cell"], "left")
         .withColumn("_salt", F.explode(salt_arr))
         .drop("_hot_cell", "_is_hot"))
    return p, b


# ---------------------------------------------------------------------------
# PIP join (point-in-polygon)
# ---------------------------------------------------------------------------

def _pip_residual_udf():
    @F.pandas_udf(T.BooleanType())
    def pip(px: pd.Series, py: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
        pxv = px.to_numpy(np.float64)
        # shift each point into its polygon's longitude frame so
        # antimeridian-straddling zones (coords beyond +/-180) test
        # correctly against wrapped points
        out = np.zeros(len(pxv), dtype=bool)
        xs_l = xs.to_numpy(object)
        ys_l = ys.to_numpy(object)
        pyv = py.to_numpy(np.float64)
        for shift in (0.0, 360.0, -360.0):
            pending = ~out
            if not pending.any():
                break
            idx = np.flatnonzero(pending)
            out[idx] |= geom.points_in_polygons_pairs(
                pxv[idx] + shift, pyv[idx],
                [xs_l[i] for i in idx], [ys_l[i] for i in idx])
        return pd.Series(out)
    return pip


def pip_join(points: DataFrame, zones: DataFrame, res: int = DEFAULT_RES,
             lng: str = "lng", lat: str = "lat",
             point_cols=("image_id",), zone_cols=("zone_id",),
             broadcast_zones: bool = True,
             salt: int = 0, hot_threshold: int = 100_000) -> DataFrame:
    """Exact point-in-polygon join (the exact form of Fiona's mask filter).

    points x zones -> rows of point_cols + zone_cols where the point is
    strictly inside the zone polygon.  Plan: point-cell equi-join
    against exploded zone coverings, then the vectorized PIP residual.
    Each point has exactly ONE cell, so candidate pairs are already
    unique — no dedup shuffle.
    """
    p = with_point_cell(points.select(*point_cols, lng, lat), res, lng, lat)
    z = with_covering_cells(
        zones.select(*zone_cols, "xs", "ys", "xmin", "ymin", "xmax", "ymax"), res
    ).select(*zone_cols, "xs", "ys", "cell")

    if salt > 0:
        hot = hot_cells(p, threshold=hot_threshold)
        p, z = salt_sides(p, z, hot, salt, probe_key=point_cols[0])
        join_keys = ["cell", "_salt"]
    else:
        join_keys = ["cell"]

    zj = F.broadcast(z) if broadcast_zones else z
    cand = p.join(zj, join_keys, "inner")
    pip = _pip_residual_udf()
    out = cand.filter(pip(F.col(lng), F.col(lat), F.col("xs"), F.col("ys")))
    return out.select(*point_cols, *zone_cols)


def spatial_semi_join(points: DataFrame, zones: DataFrame, **kw) -> DataFrame:
    """Points that fall inside at least one zone (left_semi on PIP keys)."""
    key = kw.get("point_cols", ("image_id",))[0]
    hits = pip_join(points, zones, **kw).select(key).distinct()
    return points.join(hits, key, "left_semi")


def spatial_anti_join(points: DataFrame, zones: DataFrame, **kw) -> DataFrame:
    """Points inside no zone (left_anti on PIP keys)."""
    key = kw.get("point_cols", ("image_id",))[0]
    hits = pip_join(points, zones, **kw).select(key).distinct()
    return points.join(hits, key, "left_anti")


# ---------------------------------------------------------------------------
# Range join (bbox x bbox) with reference-point dedup
# ---------------------------------------------------------------------------

def range_join(a: DataFrame, b: DataFrame, res: int = DEFAULT_RES,
               a_cols=("image_id",), b_cols=("zone_id",),
               broadcast_b: bool = True) -> DataFrame:
    """Envelope-intersects join: both sides exploded to covering cells,
    equi-joined on cell, residual bbox predicate, and reference-point
    dedup (a pair survives only in the cell containing the lower-left
    corner of the bbox intersection) — the classic trick that turns the
    theta range join into a duplicate-free equi-join with no distinct.
    """
    ax = with_covering_cells(
        a.select(*a_cols, F.col("xmin").alias("a_xmin"), F.col("ymin").alias("a_ymin"),
                 F.col("xmax").alias("a_xmax"), F.col("ymax").alias("a_ymax")),
        res, bbox_cols=("a_xmin", "a_ymin", "a_xmax", "a_ymax"))
    bx = with_covering_cells(
        b.select(*b_cols, F.col("xmin").alias("b_xmin"), F.col("ymin").alias("b_ymin"),
                 F.col("xmax").alias("b_xmax"), F.col("ymax").alias("b_ymax")),
        res, bbox_cols=("b_xmin", "b_ymin", "b_xmax", "b_ymax"))
    bj = F.broadcast(bx) if broadcast_b else bx
    cand = ax.join(bj, "cell")
    intersects = ((F.col("a_xmax") >= F.col("b_xmin")) & (F.col("a_xmin") <= F.col("b_xmax"))
                  & (F.col("a_ymax") >= F.col("b_ymin")) & (F.col("a_ymin") <= F.col("b_ymax")))
    ref_cell = F.expr(cells.cell_id_sql("greatest(a_xmin, b_xmin)",
                                        "greatest(a_ymin, b_ymin)", res))
    return (cand.filter(intersects)
            .filter(F.col("cell") == ref_cell)
            .select(*a_cols, *b_cols))


# ---------------------------------------------------------------------------
# kNN join (two-phase cell-disk + exact fallback)
# ---------------------------------------------------------------------------

def knn_res_for(n_zones: int, k: int) -> int:
    """Resolution whose finish-guarantee radius covers the expected kth
    neighbor distance with ~1.8x margin.

    With zone density rho (per deg^2), the kth-neighbor distance
    concentrates around sqrt(k / (pi * rho)); a point is provably
    finished at disk radius r0=1 only when its kth distance <=
    cell_height(res), so cell_height must exceed that typical distance —
    otherwise the expensive exact fallback swallows the dataset (the
    failure mode this formula replaces: a density-only rule that chose
    one level too fine and sent ~half the points to phase 2).
    """
    rho = max(n_zones, 1) / (360.0 * 180.0)
    r_k = float(np.sqrt(k / (np.pi * rho)))
    for res in range(MAX_KNN_RES, 0, -1):
        if 180.0 / (1 << res) >= 1.8 * r_k:
            return res
    return 1


MAX_KNN_RES = 14


def _disk_cells_sql(cell_col: str, res: int) -> "F.Column":
    """JVM-side disk(1) of a cell id: the 9 neighbor cells at ``res``
    with longitude wrap and latitude clip — pure codegen'd arithmetic,
    replacing a per-row Python UDF on the probe side."""
    n = 1 << res
    base = res * cells.RES_SHIFT
    rem = f"({cell_col} - {base}L)"
    yi = f"CAST(floor({rem} / {n}) AS BIGINT)"
    xi = f"({rem} % {n})"
    offsets = ",".join(f"named_struct('dx', {dx}L, 'dy', {dy}L)"
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    # array_distinct: at tiny n the lon wrap aliases dx=-1 and dx=+1
    # into the same cell — duplicates would corrupt candidate ranks
    return F.expr(
        f"array_distinct(transform("
        f"filter(array({offsets}), o -> {yi} + o.dy >= 0 AND {yi} + o.dy < {n}), "
        f"o -> {base}L + ({yi} + o.dy) * {n}L + pmod({xi} + o.dx, {n}L)))")


def knn_join(points: DataFrame, zones: DataFrame, k: int = 3,
             res: int | None = None,
             lng: str = "lng", lat: str = "lat",
             point_key: str = "image_id", zone_key: str = "zone_id",
             zone_lng: str = "clng", zone_lat: str = "clat") -> DataFrame:
    """Exact k nearest zones (by centroid euclidean degrees) per point.

    Plan (scale-first):
      * the SMALL side (zones) is replicated into the 9 cells of its
        disk(1) neighborhood — JVM-side array arithmetic — and
        broadcast;  the probe side keeps exactly one row per point with
        a codegen'd cell id: no probe-side explode, no Python, no
        shuffle before the ranking window.
      * one window pass ranks candidates AND computes the finish proof
        inline (a point is done when it has >= k candidates and its kth
        distance <= cell_height: anything outside disk(1) is farther).
      * the provably-unfinished remainder (resolution is chosen by
        :func:`knn_res_for` so this is a small tail) falls back to an
        exact broadcast join against the full zone set.
    Output: (point_key, zone_key, knn_rank), rank 1..k by
    (distance, zone_key) for determinism.
    """
    if res is None:
        res = knn_res_for(zones.count(), k)
    cell_h = 180.0 / (1 << res)

    zc = zones.select(zone_key, F.col(zone_lng).alias("_zlng"),
                      F.col(zone_lat).alias("_zlat"))
    # zone replicated to its disk(1): the cells whose points could see it
    zx = (with_point_cell(zc, res, "_zlng", "_zlat", out="_zc")
          .withColumn("cell", F.explode(_disk_cells_sql("_zc", res)))
          .drop("_zc"))
    p = with_point_cell(points.select(point_key, lng, lat), res, lng, lat)

    # plain multiplication (not pow()) so the double expression tree is
    # bit-identical to the DuckDB oracle's
    dx = F.col(lng) - F.col("_zlng")
    dy = F.col(lat) - F.col("_zlat")
    dist = F.sqrt(dx * dx + dy * dy)
    w = Window.partitionBy(point_key).orderBy("dist", zone_key)
    w_all = Window.partitionBy(point_key)

    # Candidates farther than cell_h are useless: a point is provably
    # finished iff it has >= k candidates with dist < cell_h (every zone
    # that close is certainly inside disk(1), so the filtered set still
    # contains the true top-k of finished points), and unfinished points
    # are re-answered exactly in phase 2 anyway.  Filtering BEFORE the
    # ranking window shrinks the shuffle ~(disk area / pi*cell_h^2) ~ 9x.
    # Strict <: a zone outside disk(1) can sit at exactly cell_h and win
    # the (dist, zone_key) tiebreak — don't claim the proof there.
    cand = (p.join(F.broadcast(zx), "cell")
            .withColumn("dist", dist)
            .filter(F.col("dist") < cell_h))
    ranked = (cand
              .withColumn("knn_rank", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(w_all)))
    done = ranked.filter((F.col("_n") >= k) & (F.col("knn_rank") <= k))

    # phase 2: points without a finish proof (incl. zero-candidate ones).
    # The tail is small, so AQE would coalesce it to ~1 partition — but
    # each tail row fans out |zones| candidate rows in the cross join, so
    # force it back to full parallelism BEFORE the fan-out.
    n_shuffle = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    rest = (p.join(done.select(point_key), point_key, "left_anti")
            .repartition(n_shuffle))
    cand2 = (rest.crossJoin(F.broadcast(zc))
             .withColumn("dist", dist)
             .withColumn("knn_rank", F.row_number().over(w))
             .filter(F.col("knn_rank") <= k))
    return (done.select(point_key, zone_key, "knn_rank")
            .unionByName(cand2.select(point_key, zone_key, "knn_rank")))


# ---------------------------------------------------------------------------
# raster -> vector tile assignment
# ---------------------------------------------------------------------------

def block_tiles(images: DataFrame, res: int, block: int = 8) -> DataFrame:
    """Split each image into block x block pixel tiles, geolocate every
    tile inside the footprint, decode the payload and emit per-tile
    stats: (image_id, bx, by, cell, mean_lum).

    This is the raster->vector op of the north_rule: pixel blocks become
    vector features keyed by cell id.  Decode + block means are one
    mapInPandas pass (Arrow in, Arrow out).
    """
    from .. import codec

    out_schema = ("image_id string, bx int, by int, cell long, mean_lum double")

    def run(batches):
        for pdf in batches:
            recs = {"image_id": [], "bx": [], "by": [], "cell": [], "mean_lum": []}
            for row in pdf.itertuples(index=False):
                img = codec.decode(bytes(row.bytes), row.fmt, int(row.w), int(row.h))
                nbx, nby = int(row.w) // block, int(row.h) // block
                if nbx == 0 or nby == 0:
                    continue
                g = img[: nby * block, : nbx * block].astype(np.float64).mean(axis=2)
                means = g.reshape(nby, block, nbx, block).mean(axis=(1, 3))
                # tile centers in geography (row 0 = north edge)
                cx = row.xmin + (np.arange(nbx) + 0.5) / nbx * (row.xmax - row.xmin)
                cy = row.ymax - (np.arange(nby) + 0.5) / nby * (row.ymax - row.ymin)
                gx, gy = np.meshgrid(cx, cy)
                cell = cells.cell_id(gx.ravel(), gy.ravel(), res)
                bxs, bys = np.meshgrid(np.arange(nbx), np.arange(nby))
                n = nbx * nby
                recs["image_id"].extend([row.image_id] * n)
                recs["bx"].extend(bxs.ravel().tolist())
                recs["by"].extend(bys.ravel().tolist())
                recs["cell"].extend(cell.tolist())
                recs["mean_lum"].extend(means.ravel().tolist())
            yield pd.DataFrame(recs)

    cols = ["image_id", "bytes", "fmt", "w", "h", "xmin", "ymin", "xmax", "ymax"]
    return images.select(*cols).mapInPandas(run, out_schema)
