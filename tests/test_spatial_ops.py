"""Spatial operators vs eager numpy oracles (Fiona featureRT analogue:
same kernels run single-node in pandas, SURVEY.md section 5.3)."""

import numpy as np
import pandas as pd
import pytest

from fiona_spark import cells, fixtures, geom
from fiona_spark.operators import aggregates, filters, spatial

N_IMG = 400
N_ZONES = 45
RES = 6


@pytest.fixture(scope="module")
def images_pdf():
    return fixtures.gen_images_pdf(0, N_IMG)


@pytest.fixture(scope="module")
def zones_pdf():
    return fixtures.gen_zones_pdf(N_ZONES)


@pytest.fixture(scope="module")
def images(spark, images_pdf):
    return spark.createDataFrame(images_pdf, schema=fixtures.IMAGES_SCHEMA).cache()


@pytest.fixture(scope="module")
def zones(spark, zones_pdf):
    return spark.createDataFrame(zones_pdf, schema=fixtures.ZONES_SCHEMA).cache()


def _pip_oracle(images_pdf, zones_pdf):
    """Brute-force point-in-polygon pairs with antimeridian wrap."""
    out = set()
    px = images_pdf.lng.to_numpy()
    py = images_pdf.lat.to_numpy()
    for z in zones_pdf.itertuples(index=False):
        xs = np.asarray(z.xs); ys = np.asarray(z.ys)
        inside = np.zeros(len(px), dtype=bool)
        for shift in (0.0, 360.0, -360.0):
            inside |= geom.points_in_polygon(px + shift, py, xs, ys)
        for i in np.flatnonzero(inside):
            out.add((images_pdf.image_id.iloc[i], z.zone_id))
    return out


def test_pip_join_matches_oracle(spark, images, zones, images_pdf, zones_pdf):
    got = set(map(tuple, spatial.pip_join(images, zones, res=RES)
                  .collect()))
    exp = _pip_oracle(images_pdf, zones_pdf)
    assert got == exp
    assert len(exp) > 20  # non-trivial overlap in the fixture


def test_pip_join_convex_sql_same_result(spark, images, zones, images_pdf, zones_pdf):
    """The zero-Python convex-SQL residual must agree with the ray-cast
    kernel on the fixture (incl. the antimeridian stradder zones)."""
    got = set(map(tuple, spatial.pip_join(images, zones, res=RES,
                                          convex=True).collect()))
    assert got == _pip_oracle(images_pdf, zones_pdf)


def test_pip_join_salted_same_result(spark, images, zones, images_pdf, zones_pdf):
    got = set(map(tuple, spatial.pip_join(images, zones, res=RES,
                                          broadcast_zones=False, salt=4,
                                          hot_threshold=5).collect()))
    assert got == _pip_oracle(images_pdf, zones_pdf)


def test_semi_anti_partition(spark, images, zones):
    n_semi = spatial.spatial_semi_join(images, zones, res=RES).count()
    n_anti = spatial.spatial_anti_join(images, zones, res=RES).count()
    assert n_semi + n_anti == N_IMG
    assert 0 < n_semi < N_IMG


def test_range_join_matches_oracle(spark, images, zones, images_pdf, zones_pdf):
    got = spatial.range_join(images, zones, res=RES).collect()
    got_set = set(map(tuple, got))
    # reference-point dedup must produce NO duplicates
    assert len(got) == len(got_set)
    exp = set()
    for img in images_pdf.itertuples(index=False):
        for z in zones_pdf.itertuples(index=False):
            if (img.xmax >= z.xmin and img.xmin <= z.xmax
                    and img.ymax >= z.ymin and img.ymin <= z.ymax):
                exp.add((img.image_id, z.zone_id))
    assert got_set == exp


def test_knn_matches_bruteforce(spark, images, zones, images_pdf, zones_pdf):
    k = 3
    got = spatial.knn_join(images, zones, k=k).toPandas()
    exp_rows = set()
    for img in images_pdf.itertuples(index=False):
        d = np.sqrt((img.lng - zones_pdf.clng.to_numpy()) ** 2
                    + (img.lat - zones_pdf.clat.to_numpy()) ** 2)
        order = np.lexsort((zones_pdf.zone_id.to_numpy(), d))
        for rank, j in enumerate(order[:k], start=1):
            exp_rows.add((img.image_id, zones_pdf.zone_id.iloc[j], rank))
    assert set(map(tuple, got.itertuples(index=False))) == exp_rows
    assert len(got) == N_IMG * k


def test_with_point_cell_matches_numpy(spark, images, images_pdf):
    got = (spatial.with_point_cell(images, 9).orderBy("image_id")
           .select("cell").toPandas()["cell"].to_numpy())
    exp = cells.cell_id(images_pdf.lng.to_numpy(), images_pdf.lat.to_numpy(), 9)
    assert (got == exp).all()


def test_covering_cells_roundtrip(spark, zones, zones_pdf):
    got = (spatial.with_covering_cells(zones.select("zone_id", "xmin", "ymin", "xmax", "ymax"), 6)
           .groupBy("zone_id").count().orderBy("zone_id").toPandas())
    for _, r in got.iterrows():
        j = int(r.zone_id[1:])
        z = zones_pdf.iloc[j]
        if z.xmax > 180.0 or z.xmin < -180.0:
            continue  # wrapped zones covered by dedicated test
        exp = cells.covering_counts(np.array([z.xmin]), np.array([z.ymin]),
                                    np.array([z.xmax]), np.array([z.ymax]), 6)[0]
        assert r["count"] == exp


def test_antimeridian_zone_joins_wrapped_points(spark, zones):
    # points just west of +180 and just east of -180 + the two stradders
    pdf = pd.DataFrame({"image_id": ["pE", "pW"], "lng": [179.95, -179.95],
                        "lat": [0.0, 0.0]})
    # place test points at the stradders' actual latitudes
    zp = fixtures.gen_zones_pdf(28)
    straddlers = zp[zp.zone_id.isin(["z000013", "z000027"])]
    pts = []
    for z in straddlers.itertuples(index=False):
        pts.append({"image_id": "c" + z.zone_id, "lng": 179.99 if z.clng > 0 else -179.99,
                    "lat": z.clat})
    test_points = pd.DataFrame(pts)
    import pyspark.sql.types as T  # noqa
    points = spark.createDataFrame(test_points, schema="image_id string, lng double, lat double")
    got = set(map(tuple, spatial.pip_join(points, zones, res=RES).collect()))
    exp = _pip_oracle(test_points, zp)
    assert got == exp
    assert len(exp) >= 1  # a point right at the stradder's center latitude hits it


def test_hot_cells_detects_fixture_skew(spark, images):
    p = spatial.with_point_cell(images, RES)
    hot = spatial.hot_cells(p, threshold=N_IMG // 25).collect()
    hot_ids = {r["cell"] for r in hot}
    expected_hot = cells.cell_id([fixtures.HOT_LNG + 0.5], [fixtures.HOT_LAT + 0.5], RES)[0]
    assert expected_hot in hot_ids


def test_block_tiles(spark, images, images_pdf):
    out = spatial.block_tiles(images.limit(5), res=12).toPandas()
    assert {"image_id", "bx", "by", "cell", "mean_lum"} == set(out.columns)
    one = images_pdf.iloc[0]
    sub = out[out.image_id == one.image_id]
    assert len(sub) == (one.w // 8) * (one.h // 8)
    # every tile cell must be inside the footprint's covering at res 12
    cov = set(cells.cells_covering(np.array([one.xmin]), np.array([one.ymin]),
                                   np.array([one.xmax]), np.array([one.ymax]), 12)[0].tolist())
    assert set(sub.cell.tolist()) <= cov
    assert (sub.mean_lum >= 0).all() and (sub.mean_lum <= 255).all()


def test_covering_cells_jvm_matches_udf(spark):
    """r8 guard: the pure-Catalyst covering enumeration (sequence +
    explode + pmod wrap) must match the vectorized pandas-UDF path on
    boundary values, antimeridian stradders and full-circle boxes."""
    rows, rid = [], 0
    for xmin in (-180.0, -179.9999, -0.5, 0.0, 179.9999, 180.0):
        for wdt in (0.0, 0.001, 0.7, 25.0):
            rows.append((f"r{rid}", xmin, -45.3, xmin + wdt, -44.1)); rid += 1
    for xmin in (179.0, 179.99, 180.0):          # east stradders
        rows.append((f"r{rid}", xmin, -10.0, xmin + 0.8, -9.0)); rid += 1
    for xmax in (-179.0, -179.99, -180.0):       # west stradders
        rows.append((f"r{rid}", xmax - 0.8, 60.0, xmax, 61.0)); rid += 1
    rows.append((f"r{rid}", 10.0, 89.5, 11.0, 90.0)); rid += 1
    rows.append((f"r{rid}", -180.0, 0.0, 180.0, 1.0)); rid += 1
    rows.append((f"r{rid}", -179.0, 0.0, 181.0, 1.0)); rid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "xmin", "ymin", "xmax", "ymax"]),
        schema="id string, xmin double, ymin double, xmax double, ymax double")
    for res in (3, 9):
        old = sorted(map(tuple, spatial.with_covering_cells(
            df, res, jvm=False).select("id", "cell").collect()))
        new = sorted(map(tuple, spatial.with_covering_cells(
            df, res, jvm=True).select("id", "cell").collect()))
        assert old == new


def test_block_tiles_matches_scalar_reference(spark, images, images_pdf):
    """r8 guard: the mapInArrow block_tiles (Arrow-buffer payload slices,
    vectorized ragged-RLE decode, chunked groups) must match a
    per-image scalar reference on every format/shape in the fixture."""
    from fiona_spark import codec

    out = spatial.block_tiles(images, res=12, block=8).toPandas()
    got = {(r.image_id, r.bx, r.by): (r.cell, r.mean_lum)
           for r in out.itertuples()}
    n_exp = 0
    for row in images_pdf.itertuples():
        img = codec.decode(row.bytes, row.fmt, row.w, row.h)
        nbx, nby = row.w // 8, row.h // 8
        g = img.astype(np.float64).mean(axis=2)
        for by in range(nby):
            for bx in range(nbx):
                n_exp += 1
                lum = g[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8].mean()
                cxv = row.xmin + (bx + 0.5) / nbx * (row.xmax - row.xmin)
                cyv = row.ymax - (by + 0.5) / nby * (row.ymax - row.ymin)
                cell = int(cells.cell_id(np.array([cxv]), np.array([cyv]), 12)[0])
                gcell, glum = got[(row.image_id, bx, by)]
                assert gcell == cell
                assert abs(glum - lum) < 1e-9
    assert len(got) == n_exp


# --- filters / aggregates (Fiona parity semantics) -------------------------

def test_filter_bbox_and_where(spark, images, images_pdf):
    bbox = (0.0, 0.0, 60.0, 60.0)
    got = filters.filter_bbox(images, bbox).count()
    exp = ((images_pdf.xmax >= bbox[0]) & (images_pdf.xmin <= bbox[2])
           & (images_pdf.ymax >= bbox[1]) & (images_pdf.ymin <= bbox[3])).sum()
    assert got == exp

    w = filters.filter_where(images, "fmt = 'q6' AND w >= 32")
    assert w.count() == ((images_pdf.fmt == "q6") & (images_pdf.w >= 32)).sum()

    both = filters.filter_where(filters.filter_bbox(images, bbox), "fmt = 'raw'")
    expb = (((images_pdf.xmax >= bbox[0]) & (images_pdf.xmin <= bbox[2])
             & (images_pdf.ymax >= bbox[1]) & (images_pdf.ymin <= bbox[3]))
            & (images_pdf.fmt == "raw")).sum()
    assert both.count() == expb


def test_filter_where_error_contract(spark, images):
    from fiona_spark.errors import AttributeFilterError
    with pytest.raises(AttributeFilterError):
        filters.filter_where(images, "fmt >== 'raw'").count()


def test_filter_mask_envelope_vs_exact(spark, images, images_pdf):
    xs = np.array([0.0, 40.0, 40.0, 0.0]); ys = np.array([0.0, 0.0, 30.0, 30.0])
    env = filters.filter_mask(images, xs, ys).count()
    exact = filters.filter_mask(images, xs, ys, exact=True).count()
    # rectangle: envelope == exact
    assert env == exact
    # triangle: envelope over-matches, exact matches oracle
    txs = np.array([0.0, 40.0, 0.0]); tys = np.array([0.0, 0.0, 30.0])
    n_exact = filters.filter_mask(images, txs, tys, exact=True).count()
    oracle = geom.points_in_polygon(images_pdf.lng.to_numpy(),
                                    images_pdf.lat.to_numpy(), txs, tys).sum()
    assert n_exact == oracle
    assert filters.filter_mask(images, txs, tys).count() >= n_exact


def test_slice_semantics(spark, images, images_pdf):
    ids = sorted(images_pdf.image_id)
    got = [r["image_id"] for r in
           filters.slice_rows(images, 10, 50, 7, "image_id")
           .orderBy("image_id").select("image_id").collect()]
    assert got == ids[10:50:7]
    # negative indices force a count, like the reference
    got_neg = [r["image_id"] for r in
               filters.slice_rows(images, -20, None, 5, "image_id")
               .orderBy("image_id").select("image_id").collect()]
    assert got_neg == ids[-20::5]
    # negative step (reference ogrext.pyx:1852-1910 backwards iteration)
    got_rev = sorted(r["image_id"] for r in
                     filters.slice_rows(images, 50, 10, -7, "image_id")
                     .select("image_id").collect())
    assert got_rev == sorted(ids[50:10:-7])
    with pytest.raises(ValueError):
        filters.slice_rows(images, 0, 10, 0, "image_id")


def test_fid_access(spark, images):
    row = filters.get_fid(images, "img0000000007", "image_id").collect()
    assert len(row) == 1 and row[0]["caption"] == "caption for img7 class=7"
    assert filters.contains_fid(images, "img0000000007", "image_id")
    assert not filters.contains_fid(images, "nope", "image_id")


def test_calc_overwrite_contract(spark, images):
    out = filters.calc(images, "area_deg", "(xmax - xmin) * (ymax - ymin)")
    assert "area_deg" in out.columns
    with pytest.raises(ValueError):
        filters.calc(images, "caption", "'x'")
    assert filters.calc(images, "caption", "'x'", overwrite=True).count() == N_IMG


def test_extent_and_grouped_bounds(spark, images, images_pdf):
    ext = aggregates.extent(images).collect()[0]
    assert ext["xmin"] == images_pdf.xmin.min()
    assert ext["ymax"] == images_pdf.ymax.max()
    g = aggregates.bounds_grouped(images, ["fmt"]).orderBy("fmt").toPandas()
    exp = images_pdf.groupby("fmt").agg(xmin=("xmin", "min"), ymax=("ymax", "max"))
    assert np.allclose(g.set_index("fmt")["xmin"], exp["xmin"])


def test_feature_bounds_from_arrays(spark, zones, zones_pdf):
    got = (aggregates.feature_bounds(zones.drop("xmin", "ymin", "xmax", "ymax"))
           .orderBy("zone_id").select("xmin", "ymax").toPandas())
    assert np.allclose(got["xmin"], [np.min(v) for v in zones_pdf["xs"]])
    assert np.allclose(got["ymax"], [np.max(v) for v in zones_pdf["ys"]])


def test_info_and_dissolve(spark, zones, zones_pdf):
    meta = aggregates.info(zones)
    assert meta["count"] == N_ZONES
    assert meta["schema"]["NAME"] == "string"
    rxs, rys, exact = aggregates.dissolve_union(zones)
    if exact:
        # r3 exact two-stage union: membership differential on a dense
        # grid — inside the union rings (even-odd) iff inside any zone
        px = np.concatenate([np.asarray(v) for v in zones_pdf["xs"]])
        py = np.concatenate([np.asarray(v) for v in zones_pdf["ys"]])
        gx, gy = np.meshgrid(np.linspace(px.min(), px.max(), 80),
                             np.linspace(py.min(), py.max(), 80))
        gx, gy = gx.ravel(), gy.ravel()
        want = np.zeros(len(gx), dtype=bool)
        for v, w in zip(zones_pdf["xs"], zones_pdf["ys"]):
            want |= geom.points_in_polygon(
                gx, gy, np.asarray(v, np.float64), np.asarray(w, np.float64))
        got = geom.points_in_rings(gx, gy, rxs, rys)
        assert (want == got).all()
    else:
        # degeneracy fallback: hull of the union contains every vertex
        px = np.concatenate([np.asarray(v) for v in zones_pdf["xs"]])
        py = np.concatenate([np.asarray(v) for v in zones_pdf["ys"]])
        bx, by = geom.buffer_convex(rxs[0], rys[0], 1e-9)
        assert geom.points_in_polygon(px, py, bx, by).mean() > 0.999


def test_dissolve_union_exact_two_stage(spark):
    """Exact global dissolve across partitions: overlapping + disjoint
    squares spread over many partitions -> exact multi-ring union
    (area differential vs direct single-shot kernel union)."""
    import pandas as pd
    rng = np.random.default_rng(5)
    rows = []
    for i in range(200):
        cx, cy = rng.uniform(0, 40, 2)
        w, h = rng.uniform(0.5, 3.0, 2)
        rows.append({"xs": [cx, cx + w, cx + w, cx],
                     "ys": [cy, cy, cy + h, cy + h]})
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf).repartition(16)
    rxs, rys, exact = aggregates.dissolve_union(df)
    assert exact
    direct_x, direct_y = geom.polygon_union(
        [r["xs"] for r in rows], [r["ys"] for r in rows])
    assert geom.union_area(rxs, rys) == pytest.approx(
        geom.union_area(direct_x, direct_y), rel=1e-12)


def test_fixture_phash_recomputable(spark, images):
    """phash column == phash recomputed from payload (input_hint invariant)."""
    from fiona_spark import codec

    def recompute(batches):
        for p in batches:
            vals = [codec.phash64(codec.decode(bytes(b), f, int(w), int(h)))
                    for b, f, w, h in zip(p["bytes"], p["fmt"], p["w"], p["h"])]
            yield pd.DataFrame({"image_id": p["image_id"], "stored": p["phash"],
                                "fresh": vals})

    out = (images.mapInPandas(recompute, "image_id string, stored long, fresh long")
           .filter("stored <> fresh").count())
    assert out == 0


def test_knn_fused_matches_staged_including_sparse_tail(spark, zones):
    """Fused one-pass kNN == staged cascade plan on a point set that
    forces every path: dense cells, sparse tail (polar points far from
    any zone -> exact fallback), and at least one exact-tie candidate."""
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(23)
    pdf = pd.DataFrame({
        "image_id": [f"p{i:04d}" for i in range(400)],
        "lng": np.concatenate([rng.uniform(-180, 180, 380),
                               rng.uniform(-180, 180, 20)]),
        "lat": np.concatenate([rng.uniform(-60, 60, 380),
                               rng.uniform(85, 89, 20)])})  # sparse tail
    pts = spark.createDataFrame(pdf)
    fused = spatial.knn_join(pts, zones, k=3).toPandas()
    staged = spatial.knn_join(pts, zones, k=3, fused=False,
                              eager_cleanup=False).toPandas()
    key = ["image_id", "knn_rank"]
    f = fused.sort_values(key).reset_index(drop=True)
    s = staged.sort_values(key).reset_index(drop=True)
    assert f[["image_id", "zone_id", "knn_rank"]].equals(
        s[["image_id", "zone_id", "knn_rank"]])
