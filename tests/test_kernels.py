"""Kernel unit tests (no Spark): cells, geom, codec."""

import numpy as np
import pytest

from fiona_spark import cells, codec, geom


# ---------------------------------------------------------------------------
# cells
# ---------------------------------------------------------------------------

def test_cell_pack_roundtrip():
    rng = np.random.default_rng(42)
    for res in (0, 1, 7, 12, 20, 26):
        n = 1 << res
        xi = rng.integers(0, n, 100)
        yi = rng.integers(0, n, 100)
        c = cells.pack(xi, yi, res)
        x2, y2, r2 = cells.unpack(c)
        assert (x2 == xi).all() and (y2 == yi).all() and (r2 == res).all()


def test_cell_id_bounds_contain_point():
    rng = np.random.default_rng(7)
    lng = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    c = cells.cell_id(lng, lat, 12)
    w, s, e, n = cells.cell_bounds(c)
    assert (lng >= w).all() and (lng < e + 1e-9).all()
    assert (lat >= s).all() and (lat < n + 1e-9).all()


def test_parent_is_prefix_hierarchy():
    c = cells.cell_id([10.3], [45.7], 12)
    p = cells.parent(c)
    # the parent must contain the child's bounds
    cw, cs, ce, cn = cells.cell_bounds(c)
    pw, ps, pe, pn = cells.cell_bounds(p)
    assert pw <= cw and ps <= cs and pe >= ce and pn >= cn
    # parent of a point's cell == point's cell at res-1
    assert (p == cells.cell_id([10.3], [45.7], 11)).all()


def test_cells_covering_matches_counts():
    xmin, ymin, xmax, ymax = np.array([10.0]), np.array([40.0]), np.array([10.4]), np.array([40.3])
    cov = cells.cells_covering(xmin, ymin, xmax, ymax, 10)
    cnt = cells.covering_counts(xmin, ymin, xmax, ymax, 10)
    assert len(cov[0]) == cnt[0]
    # every covering cell's bounds intersect the bbox
    w, s, e, n = cells.cell_bounds(cov[0])
    assert (e >= xmin[0]).all() and (w <= xmax[0]).all()
    assert (n >= ymin[0]).all() and (s <= ymax[0]).all()
    # and the point-cells of bbox corners are in the covering
    corners = cells.cell_id([10.0, 10.4], [40.0, 40.3], 10)
    assert set(corners.tolist()) <= set(cov[0].tolist())


def test_ring_sizes_and_wrap():
    c = cells.cell_id([0.0], [0.0], 8)
    assert len(cells.ring(c, 0)[0]) == 1
    assert len(cells.ring(c, 1)[0]) == 8
    assert len(cells.ring(c, 2)[0]) == 16
    # antimeridian wrap: cell at lng=-179.9 ring contains cell at 179.9
    a = cells.cell_id([-179.9], [0.0], 8)
    b = cells.cell_id([179.9], [0.0], 8)
    assert b[0] in cells.ring(a, 1)[0]


def test_disk_is_union_of_rings():
    c = cells.cell_id([5.0], [5.0], 9)
    d = set(cells.disk(c, 2)[0].tolist())
    u = set()
    for r in range(3):
        u |= set(cells.ring(c, r)[0].tolist())
    assert d == u


def test_covering_res_for_bounds_cell_count():
    xmin = np.array([10.0, -170.0]); xmax = np.array([10.5, -169.0])
    ymin = np.array([0.0, 50.0]); ymax = np.array([0.5, 51.0])
    res = cells.covering_res_for(xmin, ymin, xmax, ymax, max_cells=64)
    cnt = cells.covering_counts(xmin, ymin, xmax, ymax, res)
    assert (cnt <= 64).all() and res > 0


def test_cell_id_sql_matches_numpy_duckdb():
    import duckdb
    rng = np.random.default_rng(3)
    lng = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    res = 12
    expected = cells.cell_id(lng, lat, res)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lng": lng, "lat": lat}))
    sql = cells.cell_id_sql("lng", "lat", res)
    got = con.sql(f"SELECT {sql} AS c FROM pts").fetchnumpy()["c"]
    assert (got == expected).all()


# ---------------------------------------------------------------------------
# geom
# ---------------------------------------------------------------------------

def test_pip_square():
    xs = np.array([0.0, 10.0, 10.0, 0.0])
    ys = np.array([0.0, 0.0, 10.0, 10.0])
    px = np.array([5.0, 15.0, -1.0, 9.99])
    py = np.array([5.0, 5.0, 5.0, 0.01])
    assert geom.points_in_polygon(px, py, xs, ys).tolist() == [True, False, False, True]


def test_pip_concave():
    # L-shape: (0,0)(4,0)(4,2)(2,2)(2,4)(0,4)
    xs = np.array([0, 4, 4, 2, 2, 0], dtype=float)
    ys = np.array([0, 0, 2, 2, 4, 4], dtype=float)
    px = np.array([1.0, 3.0, 3.0, 1.0])
    py = np.array([1.0, 1.0, 3.0, 3.0])
    assert geom.points_in_polygon(px, py, xs, ys).tolist() == [True, True, False, True]


def test_pip_pairs_matches_single():
    rng = np.random.default_rng(11)
    xs = rng.uniform(0, 10, 8); ys = rng.uniform(0, 10, 8)
    hx, hy = geom.convex_hull(xs, ys)
    px = rng.uniform(-2, 12, 300); py = rng.uniform(-2, 12, 300)
    single = geom.points_in_polygon(px, py, hx, hy)
    pairs = geom.points_in_polygons_pairs(px, py, [hx] * 300, [hy] * 300)
    assert (single == pairs).all()


def test_shoelace_and_centroid():
    xs = np.array([0.0, 4.0, 4.0, 0.0]); ys = np.array([0.0, 0.0, 3.0, 3.0])
    assert geom.shoelace_area(xs, ys) == pytest.approx(12.0)
    assert geom.centroid(xs, ys) == pytest.approx((2.0, 1.5))
    assert geom.ring_length(xs, ys) == pytest.approx(14.0)


def test_crs_roundtrips():
    rng = np.random.default_rng(5)
    lng = rng.uniform(-179, 179, 100); lat = rng.uniform(-84, 84, 100)
    x, y = geom.to_6933(lng, lat)
    l2, p2 = geom.from_6933(x, y)
    np.testing.assert_allclose(l2, lng, atol=1e-9)
    np.testing.assert_allclose(p2, lat, atol=1e-9)
    x, y = geom.to_3857(lng, lat)
    l2, p2 = geom.from_3857(x, y)
    np.testing.assert_allclose(l2, lng, atol=1e-9)
    np.testing.assert_allclose(p2, lat, atol=1e-9)


def test_equal_area_property_6933():
    # equal-area: a 1x1 deg cell at equator and at 60N map to equal areas
    for lat0 in (0.0, 60.0):
        xs, ys = geom.to_6933(np.array([0.0, 1.0, 1.0, 0.0]),
                              np.array([lat0, lat0, lat0 + 1, lat0 + 1]))
        # approx area via trapezoid in projected plane
        a = (xs[1] - xs[0]) * (ys[2] - ys[1])
        if lat0 == 0.0:
            a0 = a
    # cylindrical equal-area: d(sin lat) spacing keeps areas equal
    assert a == pytest.approx(a0 * (np.sin(np.deg2rad(61)) - np.sin(np.deg2rad(60)))
                              / (np.sin(np.deg2rad(1)) - 0.0), rel=1e-12)


def test_haversine_known():
    # 1 degree of longitude at the equator on sphere R=6378137:
    # R * pi/180 = 111319.49 m
    d = geom.haversine_m([0.0], [0.0], [1.0], [0.0])
    assert d[0] == pytest.approx(111319.49, rel=1e-6)


def test_douglas_peucker():
    # all interior points within tol of the chord -> dropped
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = np.array([0.0, 0.001, 0.002, 0.001, 0.0])
    keep = geom.douglas_peucker(xs, ys, tol=0.01)
    assert keep.tolist() == [True, False, False, False, True]
    # tighter tol keeps the farthest interior point
    keep2 = geom.douglas_peucker(xs, ys, tol=0.0001)
    assert keep2[0] and keep2[2] and keep2[4]


def test_antimeridian_cut():
    parts = geom.cut_antimeridian_bbox([179.0], [-10.0], [-179.0], [10.0])[0]
    assert len(parts) == 2
    assert parts[0][0] == 179.0 and parts[0][2] == 180.0
    assert parts[1][0] == -180.0 and parts[1][2] == -179.0


def test_convex_hull_and_buffer():
    rng = np.random.default_rng(2)
    px, py = rng.uniform(0, 10, 50), rng.uniform(0, 10, 50)
    hx, hy = geom.convex_hull(px, py)
    assert geom.points_in_polygon(np.array([5.0]), np.array([5.0]), hx, hy)[0]
    bx, by = geom.buffer_convex(hx, hy, 2.0)
    # buffered hull contains all original hull vertices
    assert geom.points_in_polygon(hx, hy, bx, by).all()


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def _test_image(seed, w=32, h=16):
    rng = np.random.default_rng(seed)
    ramp = np.linspace(0, 255, w, dtype=np.float64)
    img = np.empty((h, w, 3), dtype=np.uint8)
    for ch in range(3):
        img[:, :, ch] = (ramp[None, :] + rng.integers(0, 30, (h, w))).clip(0, 255)
    return img


def test_raw_rle_lossless():
    img = _test_image(42)
    for fmt in ("raw", "rle"):
        data = codec.encode(img, fmt)
        out = codec.decode(data, fmt, 32, 16)
        assert (out == img).all()
    # rle compresses constant images massively
    flat = np.zeros((16, 32, 3), dtype=np.uint8)
    assert len(codec.encode(flat, "rle")) < 32


def test_q6_meets_psnr_gate_q4_does_not():
    img = _test_image(1, 64, 64)
    d6 = codec.decode(codec.encode(img, "q6"), "q6", 64, 64)
    d4 = codec.decode(codec.encode(img, "q4"), "q4", 64, 64)
    assert codec.psnr(img, d6) >= 40.0
    assert codec.psnr(img, d4) < 40.0


def test_q6_size():
    img = _test_image(3, 32, 32)
    assert len(codec.encode(img, "q6")) == (32 * 32 * 3 * 6 + 7) // 8


def test_psnr_identity_inf():
    img = _test_image(9)
    assert codec.psnr(img, img) == float("inf")


def test_phash_properties():
    img = _test_image(42, 64, 64)
    h1 = codec.phash64(img)
    assert isinstance(h1, int)
    # stable under q6 quantization (near-dup robustness)
    d6 = codec.decode(codec.encode(img, "q6"), "q6", 64, 64)
    assert codec.hamming64([h1], [codec.phash64(d6)])[0] <= 6
    # different image -> large distance
    h2 = codec.phash64(_test_image(1000, 64, 64)[:, ::-1][::-1])
    assert codec.hamming64([h1], [h2])[0] >= 4


def test_hamming64():
    assert codec.hamming64([0], [0])[0] == 0
    assert codec.hamming64([-1], [0])[0] == 64
    assert codec.hamming64([0b1011], [0b0001])[0] == 2


def test_packed_pip_matches_per_polygon_kernel():
    """points_in_polygons_packed == points_in_polygon on random rings,
    including boundary-ish points, closed rings, and varying sizes."""
    import numpy as np
    from fiona_spark import geom

    rng = np.random.default_rng(123)
    rings_x, rings_y = [], []
    for j in range(40):
        nv = int(rng.integers(3, 30))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        r = rng.uniform(0.5, 3.0)
        xs = rng.uniform(-170, 170) + r * np.cos(ang)
        ys = rng.uniform(-80, 80) + r * np.sin(ang)
        if j % 5 == 0:   # closed-ring variant (first == last)
            xs = np.append(xs, xs[0]); ys = np.append(ys, ys[0])
        rings_x.append(xs); rings_y.append(ys)

    n = 5000
    ridx = rng.integers(0, 40, n)
    cx = np.array([rings_x[i].mean() for i in ridx])
    cy = np.array([rings_y[i].mean() for i in ridx])
    px = cx + rng.uniform(-4, 4, n)
    py = cy + rng.uniform(-4, 4, n)

    offs, fx, fy = geom.pack_rings(rings_x, rings_y)
    got = geom.points_in_polygons_packed(px, py, ridx, offs, fx, fy)
    exp = np.array([geom.points_in_polygon(
        px[i:i+1], py[i:i+1], rings_x[ridx[i]], rings_y[ridx[i]])[0]
        for i in range(n)])
    assert (got == exp).all()
    assert 0 < got.sum() < n   # non-trivial mix of hits and misses


def test_edges_packed_holes_and_multipolygon():
    """Even-odd parity over packed feature edges: hole interior is OUT,
    island-in-hole is IN, disjoint MultiPolygon parts are both IN."""
    sq = lambda cx, cy, r: (np.array([cx - r, cx + r, cx + r, cx - r]),
                            np.array([cy - r, cy - r, cy + r, cy + r]))
    # feature 0: square with a square hole and an island inside the hole
    f0_x, f0_y = zip(sq(0, 0, 4), sq(0, 0, 2), sq(0, 0, 0.5))
    # feature 1: two disjoint squares (MultiPolygon)
    f1_x, f1_y = zip(sq(10, 0, 1), sq(14, 0, 1))
    eo, ex0, ey0, ex1, ey1 = geom.pack_feature_edges(
        [list(f0_x), list(f1_x)], [list(f0_y), list(f1_y)])
    px = np.array([3.0, 1.0, 0.0, 10.0, 14.0, 12.0, 0.0])
    py = np.array([0.0, 1.0, 0.0, 0.5, -0.5, 0.0, 10.0])
    fi = np.array([0, 0, 0, 1, 1, 1, 0])
    got = geom.points_in_edges_packed(px, py, fi, eo, ex0, ey0, ex1, ey1)
    #      shell  hole   island part1  part2  gap   outside
    assert got.tolist() == [True, False, True, True, True, False, False]


def test_edges_packed_matches_single_ring_kernel():
    """Single-ring features through the edge kernel == the r1 packed
    ring kernel (regression for the pip_join kernel swap)."""
    rng = np.random.default_rng(8)
    rings_x, rings_y = [], []
    for _ in range(20):
        nv = rng.integers(4, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        cx, cy = rng.uniform(-50, 50, 2)
        rings_x.append(cx + rng.uniform(1, 3) * np.cos(ang))
        rings_y.append(cy + rng.uniform(1, 3) * np.sin(ang))
    px = rng.uniform(-60, 60, 500)
    py = rng.uniform(-60, 60, 500)
    ridx = rng.integers(0, 20, 500)
    offs, fx, fy = geom.pack_rings(rings_x, rings_y)
    want = geom.points_in_polygons_packed(px, py, ridx, offs, fx, fy)
    eo, ex0, ey0, ex1, ey1 = geom.pack_feature_edges(
        [[r] for r in rings_x], [[r] for r in rings_y])
    got = geom.points_in_edges_packed(px, py, ridx, eo, ex0, ey0, ex1, ey1)
    assert (got == want).all()


def test_points_in_rings_equals_xor_of_rings():
    sq = lambda cx, cy, r: (np.array([cx - r, cx + r, cx + r, cx - r]),
                            np.array([cy - r, cy - r, cy + r, cy + r]))
    outer, hole = sq(0, 0, 3), sq(0, 0, 1)
    px = np.array([2.0, 0.0, 5.0])
    py = np.array([0.0, 0.0, 0.0])
    got = geom.points_in_rings(px, py, [outer[0], hole[0]], [outer[1], hole[1]])
    assert got.tolist() == [True, False, False]


def test_douglas_peucker_segment_distance_guarantee():
    """Every dropped vertex lies within tol of the simplified polyline
    (SEGMENT distance, the GEOS convention) — the infinite-line variant
    violated this for points beyond a segment end (found by fuzz)."""
    def pt_seg(px, py, ax, ay, bx, by):
        ex, ey = bx - ax, by - ay
        L2 = ex * ex + ey * ey
        t = 0.0 if L2 == 0 else np.clip(
            ((px - ax) * ex + (py - ay) * ey) / L2, 0, 1)
        return np.hypot(px - (ax + t * ex), py - (ay + t * ey))

    rng = np.random.default_rng(13)
    for trial in range(80):
        n = int(rng.integers(5, 60))
        xs = np.cumsum(rng.uniform(-1, 2, n))
        ys = rng.standard_normal(n).cumsum()
        tol = float(rng.uniform(0.05, 2.0))
        keep = geom.douglas_peucker(xs, ys, tol)
        kx, ky = xs[keep], ys[keep]
        for i in range(n):
            if keep[i]:
                continue
            d = min(pt_seg(xs[i], ys[i], kx[j], ky[j],
                           kx[j + 1], ky[j + 1])
                    for j in range(len(kx) - 1))
            assert d <= tol + 1e-9, f"trial {trial} vertex {i}"


def test_convex_hull_contains_all_points_fuzz():
    """100 random point sets (incl. grid-snapped collinear-heavy):
    every input point lies inside or exactly on the hull boundary."""
    def pt_seg(px, py, ax, ay, bx, by):
        ex, ey = bx - ax, by - ay
        L2 = ex * ex + ey * ey
        t = 0.0 if L2 == 0 else np.clip(
            ((px - ax) * ex + (py - ay) * ey) / L2, 0, 1)
        return np.hypot(px - (ax + t * ex), py - (ay + t * ey))

    rng = np.random.default_rng(17)
    for trial in range(100):
        n = int(rng.integers(3, 200))
        px = rng.uniform(-10, 10, n)
        py = rng.uniform(-10, 10, n)
        if rng.random() < 0.3:
            px = np.round(px); py = np.round(py)
        hx, hy = geom.convex_hull(px, py)
        if len(hx) < 3:
            continue
        inside = geom.points_in_polygon(px, py, hx, hy)
        m = len(hx)
        for i in np.nonzero(~inside)[0]:
            d = min(pt_seg(px[i], py[i], hx[j], hy[j],
                           hx[(j + 1) % m], hy[(j + 1) % m])
                    for j in range(m))
            assert d <= 1e-9, f"trial {trial} point {i} outside by {d}"


def test_decode_batch_bit_identical_and_fallbacks():
    """codec.decode_batch must equal stacking per-image decode() for
    every format (incl. long-run rle splitting and q6/q4 bit padding),
    fall back cleanly on ragged payload lengths, and keep decode()'s
    error contract on corrupt rle."""
    import numpy as np
    import pytest as _pytest

    from fiona_spark import codec

    rng = np.random.default_rng(7)
    for fmt in ("raw", "rle", "q6", "q4"):
        for (w, h) in ((16, 16), (37, 23), (1, 1)):
            imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    for _ in range(5)]
            if fmt == "rle":
                imgs[2] = np.full((h, w, 3), 9, np.uint8)  # runs > 255
            datas = [codec.encode(im, fmt) for im in imgs]
            got = codec.decode_batch(datas, fmt, w, h)
            want = np.stack([codec.decode(d, fmt, w, h) for d in datas])
            assert got.dtype == np.uint8 and (got == want).all()
    # ragged rle lengths take the scalar fallback, same values
    imgs = [np.full((4, 4, 3), v, np.uint8) for v in (3, 200)]
    flat = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    imgs.append(flat)
    datas = [codec.encode(im, "rle") for im in imgs]
    assert len({len(d) for d in datas}) > 1
    got = codec.decode_batch(datas, "rle", 4, 4)
    assert (got == np.stack([codec.decode(d, "rle", 4, 4)
                             for d in datas])).all()
    # corrupt rle (wrong total) raises ValueError, like decode()
    bad = [codec.encode(np.zeros((2, 2, 3), np.uint8), "rle")] * 2
    with _pytest.raises(ValueError):
        codec.decode_batch(bad, "rle", 4, 4)
    # empty group
    assert codec.decode_batch([], "raw", 8, 8).shape == (0, 8, 8, 3)
