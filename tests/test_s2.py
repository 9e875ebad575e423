"""S2 cell family — published-model exactness + algebraic properties.

Anchors are ClickHouse's OWN published documentation examples (the
geo/s2 function pages), which this implementation reproduces
bit-for-bit; everything else is structural: Hilbert round-trips over
all faces/levels, neighbor adjacency incl. face wraps, intersects
algebra, cap/rect containment coherence.
"""

from __future__ import annotations

import math

import pytest

from clickhouse_25_5_3_75_stable_spark.functions import s2


# --- ClickHouse doc anchors (public docs, geoToS2 family pages) -----------

def test_doc_anchor_geo_to_s2():
    assert s2.geo_to_s2_py(37.79506683, 55.71290588) == 4704772434919038107
    # the s2CapContains doc example's cap center is geoToS2(2.9, 2.1)
    assert s2.geo_to_s2_py(2.9, 2.1) == 1157347770437378819


def test_doc_anchor_s2_to_geo():
    lon, lat = s2.s2_to_geo_py(4704772434919038107)
    assert lon == pytest.approx(37.79506681471008, abs=1e-12)
    assert lat == pytest.approx(55.7129059052841, abs=1e-12)


def test_doc_anchor_neighbors():
    assert s2.s2_get_neighbors_py(5074766849661468672) == [
        5074766987100422144, 5074766712222515200,
        5074767536856236032, 5074767261978329088,
    ]


def test_doc_anchor_intersect_and_cap():
    assert s2.s2_cells_intersect_py(9926595209846587392, 9926594385212866560)
    assert s2.s2_cap_contains_py(1157339245694594829, 1.0, 1157347770437378819)


# --- structural properties -------------------------------------------------

_POINTS = [
    (0.0, 0.0), (179.99, 0.0), (-179.99, 0.0), (0.0, 89.99), (0.0, -89.99),
    (37.79506683, 55.71290588), (-122.41, 37.77), (151.21, -33.87),
    (2.9, 2.1), (45.0, 45.0), (-45.0, -45.0), (135.0, 1e-9), (-135.0, -1e-9),
]


def test_roundtrip_all_faces():
    """encode -> center -> re-encode lands on the same leaf, and the
    center is within one leaf diagonal (~1.3 cm) of the input."""
    for lon, lat in _POINTS:
        cid = s2.geo_to_s2_py(lon, lat)
        assert s2.s2_is_valid_py(cid)
        assert s2.s2_level_py(cid) == 30
        lon2, lat2 = s2.s2_to_geo_py(cid)
        assert s2.geo_to_s2_py(lon2, lat2) == cid
        assert abs(lat2 - lat) < 1e-6
        # meridians converge at the poles: scale the lon bound
        dlon = abs((lon2 - lon + 180) % 360 - 180)
        assert dlon * max(1e-3, math.cos(math.radians(lat))) < 1e-6


def test_face_ij_hilbert_roundtrip():
    for face in range(6):
        for i, j in [(0, 0), (1, 0), (0, 1), ((1 << 30) - 1, (1 << 30) - 1),
                     (123456789, 987654321), (1 << 29, (1 << 29) - 1)]:
            cid = s2.from_face_ij_py(face, i, j)
            assert s2.to_face_ij_py(cid) == (face, i, j)


def test_vectorized_matches_scalar():
    import numpy as np

    lons = np.array([p[0] for p in _POINTS])
    lats = np.array([p[1] for p in _POINTS])
    ids = s2._geo_to_s2_np(lons, lats)
    for k, (lon, lat) in enumerate(_POINTS):
        assert int(ids[k]) == s2.geo_to_s2_py(lon, lat)
    lo, la = s2._s2_to_geo_np(ids)
    for k in range(len(_POINTS)):
        slon, slat = s2.s2_to_geo_py(int(ids[k]))
        # np.arctan2 and libm atan2 may differ in the last ulp — the
        # same class of drift CH itself has across libc builds
        assert lo[k] == pytest.approx(slon, abs=0, rel=1e-15)
        assert la[k] == pytest.approx(slat, abs=0, rel=1e-15)


def test_neighbors_adjacency():
    """Each neighbor is distinct, valid, same level, and has the
    original cell among ITS neighbors (symmetry — holds including
    across face wraps)."""
    cells = [s2.s2_parent_py(s2.geo_to_s2_py(lon, lat), lvl)
             for lon, lat in _POINTS[:6] for lvl in (5, 12, 30)]
    # face-boundary cell: i=0 edge of face 0
    cells.append(s2.s2_parent_py(s2.from_face_ij_py(0, 0, 12345 << 15), 10))
    for cid in cells:
        ns = s2.s2_get_neighbors_py(cid)
        assert len(set(ns)) == 4 and cid not in ns
        for n in ns:
            assert s2.s2_is_valid_py(n)
            assert s2.s2_level_py(n) == s2.s2_level_py(cid)
            assert cid in s2.s2_get_neighbors_py(n)


def test_intersects_algebra():
    leaf = s2.geo_to_s2_py(-122.41, 37.77)
    parent = s2.s2_parent_py(leaf, 10)
    other = s2.geo_to_s2_py(151.21, -33.87)
    assert s2.s2_cells_intersect_py(leaf, leaf)
    assert s2.s2_cells_intersect_py(leaf, parent)
    assert s2.s2_cells_intersect_py(parent, leaf)
    assert not s2.s2_cells_intersect_py(leaf, other)
    assert not s2.s2_cells_intersect_py(parent, s2.s2_parent_py(other, 10))


def test_cap_algebra():
    c1 = s2.geo_to_s2_py(2.9, 2.1)
    c2 = s2.geo_to_s2_py(10.0, 5.0)
    # a cap contains its own center; radius 0 excludes everything else
    assert s2.s2_cap_contains_py(c1, 0.0, c1)
    assert not s2.s2_cap_contains_py(c1, 0.5, c2)
    assert s2.s2_cap_contains_py(c1, 30.0, c2)
    # union covers both inputs minimally
    cu, du = s2.s2_cap_union_py(c1, 1.0, c2, 10.0)
    a = s2._normalize(s2._center_xyz_py(c1))
    b = s2._normalize(s2._center_xyz_py(c2))
    u = s2._normalize(s2._center_xyz_py(cu))
    da = math.degrees(s2._angle_between(u, a))
    db = math.degrees(s2._angle_between(u, b))
    assert da + 1.0 <= du + 1e-6 and db + 10.0 <= du + 1e-6
    assert max(da + 1.0, db + 10.0) == pytest.approx(du, abs=1e-6)
    # containment case: big cap swallows the small one
    cu2, du2 = s2.s2_cap_union_py(c1, 60.0, c2, 1.0)
    assert cu2 == c1 and du2 == pytest.approx(60.0, abs=1e-9)


def test_rect_algebra():
    lo = s2.geo_to_s2_py(2.0, 2.0)
    hi = s2.geo_to_s2_py(10.0, 10.0)
    inside = s2.geo_to_s2_py(5.0, 5.0)
    outside = s2.geo_to_s2_py(20.0, 20.0)
    assert s2.s2_rect_contains_py(lo, hi, inside)
    assert not s2.s2_rect_contains_py(lo, hi, outside)
    # AddPoint expands to contain the point
    lo2, hi2 = s2.s2_rect_add_py(lo, hi, outside)
    assert s2.s2_rect_contains_py(lo2, hi2, outside)
    assert s2.s2_rect_contains_py(lo2, hi2, inside)
    # Union == AddPoint-corner algebra; Intersection of nested is inner
    lo3, hi3 = s2.s2_rect_union_py(lo, hi, lo2, hi2)
    assert s2.s2_rect_contains_py(lo3, hi3, outside)
    li, hi_i = s2.s2_rect_intersection_py(lo, hi, lo2, hi2)
    assert s2.s2_rect_contains_py(li, hi_i, inside)
    assert not s2.s2_rect_contains_py(li, hi_i, outside)


def test_rect_antimeridian():
    """lng interval crossing 180° (inverted S1Interval)."""
    lo = s2.geo_to_s2_py(170.0, -10.0)
    hi = s2.geo_to_s2_py(-170.0, 10.0)
    inside = s2.geo_to_s2_py(179.5, 0.0)
    inside2 = s2.geo_to_s2_py(-179.5, 0.0)
    outside = s2.geo_to_s2_py(0.0, 0.0)
    assert s2.s2_rect_contains_py(lo, hi, inside)
    assert s2.s2_rect_contains_py(lo, hi, inside2)
    assert not s2.s2_rect_contains_py(lo, hi, outside)


def test_spark_column_api(spark):
    from pyspark.sql import functions as F

    from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch

    df = spark.createDataFrame(
        [(37.79506683, 55.71290588), (2.9, 2.1), (None, 1.0)],
        "lon double, lat double",
    )
    rows = df.select(
        ch("geoToS2", F.col("lon"), F.col("lat")).alias("id")
    ).collect()
    assert [r.id for r in rows] == [4704772434919038107,
                                    1157347770437378819, None]
    back = (
        spark.createDataFrame([(4704772434919038107,)], "id long")
        .select(
            ch("s2ToGeo", F.col("id")).alias("g"),
            ch("s2GetNeighbors", F.col("id")).alias("n"),
            ch("s2CellsIntersect", F.col("id"), F.lit(1)).alias("x"),
        )
        .collect()[0]
    )
    assert back.g.lon == pytest.approx(37.79506681471008)
    assert len(back.n) == 4
    assert back.x is False


def test_sql_surface(spark):
    """geoToS2 / s2ToGeo / s2GetNeighbors / s2CellsIntersect /
    s2CapContains / s2CapUnion and the h3 index-math getters resolve
    through plain chsql SQL text (session.register_sql_udfs), incl.
    unsigned cell-id literals beyond 2^63 (typed DECIMAL by Spark)."""
    from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql
    from clickhouse_25_5_3_75_stable_spark.session import register_sql_udfs

    register_sql_udfs(spark)
    r = ch_sql(spark, """
        SELECT geoToS2(37.79506683, 55.71290588) AS id,
               s2ToGeo(4704772434919038107) AS g,
               s2GetNeighbors(5074766849661468672) AS n,
               s2CellsIntersect(9926595209846587392, 9926594385212866560) AS x,
               s2CapContains(1157339245694594829, 1.0, 1157347770437378819) AS cc,
               h3GetResolution(617700169958293503) AS hres,
               h3ToParent(617700169958293503, 8) AS hp,
               h3ToString(617700169958293503) AS hs,
               stringToH3('8928308280fffff') AS sh
    """).collect()[0]
    assert r.id == 4704772434919038107
    assert r.g.lon == pytest.approx(37.79506681471008)
    assert r.n == [5074766987100422144, 5074766712222515200,
                   5074767536856236032, 5074767261978329088]
    assert r.x is True and r.cc is True
    assert r.hres == 9 and r.hs == "8928308280fffff"
    assert r.sh == 617700169958293503
    from clickhouse_25_5_3_75_stable_spark.functions.h3 import h3_to_parent_py

    assert r.hp == h3_to_parent_py(617700169958293503, 8)


def test_sql_surface_rect(spark):
    """s2RectAdd / s2RectContains / s2RectUnion / s2RectIntersection
    resolve through SQL text and agree with the pure-python rect
    algebra (reference: src/Functions/s2RectAdd.cpp et al.)."""
    from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql
    from clickhouse_25_5_3_75_stable_spark.session import register_sql_udfs

    register_sql_udfs(spark)
    lo = s2.geo_to_s2_py(2.0, 2.0)
    hi = s2.geo_to_s2_py(10.0, 10.0)
    inside = s2.geo_to_s2_py(5.0, 5.0)
    outside = s2.geo_to_s2_py(20.0, 20.0)
    r = ch_sql(spark, f"""
        SELECT s2RectAdd({lo}, {hi}, {outside}) AS grown,
               s2RectContains({lo}, {hi}, {inside}) AS has_in,
               s2RectContains({lo}, {hi}, {outside}) AS has_out,
               s2RectUnion({lo}, {hi}, {lo}, {hi}) AS self_union,
               s2RectIntersection({lo}, {hi}, {lo}, {hi}) AS self_inter
    """).collect()[0]
    glo, ghi = s2.s2_rect_add_py(lo, hi, outside)
    assert (r.grown.lo, r.grown.hi) == (_i64(glo), _i64(ghi))
    assert r.has_in is True and r.has_out is False
    assert (r.self_union.lo, r.self_union.hi) == (_i64(lo), _i64(hi))
    assert (r.self_inter.lo, r.self_inter.hi) == (_i64(lo), _i64(hi))


def _i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u
