"""H3 index-math family (functions/h3.py): published bit-layout
anchors, parent/child round-trips, pentagon structure, Column/py
parity, validity edge cases."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from clickhouse_25_5_3_75_stable_spark.functions import h3
from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch

SF_CELL = int("8928308280fffff", 16)  # canonical res-9 cell (H3 docs)


def test_published_layout_anchors():
    assert h3.h3_get_resolution_py(SF_CELL) == 9
    assert h3.h3_get_base_cell_py(SF_CELL) == 20
    assert h3.h3_is_valid_py(SF_CELL)
    # res-0 indexes take the documented 80XXfffffffffff shape
    res0 = h3.h3_get_res0_indexes_py()
    assert format(res0[0], "x") == "8001fffffffffff"
    assert format(res0[20], "x") == "8029fffffffffff"
    # 801dfffffffffff is the well-known pentagon (base cell 14)
    pent = h3.h3_get_pentagon_indexes_py(0)
    assert format(pent[1], "x") == "801dfffffffffff"
    assert all(h3.h3_is_pentagon_py(p) and h3.h3_is_valid_py(p) for p in pent)
    assert len(res0) == 122 and sum(h3.h3_is_pentagon_py(h) for h in res0) == 12


def test_parent_child_roundtrip():
    p8 = h3.h3_to_parent_py(SF_CELL, 8)
    assert h3.h3_get_resolution_py(p8) == 8 and h3.h3_is_valid_py(p8)
    kids = h3.h3_to_children_py(p8, 9)
    assert SF_CELL in kids and len(kids) == 7
    assert all(h3.h3_to_parent_py(k, 8) == p8 for k in kids)
    assert h3.h3_to_center_child_py(p8, 9) == kids[0]
    # grandchildren: 49 for a hexagon
    assert len(h3.h3_to_children_py(p8, 10)) == 49
    # pentagon: 6 children; grandchildren = pentagon(6) + 5 hexagons(7)
    pent = h3.h3_get_pentagon_indexes_py(0)[0]
    assert len(h3.h3_to_children_py(pent, 1)) == 6
    assert len(h3.h3_to_children_py(pent, 2)) == 6 + 5 * 7  # 41


def test_num_hexagons_closed_form_vs_enumeration():
    res0 = h3.h3_get_res0_indexes_py()
    assert h3.h3_num_hexagons_py(0) == len(res0) == 122
    n1 = sum(len(h3.h3_to_children_py(h, 1)) for h in res0)
    assert n1 == h3.h3_num_hexagons_py(1) == 842


def test_validity_edge_cases():
    assert not h3.h3_is_valid_py(SF_CELL | (1 << 63))        # high bit
    assert not h3.h3_is_valid_py(SF_CELL & ~(1 << 59))       # mode != 1
    assert not h3.h3_is_valid_py(SF_CELL | (1 << 56))        # reserved
    bad_bc = (SF_CELL & ~(0x7F << 45)) | (122 << 45)
    assert not h3.h3_is_valid_py(bad_bc)                     # base cell 122
    # digit 7 inside the resolution range
    bad_digit = SF_CELL | (0x7 << (3 * (15 - 1)))
    assert not h3.h3_is_valid_py(bad_digit)
    # unused digit not 7
    bad_tail = h3.h3_to_parent_py(SF_CELL, 8) & ~0x7
    assert not h3.h3_is_valid_py(bad_tail)
    # pentagon with leading digit 1 (deleted K axis)
    pent = h3.h3_get_pentagon_indexes_py(0)[0]
    k_child = (pent & ~(0xF << 52) & ~(0x7 << 42)) | (1 << 52) | (1 << 42)
    assert not h3.h3_is_valid_py(k_child)


def test_column_api_matches_python(spark):
    rng = random.Random(11)
    cells = [SF_CELL, h3.h3_to_parent_py(SF_CELL, 5)]
    cells += h3.h3_get_pentagon_indexes_py(3)[:3]
    cells += h3.h3_to_children_py(h3.h3_to_parent_py(SF_CELL, 8), 9)
    # some invalid values too
    cells += [rng.randrange(0, 2**63) for _ in range(20)]
    df = spark.createDataFrame([(c,) for c in cells], "h long")
    rows = df.select(
        "h",
        ch("h3GetResolution", F.col("h")).alias("res"),
        ch("h3GetBaseCell", F.col("h")).alias("bc"),
        ch("h3IsValid", F.col("h")).alias("ok"),
        ch("h3IsPentagon", F.col("h")).alias("pent"),
        ch("h3ToString", F.col("h")).alias("s"),
    ).collect()
    for r in rows:
        assert r.res == h3.h3_get_resolution_py(r.h), r.h
        assert r.bc == h3.h3_get_base_cell_py(r.h)
        assert r.ok == h3.h3_is_valid_py(r.h), format(r.h, "x")
        assert r.pent == h3.h3_is_pentagon_py(r.h)
        assert int(r.s, 16) == r.h

    # parent / center child / children with column resolutions
    vdf = spark.createDataFrame(
        [(c, h3.h3_get_resolution_py(c)) for c in cells
         if h3.h3_is_valid_py(c)],
        "h long, res int",
    )
    rows = vdf.select(
        "h", "res",
        ch("h3ToParent", F.col("h"), F.greatest(F.col("res") - 2, F.lit(0))).alias("p"),
        ch("h3ToChildren", F.col("h"), F.least(F.col("res") + 1, F.lit(15))).alias("kids"),
        ch("h3NumHexagons", F.col("res")).alias("n"),
    ).collect()
    for r in rows:
        pr = max(r.res - 2, 0)
        assert r.p == h3.h3_to_parent_py(r.h, pr), (format(r.h, "x"), pr)
        cr = min(r.res + 1, 15)
        assert list(r.kids) == h3.h3_to_children_py(r.h, cr)
        assert r.n == h3.h3_num_hexagons_py(r.res)

    one = spark.range(1).select(
        ch("stringToH3", F.lit("8928308280fffff")).alias("h"),
        ch("h3IsResClassIII", F.lit(9)).alias("c3"),
        F.size(ch("h3GetRes0Indexes")).alias("n0"),
        F.size(ch("h3GetPentagonIndexes", 2)).alias("np"),
    ).collect()[0]
    assert one.h == SF_CELL and one.c3 is True
    assert one.n0 == 122 and one.np == 12
