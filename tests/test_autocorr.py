"""Spatial-autocorrelation tests: pure-Python Moran/Gi* references on the
real fixture, analytic sign goldens (checkerboard negative, clustered
positive), ring wrap/clamp handling, and parallelism determinism."""

import math

import numpy as np

from data_model_spark.functions import cells
from data_model_spark.operators.autocorr import cell_counts, gi_star, morans_i
from data_model_spark.operators.dbscan import _blob_points


def _ref_stats(cell_n: dict[int, int], res: int):
    """Reference Moran (n_cells, s0, num, den, I) and per-cell Gi* z."""
    n_grid = 1 << res
    xy = {((c & cells._XY_MASK), ((c >> cells._Y_SHIFT) & cells._XY_MASK)): v
          for c, v in cell_n.items()}
    nc = len(xy)
    t = sum(xy.values())
    sumsq = sum(v * v for v in xy.values())
    num = s0 = 0
    gi = {}
    for (x, y), v in xy.items():
        ring_sum = k = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ty = y + dy
                if not (0 <= ty < n_grid):
                    continue
                tx = (x + dx) % n_grid
                if (tx, ty) in xy:
                    ring_sum += xy[(tx, ty)]
                    k += 1
                    if not (dx == 0 and dy == 0):
                        s0 += 1
                        num += (nc * v - t) * (nc * xy[(tx, ty)] - t)
        xbar = t / nc
        s = math.sqrt(sumsq / nc - xbar * xbar)
        z = (ring_sum - xbar * k) / (s * math.sqrt((nc * k - k * k) / (nc - 1.0)))
        gi[(x, y)] = (v, k, ring_sum, int(round(z * 1e9)))
    den = nc * (nc * sumsq - t * t)
    return (nc, s0, num, den, int(round((nc * num) / (s0 * den) * 1e9))), gi


def _counts_dict(spark, sf_dir, res):
    pts = _blob_points(spark, sf_dir)
    return {r.cell: r.n for r in cell_counts(pts, res).collect()}


def test_moran_matches_reference(spark, sf_dir):
    got = morans_i(_blob_points(spark, sf_dir), res=10).collect()[0]
    want, _ = _ref_stats(_counts_dict(spark, sf_dir, 10), 10)
    assert (got.n_cells, got.s0, got.num, got.den, got.moran_i_nano) == want


def test_gi_star_matches_reference(spark, sf_dir):
    _, want = _ref_stats(_counts_dict(spark, sf_dir, 10), 10)
    got = {}
    for r in gi_star(_blob_points(spark, sf_dir), res=10).collect():
        x, y = r.cell & cells._XY_MASK, (r.cell >> cells._Y_SHIFT) & cells._XY_MASK
        got[(x, y)] = (r.n_own, r.k_ring, r.ring_sum, r.gi_z_nano)
    assert got == want
    assert len(got) >= 20


def _grid_points(spark, weights):
    """One point per unit weight at distinct cell centers of a res-6 grid."""
    rows = []
    pid = 0
    for (gx, gy), w in weights.items():
        n = 1 << 6
        lon = (gx + 0.5) / n * 360.0 - 180.0
        lat = (gy + 0.5) / n * 180.0 - 90.0
        for _ in range(w):
            rows.append((pid, lon, lat))
            pid += 1
    return spark.createDataFrame(rows, "point_id long, lon double, lat double")


def test_checkerboard_is_negative_clustered_is_positive(spark):
    # 6x6 checkerboard of counts 1/5 -> strong negative I;
    # two homogeneous halves (1s left, 5s right) -> positive I.
    checker = {(10 + i, 20 + j): (5 if (i + j) % 2 == 0 else 1)
               for i in range(6) for j in range(6)}
    halves = {(10 + i, 20 + j): (5 if i >= 3 else 1)
              for i in range(6) for j in range(6)}
    i_check = morans_i(_grid_points(spark, checker), res=6).collect()[0].moran_i_nano
    i_halves = morans_i(_grid_points(spark, halves), res=6).collect()[0].moran_i_nano
    assert i_check < 0 < i_halves
    # and the reference agrees exactly on both grids
    for weights, got in ((checker, i_check), (halves, i_halves)):
        cn = {int(cells.cell_id(6, x, y)): w for (x, y), w in weights.items()}
        want, _ = _ref_stats(cn, 6)
        assert got == want[4]


def test_hotspot_cell_has_max_z(spark):
    # one hot 3x3 block (count 9 each) in a field of 1s: the block center
    # must carry the maximum Gi* z
    weights = {(30 + i, 40 + j): 1 for i in range(9) for j in range(9)}
    for i in range(3, 6):
        for j in range(3, 6):
            weights[(30 + i, 40 + j)] = 9
    out = gi_star(_grid_points(spark, weights), res=6).collect()
    best = max(out, key=lambda r: r.gi_z_nano)
    x, y = best.cell & cells._XY_MASK, (best.cell >> cells._Y_SHIFT) & cells._XY_MASK
    assert (x, y) == (34, 44)
    assert best.ring_sum == 81 and best.k_ring == 9


def test_deterministic_across_parallelism(spark, sf_dir):
    pts = _blob_points(spark, sf_dir)
    a = sorted(map(tuple, gi_star(pts.repartition(1), res=10).collect()))
    b = sorted(map(tuple, gi_star(pts.repartition(13), res=10).collect()))
    assert a == b
    ma = morans_i(pts.repartition(1), res=10).collect()[0]
    mb = morans_i(pts.repartition(13), res=10).collect()[0]
    assert tuple(ma) == tuple(mb)
