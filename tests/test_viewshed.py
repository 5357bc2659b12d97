"""Viewshed kernel properties (flat/wall/monotone goldens) and fixture
non-vacuity; distributed==replay is pinned by the viewshed_fp oracle."""

import numpy as np

from data_model_spark.operators.viewshed import (
    _observers,
    viewshed_kernel,
)


def test_flat_terrain_fully_visible():
    Z = np.full((41, 41), 100, dtype=np.int64)
    vis = viewshed_kernel(Z, 20, 20, height=5, radius=15)
    rr, cc = np.mgrid[0:41, 0:41]
    disc = (rr - 20) ** 2 + (cc - 20) ** 2 <= 225
    assert np.array_equal(vis, disc)


def test_wall_blocks_behind():
    """A tall north-south wall east of the observer shadows everything
    strictly behind it on the observer's row."""
    Z = np.zeros((31, 31), dtype=np.int64)
    Z[:, 20] = 1000  # wall
    vis = viewshed_kernel(Z, 15, 10, height=2, radius=14)
    assert vis[15, 10]  # observer cell
    assert vis[15, 20]  # the wall face is visible
    assert not vis[15, 21] and not vis[15, 22]  # shadowed
    assert vis[15, 19]  # in front of the wall


def test_height_monotone():
    """Raising the observer never hides a visible pixel."""
    rng = np.random.default_rng(11)
    Z = rng.integers(0, 300, (41, 41)).astype(np.int64)
    lo = viewshed_kernel(Z, 20, 20, height=2, radius=18)
    hi = viewshed_kernel(Z, 20, 20, height=50, radius=18)
    assert (hi | ~lo).all()  # lo ⊆ hi
    assert hi.sum() > lo.sum()  # and strictly grows on rough terrain


def test_peak_sees_everything():
    """Observer on a dominant peak sees the whole disc."""
    Z = np.zeros((31, 31), dtype=np.int64)
    Z[15, 15] = 5000
    vis = viewshed_kernel(Z, 15, 15, height=1, radius=12)
    rr, cc = np.mgrid[0:31, 0:31]
    disc = (rr - 15) ** 2 + (cc - 15) ** 2 <= 144
    assert np.array_equal(vis, disc)


def test_fixture_observers_deterministic_and_mixed(spark):
    """The registered query's observers are stable, and its viewsheds are
    non-vacuous: some pixels visible, some blocked."""
    obs = _observers()
    assert obs == _observers() and len(obs) == 4
    from data_model_spark.operators.registry import QUERIES

    rows = QUERIES["viewshed_fp"].spark_fn(spark, "unused").collect()
    assert len(rows) == 4
    for r in rows:
        assert 0 < r.visible_px < r.considered_px  # real occlusion happens
