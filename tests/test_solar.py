"""Solar geometry: physical sanity of the NOAA equations + engine parity."""

import numpy as np

from data_model_spark.operators.solar import (
    acquisition_cycle,
    scene_centers,
    solar_angles,
    solar_position,
    _udeg,
)


def test_equator_equinox_noon_overhead():
    # near the March equinox (doy ~80) at local solar noon on the
    # equator/greenwich the sun is close to the zenith
    zen, az = solar_position(
        np.array([0.0]), np.array([0.0]), np.array([80]), np.array([12 * 60])
    )
    assert zen[0] < 3.0


def test_midnight_sun_below_horizon():
    zen, _ = solar_position(
        np.array([0.0]), np.array([0.0]), np.array([80]), np.array([0])
    )
    assert zen[0] > 90.0


def test_azimuth_quadrants_northern_hemisphere():
    # morning sun in the east (az ~90-135), afternoon in the west
    lat = np.array([46.0, 46.0])
    lon = np.array([0.0, 0.0])
    doy = np.array([172, 172])  # June solstice
    minute = np.array([8 * 60, 16 * 60])
    _, az = solar_position(lon, lat, doy, minute)
    assert 45.0 < az[0] < 135.0
    assert 225.0 < az[1] < 315.0


def test_summer_noon_zenith_matches_latitude_minus_declination():
    # at solar noon, zenith ~= |lat - decl|; June solstice decl ~23.44
    zen, _ = solar_position(
        np.array([0.0]), np.array([46.0]), np.array([172]), np.array([12 * 60])
    )
    assert abs(zen[0] - (46.0 - 23.44)) < 1.0


def test_engine_matches_replay(spark):
    got = {
        r.image_id: (r.doy, r.minute, r.zen_udeg, r.az_udeg)
        for r in solar_angles(spark, "").collect()
    }
    idx = np.arange(500, dtype=np.int64)
    from data_model_spark.sources import images as img_src

    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    lon, lat = scene_centers(idx, dims[:, 0], dims[:, 1])
    doy, minute = acquisition_cycle(idx)
    zen, az = solar_position(lon, lat, doy, minute)
    zq, aq = _udeg(zen), _udeg(az)
    for i in idx:
        key = f"img_{int(i):012d}"
        assert got[key] == (int(doy[i]), int(minute[i]), int(zq[i]), int(aq[i]))
