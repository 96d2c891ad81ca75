# Tests: SIDERA astro — ephemeris vs known oracle values, phase, sidereal
# time, refraction, range gating, night-sky render.
# Oracle values from published almanac data (accuracy gates mirror the
# reference's Horizons-oracle tests, SURVEY §2.4).

import math

import numpy as np
import pytest

from forge3d_tpu.astro import (AstroRangeError, astro_body_position,
                               astro_delta_t_seconds, astro_moon_phase,
                               astro_refraction_arcminutes,
                               astro_sidereal_time, astro_validation_metrics,
                               body_info, bright_stars, equatorial_to_altaz,
                               julian_date, render_night_sky,
                               sky_set_observation)


def test_julian_date():
    assert julian_date(2000, 1, 1, 12) == 2451545.0
    assert julian_date(2026, 8, 16, 0) == pytest.approx(2461268.5)


def test_sidereal_time_j2000():
    # GMST at J2000.0 epoch = 280.46061837 deg (Meeus 12.4)
    assert astro_sidereal_time(2451545.0) == pytest.approx(280.4606, abs=1e-3)
    # ~3m56s faster per day => +0.98565 deg/day mod 360
    d = (astro_sidereal_time(2451546.0) - astro_sidereal_time(2451545.0)) % 360
    assert d == pytest.approx(0.98565, abs=1e-4)


def test_sun_position_oracle():
    # 2026-03-20 (equinox ~14:46 UTC): solar dec crosses 0
    jd = julian_date(2026, 3, 20, 14, 46)
    sun = astro_body_position("sun", jd)
    assert abs(sun["dec_deg"]) < 0.05
    # At June solstice sun dec ~ +23.43
    jd2 = julian_date(2026, 6, 21, 8)
    sun2 = astro_body_position("sun", jd2)
    assert sun2["dec_deg"] == pytest.approx(23.43, abs=0.05)
    # distance ~0.983 AU at perihelion (early Jan), ~1.017 at aphelion
    jd3 = julian_date(2026, 1, 3)
    assert astro_body_position("sun", jd3)["distance_au"] == pytest.approx(
        0.9833, abs=0.001)


def test_moon_phase_oracle():
    # Known new moon: 2024-04-08 18:21 UTC (total solar eclipse)
    jd = julian_date(2024, 4, 8, 18, 21)
    ph = astro_moon_phase(jd)
    assert ph["illuminated_fraction"] < 0.01
    assert ph["name"] == "new"
    # Known full moon: 2024-04-23 ~23:49 UTC
    jd2 = julian_date(2024, 4, 23, 23, 49)
    ph2 = astro_moon_phase(jd2)
    assert ph2["illuminated_fraction"] > 0.99
    assert ph2["name"] == "full"


def test_moon_position_sane():
    jd = julian_date(2026, 8, 16)
    m = astro_body_position("moon", jd)
    assert 3.5e5 < m["distance_km"] < 4.1e5
    assert abs(m["ecliptic_lat_deg"]) < 5.4


def test_planet_positions():
    jd = julian_date(2026, 8, 16)
    for planet in ("mercury", "venus", "mars", "jupiter", "saturn"):
        p = astro_body_position(planet, jd)
        assert 0 <= p["ra_deg"] < 360
        assert -90 <= p["dec_deg"] <= 90
    # geocentric rate is dominated by Earth parallax: < ~3 deg / 10 days
    j1 = astro_body_position("jupiter", jd)
    j2 = astro_body_position("jupiter", jd + 10)
    dra = abs((j1["ra_deg"] - j2["ra_deg"] + 180) % 360 - 180)
    assert dra < 3.0
    with pytest.raises(ValueError):
        astro_body_position("pluto", jd)


def test_earth_kepler_vs_meeus_sun():
    """Cross-oracle: the Kepler-table Earth position must put the sun
    opposite Earth's heliocentric longitude, agreeing with the Meeus
    ch.25 solar series to < 0.05 deg across the window."""
    from forge3d_tpu.astro import _planet_heliocentric, _sun_ecliptic

    for jd in np.linspace(julian_date(2000, 6, 1),
                          julian_date(2049, 6, 1), 7):
        e = _planet_heliocentric("earth", jd)
        t = (jd - 2451545.0) / 36525.0
        prec = (5029.0966 / 3600.0) * t
        lon_e = (math.degrees(math.atan2(e[1], e[0])) + prec) % 360
        sun_lon = _sun_ecliptic(jd)[0]
        diff = abs((lon_e + 180 - sun_lon + 180) % 360 - 180)
        assert diff < 0.05, (jd, diff)


def test_range_gating():
    with pytest.raises(AstroRangeError):
        astro_body_position("sun", julian_date(1980, 1, 1))
    with pytest.raises(AstroRangeError):
        astro_moon_phase(julian_date(2099, 1, 1))


def test_delta_t():
    # Delta-T was ~69s in 2020, rising slowly
    dt = astro_delta_t_seconds(julian_date(2020, 1, 1))
    assert 60 < dt < 80


def test_refraction():
    # Bennett: ~34' at the horizon, ~1' at 45 deg, ~0 at zenith
    assert astro_refraction_arcminutes(0.0) == pytest.approx(34.5, abs=2.0)
    assert astro_refraction_arcminutes(45.0) == pytest.approx(1.0, abs=0.2)
    assert astro_refraction_arcminutes(89.0) < 0.1


def test_altaz_polaris():
    # Polaris altitude ~= observer latitude (within ~1 deg)
    jd = julian_date(2026, 8, 16, 3)
    alt, az = equatorial_to_altaz(37.955, 89.264, jd, 47.6, -122.3)
    assert alt == pytest.approx(47.6, abs=1.0)
    assert az < 2.0 or az > 358.0


def test_body_info_and_observation():
    assert body_info("moon")["radius_km"] == pytest.approx(1737.4)
    obs = sky_set_observation(46.85, -121.76, 4392.0)
    assert obs.latitude_deg == 46.85
    with pytest.raises(ValueError):
        body_info("vulcan")


def test_bright_stars_catalog():
    cat = bright_stars()
    assert len(cat) >= 50
    sirius = cat[cat["name"] == "Sirius"][0]
    assert sirius["mag"] == pytest.approx(-1.46)
    assert sirius["ra_deg"] == pytest.approx(101.29, abs=0.1)


def test_night_sky_render():
    jd = julian_date(2026, 8, 16, 6)  # pre-dawn
    img = render_night_sky(192, 128, jd, 46.85, -121.76,
                           azimuth_deg=180.0, altitude_deg=40.0)
    assert img.shape == (128, 192, 4)
    # stars present: some bright pixels over the dark background
    lum = img[..., :3].max(-1)
    assert (lum > 100).sum() > 5
    assert np.median(lum) < 40
    # deterministic
    img2 = render_night_sky(192, 128, jd, 46.85, -121.76,
                            azimuth_deg=180.0, altitude_deg=40.0)
    np.testing.assert_array_equal(img, img2)


def test_validation_metrics():
    rep = astro_validation_metrics()
    assert rep["ok"], rep
