# Regression tests for the round-1 advisor findings (ADVICE.md):
#  - license expiry must fail closed by default (with the reference's
#    14-day grace window; ref python/forge3d/_license.py behavior)
#  - f3dz must fail closed when the error bound is unachievable in f32
#    or residuals exceed the 32-bit zigzag range (ref src/codec/f3dz
#    error-bounded fail-closed contract)
#  - dem_spacing must honor a size= override on fetch_dem

import numpy as np
import pytest


def test_license_expiry_fails_closed_without_now():
    from forge3d_tpu.assurance.license import issue_license, validate_license

    lic = issue_license("test-holder", expires="2020-01-01")
    ok, why = validate_license(lic)  # now defaults to today's UTC date
    assert not ok and why == "expired"


def test_license_grace_window():
    import datetime

    from forge3d_tpu.assurance.license import (GRACE_DAYS, issue_license,
                                               validate_license)

    exp = datetime.date(2026, 3, 1)
    lic = issue_license("h", expires=exp.isoformat())
    within = (exp + datetime.timedelta(days=GRACE_DAYS)).isoformat()
    beyond = (exp + datetime.timedelta(days=GRACE_DAYS + 1)).isoformat()
    assert validate_license(lic, now=exp.isoformat()) == (True, "ok")
    assert validate_license(lic, now=within) == (True, "grace")
    assert validate_license(lic, now=beyond) == (False, "expired")


def test_f3dz_unachievable_bound_fails_closed():
    from forge3d_tpu.codec import F3dzError, compress_dem

    # 3e5-magnitude heights with a 1e-4 bound: f32 reconstruction rounding
    # alone exceeds the bound; encode must refuse, not silently violate it.
    h = (np.linspace(0.0, 3e5, 64 * 64, dtype=np.float32)
         .reshape(64, 64))
    h[10, 10] = 3e5
    with pytest.raises(F3dzError):
        compress_dem(h, max_error=1e-4)


def test_f3dz_roundtrip_error_bound_still_holds():
    from forge3d_tpu.codec import compress_dem, decompress_dem

    rng = np.random.default_rng(5)
    h = (rng.normal(0, 100, (65, 63)).astype(np.float32)
         + np.linspace(0, 500, 63, dtype=np.float32)[None, :])
    blob = compress_dem(h, max_error=0.05)
    out = decompress_dem(blob)
    assert out.shape == h.shape
    assert float(np.abs(out - h).max()) <= 0.05 + 1e-7


def test_dem_spacing_honors_size_override():
    from forge3d_tpu.datasets import dem_spacing, fetch_dem

    dem_full, info_full = fetch_dem("mini")
    dem_half, info_half = fetch_dem("mini", size=64, cache=False)
    assert info_half["size"] == 64 and dem_half.shape == (64, 64)
    sx_full, _ = dem_spacing(info_full)
    sx_half, _ = dem_spacing(info_half)
    # half the pixels over the same bounds -> ~2x the meters/pixel
    assert sx_half == pytest.approx(sx_full * info_full["size"] / 64, rel=1e-6)


def test_png16_roundtrip_exact():
    """16-bit PNG write/read is lossless (round-1 verdict weak item 10:
    'PNG16 path unverified')."""
    import tempfile

    from forge3d_tpu.io.image import numpy_to_png, png_to_numpy

    a = (np.random.default_rng(0).integers(0, 65536, (32, 48, 3))
         ).astype(np.uint16)
    with tempfile.TemporaryDirectory() as d:
        numpy_to_png(d + "/x.png", a)
        b = png_to_numpy(d + "/x.png")
    assert b.dtype == np.uint16
    assert np.array_equal(a, b.reshape(a.shape))
