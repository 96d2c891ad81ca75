# Seeded deterministic fuzz suites (VERDICT r2 item 10; reference pattern:
# tests/_fuzz.py + tests/_geomfuzz.py — seeded corpora with invariant
# checks, no RNG at collection time beyond the fixed seeds).

import math

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# geometry overlay invariants (EUCLIDEA-equivalent plane sweep)
# ---------------------------------------------------------------------------


def _rect(x, y, w, h):
    return [[x, y], [x + w, y], [x + w, y + h], [x, y + h]]


def _ring_area(r):
    a = 0.0
    for i in range(len(r)):
        x0, y0 = r[i]
        x1, y1 = r[(i + 1) % len(r)]
        a += x0 * y1 - x1 * y0
    return abs(a) * 0.5


def _even_odd_area(rings, lo=-200.0, hi=200.0, n=400):
    """Raster reference area under even-odd semantics."""
    xs = (np.arange(n) + 0.5) / n * (hi - lo) + lo
    ys = (np.arange(n) + 0.5) / n * (hi - lo) + lo
    xx, yy = np.meshgrid(xs, ys)
    inside = np.zeros(xx.shape, bool)
    for r in rings:
        acc = np.zeros(xx.shape, bool)
        j = len(r) - 1
        for i in range(len(r)):
            xi, yi = r[i]
            xj, yj = r[j]
            hit = ((yi > yy) != (yj > yy)) & (
                xx < (xj - xi) * (yy - yi) / (yj - yi + 1e-12) + xi)
            acc ^= hit
            j = i
        inside ^= acc
    cell = ((hi - lo) / n) ** 2
    return inside.sum() * cell


def _overlay_cases(count=24):
    import random

    rng = random.Random(0x4C49444541)
    cases = []
    for idx in range(count):
        x = rng.randrange(-1024, 1024) / 16
        y = rng.randrange(-1024, 1024) / 16
        w = 1 + rng.randrange(1, 64) / 16
        h = 1 + rng.randrange(1, 64) / 16
        a = _rect(x, y, w, h)
        mode = idx % 6
        if mode == 0:       # disjoint
            b = _rect(x + w + 1.0, y, w, h)
        elif mode == 1:     # identical
            b = _rect(x, y, w, h)
        elif mode == 2:     # overlap
            b = _rect(x + w / 2, y + h / 2, w, h)
        elif mode == 3:     # contained
            b = _rect(x + w / 4, y + h / 4, w / 2, h / 2)
        elif mode == 4:     # edge-touching
            b = _rect(x + w, y, w, h)
        else:               # corner-touching
            b = _rect(x + w, y + h, w, h)
        cases.append((idx, a, b))
    return cases


@pytest.mark.parametrize("idx,a,b", _overlay_cases())
def test_overlay_inclusion_exclusion(idx, a, b):
    """area(A) + area(B) == area(A|B) + area(A&B) (exact arithmetic)."""
    from forge3d_tpu.geometry.overlay import boolean_overlay

    uni = boolean_overlay([a], [b], "union")
    inter = boolean_overlay([a], [b], "intersection")
    area_u = _even_odd_area(uni)
    area_i = _even_odd_area(inter)
    area_a = _ring_area(a)
    area_b = _ring_area(b)
    tol = 4 * (400.0 / 400) ** 2 * 8    # raster-reference tolerance
    assert abs((area_a + area_b) - (area_u + area_i)) < tol, \
        f"case {idx}: inclusion-exclusion violated"


@pytest.mark.parametrize("idx,a,b", _overlay_cases(12))
def test_overlay_difference_partition(idx, a, b):
    """area(A-B) + area(A&B) == area(A)."""
    from forge3d_tpu.geometry.overlay import boolean_overlay

    diff = boolean_overlay([a], [b], "difference")
    inter = boolean_overlay([a], [b], "intersection")
    lhs = _even_odd_area(diff) + _even_odd_area(inter)
    assert abs(lhs - _ring_area(a)) < 8.5, f"case {idx}"


@pytest.mark.parametrize("idx,a,b", _overlay_cases(8))
def test_overlay_translation_invariance(idx, a, b):
    """Translating both inputs translates the overlay (same areas)."""
    from forge3d_tpu.geometry.overlay import boolean_overlay

    dx, dy = 13.25, -7.5
    a2 = [[x + dx, y + dy] for x, y in a]
    b2 = [[x + dx, y + dy] for x, y in b]
    u1 = _even_odd_area(boolean_overlay([a], [b], "union"))
    u2 = _even_odd_area(boolean_overlay([a2], [b2], "union"),
                        lo=-200 + min(dx, dy), hi=200 + max(dx, dy))
    assert abs(u1 - u2) < 8.5, f"case {idx}"


# ---------------------------------------------------------------------------
# F3DZ codec fuzz: roundtrip bound + fail-closed corruption
# ---------------------------------------------------------------------------

_F3DZ_SEEDS = list(range(10))


@pytest.mark.parametrize("seed", _F3DZ_SEEDS)
def test_f3dz_roundtrip_error_bound_fuzz(seed):
    from forge3d_tpu.codec.f3dz import compress_dem, decompress_dem

    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(16, 96))
    kind = seed % 4
    if kind == 0:
        hm = rng.uniform(-500, 4000, (n, n)).astype(np.float32)
    elif kind == 1:
        y, x = np.mgrid[0:n, 0:n].astype(np.float32)
        hm = (100 * np.sin(x * 0.2) + 60 * np.cos(y * 0.31)).astype(
            np.float32)
    elif kind == 2:
        hm = np.zeros((n, n), np.float32)
        hm[n // 2:, :] = 2000.0
    else:
        hm = np.full((n, n), float(rng.uniform(-100, 100)), np.float32)
    max_err = float(rng.choice([0.01, 0.1, 1.0]))
    blob = compress_dem(hm, max_error=max_err)
    out = decompress_dem(blob)
    assert out.shape == hm.shape
    assert float(np.abs(out - hm).max()) <= max_err + 1e-5


@pytest.mark.parametrize("flip_at", [45, 80, 150, 300])
def test_f3dz_corruption_fail_closed_fuzz(flip_at):
    from forge3d_tpu.codec.f3dz import F3dzError, compress_dem, \
        decompress_dem

    y, x = np.mgrid[0:48, 0:48].astype(np.float32)
    hm = (50 * np.sin(x * 0.2) * np.cos(y * 0.13)).astype(np.float32)
    blob = bytearray(compress_dem(hm, max_error=0.1))
    if flip_at >= len(blob):
        pytest.skip("stream shorter than flip offset")
    blob[flip_at] ^= 0x5A
    with pytest.raises(F3dzError):
        decompress_dem(bytes(blob))


# ---------------------------------------------------------------------------
# CRS transform fuzz: forward/inverse roundtrips
# ---------------------------------------------------------------------------

_CRS_CASES = [
    ("EPSG:3857", (-179.0, 179.0), (-84.0, 84.0)),
    ("EPSG:32610", (-126.0, -120.0), (0.5, 83.0)),
    ("EPSG:32733", (12.0, 18.0), (-79.0, -0.5)),
]


@pytest.mark.parametrize("crs,lon_rng,lat_rng", _CRS_CASES)
@pytest.mark.parametrize("seed", range(4))
def test_crs_roundtrip_fuzz(crs, lon_rng, lat_rng, seed):
    from forge3d_tpu.geo.crs import create_crs_transformer

    rng = np.random.default_rng(7000 + seed)
    lon = rng.uniform(*lon_rng, 50)
    lat = rng.uniform(*lat_rng, 50)
    fwd = create_crs_transformer("EPSG:4326", crs)
    inv = create_crs_transformer(crs, "EPSG:4326")
    x, y = fwd.transform(lon, lat)
    lon2, lat2 = inv.transform(x, y)
    assert np.abs(np.asarray(lon2) - lon).max() < 1e-6
    assert np.abs(np.asarray(lat2) - lat).max() < 1e-6


# ---------------------------------------------------------------------------
# text shaping fuzz: arbitrary unicode never crashes, raster bounded
# ---------------------------------------------------------------------------

_SHAPE_SAMPLES = [
    "",
    " ",
    "a",
    "Hello, World!",
    "مرحبا بالعالم",
    "שלום עולם",
    "mixed مرحبا and עולם 42",
    "«quoted» (brackets) [mixed م]",
    "‌ZWNJ‌",
    "emoji \U0001F600 fallback",
    "line\nbreak",
    "ÅÉÎÕÜ çñß",
    "12,345.67",
    "م" * 40,
]


@pytest.mark.parametrize("idx", range(len(_SHAPE_SAMPLES)))
def test_shape_fuzz_never_crashes(idx):
    from forge3d_tpu.labels.font import rasterize_shaped_run, shape

    text = _SHAPE_SAMPLES[idx]
    s = shape(text, None, 14.0)
    assert s.width >= 0.0
    mask = rasterize_shaped_run(s, 80, 24, origin=(2.0, 18.0))
    assert mask.shape == (24, 80)
    assert 0.0 <= float(mask.min()) and float(mask.max()) <= 1.0


@pytest.mark.parametrize("seed", range(6))
def test_bidi_levels_fuzz_invariants(seed):
    """Levels are non-negative; visual_order is a permutation."""
    import random

    from forge3d_tpu.labels.bidi import resolve_levels, visual_order

    pool = "abc ابج 123 .,() עב ‌"
    rng = random.Random(400 + seed)
    text = "".join(rng.choice(pool) for _ in range(rng.randrange(1, 40)))
    lv = resolve_levels(text)
    assert len(lv) == len(text) and min(lv) >= 0
    order = visual_order(text)
    assert sorted(order) == list(range(len(text)))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
