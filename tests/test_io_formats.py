

def test_exr_zips_roundtrip(tmp_path):
    """ZIPS-compressed EXR write/read round-trips exactly (OpenEXR ZIP
    pre-filter: interleave split + delta + deflate)."""
    import numpy as np

    from forge3d_tpu.io.formats import exr_to_numpy, numpy_to_exr

    rng = np.random.default_rng(5)
    img = rng.standard_normal((40, 56, 3)).astype(np.float32)
    # smooth data compresses well through the pre-filter
    img[..., 0] = np.linspace(0, 1, 56)[None, :]
    p = tmp_path / "zips.exr"
    numpy_to_exr(p, img, compression="zips")
    back, names = exr_to_numpy(p)
    assert names == ("R", "G", "B")
    assert np.array_equal(back, img)
    # compressed file is smaller than the uncompressed one for smooth data
    smooth = np.full((40, 256), 0.25, np.float32)
    p1 = tmp_path / "s_none.exr"
    p2 = tmp_path / "s_zips.exr"
    numpy_to_exr(p1, smooth)
    numpy_to_exr(p2, smooth, compression="zips")
    assert p2.stat().st_size < p1.stat().st_size


def test_exr_zips_half_roundtrip(tmp_path):
    import numpy as np

    from forge3d_tpu.io.formats import exr_to_numpy, numpy_to_exr

    img = (np.arange(24 * 32, dtype=np.float32).reshape(24, 32) / 100.0)
    p = tmp_path / "h.exr"
    numpy_to_exr(p, img, half=True, compression="zips")
    back, names = exr_to_numpy(p)
    assert np.array_equal(back, img.astype(np.float16).astype(np.float32))


def test_exr_zip_prefilter_inverse():
    from forge3d_tpu.io.formats import (_exr_zip_compress,
                                        _exr_zip_decompress)

    raw = bytes(range(256)) * 3 + b"\x00\xff" * 11
    assert _exr_zip_decompress(_exr_zip_compress(raw), len(raw)) == raw
