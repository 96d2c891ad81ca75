# Seeded round-trip fuzz for the IO seams: PNG8/16, EXR (none/zips),
# Radiance HDR, and the mesh formats (OBJ/PLY/STL/glTF/GLB). The
# reference exercises these through per-format torture suites
# (tests/test_png_formats.py, test_exr_io.py, test_mesh_io.py); this
# suite mirrors that strategy as seeded property tests: arbitrary
# shapes/values must survive a write/read cycle bit-exactly (integer
# formats) or to float tolerance (HDR shared-exponent).

import numpy as np
import pytest

from forge3d_tpu.io.png import decode_png, encode_png, read_png, write_png
from forge3d_tpu.io.formats import numpy_to_exr, exr_to_numpy, \
    write_hdr, read_hdr
from forge3d_tpu.io.mesh import MeshData, load_mesh, save_mesh

SEEDS = range(8)


def _rand_img(rng, dtype, channels):
    h = int(rng.integers(1, 40))
    w = int(rng.integers(1, 40))
    if dtype == np.uint8:
        img = rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
    else:
        img = rng.integers(0, 65536, (h, w, channels), dtype=np.uint16)
    return img


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_png_roundtrip_bits(seed, channels, dtype, tmp_path):
    rng = np.random.default_rng(seed * 31 + channels)
    img = _rand_img(rng, dtype, channels)
    got = decode_png(encode_png(img))
    assert got.dtype == img.dtype
    assert np.array_equal(got.reshape(img.shape), img)
    p = tmp_path / "x.png"
    write_png(p, img)
    assert np.array_equal(read_png(p).reshape(img.shape), img)


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("compression", ["none", "zips"])
def test_exr_roundtrip_float(seed, compression, tmp_path):
    rng = np.random.default_rng(100 + seed)
    h = int(rng.integers(1, 33))
    w = int(rng.integers(1, 33))
    c = int(rng.integers(1, 5))
    arr = (rng.standard_normal((h, w, c))
           * 10.0 ** float(rng.integers(-3, 4))).astype(np.float32)
    p = tmp_path / "x.exr"
    numpy_to_exr(p, arr, compression=compression)
    got, _names = exr_to_numpy(p)
    assert np.array_equal(np.asarray(got).reshape(arr.shape), arr)


@pytest.mark.parametrize("seed", SEEDS)
def test_hdr_roundtrip_rgbe_tolerance(seed, tmp_path):
    rng = np.random.default_rng(200 + seed)
    h = int(rng.integers(2, 24))
    w = int(rng.integers(2, 24))
    rgb = (rng.uniform(0, 1, (h, w, 3)) ** 2 * 100).astype(np.float32)
    p = tmp_path / "x.hdr"
    write_hdr(p, rgb)
    got = read_hdr(p)
    # shared-exponent format: ~1% relative tolerance
    denom = np.maximum(rgb.max(axis=-1, keepdims=True), 1e-6)
    assert (np.abs(got - rgb) / denom).max() < 0.01


def _rand_mesh(rng, with_normals=False, with_uvs=False):
    n = int(rng.integers(4, 40))
    verts = rng.standard_normal((n, 3)).astype(np.float32)
    m = int(rng.integers(1, 40))
    # distinct corners: degenerate triangles may legitimately be dropped
    # by soup formats
    idx = np.stack([rng.choice(n, 3, replace=False)
                    for _ in range(m)]).astype(np.uint32)
    normals = None
    uvs = None
    if with_normals:
        nr = rng.standard_normal((n, 3)).astype(np.float32)
        normals = nr / np.maximum(
            np.linalg.norm(nr, axis=1, keepdims=True), 1e-6)
    if with_uvs:
        uvs = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    return MeshData(vertices=verts, indices=idx, normals=normals, uvs=uvs)


def _soup(verts, idx):
    """Canonical triangle soup: loaders may drop unreferenced vertices
    and rebuild index buffers, so only the triangle SET is format-stable."""
    tris = np.asarray(verts, np.float32)[
        np.asarray(idx, np.uint32).reshape(-1)].reshape(-1, 9)
    return np.sort(np.round(tris, 4), axis=0)


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("ext", ["obj", "ply", "stl"])
def test_mesh_roundtrip_triangle_soup(seed, ext, tmp_path):
    rng = np.random.default_rng(300 + seed)
    mesh = _rand_mesh(rng, with_normals=(seed % 2 == 0),
                      with_uvs=(seed % 3 == 0))
    p = tmp_path / f"m.{ext}"
    save_mesh(p, mesh)
    got = load_mesh(p)
    tri_in = _soup(mesh.vertices, mesh.indices)
    tri_out = _soup(got.vertices, got.indices)
    assert tri_in.shape == tri_out.shape
    assert np.allclose(tri_in, tri_out, atol=1e-3)


@pytest.mark.parametrize("bad", [
    b"", b"\x89PNG\r\n\x1a\n", b"not a png at all",
    b"\x89PNG\r\n\x1a\n" + b"\x00" * 20])
def test_png_corrupt_inputs_fail_closed(bad):
    with pytest.raises(Exception):
        decode_png(bad)


def test_exr_unsupported_compression_fails_closed(tmp_path):
    with pytest.raises(Exception):
        numpy_to_exr(tmp_path / "x.exr",
                     np.zeros((4, 4), np.float32), compression="piz")
