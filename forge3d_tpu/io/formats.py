# forge3d_tpu/io/formats.py
# HDR image formats: OpenEXR (uncompressed FLOAT scanlines), Radiance HDR
# (RGBE), KTX2 container read.
#
# Parity notes (reference behavior, not code): /root/reference/src/formats/
# + src/util/exr_write.rs + src/loaders/ (KTX2) expose EXR read/write for
# HDR AOVs, Radiance .hdr, and KTX2 texture loading; Python seam
# `numpy_to_exr`. Implemented from the public format specs; EXR is written
# uncompressed (compression=NO_COMPRESSION) single-part scanline, FLOAT or
# HALF, which every EXR reader accepts.

from __future__ import annotations

import struct
import zlib
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from ..errors import RenderError

__all__ = ["numpy_to_exr", "exr_to_numpy", "write_hdr", "read_hdr",
           "read_ktx2", "FormatError"]


class FormatError(RenderError):
    pass


# ---------------------------------------------------------------------------
# OpenEXR (single-part scanline, uncompressed)

_EXR_MAGIC = 0x01312F76
_PIX_FLOAT = 2
_PIX_HALF = 1


def _exr_attr(name: str, atype: str, data: bytes) -> bytes:
    return (name.encode() + b"\0" + atype.encode() + b"\0"
            + struct.pack("<I", len(data)) + data)


def _exr_zip_compress(raw: bytes) -> bytes:
    """OpenEXR ZIP pre-filter + deflate: split bytes into two interleaved
    planes, delta-encode (+384 bias), then zlib (ImfZip semantics)."""
    import zlib

    b = np.frombuffer(raw, np.uint8)
    n = len(b)
    half = (n + 1) // 2
    t = np.empty(n, np.uint8)
    t[:half] = b[0::2]
    t[half:] = b[1::2]
    d = t.astype(np.int16)
    d[1:] = (d[1:] - t[:-1].astype(np.int16) + 384) & 0xFF
    return zlib.compress(d.astype(np.uint8).tobytes())


def _exr_zip_decompress(blob: bytes, n: int) -> bytes:
    import zlib

    t = np.frombuffer(zlib.decompress(blob), np.uint8).copy()
    if len(t) != n:
        raise FormatError("EXR zip block size mismatch")
    # undo delta (prefix reconstruction), then un-interleave
    d = t.astype(np.int64)
    d[1:] -= 384
    t = (np.cumsum(d) & 0xFF).astype(np.uint8)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def numpy_to_exr(path, array: np.ndarray, *, half: bool = False,
                 channel_names: Optional[Tuple[str, ...]] = None,
                 compression: str = "none") -> None:
    """Write (H, W) or (H, W, C<=4) float data as an EXR
    (reference seam: numpy_to_exr). compression: "none" | "zips"
    (per-scanline deflate with the OpenEXR ZIP pre-filter)."""
    a = np.asarray(array)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] > 4:
        raise FormatError("expected (H, W) or (H, W, C<=4)")
    H, W, C = a.shape
    names = list(channel_names or (["Y"] if C == 1
                                   else ["R", "G", "B", "A"][:C]))
    if len(names) != C:
        raise FormatError("channel_names length mismatch")
    dtype = np.float16 if half else np.float32
    ptype = _PIX_HALF if half else _PIX_FLOAT
    data = a.astype(dtype)

    # channels appear alphabetically in EXR
    order = sorted(range(C), key=lambda i: names[i])
    chan_list = b""
    for i in order:
        chan_list += (names[i].encode() + b"\0"
                      + struct.pack("<iBBBBii", ptype, 0, 0, 0, 0, 1, 1))
    chan_list += b"\0"

    comp = {"none": 0, "zips": 2}.get(str(compression).lower())
    if comp is None:
        raise FormatError(f"unsupported EXR compression: {compression}")
    header = b""
    header += _exr_attr("channels", "chlist", chan_list)
    header += _exr_attr("compression", "compression", bytes([comp]))
    box = struct.pack("<4i", 0, 0, W - 1, H - 1)
    header += _exr_attr("dataWindow", "box2i", box)
    header += _exr_attr("displayWindow", "box2i", box)
    header += _exr_attr("lineOrder", "lineOrder", b"\x00")
    header += _exr_attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _exr_attr("screenWindowCenter", "v2f",
                        struct.pack("<2f", 0, 0))
    header += _exr_attr("screenWindowWidth", "float",
                        struct.pack("<f", 1.0))
    header += b"\0"

    psize = np.dtype(dtype).itemsize
    scan_bytes = W * C * psize
    blocks = []
    for y in range(H):
        raw = b"".join(np.ascontiguousarray(
            data[y, :, i]).astype(dtype).tobytes() for i in order)
        if comp == 2:
            z = _exr_zip_compress(raw)
            # the EXR contract: store raw when compression doesn't shrink
            blocks.append(z if len(z) < len(raw) else raw)
        else:
            blocks.append(raw)
    offset_table_pos = 8 + len(header)
    data_start = offset_table_pos + 8 * H
    offsets = []
    pos = data_start
    for blk in blocks:
        offsets.append(pos)
        pos += 8 + len(blk)

    with open(path, "wb") as fh:
        fh.write(struct.pack("<I", _EXR_MAGIC))
        fh.write(struct.pack("<I", 2))          # version 2, no flags
        fh.write(header)
        for off in offsets:
            fh.write(struct.pack("<Q", off))
        for y, blk in enumerate(blocks):
            fh.write(struct.pack("<iI", y, len(blk)))
            fh.write(blk)


def exr_to_numpy(path) -> Tuple[np.ndarray, Tuple[str, ...]]:
    """Read a single-part uncompressed scanline EXR written by
    numpy_to_exr (or any writer using NO_COMPRESSION FLOAT/HALF)."""
    raw = Path(path).read_bytes()
    if struct.unpack_from("<I", raw, 0)[0] != _EXR_MAGIC:
        raise FormatError("not an EXR file")
    pos = 8
    channels = []
    compression = 0
    dw = None
    while True:
        end = raw.index(b"\0", pos)
        name = raw[pos:end].decode()
        pos = end + 1
        if name == "":
            break
        end = raw.index(b"\0", pos)
        atype = raw[pos:end].decode()
        pos = end + 1
        (alen,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        aval = raw[pos:pos + alen]
        pos += alen
        if name == "channels":
            cpos = 0
            while aval[cpos] != 0:
                cend = aval.index(b"\0", cpos)
                cname = aval[cpos:cend].decode()
                cpos = cend + 1
                ptype = struct.unpack_from("<i", aval, cpos)[0]
                cpos += 16
                channels.append((cname, ptype))
        elif name == "compression":
            compression = aval[0]
        elif name == "dataWindow":
            dw = struct.unpack("<4i", aval)
    if compression not in (0, 2, 3):
        raise FormatError(
            "only NONE/ZIPS/ZIP EXR compression supported")
    if dw is None or not channels:
        raise FormatError("EXR missing dataWindow/channels")
    W = dw[2] - dw[0] + 1
    H = dw[3] - dw[1] + 1
    lines_per_block = {0: 1, 2: 1, 3: 16}[compression]
    n_blocks = (H + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{n_blocks}Q", raw, pos)
    out = np.empty((H, len(channels), W), np.float32)
    psizes = [np.dtype(np.float16 if pt == _PIX_HALF
                       else np.float32).itemsize for _, pt in channels]
    scan_bytes = W * sum(psizes)
    for off in offsets:
        y0, nbytes = struct.unpack_from("<iI", raw, off)
        blk = raw[off + 8:off + 8 + nbytes]
        n_lines = min(lines_per_block, dw[3] - y0 + 1)
        want = scan_bytes * n_lines
        if compression and nbytes < want:
            blk = _exr_zip_decompress(blk, want)
        for li in range(n_lines):
            p = li * scan_bytes
            for ci, (cname, ptype) in enumerate(channels):
                dt = np.float16 if ptype == _PIX_HALF else np.float32
                n = W * np.dtype(dt).itemsize
                out[y0 - dw[1] + li, ci] = np.frombuffer(
                    blk[p:p + n], dt).astype(np.float32)
                p += n
    names = tuple(c[0] for c in channels)
    img = np.transpose(out, (0, 2, 1))
    # reorder alphabetical -> RGBA when applicable
    want = [n for n in ("R", "G", "B", "A", "Y") if n in names]
    if len(want) == len(names):
        idx = [names.index(n) for n in want]
        img = img[..., idx]
        names = tuple(want)
    return (img[..., 0] if img.shape[2] == 1 else img), names


# ---------------------------------------------------------------------------
# Radiance HDR (RGBE, RLE scanlines)


def write_hdr(path, rgb: np.ndarray) -> None:
    """Write (H, W, 3) float RGB as Radiance .hdr (flat scanlines)."""
    a = np.asarray(rgb, np.float64)
    if a.ndim != 3 or a.shape[2] != 3:
        raise FormatError("expected (H, W, 3)")
    H, W, _ = a.shape
    maxc = a.max(-1)
    with np.errstate(divide="ignore"):
        e = np.where(maxc > 1e-32, np.floor(np.log2(maxc)) + 1, 0)
    scale = np.where(maxc > 1e-32, 2.0 ** (8 - e) , 0.0)
    rgbe = np.zeros((H, W, 4), np.uint8)
    rgbe[..., :3] = np.clip(a * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(f"-Y {H} +X {W}\n".encode())
        fh.write(rgbe.tobytes())


def read_hdr(path) -> np.ndarray:
    raw = Path(path).read_bytes()
    if not raw.startswith(b"#?"):
        raise FormatError("not a Radiance HDR file")
    pos = raw.index(b"\n\n") + 2
    dim_end = raw.index(b"\n", pos)
    dims = raw[pos:dim_end].decode().split()
    if dims[0] != "-Y" or dims[2] != "+X":
        raise FormatError(f"unsupported HDR orientation {dims}")
    H, W = int(dims[1]), int(dims[3])
    pos = dim_end + 1
    rgbe = np.empty((H, W, 4), np.uint8)
    for y in range(H):
        # adaptive RLE scanline?
        if (pos + 4 <= len(raw) and raw[pos] == 2 and raw[pos + 1] == 2
                and (raw[pos + 2] << 8 | raw[pos + 3]) == W):
            pos += 4
            for c in range(4):
                x = 0
                while x < W:
                    count = raw[pos]
                    pos += 1
                    if count > 128:       # run
                        rgbe[y, x:x + count - 128, c] = raw[pos]
                        pos += 1
                        x += count - 128
                    else:                 # literal
                        rgbe[y, x:x + count, c] = np.frombuffer(
                            raw[pos:pos + count], np.uint8)
                        pos += count
                        x += count
        else:
            row = np.frombuffer(raw[pos:pos + W * 4], np.uint8).reshape(W, 4)
            rgbe[y] = row
            pos += W * 4
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, 2.0 ** (e - 128 - 8), 0.0)
    return (rgbe[..., :3].astype(np.float64) * scale[..., None]
            ).astype(np.float32)


# ---------------------------------------------------------------------------
# KTX2 (read header + level data; no supercompression)

_KTX2_ID = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x32, 0x30, 0xBB,
                  0x0D, 0x0A, 0x1A, 0x0A])

_VK_FORMATS = {
    37: ("R8G8B8A8_UNORM", 4, np.uint8),
    43: ("R8G8B8A8_SRGB", 4, np.uint8),
    23: ("R8G8B8_UNORM", 3, np.uint8),
    109: ("R32G32B32A32_SFLOAT", 16, np.float32),
    100: ("R32_SFLOAT", 4, np.float32),
    16: ("R8G8_UNORM", 2, np.uint8),
    9: ("R8_UNORM", 1, np.uint8),
}


def read_ktx2(path) -> dict:
    """Parse a KTX2 container: header, per-level data, decoded numpy for
    known uncompressed formats. Supercompression: none (0) and zstd (2,
    KHR spec 3.12.2) are supported; BasisLZ (1) fails closed with a
    typed FormatError (reference KTX2 loader: src/loaders/)."""
    raw = Path(path).read_bytes()
    if raw[:12] != _KTX2_ID:
        raise FormatError("not a KTX2 file")
    (vk_format, type_size, w, h, depth, layers, faces, levels,
     scheme) = struct.unpack_from("<9I", raw, 12)
    if scheme not in (0, 2):
        raise FormatError(f"supercompression scheme {scheme} unsupported")
    if scheme == 2:
        try:
            import zstandard
        except ImportError as exc:           # pragma: no cover - env gate
            raise FormatError(
                "KTX2 zstd supercompression needs the zstandard module"
            ) from exc
        _zdec = zstandard.ZstdDecompressor()
    # level index starts at byte 80
    level_index = []
    for i in range(max(levels, 1)):
        off, length, ulength = struct.unpack_from("<3Q", raw, 80 + i * 24)
        level_index.append((off, length, ulength))
    out = {"vk_format": vk_format, "width": w, "height": h,
           "levels": max(levels, 1), "faces": max(faces, 1),
           "layers": max(layers, 1), "level_data": [], "images": []}
    fmt = _VK_FORMATS.get(vk_format)
    for li, (off, length, ulength) in enumerate(level_index):
        data = raw[off:off + length]
        if scheme == 2:
            data = _zdec.decompress(data, max_output_size=max(ulength, 1))
            if ulength and len(data) != ulength:
                raise FormatError(
                    f"KTX2 level {li}: zstd inflate size {len(data)} != "
                    f"indexed {ulength}")
        out["level_data"].append(data)
        if fmt is not None:
            name, bpp, dt = fmt
            lw = max(w >> li, 1)
            lh = max(h >> li, 1)
            ch = bpp // np.dtype(dt).itemsize
            expect = lw * lh * bpp
            if len(data) >= expect:
                arr = np.frombuffer(data[:expect], dt)
                out["images"].append(
                    arr.reshape(lh, lw, ch) if ch > 1 else arr.reshape(lh, lw))
    return out


# ---------------------------------------------------------------------------
# External image import (JPEG/PNG/...): the reference imports external
# imagery through the image crate (/root/reference/src/external_image/).
# Here decode rides on the environment's Pillow when present; absent
# Pillow the import FAILS CLOSED (no silent placeholder pixels).
# ---------------------------------------------------------------------------


def read_image(path) -> np.ndarray:
    """Decode an external image (JPEG, PNG, BMP, ...) to RGBA u8.

    PNG decodes through the first-party reader; other formats require
    Pillow and raise ImportError otherwise (fail-closed, mirroring the
    reference's typed import errors).
    """
    p = str(path)
    with open(p, "rb") as fh:
        magic = fh.read(8)
    if magic.startswith(b"\x89PNG"):
        from .png import read_png

        img = read_png(p)
    else:
        try:
            from PIL import Image
        except Exception as exc:  # pragma: no cover - env without Pillow
            raise ImportError(
                "non-PNG external images require Pillow for decode; "
                f"cannot import {p!r}"
            ) from exc
        img = np.asarray(Image.open(p).convert("RGBA"), np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3 + [np.full_like(img, 255)], axis=-1)
    if img.shape[-1] == 3:
        img = np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, img.dtype)], axis=-1)
    return np.ascontiguousarray(img[..., :4])


def write_jpeg(path, rgb: np.ndarray, quality: int = 90) -> None:
    """Encode RGB u8 to JPEG via Pillow (fail-closed without it)."""
    try:
        from PIL import Image
    except Exception as exc:  # pragma: no cover
        raise ImportError("JPEG encode requires Pillow") from exc
    arr = np.asarray(rgb)
    if arr.dtype != np.uint8:
        arr = np.clip(np.asarray(arr, np.float32) * 255.0 + 0.5,
                      0, 255).astype(np.uint8)
    Image.fromarray(arr[..., :3], "RGB").save(str(path), "JPEG",
                                              quality=int(quality))
