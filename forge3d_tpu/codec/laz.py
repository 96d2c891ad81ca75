# forge3d_tpu/codec/laz.py
# Python surface for the native compressed-LAS point codec (ctypes over
# native/laz.cpp).
#
# Parity notes (reference behavior, not code): the reference decodes LAZ
# natively via the las/laz crates (Cargo.toml:91-93, src/pointcloud/).
# This codec follows the LASzip architecture (adaptive arithmetic coding,
# predictive integer compression, POINT10/GPSTIME/RGB item predictors,
# pointwise chunking) as an independent implementation. Interop policy
# (fail-closed): files written here declare custom item versions
# (0x8000 | item version) in the LAZ VLR so genuine LASzip decoders refuse
# them, and this decoder refuses genuine LASzip item versions — there is
# no LASzip validation fixture in this environment, and silently
# misdecoding a real .laz would violate the fail-closed policy. Round-trip
# plus bounds checks are tested in tests/test_laz.py.

from __future__ import annotations

import ctypes
import struct
from pathlib import Path
from typing import Optional

import numpy as np

from ..errors import RenderError
from ._build import build_native

__all__ = ["compress_point_records", "decompress_point_records",
           "LazCodecError", "LAZ_VLR_USER_ID", "LAZ_VLR_RECORD_ID",
           "build_laz_vlr_payload", "parse_laz_vlr_payload"]

LAZ_VLR_USER_ID = b"laszip encoded\x00\x00"
LAZ_VLR_RECORD_ID = 22204

# LASzip item type ids (spec); sizes for formats 0-3
_ITEM_POINT10 = 6
_ITEM_GPSTIME11 = 7
_ITEM_RGB12 = 8
_ITEM_SIZES = {_ITEM_POINT10: 20, _ITEM_GPSTIME11: 8, _ITEM_RGB12: 6}
# custom version flag: independent entropy layer, not bit-compatible with
# genuine LASzip item version 2 (see module docstring)
_OUR_VERSION = 0x8002

_FMT_ITEMS = {
    0: (_ITEM_POINT10,),
    1: (_ITEM_POINT10, _ITEM_GPSTIME11),
    2: (_ITEM_POINT10, _ITEM_RGB12),
    3: (_ITEM_POINT10, _ITEM_GPSTIME11, _ITEM_RGB12),
}


class LazCodecError(RenderError):
    """Compressed-LAS codec failure (corrupt stream, foreign versions)."""


_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        path = build_native("f3dlaz", Path(__file__).parent / "native" / "laz.cpp")
        lib = ctypes.CDLL(str(path))
        lib.f3dlaz_compress.restype = ctypes.c_longlong
        lib.f3dlaz_compress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint32, ctypes.c_uint8,
            ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_longlong]
        lib.f3dlaz_decompress.restype = ctypes.c_longlong
        lib.f3dlaz_decompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.c_uint32, ctypes.c_uint8, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    return _lib


def compress_point_records(records: bytes | np.ndarray, n_points: int,
                           point_format: int,
                           chunk_size: int = 50000) -> bytes:
    """Compress raw LAS point records (formats 0-3) into a chunked stream."""
    if point_format not in _FMT_ITEMS:
        raise LazCodecError(f"point format {point_format} not supported "
                            "(formats 0-3)")
    rec = np.frombuffer(bytes(records), np.uint8).copy()
    rsize = sum(_ITEM_SIZES[i] for i in _FMT_ITEMS[point_format])
    if rec.size != n_points * rsize:
        raise LazCodecError(
            f"records size {rec.size} != {n_points} x {rsize}")
    lib = _load()
    cap = rec.size + 4096 + 8 * (n_points // chunk_size + 2)
    out = np.empty(cap, np.uint8)
    n = lib.f3dlaz_compress(
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_points,
        point_format, chunk_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        cap = -n
        out = np.empty(cap, np.uint8)
        n = lib.f3dlaz_compress(
            rec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_points,
            point_format, chunk_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n <= 0:
        raise LazCodecError("compression failed")
    return out[:n].tobytes()


def decompress_point_records(stream: bytes, n_points: int,
                             point_format: int,
                             chunk_size: int = 50000) -> bytes:
    """Decompress a chunked point stream back to raw LAS records.
    Fails closed on any structural inconsistency."""
    if point_format not in _FMT_ITEMS:
        raise LazCodecError(f"point format {point_format} not supported")
    rsize = sum(_ITEM_SIZES[i] for i in _FMT_ITEMS[point_format])
    lib = _load()
    src = np.frombuffer(stream, np.uint8).copy()
    out = np.empty(n_points * rsize, np.uint8)
    n = lib.f3dlaz_decompress(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src.size,
        n_points, point_format, chunk_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if n != n_points:
        raise LazCodecError(
            "compressed point stream is corrupt or not in this codec's "
            "format (genuine LASzip streams are refused, fail-closed)")
    return out.tobytes()


def build_laz_vlr_payload(point_format: int, chunk_size: int = 50000) -> bytes:
    """LAZ VLR payload (laszip spec layout) describing this codec's stream:
    compressor 2 (pointwise chunked), items with custom versions."""
    items = _FMT_ITEMS[point_format]
    head = struct.pack(
        "<HBBHHIIQQ",
        2,                  # compressor: pointwise chunked
        3, 0,               # coder/version major (3 = custom namespace)
        1,                  # version minor
        0,                  # version revision
        0,                  # options
        chunk_size,
        0, 0,               # evlr count/offset (unused)
    )
    body = struct.pack("<H", len(items))
    for it in items:
        body += struct.pack("<HHH", it, _ITEM_SIZES[it], _OUR_VERSION)
    return head + body


def parse_laz_vlr_payload(payload: bytes) -> dict:
    """Parse a LAZ VLR payload; validates that the stream was written by
    this codec (custom item versions) and fails closed otherwise."""
    hsize = struct.calcsize("<HBBHHIIQQ")
    if len(payload) < hsize + 2:
        raise LazCodecError("LAZ VLR payload too short")
    (compressor, _cmaj, _cmin, _vminor, _vrev, _opts, chunk_size,
     _ec, _eo) = struct.unpack("<HBBHHIIQQ", payload[:hsize])
    (n_items,) = struct.unpack("<H", payload[hsize:hsize + 2])
    items = []
    off = hsize + 2
    foreign = False
    for _ in range(n_items):
        it, size, ver = struct.unpack("<HHH", payload[off:off + 6])
        off += 6
        items.append({"type": it, "size": size, "version": ver})
        if ver != _OUR_VERSION:
            foreign = True
    if compressor not in (1, 2, 3):
        raise LazCodecError(f"unknown LAZ compressor {compressor}")
    return {"compressor": compressor, "chunk_size": chunk_size,
            "items": items, "foreign": foreign}
