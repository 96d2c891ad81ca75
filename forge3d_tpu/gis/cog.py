# forge3d_tpu/gis/cog.py
# COG range reader: windowed reads of (cloud-optimized) GeoTIFFs over HTTP
# range requests or local files, with a strip/tile cache.
#
# Parity notes (reference behavior, not code): /root/reference/src/gis/
# cog_range.rs (CHANGELOG 1.33.0) streams striped/tiled COGs with
# validated 206 partial-content handling, a block cache, and fallback
# diagnostics; Python seam `read_cog_py`. Here: a RangeSource abstraction
# (file seek / HTTP Range) under the same windowed-read logic as
# gis/geotiff.py; servers that ignore Range (200 responses) are detected
# and handled by full-fetch fallback with a diagnostic.

from __future__ import annotations

import io
import urllib.request
import zlib
from typing import Dict, Optional, Tuple

import numpy as np

from ..errors import RenderError
from .geotiff import _np_dtype

__all__ = ["CogReader", "read_cog", "CogError"]


class CogError(RenderError):
    pass


class _RangeSource:
    """Byte-range reads from a path or URL."""

    def __init__(self, path_or_url: str, *, timeout: float = 30.0):
        self.url = str(path_or_url)
        self.timeout = timeout
        self.is_http = self.url.startswith(("http://", "https://"))
        self.bytes_fetched = 0
        self.requests_made = 0
        self.range_supported: Optional[bool] = None
        self._full: Optional[bytes] = None
        if not self.is_http:
            self._fh = open(self.url, "rb")

    def read(self, offset: int, length: int) -> bytes:
        self.requests_made += 1
        self.bytes_fetched += length
        if not self.is_http:
            self._fh.seek(offset)
            return self._fh.read(length)
        if self._full is not None:
            return self._full[offset:offset + length]
        req = urllib.request.Request(
            self.url, headers={"Range": f"bytes={offset}-{offset + length - 1}"})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            data = resp.read()
            if resp.status == 206:
                self.range_supported = True
                return data
            # server ignored Range: fall back to the full body (diagnostic)
            self.range_supported = False
            self._full = data
            return data[offset:offset + length]

    def close(self):
        if not self.is_http:
            self._fh.close()


class CogReader:
    """Windowed reader over a striped or tiled GeoTIFF, fetching only the
    byte ranges a window needs."""

    def __init__(self, path_or_url: str, *, cache_blocks: int = 256):
        self.src = _RangeSource(path_or_url)
        self._cache: Dict[int, np.ndarray] = {}
        self._cache_cap = cache_blocks
        self._parse_header()

    # ------------------------------------------------------------ tiff parse
    def _parse_header(self):
        head = self.src.read(0, 8)
        if head[:2] not in (b"II", b"MM"):
            raise CogError("not a TIFF stream")
        self.bo = "<" if head[:2] == b"II" else ">"
        import struct

        magic, ifd_off = struct.unpack(self.bo + "HI", head[2:8])
        if magic != 42:
            raise CogError("not a classic TIFF (bigtiff unsupported)")
        # read IFD
        cnt_raw = self.src.read(ifd_off, 2)
        (cnt,) = struct.unpack(self.bo + "H", cnt_raw)
        ifd_raw = self.src.read(ifd_off + 2, cnt * 12 + 4)
        self.tags: Dict[int, tuple] = {}
        type_sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8}
        pending = []
        for i in range(cnt):
            tid, ttype, tcnt = struct.unpack(self.bo + "HHI",
                                             ifd_raw[i * 12: i * 12 + 8])
            size = type_sizes.get(ttype, 1) * tcnt
            inline = ifd_raw[i * 12 + 8: i * 12 + 12]
            if size <= 4:
                self.tags[tid] = (ttype, tcnt, inline[:size])
            else:
                (off,) = struct.unpack(self.bo + "I", inline)
                pending.append((tid, ttype, tcnt, off, size))
        for tid, ttype, tcnt, off, size in pending:
            self.tags[tid] = (ttype, tcnt, self.src.read(off, size))

        self.width = int(self._tag_vals(256)[0])
        self.height = int(self._tag_vals(257)[0])
        self.bits = int(self._tag_vals(258, [8])[0])
        self.compression = int(self._tag_vals(259, [1])[0])
        self.sample_format = int(self._tag_vals(339, [1])[0])
        self.samples = int(self._tag_vals(277, [1])[0])
        self.dtype = np.dtype(_np_dtype(self.bits, self.sample_format))
        self.tiled = 322 in self.tags
        if self.tiled:
            self.block_w = int(self._tag_vals(322)[0])
            self.block_h = int(self._tag_vals(323)[0])
            self.offsets = [int(v) for v in self._tag_vals(324)]
            self.counts = [int(v) for v in self._tag_vals(325)]
        else:
            self.block_w = self.width
            self.block_h = int(self._tag_vals(278, [self.height])[0])
            self.offsets = [int(v) for v in self._tag_vals(273)]
            self.counts = [int(v) for v in self._tag_vals(279)]
        if self.compression not in (1, 8):
            raise CogError(f"unsupported COG compression {self.compression}")

    def _tag_vals(self, tid, default=None):
        import struct

        if tid not in self.tags:
            if default is not None:
                return default
            raise CogError(f"missing TIFF tag {tid}")
        ttype, tcnt, raw = self.tags[tid]
        fmt = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d", 16: "Q"}.get(ttype)
        if fmt is None:
            if ttype == 5:  # rational
                vals = struct.unpack(self.bo + "II" * tcnt, raw)
                return [vals[2 * i] / max(vals[2 * i + 1], 1)
                        for i in range(tcnt)]
            return raw
        return list(struct.unpack(self.bo + fmt * tcnt, raw))

    # -------------------------------------------------------------- blocks
    def _block(self, idx: int) -> np.ndarray:
        blk = self._cache.get(idx)
        if blk is not None:
            return blk
        raw = self.src.read(self.offsets[idx], self.counts[idx])
        if self.compression == 8:
            raw = zlib.decompress(raw)
        if self.tiled:
            shape = (self.block_h, self.block_w, self.samples)
        else:
            rows = min(self.block_h,
                       self.height - (idx * self.block_h))
            shape = (rows, self.width, self.samples)
        expect = shape[0] * shape[1] * shape[2] * self.dtype.itemsize
        if len(raw) < expect:
            raise CogError(
                f"block {idx}: short read ({len(raw)} < {expect}) — "
                "corrupt or truncated COG (fail-closed)")
        arr = np.frombuffer(raw[:expect],
                            self.dtype.newbyteorder(self.bo)).reshape(shape)
        if len(self._cache) >= self._cache_cap:
            self._cache.pop(next(iter(self._cache)))
        self._cache[idx] = arr
        return arr

    def read_window(self, col_off: int, row_off: int,
                    width: int, height: int) -> np.ndarray:
        """Read a (height, width[, C]) window, fetching only needed blocks."""
        if not (0 <= col_off and 0 <= row_off
                and col_off + width <= self.width
                and row_off + height <= self.height):
            raise CogError("window outside raster bounds")
        out = np.empty((height, width, self.samples), self.dtype)
        if self.tiled:
            tiles_across = (self.width + self.block_w - 1) // self.block_w
            ty0 = row_off // self.block_h
            ty1 = (row_off + height - 1) // self.block_h
            tx0 = col_off // self.block_w
            tx1 = (col_off + width - 1) // self.block_w
            for ty in range(ty0, ty1 + 1):
                for tx in range(tx0, tx1 + 1):
                    blk = self._block(ty * tiles_across + tx)
                    by0 = ty * self.block_h
                    bx0 = tx * self.block_w
                    sy0 = max(row_off, by0)
                    sy1 = min(row_off + height, by0 + self.block_h)
                    sx0 = max(col_off, bx0)
                    sx1 = min(col_off + width, bx0 + self.block_w)
                    out[sy0 - row_off: sy1 - row_off,
                        sx0 - col_off: sx1 - col_off] = \
                        blk[sy0 - by0: sy1 - by0, sx0 - bx0: sx1 - bx0]
        else:
            s0 = row_off // self.block_h
            s1 = (row_off + height - 1) // self.block_h
            for s in range(s0, s1 + 1):
                blk = self._block(s)
                by0 = s * self.block_h
                sy0 = max(row_off, by0)
                sy1 = min(row_off + height, by0 + blk.shape[0])
                out[sy0 - row_off: sy1 - row_off] = \
                    blk[sy0 - by0: sy1 - by0, col_off: col_off + width]
        return out[..., 0] if self.samples == 1 else out

    def stats(self) -> dict:
        """Transfer diagnostics (the reference's cache/fallback report)."""
        return {
            "requests": self.src.requests_made,
            "bytes_fetched": self.src.bytes_fetched,
            "range_supported": self.src.range_supported,
            "cached_blocks": len(self._cache),
            "tiled": self.tiled,
            "block_size": (self.block_w, self.block_h),
            "shape": (self.height, self.width),
        }

    def close(self):
        self.src.close()


def read_cog(path_or_url, window: Optional[Tuple[int, int, int, int]] = None
             ) -> np.ndarray:
    """One-shot windowed COG read (reference seam: read_cog_py).
    window = (col_off, row_off, width, height); None = full raster."""
    r = CogReader(path_or_url)
    try:
        if window is None:
            window = (0, 0, r.width, r.height)
        return r.read_window(*window)
    finally:
        r.close()
