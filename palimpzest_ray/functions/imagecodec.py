"""Pure-python image codec: PNG (8-bit gray/RGB/RGBA/palette, all five
scanline filters, non-interlaced) and BMP (BI_RGB 8/24/32-bit) decode,
plus a PNG encoder for fixtures and sinks.

Exists so the multimodal stages (`stages/multimodal.py`) have a REAL
decode kernel in containers without PIL/ffmpeg — stdlib ``zlib`` +
``struct`` + numpy only. Production swaps in PIL via the stage's
``_load_codec`` priority; this module is the dependency-free floor, not
a performance ceiling (PNG filter reconstruction is sequential by
specification — Sub/Avg/Paeth chain along the scanline — so the inner
reconstruction loops by pixel column with numpy column vectors).

Reference parity: the reference ships real file parsing for its
modalities (``src/palimpzest/tools/pdfparser.py:1-226``,
``iter_dataset.py:425-469``); this is the engine's equivalent for the
image modality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff(data: bytes) -> str | None:
    """'png' | 'bmp' | None."""
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    return None


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor on int16 vectors (per the PNG spec's tie order)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. ``raw`` is height*(1+stride)
    bytes; returns (height, stride) uint8."""
    raw = raw.reshape(height, 1 + stride)
    ftypes = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        line = raw[y, 1:].copy()
        f = int(ftypes[y])
        if f == 0:
            pass
        elif f == 1:  # Sub — sequential along x
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif f == 2:  # Up — fully vectorized
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            line[:bpp] = (line[:bpp].astype(np.int16) + (prev[:bpp] >> 1)).astype(
                np.uint8
            )
            for x in range(bpp, stride):
                line[x] = (
                    int(line[x]) + ((int(line[x - bpp]) + int(prev[x])) >> 1)
                ) & 0xFF
        elif f == 4:  # Paeth
            line[:bpp] = (line[:bpp].astype(np.int16) + prev[:bpp]).astype(np.uint8)
            for x in range(bpp, stride):
                pred = _paeth(
                    line[x - bpp : x - bpp + 1],
                    prev[x : x + 1],
                    prev[x - bpp : x - bpp + 1],
                )
                line[x] = (int(line[x]) + int(pred[0])) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = line
        prev = out[y]
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W) or (H, W, C) uint8 array. Supports bit depth
    8, color types 0/2/3/4/6, non-interlaced (Adam7 rejected clearly)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = []
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace != 0:
        raise ValueError("unsupported PNG: Adam7 interlacing")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != height * (1 + stride):
        raise ValueError("corrupt PNG: IDAT size mismatch")
    px = _unfilter(raw, height, stride, bpp=channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        return palette[px.reshape(height, width)]
    if channels == 1:
        return px.reshape(height, width)
    return px.reshape(height, width, channels)


# ---------------------------------------------------------------------------
# PNG encode (filter 0 or a fixed filter for decoder tests)
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """(H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA uint8 → PNG bytes.

    ``filter_type`` applies one filter to every scanline (0 none, 1 sub,
    2 up, 3 average, 4 paeth) — the non-zero types exist to exercise the
    decoder's reconstruction paths from tests."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * channels)
    bpp = channels
    lines = []
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        line = flat[y]
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            left = np.zeros_like(line)
            left[bpp:] = line[:-bpp]
            enc = (line.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:
            enc = (line.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:
            left = np.zeros_like(line)
            left[bpp:] = line[:-bpp]
            avg = (left.astype(np.int16) + prev.astype(np.int16)) >> 1
            enc = (line.astype(np.int16) - avg).astype(np.uint8)
        elif filter_type == 4:
            left = np.zeros_like(line)
            left[bpp:] = line[:-bpp]
            upleft = np.zeros_like(line)
            upleft[bpp:] = prev[:-bpp]
            enc = (line.astype(np.int16) - _paeth(left, prev, upleft)).astype(
                np.uint8
            )
        else:
            raise ValueError(f"bad filter_type {filter_type}")
        lines.append(bytes([filter_type]) + enc.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), level)
    return _PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(
        b"IEND", b""
    )


# ---------------------------------------------------------------------------
# BMP decode (BI_RGB uncompressed)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (H, W) or (H, W, 3) uint8. BI_RGB 8-bit palette,
    24-bit BGR and 32-bit BGRA (alpha dropped); bottom-up or top-down."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (data_offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(
        data, dtype=np.uint8, count=height * row_bytes, offset=data_offset
    ).reshape(height, row_bytes)
    if not top_down:
        px = px[::-1]
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA → RGB
        return pal[px[:, :width]]
    ch = bpp // 8
    img = px[:, : width * ch].reshape(height, width, ch)
    return np.ascontiguousarray(img[:, :, 2::-1])  # BGR(A) → RGB


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode. Raises ValueError for unknown formats."""
    kind = sniff(bytes(data[:8]) if not isinstance(data, bytes) else data)
    if kind == "png":
        return decode_png(data)
    if kind == "bmp":
        return decode_bmp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):  # still image = first frame
        from palimpzest_ray.functions import gifcodec

        return gifcodec.decode_gif(data)[0]
    raise ValueError("unknown image format (supported: PNG, BMP, GIF)")


def to_gray(img: np.ndarray) -> np.ndarray:
    """(H,W[,C]) uint8 → (H,W) uint8 luma (ITU-R BT.601 integer form,
    the same 77/150/29 >> 8 weights PIL's convert('L') uses)."""
    if img.ndim == 2:
        return img
    r, g, b = (img[:, :, i].astype(np.uint32) for i in range(3))
    return ((r * 77 + g * 150 + b * 29) >> 8).astype(np.uint8)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (any HxW → out)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]  # np.ix_ leaves a trailing channel dim intact
