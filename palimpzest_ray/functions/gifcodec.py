"""Pure-stdlib animated-GIF codec: decode GIF87a/89a to composited RGB
frames (full LZW, frame composition with keep/background disposal,
transparency), plus a minimal encoder for fixtures.

Sibling of ``imagecodec.py`` / ``audiocodec.py``: gives the VIDEO
modality (frame sampling) a real decode kernel without ffmpeg — an
animated GIF is the one multi-frame container parseable with stdlib
only. ``stages/multimodal.FrameSampleStage`` samples frames from it;
other containers (mp4 etc.) keep the deterministic stub per row.

The encoder cheats legally on LZW: it emits a CLEAR code before every
pixel code, so the dictionary never grows and the code width stays
fixed — bulky output, trivially correct, and it exercises the
decoder's clear-code path on every fixture.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


class _BitReader:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        got = 0
        while got < n:
            if self.pos >= len(self.data):
                raise ValueError("corrupt GIF: LZW stream truncated")
            take = min(n - got, 8 - self.bit)
            out |= ((self.data[self.pos] >> self.bit) & ((1 << take) - 1)) << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    br = _BitReader(data)

    def reset():
        return (
            {i: (i,) for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: tuple | None = None
    while n_out < n_pixels:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt GIF: bad LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = entry[:take]
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("corrupt GIF: LZW ended early")
    return out


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("corrupt GIF: unterminated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(data[pos : pos + n])
        pos += n


_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> list[np.ndarray]:
    """GIF bytes → list of composited (H, W, 3) uint8 RGB frames."""
    if not sniff(data):
        raise ValueError("not a GIF: bad signature")
    W, H = struct.unpack("<HH", data[6:10])
    flags = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    frames: list[np.ndarray] = []
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    transparent: int | None = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphics control
                body, pos = _read_subblocks(data, pos)
                packed = body[0]
                disposal = (packed >> 2) & 0x07
                transparent = body[3] if packed & 1 else None
            else:
                _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("corrupt GIF: truncated image descriptor")
        left, top, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
        iflags = data[pos + 8]
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if lct is None:
            raise ValueError("corrupt GIF: image without any color table")
        min_code = data[pos]
        pos += 1
        stream, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, stream, w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            de = np.empty_like(idx)
            src = 0
            for start, step in _DEINTERLACE_PASSES:
                rows = range(start, h, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de
        before = canvas.copy()
        region = canvas[top : top + h, left : left + w]
        px = lct[np.clip(idx, 0, len(lct) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = px[mask]
        else:
            region[:] = px
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background color (GCT index per spec)
            bg = gct[bg_index] if gct is not None and bg_index < len(gct) else 0
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3:  # restore to previous
            canvas = before
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return frames


def encode_gif(
    frames: list[np.ndarray], palette: np.ndarray, *, delay_cs: int = 4
) -> bytes:
    """Index frames ((H, W) uint8 into ``palette`` (N,3)) → animated
    GIF. Fixture-grade LZW (clear code before every pixel)."""
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = frames[0].shape
    bits = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal_n = 1 << bits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg=0, no aspect
    out += pal.tobytes()
    # netscape loop extension (exercises the skip-extension path)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    clear = 1 << bits
    eoi = clear + 1
    width = bits + 1
    for fr in frames:
        assert fr.shape == (h, w)
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", delay_cs)
        out += b"\x00\x00"  # no transparency; disposal=1 (keep)
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([bits])
        # bit-pack [CLEAR px CLEAR px ... EOI] at fixed code width
        acc = 0
        nbits = 0
        stream = bytearray()

        def emit(code):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        for v in fr.reshape(-1):
            emit(clear)
            emit(int(v))
        emit(eoi)
        if nbits:
            stream.append(acc & 0xFF)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
