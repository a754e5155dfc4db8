"""Pure-python image codec (functions/imagecodec.py): exact round-trip
oracles for every PNG filter type / color type, hand-built palette PNG
and BMP fixtures, and the ImageDecodeStage real-decode path.

Reference parity: the reference parses real files for its modalities
(src/palimpzest/tools/pdfparser.py:1-226); this is the image-modality
equivalent's correctness gate.
"""

import struct
import zlib

import numpy as np
import pytest
import ray.data as rd

from palimpzest_ray.functions import imagecodec as ic
from palimpzest_ray.stages import multimodal


def _rng(seed=0):
    return np.random.default_rng(seed)


# ------------------------------------------------------------------ PNG


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 3), (7, 5, 4)])
def test_png_roundtrip_all_filters(filter_type, shape):
    img = _rng(filter_type).integers(0, 256, size=shape, dtype=np.uint8)
    blob = ic.encode_png(img, filter_type=filter_type)
    out = ic.decode_png(blob)
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_png_roundtrip_1x1_and_wide():
    for shape in [(1, 1), (1, 64), (64, 1), (2, 300, 3)]:
        img = _rng(9).integers(0, 256, size=shape, dtype=np.uint8)
        np.testing.assert_array_equal(ic.decode_png(ic.encode_png(img, filter_type=4)), img)


def _chunk(ctype, body):
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def test_png_palette_decode():
    # hand-built 2x3 color-type-3 image: indices into a 4-entry palette
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(bytes([0]) + idx[y].tobytes() for y in range(2))
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = ic.decode_png(blob)
    np.testing.assert_array_equal(out, pal[idx])


def test_png_rejects_unsupported():
    img = _rng(1).integers(0, 256, size=(4, 4), dtype=np.uint8)
    blob = bytearray(ic.encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        ic.decode_png(b"notapng" + bytes(blob))
    # flip the interlace byte inside IHDR (offset: 8 magic + 8 hdr + 12)
    adam7 = bytes(blob[:28]) + b"\x01" + bytes(blob[29:])
    with pytest.raises(ValueError, match="Adam7"):
        ic.decode_png(adam7)
    bit16 = bytes(blob[:24]) + b"\x10" + bytes(blob[25:])
    with pytest.raises(ValueError, match="bit depth"):
        ic.decode_png(bit16)


# ------------------------------------------------------------------ BMP


def _bmp(width, height, bpp, rows_bottom_up=True, palette=None, pixels=None):
    """Build a BI_RGB BMP by hand. pixels: (H,W) indices for 8-bit,
    (H,W,3) RGB for 24/32-bit (stored as BGR[A])."""
    row_bytes = (width * bpp // 8 + 3) & ~3
    pal_bytes = b""
    if bpp == 8:
        pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    data_offset = 14 + 40 + len(pal_bytes)
    body = bytearray()
    order = range(height - 1, -1, -1) if rows_bottom_up else range(height)
    for y in order:
        row = bytearray()
        for x in range(width):
            if bpp == 8:
                row.append(pixels[y, x])
            else:
                r, g, b = pixels[y, x]
                row += bytes([b, g, r] + ([0] if bpp == 32 else []))
        row += b"\0" * (row_bytes - len(row))
        body += row
    h_field = height if rows_bottom_up else -height
    hdr = (
        b"BM"
        + struct.pack("<IHHI", data_offset + len(body), 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, width, h_field, 1, bpp, 0, len(body), 0, 0,
                      len(palette) if palette else 0, 0)
    )
    return bytes(hdr) + pal_bytes + bytes(body)


@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp_truecolor(bpp, bottom_up):
    px = _rng(bpp).integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    out = ic.decode_bmp(_bmp(5, 3, bpp, rows_bottom_up=bottom_up, pixels=px))
    np.testing.assert_array_equal(out, px)


def test_bmp_palette():
    pal = [(10, 20, 30), (200, 100, 50), (0, 0, 0), (255, 255, 255)]
    idx = np.array([[0, 1], [2, 3], [1, 0]], dtype=np.uint8)
    out = ic.decode_bmp(_bmp(2, 3, 8, palette=pal, pixels=idx))
    np.testing.assert_array_equal(out, np.array(pal, dtype=np.uint8)[idx])


def test_bmp_rejects_compressed():
    blob = bytearray(_bmp(2, 2, 24, pixels=np.zeros((2, 2, 3), dtype=np.uint8)))
    blob[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        ic.decode_bmp(bytes(blob))


# ----------------------------------------------------------- gray/resize


def test_to_gray_matches_pil_weights():
    img = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [128, 128, 128]]], dtype=np.uint8)
    got = ic.to_gray(img)
    exp = np.array(
        [[(255 * 77) >> 8, (255 * 150) >> 8, (255 * 29) >> 8, (128 * 256) >> 8]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(got, exp)
    # gray passthrough
    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    assert ic.to_gray(g) is g


def test_resize_nearest_exact():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = ic.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    np.testing.assert_array_equal(up[::2, ::2], img)
    down = ic.resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(down, img[[0, 2]][:, [0, 2]])
    rgb = _rng(3).integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert ic.resize_nearest(rgb, 3, 3).shape == (3, 3, 3)


def test_decode_image_sniff():
    img = _rng(5).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(ic.decode_image(ic.encode_png(img)), img)
    with pytest.raises(ValueError, match="unknown image format"):
        ic.decode_image(b"WEBP-not-supported")


# ------------------------------------------------- stage real-decode path


def test_image_decode_stage_real_png(ray_session):
    imgs = [
        _rng(i).integers(0, 256, size=(20 + i, 30 + i, 3), dtype=np.uint8)
        for i in range(4)
    ]
    blobs = [ic.encode_png(im, filter_type=i % 5) for i, im in enumerate(imgs)]
    blobs.append(b"not-an-image-at-all-" * 4)  # falls back to stub features
    ds = rd.from_arrow(
        multimodal.table_from_blobs([f"p{i}.png" for i in range(5)], blobs, "image/png")
    )
    rows = sorted(
        multimodal.decode_images(ds, concurrency=1, feature_dim=16).take_all(),
        key=lambda r: r["media_id"],
    )
    for i in range(4):
        assert rows[i]["width"] == 30 + i and rows[i]["height"] == 20 + i
        # features are the first 16 pixels of the 16x16 nearest-resized luma
        gray = ic.to_gray(imgs[i])
        small = ic.resize_nearest(gray, 16, 16).astype(np.float32).reshape(-1) / 255.0
        np.testing.assert_allclose(rows[i]["image_feat"], small[:16], rtol=1e-6)
    # undecodable row kept the deterministic stub contract
    assert rows[4]["width"] >= 1 and len(rows[4]["image_feat"]) == 16


def test_stage_survives_corrupt_codec_level_payloads(ray_session):
    """Blobs that pass sniffing but die inside the codec (zlib.error,
    struct.error) must fall back per row, never fail the batch."""
    good = ic.encode_png(_rng(0).integers(0, 256, (5, 5), dtype=np.uint8))
    corrupt_deflate = good[:40] + b"\xff\x00garbage" + good[50:]
    truncated = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR\x01"
    ds = rd.from_arrow(
        multimodal.table_from_blobs(
            ["g.png", "c.png", "t.png"], [good, corrupt_deflate, truncated],
            "image/png",
        )
    )
    rows = multimodal.decode_images(ds, concurrency=1, feature_dim=8).take_all()
    assert len(rows) == 3 and all(len(r["image_feat"]) == 8 for r in rows)
