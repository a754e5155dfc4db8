"""Stdlib GIF codec (functions/gifcodec.py): LZW round-trips, frame
composition (disposal, transparency, sub-rectangles, interlace), and
the FrameSampleStage real path."""

import struct

import numpy as np
import pytest
import ray.data as rd

from palimpzest_ray.functions import gifcodec as gc
from palimpzest_ray.stages import multimodal

PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]],
    dtype=np.uint8,
)


def test_gif_roundtrip_frames():
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, len(PAL), (7, 9)).astype(np.uint8) for _ in range(3)]
    got = gc.decode_gif(gc.encode_gif(frames, PAL))
    assert len(got) == 3
    for fr, g in zip(frames, got):
        np.testing.assert_array_equal(g, PAL[fr])


def test_gif_single_frame_and_signature():
    fr = np.array([[1, 2], [3, 0]], dtype=np.uint8)
    got = gc.decode_gif(gc.encode_gif([fr], PAL))
    np.testing.assert_array_equal(got[0], PAL[fr])
    with pytest.raises(ValueError, match="not a GIF"):
        gc.decode_gif(b"PNG-not-gif")
    with pytest.raises(ValueError, match="truncated|sub-blocks|LZW"):
        gc.decode_gif(gc.encode_gif([fr], PAL)[:-10])


def test_gif_real_lzw_stream():
    """Hand-built stream with a GROWING dictionary (the encoder only
    emits cleared streams): pixels [1,1,1,1] with min_code=2 →
    codes CLEAR(4),1,6(='11' from the just-created entry),EOI(5) —
    exercises the code==next_code special case."""
    bits = 2
    codes = [4, 1, 6, 5]
    acc = nbits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += bits + 1
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    out = gc._lzw_decode(bits, bytes(stream), 3)
    np.testing.assert_array_equal(out, [1, 1, 1])


def test_gif_transparency_and_disposal_background():
    """Frame 2 paints a transparent-holed sub-rectangle; composition
    must keep frame 1's pixels under the holes; disposal=2 then clears
    the region to background before frame 3."""
    w = h = 4
    base = np.full((h, w), 2, dtype=np.uint8)  # all green
    out = bytearray(gc.encode_gif([base], PAL)[:-1])  # drop trailer
    # frame 2: 2x2 patch at (1,1), index 3 with index-0 transparent
    patch = np.array([[3, 0], [0, 3]], dtype=np.uint8)
    out += b"\x21\xf9\x04" + bytes([(2 << 2) | 1]) + struct.pack("<H", 4)
    out += bytes([0]) + b"\x00"  # transparent index 0
    out += b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + b"\x00" + bytes([3])
    # cleared-LZW the patch at min_code=3 (width 4): CLEAR=8, EOI=9
    acc = nbits = 0
    stream = bytearray()
    for v in patch.reshape(-1):
        for c in (8, int(v)):
            acc |= c << nbits
            nbits += 4
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
    acc |= 9 << nbits
    nbits += 4
    while nbits > 0:
        stream.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    out += bytes([len(stream)]) + stream + b"\x00"
    # frame 3: full-size repaint with index 4
    third = gc.encode_gif([np.full((h, w), 4, dtype=np.uint8)], PAL)
    img_start = third.index(b"\x2c")
    out += b"\x21\xf9\x04\x04" + struct.pack("<H", 4) + b"\x00\x00"
    out += third[img_start:]  # includes trailer
    frames = gc.decode_gif(bytes(out))
    assert len(frames) == 3
    # frame 2: blue at the opaque corners, green under the holes
    np.testing.assert_array_equal(frames[1][1, 1], PAL[3])
    np.testing.assert_array_equal(frames[1][1, 2], PAL[2])
    np.testing.assert_array_equal(frames[1][2, 1], PAL[2])
    np.testing.assert_array_equal(frames[1][0, 0], PAL[2])
    # frame 3 fully repainted
    assert (frames[2] == PAL[4]).all()


def test_frame_sample_stage_real_gif(ray_session):
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, len(PAL), (10, 10)).astype(np.uint8) for _ in range(8)]
    blob = gc.encode_gif(frames, PAL)
    ds = rd.from_arrow(
        multimodal.table_from_blobs(["a.gif", "junk.mp4"], [blob, b"mp4" * 50],
                                    "image/gif")
    )
    rows = multimodal.sample_frames(ds, concurrency=1, num_frames=4).take_all()
    assert len(rows) == 8  # 2 payloads x 4 sampled frames
    gif_rows = sorted(
        (r for r in rows if r["media_id"] == "a.gif"), key=lambda r: r["frame_idx"]
    )
    # frame 0 feature equals the real first frame's resized gray pixels
    from palimpzest_ray.functions import imagecodec as ic

    gray = ic.to_gray(PAL[frames[0]])
    exp = ic.resize_nearest(gray, 8, 8).astype(np.float32).reshape(-1) / 255.0
    np.testing.assert_allclose(gif_rows[0]["frame_feat"], exp[:64], rtol=1e-6)
    # sampled evenly: last slot uses the last frame
    gray_last = ic.to_gray(PAL[frames[7]])
    exp_last = ic.resize_nearest(gray_last, 8, 8).astype(np.float32).reshape(-1) / 255.0
    np.testing.assert_allclose(gif_rows[3]["frame_feat"], exp_last[:64], rtol=1e-6)


def test_stage_survives_null_content(ray_session):
    import pyarrow as pa

    t = pa.table(
        {
            "media_id": pa.array(["n.gif"]),
            "content": pa.array([None], pa.binary()),
            "mime": pa.array(["image/gif"]),
            "n_bytes": pa.array([0], pa.int64()),
        }
    )
    rows = multimodal.sample_frames(rd.from_arrow(t), concurrency=1, num_frames=2).take_all()
    assert len(rows) == 2  # stub fallback, no crash
    img_rows = multimodal.decode_images(rd.from_arrow(t), concurrency=1, feature_dim=4).take_all()
    assert len(img_rows) == 1 and img_rows[0]["width"] >= 1
    au = multimodal.audio_features(rd.from_arrow(t), concurrency=1).take_all()
    assert au[0]["duration_s"] == 0.0


def test_gif_disposal_background_uses_global_table():
    """disposal=2 must clear to the GLOBAL table's background color even
    when the frame carries a local color table."""
    import struct as st

    base = np.full((2, 2), 1, dtype=np.uint8)  # red via GCT
    out = bytearray(gc.encode_gif([base], PAL)[:-1])
    # frame 2 with a LOCAL color table (all white) + disposal=2
    out += b"\x21\xf9\x04" + bytes([2 << 2]) + st.pack("<H", 4) + b"\x00\x00"
    out += b"\x2c" + st.pack("<HHHH", 0, 0, 2, 2)
    out += bytes([0x80 | 0])  # LCT flag, size 2^(0+1)=2 entries
    out += bytes([255, 255, 255, 200, 200, 200])
    acc = nbits = 0
    stream = bytearray()
    for v in [0, 0, 0, 0]:  # all white via LCT (min_code=2 -> CLEAR=4)
        for c in (4, v):
            acc |= c << nbits
            nbits += 3
            while nbits >= 8:
                stream.append(acc & 0xFF); acc >>= 8; nbits -= 8
    acc |= 5 << nbits; nbits += 3
    while nbits > 0:
        stream.append(acc & 0xFF); acc >>= 8; nbits -= 8
    out += bytes([2])  # min code size
    out += bytes([len(stream)]) + stream + b"\x00"
    # frame 3: transparent-everything patch so the disposed canvas shows
    out += b"\x21\xf9\x04" + bytes([1]) + st.pack("<H", 4) + bytes([1]) + b"\x00"
    out += b"\x2c" + st.pack("<HHHH", 0, 0, 1, 1) + b"\x00" + bytes([2])
    acc = nbits = 0
    stream = bytearray()
    for c in (4, 1, 5):  # CLEAR, transparent px(idx1), EOI
        acc |= c << nbits; nbits += 3
        while nbits >= 8:
            stream.append(acc & 0xFF); acc >>= 8; nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    out += bytes([len(stream)]) + stream + b"\x00\x3b"
    frames = gc.decode_gif(bytes(out))
    # after frame 2's disposal=2, the canvas region is GCT bg (index 0 =
    # black), NOT the local table's white
    np.testing.assert_array_equal(frames[2][0, 0], PAL[0])
