"""Multimodal column plumbing: images / audio / video as opaque binary.

Reference parity: the reference reads media as base64 strings per row
(``ImageFileDataset`` / ``AudioFileDataset``, ``iter_dataset.py:284-323,
472-511``) and types them via ``ImageBase64`` / ``AudioBase64`` aliases
(``schemas.py:21-57``). Here media is an Arrow ``binary`` column plus a
typed metadata struct, processed by ACTOR-POOL ``map_batches`` stages
(decoder/model load once per actor in ``__init__`` — the pattern that
replaces the reference's process-wide Singleton+lock, ``topk.py:21-37``).

The actual codecs (PIL / torchaudio / ffmpeg) are not in this container,
so the decode kernel is STUBBED: each stage tries the real import and
otherwise falls back to a deterministic fake (seeded by a stable hash of
the payload bytes) so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and testable. The fake is
clearly marked; swapping in a real codec touches only ``_decode_one``.

Scale notes: media payloads are KB–MB per row, so these stages must run
with SMALL ``batch_size`` (bytes, not rows, dominate) and the binary
column stays zero-copy Arrow end-to-end; feature outputs are
fixed-width ``fixed_size_list<float32>`` so downstream stages shuffle
narrow columns, never the payload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from palimpzest_ray.functions.tokens import stable_hash

# everything a malformed payload can raise out of a codec (in-repo or
# third-party): truncated headers (struct.error), corrupt deflate
# (zlib.error), bad geometry (ValueError/ZeroDivisionError/IndexError),
# library I/O errors (OSError/RuntimeError). The per-row stub fallback
# must catch ALL of these — one bad blob must never fail the batch.
import struct as _struct
import zlib as _zlib

_DECODE_ERRORS = (
    ValueError, OSError, RuntimeError, KeyError, IndexError, TypeError,
    AttributeError, ZeroDivisionError, _struct.error, _zlib.error,
)  # TypeError/AttributeError: null content blobs reach _decode_one as None

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("content", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("n_bytes", pa.int64()),
    ]
)

# recommended map_batches kwargs for payload-heavy stages
MEDIA_BATCH_KWARGS = dict(batch_format="pyarrow", batch_size=32)


def read_media_dir(path: str) -> rd.Dataset:
    """Directory of media files → MEDIA_SCHEMA dataset (streaming)."""
    ds = rd.read_binary_files(path, include_paths=True)

    def _conform(batch: pa.Table) -> pa.Table:
        import os

        paths = batch["path"].to_pylist()
        content = batch["bytes"]
        mimes = [_guess_mime(p) for p in paths]
        return pa.table(
            {
                "media_id": pa.array([os.path.basename(p) for p in paths]),
                "content": content,
                "mime": pa.array(mimes),
                "n_bytes": pc.binary_length(content).cast(pa.int64()),
            }
        )

    return ds.map_batches(_conform, batch_format="pyarrow")


def _guess_mime(path: str) -> str:
    import mimetypes

    return mimetypes.guess_type(path)[0] or "application/octet-stream"


def table_from_blobs(ids: list[str], blobs: list[bytes], mime: str) -> pa.Table:
    """Build a MEDIA_SCHEMA table from in-memory payloads (tests)."""
    return pa.table(
        {
            "media_id": pa.array(ids),
            "content": pa.array(blobs, pa.binary()),
            "mime": pa.array([mime] * len(ids)),
            "n_bytes": pa.array([len(b) for b in blobs], pa.int64()),
        }
    )


class _MediaStage:
    """Base actor-pool stage: expensive setup once per actor."""

    def __init__(self):
        self._codec = self._load_codec()  # once per ACTOR, not per batch

    def _load_codec(self):
        return None  # overridden; None => deterministic fake

    @staticmethod
    def _fake_features(content: pa.Array | pa.ChunkedArray, dim: int) -> np.ndarray:
        """STUB decode: deterministic pseudo-features seeded by a stable
        hash of the payload bytes. NOT a real decode — replace via
        ``_load_codec`` when the codec library exists."""
        seeds = stable_hash(content)
        out = np.empty((len(seeds), dim), dtype=np.float32)
        for i, s in enumerate(seeds):  # per-row RNG init only; dim-vector fill is vectorized
            out[i] = np.random.default_rng(int(s)).standard_normal(dim)
        return out


class ImageDecodeStage(_MediaStage):
    """content:binary → image feature vector + real width/height.

    Codec priority per actor: PIL if importable, else the in-repo
    pure-python PNG/BMP codec (`functions/imagecodec.py`) — a REAL
    decode either way. Payloads in formats neither path can read fall
    back per row to deterministic fake features + hash-derived dims
    (schema never changes shape under codec availability).
    """

    def __init__(self, target_size: int = 16, feature_dim: int = 64):
        self.target_size = target_size
        self.feature_dim = feature_dim
        super().__init__()

    def _load_codec(self):
        try:
            from PIL import Image  # noqa: F401  (absent in this container)

            return ("pil", Image)
        except ImportError:
            from palimpzest_ray.functions import imagecodec

            return ("pure", imagecodec)

    def _decode_one(self, blob: bytes) -> tuple[np.ndarray, int, int]:
        """blob → (target×target grayscale float32 in [0,1], w, h)."""
        kind, codec = self._codec
        if kind == "pil":
            import io

            img = codec.open(io.BytesIO(blob)).convert("L")
            w, h = img.size
            img = img.resize((self.target_size, self.target_size))
            px = np.asarray(img, dtype=np.float32) / 255.0
            return px.reshape(-1), w, h
        arr = codec.decode_image(blob)
        h, w = arr.shape[:2]
        gray = codec.to_gray(arr)
        small = codec.resize_nearest(gray, self.target_size, self.target_size)
        return small.astype(np.float32).reshape(-1) / 255.0, w, h

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch["content"].combine_chunks()
        feats = np.empty((batch.num_rows, self.feature_dim), dtype=np.float32)
        dims = np.empty((batch.num_rows, 2), dtype=np.int32)
        undecodable: list[int] = []
        for i, blob in enumerate(content.to_pylist()):
            try:
                px, w, h = self._decode_one(blob)
                if px.size < self.feature_dim:
                    px = np.pad(px, (0, self.feature_dim - px.size))
                feats[i] = px[: self.feature_dim]
                dims[i] = (w, h)
            except _DECODE_ERRORS:
                undecodable.append(i)
        if undecodable:
            sub = content.take(pa.array(undecodable, pa.int64()))
            feats[undecodable] = self._fake_features(sub, self.feature_dim)
            seeds = stable_hash(sub)
            dims[undecodable, 0] = (seeds % 1920 + 1).astype(np.int32)
            dims[undecodable, 1] = (seeds % 1080 + 1).astype(np.int32)
        batch = batch.append_column(
            "image_feat",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.feature_dim
            ),
        )
        batch = batch.append_column("width", pa.array(dims[:, 0]))
        return batch.append_column("height", pa.array(dims[:, 1]))


class AudioFeatureStage(_MediaStage):
    """content:binary → fixed-width audio features + duration.

    Real path: soundfile if importable, else the in-repo stdlib WAV
    codec (``functions/audiocodec.py``) — exact duration from the data
    chunk and per-segment RMS energy features. Payloads neither can
    read (non-WAV containers without soundfile) fall back per row to
    the deterministic stub: duration from byte length at an assumed
    bitrate, hash-seeded features (schema identical either way)."""

    BYTES_PER_SEC = 32_000  # 16 kHz × 16-bit mono assumption for the stub

    def __init__(self, feature_dim: int = 32):
        self.feature_dim = feature_dim
        super().__init__()

    def _load_codec(self):
        try:
            import soundfile  # noqa: F401  (absent in this container)

            return ("soundfile", soundfile)
        except ImportError:
            from palimpzest_ray.functions import audiocodec

            return ("wav", audiocodec)

    def _decode_one(self, blob: bytes) -> tuple[np.ndarray, float]:
        """blob → (feature_dim RMS vector, exact duration seconds)."""
        kind, codec = self._codec
        if kind == "soundfile":
            import io

            from palimpzest_ray.functions import audiocodec

            samples, rate = codec.read(io.BytesIO(blob), dtype="float32")
            return audiocodec.segment_rms(samples, self.feature_dim), len(
                samples
            ) / float(rate)
        samples, rate = codec.decode_wav(blob)
        return codec.segment_rms(samples, self.feature_dim), samples.shape[0] / float(
            rate
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch["content"].combine_chunks()
        feats = np.empty((batch.num_rows, self.feature_dim), dtype=np.float32)
        dur = np.empty(batch.num_rows, dtype=np.float64)
        undecodable: list[int] = []
        for i, blob in enumerate(content.to_pylist()):
            try:
                feats[i], dur[i] = self._decode_one(blob)
            except _DECODE_ERRORS:
                undecodable.append(i)
        if undecodable:
            sub = content.take(pa.array(undecodable, pa.int64()))
            feats[undecodable] = self._fake_features(sub, self.feature_dim)
            n_bytes = np.array(
                [len(b) if b is not None else 0 for b in sub.to_pylist()],
                dtype=np.float64,
            )
            dur[undecodable] = n_bytes / self.BYTES_PER_SEC
        batch = batch.append_column(
            "audio_feat",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.feature_dim
            ),
        )
        return batch.append_column("duration_s", pa.array(np.round(dur, 3)))


class FrameSampleStage(_MediaStage):
    """video content:binary → N sampled frame features (1:N explode).

    Emits one output row per sampled frame with ``frame_idx`` — the
    multimodal analogue of the reference's ``Cardinality.ONE_TO_MANY``
    converts (``convert.py:198-259``).

    Real path: animated GIF via the in-repo stdlib codec
    (``functions/gifcodec.py``) — ``num_frames`` frames sampled evenly
    across the timeline, features = resized grayscale pixels. Other
    containers (mp4/webm — no ffmpeg here) fall back per row to the
    deterministic stub. Schema is identical either way."""

    def __init__(self, num_frames: int = 4, feature_dim: int = 64):
        self.num_frames = num_frames
        self.feature_dim = feature_dim
        self._side = int(np.ceil(np.sqrt(feature_dim)))
        super().__init__()

    def _load_codec(self):
        from palimpzest_ray.functions import gifcodec, imagecodec

        return (gifcodec, imagecodec)

    def _decode_one(self, blob: bytes) -> np.ndarray:
        """blob → (num_frames, feature_dim) float32 from real pixels."""
        gifcodec, imagecodec = self._codec
        frames = gifcodec.decode_gif(blob)
        picks = np.linspace(0, len(frames) - 1, self.num_frames).astype(int)
        out = np.empty((self.num_frames, self.feature_dim), dtype=np.float32)
        for j, fi in enumerate(picks):
            gray = imagecodec.to_gray(frames[fi])
            px = imagecodec.resize_nearest(gray, self._side, self._side)
            flat = px.astype(np.float32).reshape(-1) / 255.0
            out[j] = flat[: self.feature_dim]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        content = batch["content"].combine_chunks()
        rows = np.repeat(np.arange(n), self.num_frames)
        frame_idx = np.tile(np.arange(self.num_frames), n)
        feats = np.empty((n * self.num_frames, self.feature_dim), dtype=np.float32)
        undecodable: list[int] = []
        blobs = content.to_pylist()
        for i, blob in enumerate(blobs):
            try:
                feats[i * self.num_frames : (i + 1) * self.num_frames] = (
                    self._decode_one(blob)
                )
            except _DECODE_ERRORS:
                undecodable.append(i)
        if undecodable:
            sub = content.take(pa.array(undecodable, pa.int64()))
            seeds = stable_hash(sub)
            for j, i in enumerate(undecodable):  # stub: hash-seeded fake
                rng = np.random.default_rng(int(seeds[j]))
                feats[i * self.num_frames : (i + 1) * self.num_frames] = (
                    rng.standard_normal((self.num_frames, self.feature_dim))
                )
        out = batch.drop_columns(["content"]).take(pa.array(rows))
        out = out.append_column("frame_idx", pa.array(frame_idx.astype(np.int32)))
        return out.append_column(
            "frame_feat",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.feature_dim
            ),
        )


def decode_images(ds: rd.Dataset, *, concurrency=(1, 4), **stage_kw) -> rd.Dataset:
    """Actor-pool image decode: ``map_batches(ImageDecodeStage, ...)``."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=stage_kw,
        concurrency=concurrency,
        **MEDIA_BATCH_KWARGS,
    )


def audio_features(ds: rd.Dataset, *, concurrency=(1, 4), **stage_kw) -> rd.Dataset:
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs=stage_kw,
        concurrency=concurrency,
        **MEDIA_BATCH_KWARGS,
    )


def sample_frames(ds: rd.Dataset, *, concurrency=(1, 4), **stage_kw) -> rd.Dataset:
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=stage_kw,
        concurrency=concurrency,
        **MEDIA_BATCH_KWARGS,
    )
