"""Multimodal columns — opaque binary payloads + typed metadata (scale
extension per BASELINE.json north star; no reference counterpart).

Pattern: media rides as `content BINARY` plus a typed metadata struct
(`media_type, width, height, sample_rate, duration_ms, codec`); decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
mapInPandas stages so bytes never round-trip through Python row objects.

Decoder wiring: `strict=True` decodes with the real library through a
guarded import — PIL for image features/resize, soundfile for audio —
and raises NotImplementedError only where the library is absent (this
environment has none of them, so the guard paths are what tests can
exercise here; the PIL/soundfile branches follow the libraries'
documented public APIs). `strict=False` runs a deterministic fake
decoder (content-hash-seeded) so the Spark plumbing — schemas, batch
iteration, partition sizing, downstream feature math — is real,
testable, and oracle-checkable end to end. Video frame sampling (r5)
follows the same guard: PyAV preferred, imageio-ffmpeg fallback,
NotImplementedError only where both are absent.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, media_type STRING, content BINARY, "
    "width INT, height INT, sample_rate INT, duration_ms INT, codec STRING"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id BIGINT, width INT, height INT, n_pixels BIGINT, "
    "mean_luma DOUBLE, content_digest STRING"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id BIGINT, frame_index INT, frame_ts_ms INT, frame_digest STRING"
)


def _fake_pixels(content: bytes, n: int) -> list[int]:
    """Deterministic stand-in for decoded pixel luma values: hex-pair
    ints of a sha256 HEXDIGEST chain (h0 = sha256(content), h_{i+1} =
    sha256 of h_i's hex string). Stable across runs/partitions, and —
    because each step hashes a hex STRING, not raw digest bytes — exactly
    reproducible in DuckDB's sha256(VARCHAR), so the decode output is
    oracle-checkable end to end."""
    out: list[int] = []
    hx = hashlib.sha256(content).hexdigest()
    while len(out) < n:
        out.extend(int(hx[2 * j:2 * j + 2], 16) for j in range(32))
        hx = hashlib.sha256(hx.encode("ascii")).hexdigest()
    return out[:n]


def decode_image_features(
    media: DataFrame, strict: bool = False
) -> DataFrame:
    """Decode → per-image features via mapInPandas (Arrow batches).

    strict=True: decode with PIL (guarded import — raises
    NotImplementedError where pillow is absent). strict=False:
    deterministic fake decode, real plumbing."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "image":
                    continue
                if strict:
                    try:
                        import io

                        from PIL import Image
                    except ImportError as e:
                        raise NotImplementedError(
                            "image decode needs PIL (pip install pillow); "
                            "strict=False runs the deterministic fake "
                            "decoder instead"
                        ) from e
                    img = Image.open(
                        io.BytesIO(bytes(r.content or b""))
                    ).convert("L")
                    w, h = img.size
                    data = list(img.getdata())
                    n = max(len(data), 1)
                    mean_luma = sum(data) / n
                    rows.append(
                        (
                            r.media_id, w, h, n, mean_luma,
                            hashlib.sha256(
                                bytes(r.content or b"")
                            ).hexdigest()[:16],
                        )
                    )
                    continue
                w = int(r.width or 0)
                h = int(r.height or 0)
                n = max(w * h, 1)
                # cap fake decode work; real decoders stream
                sample = _fake_pixels(bytes(r.content or b""), min(n, 4096))
                # sum of <=4096 small ints is exact in double, so this
                # division is bit-identical to the SQL mirror; rounding is
                # left to the caller (engines round differently at .5)
                mean_luma = sum(sample) / len(sample)
                rows.append(
                    (
                        r.media_id,
                        w,
                        h,
                        n,
                        mean_luma,
                        hashlib.sha256(
                            bytes(r.content or b"")
                        ).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_pixels",
                    "mean_luma",
                    "content_digest",
                ],
            )

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def _decode_video_frames_strict(
    content: bytes, every_ms: int
) -> list[tuple[int, str]]:
    """Real frame sampling behind a guarded import (the r3 PIL/soundfile
    pattern): PyAV preferred (container demux, pts-accurate timestamps),
    imageio's ffmpeg reader as fallback (index-based, ts = i·1000/fps).
    Raises NotImplementedError only where neither library is installed.
    Returns [(frame_ts_ms, digest16)] — one entry per sampled frame, the
    first frame at/after each every_ms boundary."""
    import io

    try:
        import av
    except ImportError:
        av = None
    if av is not None:
        out: list[tuple[int, str]] = []
        next_ts = 0
        with av.open(io.BytesIO(content)) as container:
            stream = container.streams.video[0]
            tb = stream.time_base
            for frame in container.decode(stream):
                ts_ms = (
                    int(frame.pts * tb * 1000)
                    if frame.pts is not None
                    else len(out) * every_ms
                )
                if ts_ms >= next_ts:
                    digest = hashlib.sha256(
                        frame.to_ndarray(format="gray").tobytes()
                    ).hexdigest()[:16]
                    out.append((ts_ms, digest))
                    next_ts = (ts_ms // every_ms + 1) * every_ms
        return out
    try:
        import imageio
    except ImportError as e:
        raise NotImplementedError(
            "video decode needs PyAV (pip install av) or imageio + "
            "imageio-ffmpeg; strict=False runs the deterministic fake "
            "frame sampler instead"
        ) from e
    reader = imageio.get_reader(content, format="ffmpeg")
    fps = float(reader.get_meta_data().get("fps") or 0.0)
    if fps <= 0:
        reader.close()
        raise NotImplementedError(
            "imageio could not determine fps for this container; "
            "install PyAV for pts-accurate sampling"
        )
    step = max(1, round(fps * every_ms / 1000.0))
    out = []
    for i, frame in enumerate(reader):
        if i % step == 0:
            out.append(
                (
                    int(i * 1000 / fps),
                    hashlib.sha256(frame.tobytes()).hexdigest()[:16],
                )
            )
    reader.close()
    return out


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (mapInPandas row
    expansion — the batch shape a real ffmpeg-backed sampler needs).

    strict=True decodes with PyAV / imageio-ffmpeg through the guarded
    `_decode_video_frames_strict` (NotImplementedError where both are
    absent); strict=False runs the deterministic fake sampler — real
    row-expansion plumbing, content-hash frame digests."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "video":
                    continue
                if strict:
                    frames = _decode_video_frames_strict(
                        bytes(r.content or b""), every_ms
                    )
                    rows.extend(
                        (r.media_id, i, ts, dg)
                        for i, (ts, dg) in enumerate(frames)
                    )
                    continue
                duration = int(r.duration_ms or 0)
                for i, ts in enumerate(range(0, duration, every_ms)):
                    digest = hashlib.sha256(
                        bytes(r.content or b"") + ts.to_bytes(8, "big")
                    ).hexdigest()[:16]
                    rows.append((r.media_id, i, ts, digest))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_index",
                    "frame_ts_ms",
                    "frame_digest",
                ],
            )

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def media_summary(media: DataFrame) -> DataFrame:
    """Pure-expression metadata profile — no decode, runs at full scan
    speed: per media_type count, total bytes, avg duration."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.round(F.avg("duration_ms"), 2).alias("avg_duration_ms"),
    )


RESIZE_SCHEMA = (
    "media_id BIGINT, width INT, height INT, new_width INT, "
    "new_height INT, resized_digest STRING"
)

AUDIO_FEATURE_SCHEMA = (
    "media_id BIGINT, sample_rate INT, duration_ms INT, n_samples BIGINT, "
    "n_windows INT, mean_energy DOUBLE, content_digest STRING"
)


def resize_images(
    media: DataFrame, max_side: int = 256, strict: bool = False
) -> DataFrame:
    """Aspect-preserving resize to fit a max_side box (no upscaling).

    Target dimensions are exact integer math (floor, like PIL.thumbnail);
    the pixel resample itself is the stubbed decoder step — strict=True
    raises where PIL/cv2 would run, strict=False emits a deterministic
    digest standing in for the resized payload. Same mapInPandas batch
    shape a real resampler needs: bytes in, bytes (here: digest) out,
    never row-at-a-time Python objects."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "image":
                    continue
                if strict:
                    try:
                        import io

                        from PIL import Image
                    except ImportError as e:
                        raise NotImplementedError(
                            "image resize needs PIL (pip install "
                            "pillow); strict=False emits deterministic "
                            "digests instead"
                        ) from e
                    img = Image.open(io.BytesIO(bytes(r.content or b"")))
                    w, h = img.size
                    img.thumbnail((max_side, max_side))
                    nw, nh = img.size
                    digest = hashlib.sha256(img.tobytes()).hexdigest()[:16]
                    rows.append((r.media_id, w, h, nw, nh, digest))
                    continue
                w = int(r.width or 0)
                h = int(r.height or 0)
                side = max(w, h)
                if side <= max_side or side == 0:
                    nw, nh = w, h
                else:
                    nw = w * max_side // side
                    nh = h * max_side // side
                digest = hashlib.sha256(
                    bytes(r.content or b"")
                    + nw.to_bytes(4, "big")
                    + nh.to_bytes(4, "big")
                ).hexdigest()[:16]
                rows.append((r.media_id, w, h, nw, nh, digest))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "new_width", "new_height", "resized_digest",
                ],
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


def extract_audio_features(
    media: DataFrame, window_ms: int = 500, strict: bool = False
) -> DataFrame:
    """Audio decode → windowed energy features via mapInPandas.

    n_samples / n_windows are exact integer math from the metadata;
    mean_energy is the mean of the fake-decoded byte stream (sum of
    bounded small ints — exact in double, engine-independent). strict=True
    marks where torchaudio/librosa would decode the real payload."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "audio":
                    continue
                if strict:
                    try:
                        import io

                        import soundfile as sf
                    except ImportError as e:
                        raise NotImplementedError(
                            "audio decode needs soundfile (pip install "
                            "soundfile); strict=False runs the "
                            "deterministic fake decoder instead"
                        ) from e
                    data, sr = sf.read(io.BytesIO(bytes(r.content or b"")))
                    n_samples = int(len(data))
                    dur = int(n_samples * 1000 // sr) if sr else 0
                    n_windows = (
                        (dur + window_ms - 1) // window_ms if dur else 0
                    )
                    mean_energy = (
                        float(abs(data).mean()) if n_samples else 0.0
                    )
                    rows.append(
                        (
                            r.media_id, int(sr), dur, n_samples,
                            n_windows, mean_energy,
                            hashlib.sha256(
                                bytes(r.content or b"")
                            ).hexdigest()[:16],
                        )
                    )
                    continue
                sr = int(r.sample_rate or 0)
                dur = int(r.duration_ms or 0)
                n_samples = sr * dur // 1000
                n_windows = (
                    (dur + window_ms - 1) // window_ms if dur else 0
                )
                sample = _fake_pixels(
                    bytes(r.content or b""), min(max(n_samples, 1), 4096)
                )
                mean_energy = sum(sample) / len(sample)
                rows.append(
                    (
                        r.media_id, sr, dur, n_samples, n_windows,
                        mean_energy,
                        hashlib.sha256(
                            bytes(r.content or b"")
                        ).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "duration_ms", "n_samples",
                    "n_windows", "mean_energy", "content_digest",
                ],
            )

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)
