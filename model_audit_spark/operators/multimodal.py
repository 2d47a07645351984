"""Multimodal columns — opaque binary payloads + typed metadata (scale
extension per BASELINE.json north star; no reference counterpart).

Pattern: media rides as `content BINARY` plus a typed metadata struct
(`media_type, width, height, sample_rate, duration_ms, codec`); decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
mapInPandas stages so bytes never round-trip through Python row objects.

The image/audio codec libraries are NOT in this environment, so the decode
kernels are stubbed: `strict=True` raises NotImplementedError (the
production path, swap in PIL/torchaudio there); `strict=False` runs a
deterministic fake decoder (content-hash-seeded) so the Spark plumbing —
schemas, batch iteration, partition sizing, downstream feature math — is
real and testable end to end.
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

    strict=True: raise NotImplementedError where a real decoder (PIL etc.)
    would run. strict=False: deterministic fake decode, real plumbing."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "image":
                    continue
                if strict:
                    raise NotImplementedError(
                        "image decode needs PIL/cv2 — not available in "
                        "this environment; swap the fake decoder here"
                    )
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


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (mapInPandas row
    expansion — the batch shape a real ffmpeg-backed sampler needs)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "video":
                    continue
                if strict:
                    raise NotImplementedError(
                        "video decode needs ffmpeg — not available; swap "
                        "the fake frame sampler here"
                    )
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
                    raise NotImplementedError(
                        "image resize needs PIL/cv2 — not available in "
                        "this environment; swap the fake resampler here"
                    )
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
                    raise NotImplementedError(
                        "audio decode needs torchaudio/librosa — not "
                        "available; swap the fake decoder here"
                    )
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
