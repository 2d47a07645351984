"""Multimodal plumbing tests: schemas, Arrow batch iteration, row expansion,
deterministic fake decode, and the strict=True stub contract."""

from __future__ import annotations

import pytest

from model_audit_spark.operators.multimodal import (
    decode_image_features,
    media_summary,
    sample_video_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", 64, 32, None, None, "png"),
        (2, "image", b"\xff\xd8 other fake", 10, 10, None, None, "jpeg"),
        (3, "audio", b"RIFF fake", None, None, 16000, 2500, "wav"),
        (4, "video", b"\x00\x00ftyp fake", 640, 480, None, 3500, "h264"),
    ]
    return spark.createDataFrame(
        rows,
        "media_id BIGINT, media_type STRING, content BINARY, width INT, "
        "height INT, sample_rate INT, duration_ms INT, codec STRING",
    )


def test_image_features_deterministic(spark, media):
    a = {r.media_id: r for r in decode_image_features(media).collect()}
    b = {r.media_id: r for r in decode_image_features(media).collect()}
    assert set(a) == {1, 2}  # only images
    assert a[1].n_pixels == 64 * 32
    assert a[1].mean_luma == b[1].mean_luma  # deterministic fake decode
    assert a[1].content_digest != a[2].content_digest
    assert 0 <= a[1].mean_luma <= 255


def test_image_strict_raises(spark, media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        decode_image_features(media, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, Py4JJavaError
    )


def test_video_frame_sampling_row_expansion(spark, media):
    frames = sample_video_frames(media, every_ms=1000).collect()
    # 3500 ms at 1000 ms stride -> frames at 0,1000,2000,3000
    assert [f.frame_ts_ms for f in sorted(frames, key=lambda f: f.frame_index)] == [
        0,
        1000,
        2000,
        3000,
    ]
    assert len({f.frame_digest for f in frames}) == 4


def test_media_summary_no_decode(spark, media):
    rows = {r.media_type: r for r in media_summary(media).collect()}
    assert rows["image"].n_items == 2
    assert rows["video"].avg_duration_ms == 3500.0
    assert rows["audio"].total_bytes == 9


def test_resize_target_dims_and_determinism(spark, media):
    from model_audit_spark.operators.multimodal import resize_images

    out = {r.media_id: r for r in resize_images(media, max_side=16).collect()}
    assert set(out) == {1, 2}  # images only
    # 64x32 -> fit 16 box: 16x8; 10x10 under the box: untouched
    assert (out[1].new_width, out[1].new_height) == (16, 8)
    assert (out[2].new_width, out[2].new_height) == (10, 10)
    again = {
        r.media_id: r.resized_digest
        for r in resize_images(media, max_side=16).collect()
    }
    assert again == {k: v.resized_digest for k, v in out.items()}


def test_resize_strict_raises(spark, media):
    import pytest as _pytest

    from model_audit_spark.operators.multimodal import resize_images

    with _pytest.raises(Exception, match="PIL|cv2|NotImplemented"):
        resize_images(media, strict=True).collect()


def test_audio_features_windows_and_energy(spark, media):
    from model_audit_spark.operators.multimodal import (
        extract_audio_features,
    )

    rows = extract_audio_features(media, window_ms=500).collect()
    assert len(rows) == 1 and rows[0].media_id == 3
    r = rows[0]
    # 16 kHz * 2.5 s = 40000 samples; 2500ms / 500ms = 5 windows
    assert r.n_samples == 40000 and r.n_windows == 5
    assert 0 <= r.mean_energy <= 255


def _video_libs_present():
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        pass
    try:
        import imageio  # noqa: F401
        import imageio_ffmpeg  # noqa: F401

        return True
    except ImportError:
        return False


def test_video_strict_raises_without_decoder(spark, media):
    """Where neither PyAV nor imageio-ffmpeg is installed, the strict
    path must fail loudly (guarded import), never silently fake."""
    if _video_libs_present():
        pytest.skip("a real video decoder is installed")
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        sample_video_frames(media, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, Py4JJavaError
    )


def test_video_strict_real_decode(spark, media):
    """Exercised only when PyAV / imageio-ffmpeg is present: the real
    path samples one frame per every_ms boundary with pts-derived
    timestamps (driver-side helper test keeps it cheap; the Spark
    plumbing is identical to the fake path already pinned above)."""
    if not _video_libs_present():
        pytest.skip("no real video decoder in this environment")
    import io

    import av
    import numpy as np

    # synthesize a 2 s 4 fps video in-memory so the test has a payload
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 32, 32
        for i in range(8):
            arr = np.full((32, 32, 3), i * 20, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    from model_audit_spark.operators.multimodal import (
        _decode_video_frames_strict,
    )

    frames = _decode_video_frames_strict(buf.getvalue(), every_ms=1000)
    assert len(frames) >= 2  # 2 s at 1 s stride
    ts = [t for t, _ in frames]
    assert ts == sorted(ts)
    assert all(len(d) == 16 for _, d in frames)
