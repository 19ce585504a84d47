"""Multimodal metadata stages: Arrow plumbing + the one REAL decoder.

The image/video decode paths are gated stubs (no codec libraries in this
container); the audio stage genuinely parses RIFF/WAVE headers with the
stdlib, so the real-decode path is testable end-to-end here.
"""

import io
import wave

from pyspark.sql import functions as F

from webcrawl_spark.functions import multimodal as MM

SF = "/root/testdata/sf0.001"


def _wav_bytes(rate: int, channels: int, n_frames: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * n_frames)
    return buf.getvalue()


def test_audio_meta_real_wav(spark):
    blob = _wav_bytes(rate=8000, channels=2, n_frames=12000)  # 1500 ms
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    row = MM.extract_audio_meta(df, "id", "blob").collect()[0]
    assert row["duration_ms"] == 12000 * 1000 // 8000 == 1500
    assert row["sample_rate"] == 8000
    assert row["channels"] == 2
    assert row["n_bytes"] == len(blob)


def test_audio_meta_fake_fallback_deterministic(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not-audio")), (2, bytearray(b"not-audio"))],
        "id long, blob binary",
    )
    rows = MM.extract_audio_meta(df, "id", "blob").collect()
    # same bytes → same digest → identical fake properties
    assert rows[0]["duration_ms"] == rows[1]["duration_ms"]
    assert rows[0]["sample_rate"] in MM._SAMPLE_RATES
    assert 1 <= rows[0]["channels"] <= 2
    assert 1000 <= rows[0]["duration_ms"] < 601000


def test_video_meta_and_frame_sampling(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    )
    meta = MM.extract_video_meta(docs, "doc_id", "blob")
    pdf = meta.toPandas()
    assert len(pdf) == 20
    # n_frames is exact integer math from duration × fps
    for _, r in pdf.iterrows():
        assert r["n_frames"] == r["duration_ms"] * r["fps_x100"] // 100000
        assert r["fps_x100"] in MM._FPS_X100

    samples = MM.sample_frame_indices(meta, every_ms=1000).toPandas()
    # one sample instant per started second, frame index within range
    per_id = samples.groupby("id").size().to_dict()
    for _, r in pdf.iterrows():
        want = (int(r["duration_ms"]) - 1) // 1000 + 1
        assert per_id[r["id"]] == want
    m = samples.merge(pdf, left_on="id", right_on="id")
    assert (m["frame_idx"] == m["ts_ms"] * m["fps_x100"] // 100000).all()
    assert (m["frame_idx"] <= m["n_frames"]).all()


def test_decode_gates_raise_without_codecs():
    import pytest

    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            MM.decode_image(b"\x89PNG")
    try:
        import av  # noqa: F401
        has_av = True
    except ImportError:
        has_av = False
    if not has_av:
        with pytest.raises(NotImplementedError):
            MM.decode_video(b"\x00\x00\x00\x18ftyp")
