"""Multimodal metadata stages: Arrow plumbing + the REAL decoders.

Pixel/sample decode stays codec-gated (no codec libraries in this
container), but container METADATA parses for real: the audio stage reads
RIFF/WAVE headers with the stdlib and the video stage walks ISO-BMFF/MP4
boxes in pure Python — both real paths are testable end-to-end here, with
deterministic digest fakes for everything else.
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


def _box(typ: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + typ + payload


def _mp4_bytes(
    *, timescale=1000, duration=5000, width=320, height=240,
    media_ts=30, media_dur=150, n_frames=150, mvhd_v1=False,
) -> bytes:
    """Hand-built minimal ISO-BMFF file: ftyp + moov(mvhd, trak(tkhd,
    mdia(mdhd, minf(stbl(stts))))) — real box structure, no codec data."""
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    if mvhd_v1:
        mvhd = _box(b"mvhd", bytes([1, 0, 0, 0]) + (0).to_bytes(16, "big")
                    + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
                    + bytes(80))
    else:
        mvhd = _box(b"mvhd", bytes(4) + (0).to_bytes(8, "big")
                    + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
                    + bytes(80))
    # tkhd v0: ver/flags(4) ctime(4) mtime(4) track_id(4) res(4) dur(4)
    # res(8) layer(2) alt(2) vol(2) res(2) matrix(36) width(4) height(4)
    tkhd = _box(b"tkhd", bytes(4) + bytes(8) + (1).to_bytes(4, "big")
                + bytes(4) + duration.to_bytes(4, "big") + bytes(8)
                + bytes(8) + bytes(36)
                + (width << 16).to_bytes(4, "big")
                + (height << 16).to_bytes(4, "big"))
    mdhd = _box(b"mdhd", bytes(4) + bytes(8)
                + media_ts.to_bytes(4, "big") + media_dur.to_bytes(4, "big")
                + bytes(4))
    stts = _box(b"stts", bytes(4) + (1).to_bytes(4, "big")
                + n_frames.to_bytes(4, "big") + (1).to_bytes(4, "big"))
    stbl = _box(b"stbl", stts)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


def test_decode_video_mp4_real_parse():
    blob = _mp4_bytes()
    got = MM.decode_video_mp4(blob)
    # 5000/1000 timescale = 5000 ms; 150 frames over 150/30 s = 30.00 fps
    assert got == (5000, 320, 240, 3000, 150)
    # 64-bit mvhd variant parses identically
    assert MM.decode_video_mp4(_mp4_bytes(mvhd_v1=True)) == (5000, 320, 240, 3000, 150)
    # non-MP4 bytes → None (fake fallback path)
    assert MM.decode_video_mp4(b"RIFFxxxxWAVEfmt ") is None
    assert MM.decode_video_mp4(b"") is None
    # truncated box table must not raise
    assert MM.decode_video_mp4(blob[:40]) is None


def test_video_meta_real_mp4_end_to_end(spark):
    """The real-MP4 path through the actual Arrow stage, mirroring the
    WAV test: a parseable MP4 yields box-derived metadata, a sibling
    non-MP4 blob in the same batch falls to the digest fake."""
    blob = _mp4_bytes(timescale=600, duration=7200,   # 12 000 ms
                      width=640, height=360, media_ts=24,
                      media_dur=288, n_frames=288)    # 24.00 fps
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"not-a-video"))],
        "id long, blob binary",
    )
    rows = {r["id"]: r for r in MM.extract_video_meta(df, "id", "blob").collect()}
    r1 = rows[1]
    assert (r1["duration_ms"], r1["width"], r1["height"]) == (12000, 640, 360)
    assert r1["fps_x100"] == 2400 and r1["n_frames"] == 288
    assert r1["n_bytes"] == len(blob)
    assert rows[2]["fps_x100"] in MM._FPS_X100  # digest fake
    # real_mp4=False pins the fake even for the parseable blob
    pinned = {r["id"]: r for r in
              MM.extract_video_meta(df, "id", "blob", real_mp4=False).collect()}
    assert pinned[1]["fps_x100"] in MM._FPS_X100
    assert pinned[1]["duration_ms"] != 12000 or pinned[1]["width"] != 640


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


def test_frame_patch_stage_matches_reference(spark):
    """extract_frame_patches: every work-list row yields exactly one output
    row whose window stats match a plain-Python reference computation."""
    import hashlib

    blobs = {1: b"A" * 10, 2: bytes(range(200)) * 3}  # short + long payloads
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()], "id long, blob binary"
    )
    work = spark.createDataFrame(
        [(1, 0, 0), (1, 7, 1000), (2, 0, 0), (2, 31, 2000), (2, 900, 5000)],
        "id long, frame_idx long, ts_ms long",
    )
    rows = MM.extract_frame_patches(df, work).collect()
    assert len(rows) == 5
    for r in rows:
        b = blobs[r["id"]]
        span = max(len(b) - MM.FRAME_PATCH_BYTES + 1, 1)
        off = (r["frame_idx"] * MM.FRAME_PATCH_STRIDE) % span
        patch = b[off:off + MM.FRAME_PATCH_BYTES]
        assert r["patch_off"] == off
        assert r["patch_len"] == len(patch)
        assert r["patch_digest"] == hashlib.md5(patch).hexdigest()
        assert r["byte_sum"] == sum(patch)


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
