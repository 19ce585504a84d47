"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride opaque ``binary`` columns with typed metadata extracted
by Arrow-batched ``mapInPandas`` stages. The Spark-side plumbing — schema,
batching, partition behavior — is real and tested; the actual codec work is
stubbed: this container has no image/audio libraries, so ``decode_image``
raises ``NotImplementedError`` unless a decoder is importable, and the
metadata stage uses a deterministic digest-derived fake in its place
(cross-engine reproducible, so correctness gates still apply end-to-end).

At scale: blobs live in their own column family / Parquet column so scans
that don't touch pixels never read them (column pruning); metadata stages
repartition by a content-digest prefix for uniform task sizing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "id long, n_bytes int, width int, height int, digest string"


def decode_image(blob: bytes):
    """Real decode — gated on an importable decoder (none in-container)."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(blob))
    except ImportError as e:  # pragma: no cover - no PIL in this container
        raise NotImplementedError(
            "image decoding requires PIL/pillow; metadata stages use the "
            "deterministic digest-derived fake instead"
        ) from e


def _fake_dims(digest_hex: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded dimensions: digest-derived."""
    return (
        int(digest_hex[:4], 16) % 1024 + 16,
        int(digest_hex[4:8], 16) % 1024 + 16,
    )


def image_meta_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(id, blob) → (id, n_bytes, width, height, digest)."""
    for pdf in batches:
        if pdf.empty:
            continue
        blobs = pdf["blob"].map(lambda b: bytes(b) if b is not None else b"")
        digests = blobs.map(lambda b: hashlib.md5(b).hexdigest())
        dims = digests.map(_fake_dims)
        yield pd.DataFrame(
            {
                "id": pdf["id"].astype("int64"),
                "n_bytes": blobs.map(len).astype("int32"),
                "width": dims.map(lambda wh: wh[0]).astype("int32"),
                "height": dims.map(lambda wh: wh[1]).astype("int32"),
                "digest": digests,
            }
        )


def extract_image_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Typed metadata for a binary column via an Arrow-batched stage."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(blob_col).alias("blob")
    ).mapInPandas(image_meta_stage, IMAGE_META_SCHEMA)


# --------------------------------------------------------------------- audio

AUDIO_META_SCHEMA = (
    "id long, n_bytes int, duration_ms long, sample_rate int, channels int, "
    "digest string"
)

_SAMPLE_RATES = (8000, 16000, 22050, 44100, 48000)


def decode_audio_wav(blob: bytes) -> tuple[int, int, int] | None:
    """REAL decode for the one container the stdlib handles: RIFF/WAVE.
    Returns (duration_ms, sample_rate, channels), or None if the blob is
    not a parseable WAV. Duration is exact integer math
    (frames * 1000 // rate) so any engine replaying it agrees."""
    import io
    import wave

    # full container magic: 'RIFF' + 4-byte size + 'WAVE' — a blob that
    # merely starts with 'RIFF' (e.g. arbitrary text bytes) never reaches
    # the parser
    if not (blob.startswith(b"RIFF") and blob[8:12] == b"WAVE"):
        return None
    try:
        with wave.open(io.BytesIO(blob)) as w:
            rate = w.getframerate()
            if rate <= 0:
                return None
            return (w.getnframes() * 1000 // rate, rate, w.getnchannels())
    except Exception:
        return None


def _fake_audio(digest_hex: str) -> tuple[int, int, int]:
    """Deterministic digest-derived stand-in for decoded audio properties
    (non-WAV codecs need external libraries this container lacks)."""
    return (
        int(digest_hex[8:12], 16) % 600000 + 1000,
        _SAMPLE_RATES[int(digest_hex[12:14], 16) % len(_SAMPLE_RATES)],
        int(digest_hex[14:16], 16) % 2 + 1,
    )


def audio_meta_stage(
    batches: Iterator[pd.DataFrame], real_wav: bool = True
) -> Iterator[pd.DataFrame]:
    """(id, blob) → (id, n_bytes, duration_ms, sample_rate, channels,
    digest). WAV blobs are REALLY parsed (stdlib); anything else gets the
    deterministic digest-derived fake. ``real_wav=False`` disables the real
    parse entirely (ADVICE r4): a battery query checked against an oracle
    that always replays the fake sets it so engine/oracle parity is
    STRUCTURAL, not a probabilistic bet that no blob happens to be a WAV."""
    for pdf in batches:
        if pdf.empty:
            continue
        blobs = pdf["blob"].map(lambda b: bytes(b) if b is not None else b"")
        digests = blobs.map(lambda b: hashlib.md5(b).hexdigest())
        props = [
            (decode_audio_wav(b) if real_wav else None) or _fake_audio(d)
            for b, d in zip(blobs, digests)
        ]
        yield pd.DataFrame(
            {
                "id": pdf["id"].astype("int64"),
                "n_bytes": blobs.map(len).astype("int32"),
                "duration_ms": pd.Series([p[0] for p in props], dtype="int64"),
                "sample_rate": pd.Series([p[1] for p in props], dtype="int32"),
                "channels": pd.Series([p[2] for p in props], dtype="int32"),
                "digest": digests,
            }
        )


def extract_audio_meta(
    df: DataFrame, id_col: str, blob_col: str, real_wav: bool = True
) -> DataFrame:
    from pyspark.sql import functions as F

    def stage(batches):
        return audio_meta_stage(batches, real_wav=real_wav)

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(blob_col).alias("blob")
    ).mapInPandas(stage, AUDIO_META_SCHEMA)


# --------------------------------------------------------------------- video

VIDEO_META_SCHEMA = (
    "id long, n_bytes int, duration_ms long, width int, height int, "
    "fps_x100 int, n_frames long, digest string"
)

_FPS_X100 = (2397, 2400, 2500, 3000, 6000)


def decode_video(blob: bytes):
    """Real pixel decode — gated on an importable decoder (none
    in-container). Container METADATA does not need a codec: see
    :func:`decode_video_mp4`."""
    try:
        import av  # noqa: F401
    except ImportError as e:  # pragma: no cover - no PyAV in this container
        raise NotImplementedError(
            "video frame decoding requires PyAV/ffmpeg; metadata stages "
            "parse MP4 boxes in pure Python (decode_video_mp4) and fall to "
            "the deterministic digest-derived fake for other containers"
        ) from e
    import io

    return av.open(io.BytesIO(blob))


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Iterate ISO-BMFF boxes in buf[start:end] → (type, body_off, box_end).
    Handles 64-bit largesize (size==1) and to-end-of-file (size==0) boxes;
    stops on any malformed length instead of raising."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(buf[off:off + 4], "big")
        typ = buf[off + 4:off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                return
            size = int.from_bytes(buf[off + 8:off + 16], "big")
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off or off + size > end:
            return
        yield typ, body, off + size
        off += size


def _mp4_find(buf: bytes, start: int, end: int, typ: bytes):
    for t, body, box_end in _mp4_boxes(buf, start, end):
        if t == typ:
            return body, box_end
    return None


def decode_video_mp4(blob: bytes) -> tuple[int, int, int, int, int] | None:
    """REAL metadata parse for the one container that needs no codec work:
    ISO-BMFF / MP4. Walks ftyp→moov→(mvhd, trak→tkhd/mdia) boxes in pure
    Python and returns (duration_ms, width, height, fps_x100, n_frames),
    or None if the blob is not a parseable MP4 (fall to the digest fake).

    All fields come from exact integer math so any engine replaying the
    same bytes agrees: duration_ms = mvhd duration*1000 // timescale;
    width/height are the video tkhd's 16.16 fixed-point values >> 16;
    n_frames = the video track's stts sample-count sum (stsz count as a
    fallback); fps_x100 = n_frames*100*media_timescale // media_duration.

    Mirrors the audio stage's real-RIFF/fake-fallback contract
    (decode_audio_wav); the reference crawler stores such resources as
    opaque bytes (WebCrawl Crawler.cs:1743-1771) — typed metadata is this
    engine's LLM-pipeline extension."""
    n = len(blob)
    # first top-level box must be ftyp (strict: avoids "happens to contain
    # boxes" false positives on arbitrary byte blobs)
    if n < 16 or blob[4:8] != b"ftyp":
        return None
    moov = _mp4_find(blob, 0, n, b"moov")
    if moov is None:
        return None
    mstart, mend = moov
    mvhd = _mp4_find(blob, mstart, mend, b"mvhd")
    if mvhd is None:
        return None
    b, _ = mvhd
    version = blob[b]
    try:
        if version == 1:
            timescale = int.from_bytes(blob[b + 20:b + 24], "big")
            duration = int.from_bytes(blob[b + 24:b + 32], "big")
        else:
            timescale = int.from_bytes(blob[b + 12:b + 16], "big")
            duration = int.from_bytes(blob[b + 16:b + 20], "big")
    except IndexError:
        return None
    if timescale <= 0:
        return None
    duration_ms = duration * 1000 // timescale

    width = height = 0
    fps_x100 = 0
    n_frames = 0
    for t, tb, te in _mp4_boxes(blob, mstart, mend):
        if t != b"trak":
            continue
        tkhd = _mp4_find(blob, tb, te, b"tkhd")
        if tkhd is None:
            continue
        hb, he = tkhd
        v = blob[hb]
        wh_off = hb + (88 if v == 1 else 76)
        if wh_off + 8 > he:
            continue
        w = int.from_bytes(blob[wh_off:wh_off + 4], "big") >> 16
        h = int.from_bytes(blob[wh_off + 4:wh_off + 8], "big") >> 16
        if w <= 0 or h <= 0 or width:  # first video track wins
            continue
        width, height = w, h
        mdia = _mp4_find(blob, tb, te, b"mdia")
        if mdia is None:
            continue
        db, de = mdia
        mdhd = _mp4_find(blob, db, de, b"mdhd")
        minf = _mp4_find(blob, db, de, b"minf")
        if mdhd is None or minf is None:
            continue
        mb, _ = mdhd
        mv = blob[mb]
        if mv == 1:
            media_ts = int.from_bytes(blob[mb + 20:mb + 24], "big")
            media_dur = int.from_bytes(blob[mb + 24:mb + 32], "big")
        else:
            media_ts = int.from_bytes(blob[mb + 12:mb + 16], "big")
            media_dur = int.from_bytes(blob[mb + 16:mb + 20], "big")
        stbl = _mp4_find(blob, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        stts = _mp4_find(blob, stbl[0], stbl[1], b"stts")
        if stts is not None:
            sb, se = stts
            n_entries = int.from_bytes(blob[sb + 4:sb + 8], "big")
            total = 0
            for i in range(n_entries):
                eo = sb + 8 + i * 8
                if eo + 8 > se:
                    break
                total += int.from_bytes(blob[eo:eo + 4], "big")
            n_frames = total
        else:
            stsz = _mp4_find(blob, stbl[0], stbl[1], b"stsz")
            if stsz is not None:
                sb, _ = stsz
                n_frames = int.from_bytes(blob[sb + 8:sb + 12], "big")
        if n_frames and media_dur > 0 and media_ts > 0:
            fps_x100 = n_frames * 100 * media_ts // media_dur
    if not width:
        return None
    return (duration_ms, width, height, fps_x100, n_frames)


def _fake_video(digest_hex: str) -> tuple[int, int, int, int, int]:
    """(duration_ms, width, height, fps_x100, n_frames) — digest-derived;
    n_frames = duration * fps in exact integer math."""
    duration_ms = int(digest_hex[8:12], 16) % 600000 + 1000
    w, h = _fake_dims(digest_hex)
    fps = _FPS_X100[int(digest_hex[12:14], 16) % len(_FPS_X100)]
    return (duration_ms, w, h, fps, duration_ms * fps // 100000)


def video_meta_stage(
    batches: Iterator[pd.DataFrame], real_mp4: bool = True
) -> Iterator[pd.DataFrame]:
    """(id, blob) → (id, n_bytes, duration_ms, width, height, fps_x100,
    n_frames, digest) — same Arrow plumbing as the image stage. MP4 blobs
    are REALLY parsed (pure-Python box walk, :func:`decode_video_mp4`);
    other containers get the deterministic digest-derived fake.
    ``real_mp4=False`` disables the real parse for battery queries whose
    oracle always replays the fake (same structural-parity contract as the
    audio stage's ``real_wav``)."""
    for pdf in batches:
        if pdf.empty:
            continue
        blobs = pdf["blob"].map(lambda b: bytes(b) if b is not None else b"")
        digests = blobs.map(lambda b: hashlib.md5(b).hexdigest())
        props = [
            (decode_video_mp4(b) if real_mp4 else None) or _fake_video(d)
            for b, d in zip(blobs, digests)
        ]
        yield pd.DataFrame(
            {
                "id": pdf["id"].astype("int64"),
                "n_bytes": blobs.map(len).astype("int32"),
                "duration_ms": pd.Series([p[0] for p in props], dtype="int64"),
                "width": pd.Series([p[1] for p in props], dtype="int32"),
                "height": pd.Series([p[2] for p in props], dtype="int32"),
                "fps_x100": pd.Series([p[3] for p in props], dtype="int32"),
                "n_frames": pd.Series([p[4] for p in props], dtype="int64"),
                "digest": digests,
            }
        )


def extract_video_meta(
    df: DataFrame, id_col: str, blob_col: str, real_mp4: bool = True
) -> DataFrame:
    from pyspark.sql import functions as F

    def stage(batches):
        return video_meta_stage(batches, real_mp4=real_mp4)

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(blob_col).alias("blob")
    ).mapInPandas(stage, VIDEO_META_SCHEMA)


FRAME_PATCH_SCHEMA = (
    "id long, frame_idx long, ts_ms long, patch_off long, patch_len long, "
    "patch_digest string, byte_sum long"
)

FRAME_PATCH_BYTES = 64
FRAME_PATCH_STRIDE = 997  # prime → frame_idx*stride walks the whole payload


def frame_patch_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(id, blob, frames:[{frame_idx, ts_ms}]) → one row per sampled frame
    with deterministic byte-window stats over the container payload:
    ``patch_off = (frame_idx * STRIDE) % max(n_bytes - PATCH + 1, 1)``,
    ``patch = blob[patch_off : patch_off + PATCH]``, md5 digest + byte sum.

    This is the frame-CONTENT stage the ``sample_frame_indices`` work list
    feeds: without a codec in-container there are no pixels, so "frame k"
    deterministically maps to a byte window of the payload — the plumbing
    (work-list join shape, Arrow batching, per-frame fan-out INSIDE the
    stage so each blob crosses the exchange exactly once) is the real
    100-TB design; a deployment swaps the window read for a codec call."""
    for pdf in batches:
        if pdf.empty:
            continue
        out_id, out_fi, out_ts, out_off, out_len, out_dig, out_sum = (
            [], [], [], [], [], [], []
        )
        for rid, blob, frames in zip(pdf["id"], pdf["blob"], pdf["frames"]):
            b = bytes(blob) if blob is not None else b""
            n = len(b)
            span = max(n - FRAME_PATCH_BYTES + 1, 1)
            for fr in frames:
                fi = int(fr["frame_idx"])
                off = (fi * FRAME_PATCH_STRIDE) % span
                patch = b[off:off + FRAME_PATCH_BYTES]
                out_id.append(int(rid))
                out_fi.append(fi)
                out_ts.append(int(fr["ts_ms"]))
                out_off.append(off)
                out_len.append(len(patch))
                out_dig.append(hashlib.md5(patch).hexdigest())
                out_sum.append(sum(patch))
        yield pd.DataFrame(
            {
                "id": pd.Series(out_id, dtype="int64"),
                "frame_idx": pd.Series(out_fi, dtype="int64"),
                "ts_ms": pd.Series(out_ts, dtype="int64"),
                "patch_off": pd.Series(out_off, dtype="int64"),
                "patch_len": pd.Series(out_len, dtype="int64"),
                "patch_digest": pd.Series(out_dig, dtype="object"),
                "byte_sum": pd.Series(out_sum, dtype="int64"),
            }
        )


def extract_frame_patches(
    blobs: DataFrame, work: DataFrame, id_col: str = "id",
    blob_col: str = "blob",
) -> DataFrame:
    """Join the frame-sampling work list (``sample_frame_indices`` output:
    id, frame_idx, ts_ms) back to the payload column and run the
    frame-content stage.

    Scale shape: the work list is pre-aggregated to ONE row per id
    (collect_list of the small (frame_idx, ts_ms) structs) BEFORE joining,
    so the multi-KB/MB payload bytes cross the shuffle exactly once per
    document instead of once per sampled frame; the per-frame fan-out
    happens inside the Arrow stage. Both join sides key on the uniform
    document id — never a broadcast assumption on the corpus."""
    from pyspark.sql import functions as F

    per_doc = work.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("frame_idx", "ts_ms"))).alias("frames")
    )
    joined = blobs.select(
        F.col(id_col).cast("long").alias("id"), F.col(blob_col).alias("blob")
    ).join(per_doc, "id")
    return joined.mapInPandas(frame_patch_stage, FRAME_PATCH_SCHEMA)


def sample_frame_indices(
    df: DataFrame, every_ms: int = 1000,
    id_col: str = "id", duration_col: str = "duration_ms",
    fps_col: str = "fps_x100",
) -> DataFrame:
    """(id, frame_idx, ts_ms) — frame-sampling plan: which frame indices a
    decode stage should extract, one row per sample instant. Pure JVM
    ``sequence``/``explode`` — the expensive pixel work downstream receives
    an exact work list and the planning never touches Python."""
    from pyspark.sql import functions as F

    return (
        df.select(
            F.col(id_col).alias("id"), F.col(duration_col).alias("d"),
            F.col(fps_col).alias("f"),
        )
        .select(
            "id",
            F.explode(
                F.expr(f"sequence(0, greatest(cast((d - 1) / {every_ms} as int), 0))")
            ).alias("k"),
            "d", "f",
        )
        .select(
            "id",
            F.expr(f"cast(k * {every_ms} as bigint)").alias("ts_ms"),
            F.expr(f"cast(k * {every_ms} * f div 100000 as bigint)").alias("frame_idx"),
        )
    )
