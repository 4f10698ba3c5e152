"""Multimodal (image/audio/video) column support.

Data model: media travels as an opaque ``binary`` column plus typed
metadata — the only schema that scales to 100 TB (media bytes stay in
parquet/object storage; Spark moves them only through narrow
mapInPandas stages, never through a shuffle).

    MEDIA_SCHEMA: data binary, media_type string,
                  meta map<string,string>

Decode/feature stages run as Arrow-batched ``mapInPandas`` (the
correct Spark shape for per-item Python libraries: one python-worker
round trip per batch, not per row). Decoding is REAL for the two
container formats a pure-Python stdlib implementation can cover
end-to-end:

- PNG  — signature + IHDR parse, zlib IDAT inflate, scanline
  unfiltering (all five filter types), 8-bit gray/RGB/RGBA; yields
  true (width, height) and an exact integer pixel sum for mean luma.
- WAV  — RIFF/fmt/data chunk walk, PCM16 samples; yields true
  (sample_rate, channels, duration) and an exact sum of squares for
  RMS.

Formats needing codec libraries (JPEG, MP3, H.264, ...) raise
``NotImplementedError`` from :func:`decode_media` — swap that branch
for PIL/soundfile/av calls in a real deployment. The matching
encoders (:func:`encode_png_gray`, :func:`encode_wav_pcm16`) exist so
tests and queries can synthesize REAL payloads and verify the decode
round-trip bit-for-bit.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "item_id bigint, media_type string, width int, height int, "
    "luma_sum bigint, mean_luma double"
)

AUDIO_FEATURES_SCHEMA = (
    "item_id bigint, media_type string, sample_rate int, n_channels int, "
    "n_samples bigint, duration_s double, rms double"
)

VIDEO_FEATURES_SCHEMA = (
    "item_id bigint, media_type string, width int, height int, "
    "n_frames bigint, n_sampled bigint, luma_sum bigint, mean_luma double"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ======================================================================
# PNG: pure-Python encode/decode (8-bit gray / RGB / RGBA)
# ======================================================================

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, rows: list[list[int]],
                    filter_type: int = 2) -> bytes:
    """Minimal valid grayscale 8-bit PNG. ``rows`` is height lists of
    width pixel values (0-255). ``filter_type`` 0 (None) or 2 (Up) is
    applied to every scanline after the first (the first is always 0),
    so a decoder must actually unfilter to recover the pixels."""
    if len(rows) != height or any(len(r) != width for r in rows):
        raise ValueError("rows shape must be height x width")
    raw = bytearray()
    prev = [0] * width
    for i, row in enumerate(rows):
        ft = 0 if i == 0 else filter_type
        raw.append(ft)
        if ft == 0:
            raw.extend(row)
        elif ft == 2:  # Up: delta vs the row above, mod 256
            raw.extend((c - p) & 0xFF for c, p in zip(row, prev))
        else:
            raise ValueError("encoder supports filter types 0 and 2")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> dict:
    """Parse + fully decode a non-interlaced 8-bit gray/RGB/RGBA PNG.
    Returns width, height, n_channels, and the exact integer sum of
    all pixel samples (``luma_sum``) — kept as an int so downstream
    statistics can stay bit-reproducible."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    # Unfilter scanlines with numpy row-at-a-time ops. None/Up are one
    # vector op; Sub is a per-channel cumulative sum (out[x] =
    # (out[x-c] + raw[x]) mod 256 is exactly cumsum mod 256 along the
    # width axis); Average/Paeth carry a true left-to-right dependency,
    # so they loop over pixel columns but stay channel-vectorized.
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = scan[:, 0]
    if not np.all(ftypes <= 4):
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"bad PNG filter type {bad}")
    prev = np.zeros((width, channels), dtype=np.int64)
    total = 0
    lines: list[np.ndarray] = []
    for y in range(height):
        ft = int(ftypes[y])
        cur = scan[y, 1:].astype(np.int64).reshape(width, channels)
        if ft == 0:
            line = cur
        elif ft == 1:  # Sub: cumsum mod 256 per channel
            line = np.cumsum(cur, axis=0) & 0xFF
        elif ft == 2:  # Up: one vector add
            line = (cur + prev) & 0xFF
        elif ft == 3:  # Average
            line = np.empty_like(cur)
            left = np.zeros(channels, dtype=np.int64)
            for x in range(width):
                left = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
                line[x] = left
        else:  # Paeth
            line = np.empty_like(cur)
            left = np.zeros(channels, dtype=np.int64)
            upleft = np.zeros(channels, dtype=np.int64)
            for x in range(width):
                up = prev[x]
                p = left + up - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (cur[x] + pred) & 0xFF
                line[x] = left
                upleft = up
        total += int(line.sum())
        prev = line
        lines.append(line.astype(np.uint8))
    return {
        "width": width,
        "height": height,
        "n_channels": channels,
        "luma_sum": total,
        # full decoded pixel grid (h, w, c) uint8 — windowed/tiled
        # consumers (extract_image_tiles) read it; aggregate-only
        # consumers ignore it
        "pixels": (
            np.stack(lines)
            if lines
            else np.zeros((0, width, channels), dtype=np.uint8)
        ),
    }


# ======================================================================
# WAV: pure-Python encode/decode (PCM16)
# ======================================================================

def encode_wav_pcm16(sample_rate: int, channels: int,
                     samples: list[int]) -> bytes:
    """Minimal valid RIFF/WAVE with one PCM16 data chunk. ``samples``
    are interleaved int16 values."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav(data: bytes) -> dict:
    """Chunk-walk a RIFF/WAVE file; PCM16 only. Returns rate/channels/
    counts plus the exact integer sum of squared samples so RMS stays
    bit-reproducible."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF header)")
    pos = 12
    rate = channels = bits = None
    saw_data = False
    sumsq = 0
    n_samples = 0
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif tag == b"data":
            # accumulate BOTH sumsq and n_samples so nonstandard (but
            # valid) multi-data-chunk files stay self-consistent
            saw_data = True
            chunk_n = len(body) // 2
            samples = np.frombuffer(
                body[: chunk_n * 2], dtype="<i2"
            ).astype(np.int64)
            n_samples += chunk_n
            sumsq += int(samples @ samples)
    if rate is None or not saw_data:
        raise ValueError("WAV missing fmt/data chunk")
    n_frames = n_samples // channels
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "n_samples": n_frames,
        "duration_s": n_frames / rate,
        "sumsq": sumsq,
        "rms": (sumsq / n_samples) ** 0.5 if n_samples else 0.0,
    }


# ======================================================================
# Y4M (YUV4MPEG2): pure-Python encode/decode of the public uncompressed
# video container (what ffmpeg/mjpegtools emit with -f yuv4mpegpipe).
# Mono (luma-only) colorspace keeps the plane math exact and simple;
# COMPRESSED video (h264/vp9/...) still needs PyAV — that branch stays
# a documented NotImplementedError.
# ======================================================================

_Y4M_SIG = b"YUV4MPEG2 "


def encode_y4m_mono(width: int, height: int, frames: list[bytes]) -> bytes:
    """Minimal valid YUV4MPEG2 stream, Cmono colorspace: one luma
    plane of width*height bytes per FRAME."""
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    )
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("frame plane size mismatch")
        out += b"FRAME\n" + fr
    return bytes(out)


def decode_y4m(data: bytes, sample_every: int = 1) -> dict:
    """Parse a YUV4MPEG2 stream (mono or 420-family): header
    parameters, FRAME walk, and the exact integer luma sum over every
    ``sample_every``-th frame (frame sampling without decoding the
    skipped frames — the planes are fixed-size, so skipping is a
    seek). Returns width/height/n_frames/n_sampled/luma_sum."""
    if not data.startswith(_Y4M_SIG):
        raise ValueError("not a Y4M (bad YUV4MPEG2 signature)")
    nl = data.index(b"\n")
    width = height = None
    cs = "420"
    for tok in data[len(_Y4M_SIG) - 1 : nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("C"):
            cs = t[1:]
    if not width or not height:
        raise ValueError("Y4M missing W/H header parameters")
    if cs.startswith("mono"):
        frame_bytes = width * height
    elif cs.startswith("420"):
        frame_bytes = width * height * 3 // 2
    elif cs.startswith("422"):
        frame_bytes = width * height * 2
    elif cs.startswith("444"):
        frame_bytes = width * height * 3
    else:
        raise NotImplementedError(f"unsupported Y4M colorspace {cs}")
    pos = nl + 1
    n_frames = 0
    n_sampled = 0
    luma = 0
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M FRAME marker")
        plane_start = fnl + 1
        if plane_start + frame_bytes > len(data):
            raise ValueError("truncated Y4M frame")
        if n_frames % sample_every == 0:
            # luma is always the FIRST width*height bytes of the plane
            y = np.frombuffer(
                data[plane_start : plane_start + width * height], dtype=np.uint8
            )
            luma += int(y.astype(np.int64).sum())
            n_sampled += 1
        n_frames += 1
        pos = plane_start + frame_bytes
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "n_sampled": n_sampled,
        "luma_sum": luma,
    }


_JPEG_SIG = b"\xff\xd8\xff"


def _decode_jpeg_pil(data: bytes) -> dict:
    """JPEG via the OPTIONAL PIL dependency — the documented codec
    swap-point, exercised. Imported lazily inside the Arrow-batched
    kernel's per-item call so environments without PIL pay nothing;
    emits the same keys as :func:`decode_png` (width, height,
    n_channels, integer ``luma_sum`` over the 8-bit grayscale
    conversion) so every downstream feature column is
    format-agnostic."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "JPEG payload but PIL is not installed; "
            "pip install pillow to enable the optional JPEG codec"
        ) from e
    import io

    img = Image.open(io.BytesIO(data))
    n_channels = len(img.getbands())
    arr = np.asarray(img.convert("L"), dtype=np.int64)
    return {
        "width": int(img.width),
        "height": int(img.height),
        "n_channels": n_channels,
        "luma_sum": int(arr.sum()),
    }


def _decode_audio_soundfile(data: bytes) -> dict:
    """Compressed audio (MP3/FLAC/OGG) via the OPTIONAL soundfile
    dependency — the audio half of the codec swap-point. Emits the
    same keys as :func:`decode_wav`; sumsq/rms are computed over the
    decoded float stream scaled to int16 range so the numbers are
    comparable with the PCM path."""
    try:
        import soundfile as sf
    except ImportError as e:
        raise NotImplementedError(
            "compressed-audio payload but soundfile is not installed; "
            "pip install soundfile to enable the optional audio codec"
        ) from e
    import io

    samples, rate = sf.read(io.BytesIO(data), dtype="int16")
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, channels = arr.shape
    n_samples = n_frames * channels
    sumsq = int((arr.ravel() @ arr.ravel()))
    return {
        "sample_rate": int(rate),
        "n_channels": int(channels),
        "n_samples": n_frames,
        "duration_s": n_frames / rate,
        "sumsq": sumsq,
        "rms": (sumsq / n_samples) ** 0.5 if n_samples else 0.0,
    }


def _decode_video_av(data: bytes, sample_every: int = 1) -> dict:
    """Compressed video (H.264 in MP4/Matroska, or raw Annex-B) via
    the OPTIONAL av (PyAV/FFmpeg) dependency — the video half of the
    codec swap-point, same feature-flag pattern as the PIL and
    soundfile halves. Imported lazily per-item so environments
    without av pay nothing; emits the same keys as
    :func:`decode_y4m` (width, height, n_frames, n_sampled, integer
    ``luma_sum`` over the sampled frames' 8-bit grayscale planes) so
    downstream video features are container-agnostic."""
    try:
        import av
    except ImportError as e:
        raise NotImplementedError(
            "compressed-video payload but av is not installed; "
            "pip install av to enable the optional H.264/MP4/Matroska "
            "video codec"
        ) from e
    import io

    width = height = n_frames = n_sampled = 0
    luma = 0
    with av.open(io.BytesIO(data)) as container:
        for frame in container.decode(video=0):
            if n_frames % sample_every == 0:
                arr = np.asarray(
                    frame.to_ndarray(format="gray"), dtype=np.int64
                )
                height, width = arr.shape
                luma += int(arr.sum())
                n_sampled += 1
            n_frames += 1
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "n_sampled": n_sampled,
        "luma_sum": luma,
    }


_MP3_ID3_SIG = b"ID3"
_FLAC_SIG = b"fLaC"
_OGG_SIG = b"OggS"
_MP4_FTYP = b"ftyp"  # box type at byte offset 4
_MKV_EBML_SIG = b"\x1a\x45\xdf\xa3"
_H264_ANNEXB_SIGS = (b"\x00\x00\x00\x01", b"\x00\x00\x01")


def _looks_like_annexb(data: bytes) -> bool:
    """Raw Annex-B sniff, hardened (r7 advice): a bare 00 00 01 start
    code is a 3-byte prefix weak enough that arbitrary binary blobs
    would get routed to the av decoder and die with a misleading
    install-av/decode error. Require a plausible NAL header byte
    right after the start code too: forbidden_zero_bit clear and
    nal_unit_type in the H.264-defined 1..23 range."""
    for sig in _H264_ANNEXB_SIGS:
        if data.startswith(sig):
            if len(data) <= len(sig):
                return False
            nal = data[len(sig)]
            return (nal & 0x80) == 0 and 1 <= (nal & 0x1F) <= 23
    return False


def decode_media(data: bytes, media_type: str | None = None) -> dict:
    """Sniff + decode. PNG, WAV and uncompressed Y4M video decode for
    real (pure Python); JPEG routes through the optional-PIL swap-point
    (:func:`_decode_jpeg_pil`), MP3/FLAC/OGG through the optional-
    soundfile one (:func:`_decode_audio_soundfile`), and compressed
    video (H.264 in MP4/Matroska, raw Annex-B) through the optional-av
    one (:func:`_decode_video_av`) — each a clean NotImplementedError
    with an install hint when the library is absent."""
    if data is None:
        raise ValueError("no payload")
    if data.startswith(_PNG_SIG):
        return {"kind": "image", **decode_png(data)}
    if data.startswith(_JPEG_SIG):
        return {"kind": "image", **_decode_jpeg_pil(data)}
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return {"kind": "audio", **decode_wav(data)}
    if (
        data.startswith(_MP3_ID3_SIG)
        or data.startswith(_FLAC_SIG)
        or data.startswith(_OGG_SIG)
        or (len(data) > 1 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0)
    ):
        return {"kind": "audio", **_decode_audio_soundfile(data)}
    if data.startswith(_Y4M_SIG):
        return {"kind": "video", **decode_y4m(data)}
    if (
        (len(data) >= 12 and data[4:8] == _MP4_FTYP)
        or data.startswith(_MKV_EBML_SIG)
        or _looks_like_annexb(data)
    ):
        return {"kind": "video", **_decode_video_av(data)}
    raise NotImplementedError(
        f"no codec for media_type={media_type!r} (unrecognized "
        "container signature)"
    )


# ======================================================================
# Spark operators
# ======================================================================

def attach_media_column(
    df: DataFrame, bytes_col: str, media_type: str, id_col: str
) -> DataFrame:
    """Wrap raw bytes into the canonical media struct."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.struct(
            F.col(bytes_col).alias("data"),
            F.lit(media_type).alias("media_type"),
            F.create_map().cast("map<string,string>").alias("meta"),
        ).alias("media"),
    )


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas image decode → (dims, exact luma sum, mean luma).
    Input needs columns (item_id, media struct). ``mean_luma`` is one
    double division of exact ints (luma_sum / (pixels*255)), so it is
    bit-identical to any engine computing the same ints."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                media = r["media"]
                d = decode_png(bytes(media["data"]))
                denom = d["width"] * d["height"] * d["n_channels"] * 255
                rows.append(
                    {
                        "item_id": r["item_id"],
                        "media_type": media["media_type"],
                        "width": d["width"],
                        "height": d["height"],
                        "luma_sum": d["luma_sum"],
                        "mean_luma": d["luma_sum"] / denom,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas WAV decode → (rate, channels, duration, RMS)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                media = r["media"]
                d = decode_wav(bytes(media["data"]))
                rows.append(
                    {
                        "item_id": r["item_id"],
                        "media_type": media["media_type"],
                        "sample_rate": d["sample_rate"],
                        "n_channels": d["n_channels"],
                        "n_samples": d["n_samples"],
                        "duration_s": d["duration_s"],
                        "rms": d["rms"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def extract_video_features(df: DataFrame, sample_every: int = 1) -> DataFrame:
    """mapInPandas Y4M decode → (dims, frame counts, exact luma sum of
    the sampled frames, mean luma). ``sample_every`` decodes every
    k-th frame and seeks past the rest — the cheap-scan mode a 100 TB
    video corpus needs. mean_luma is one double division of exact
    ints, bit-identical cross-engine."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                media = r["media"]
                d = decode_y4m(bytes(media["data"]), sample_every)
                denom = d["width"] * d["height"] * d["n_sampled"] * 255
                rows.append(
                    {
                        "item_id": r["item_id"],
                        "media_type": media["media_type"],
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                        "n_sampled": d["n_sampled"],
                        "luma_sum": d["luma_sum"],
                        "mean_luma": d["luma_sum"] / denom if denom else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, VIDEO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling plumbing for OPAQUE video payloads (compressed
    formats whose decode needs PyAV): emits one row per sampled byte
    offset (explode — bounded by payload size / stride). For
    uncompressed Y4M, extract_video_features decodes sampled frames
    for real."""
    return df.select(
        "item_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.length(F.col("media.data")) / every_n_bytes).cast("int") - 1,
                    F.lit(0),
                ),
            )
        ).alias("frame_idx"),
        F.length(F.col("media.data")).alias("n_bytes"),
    )


def decode_wav_samples(data: bytes) -> dict:
    """Chunk-walk variant of :func:`decode_wav` that RETURNS the
    PCM16 samples (int64 numpy array, data chunks concatenated) for
    windowed analysis. Same format guards."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF header)")
    pos = 12
    rate = channels = None
    parts = []
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif tag == b"data":
            chunk_n = len(body) // 2
            parts.append(
                np.frombuffer(body[: chunk_n * 2], dtype="<i2").astype(
                    np.int64
                )
            )
    samples = (
        np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)
    )
    return {"sample_rate": rate, "n_channels": channels, "samples": samples}


AUDIO_ENERGY_SCHEMA = (
    "item_id bigint, window_idx bigint, n_in_window bigint, sum_sq bigint"
)


def extract_audio_energy_windows(
    df: DataFrame, window_samples: int = 32
) -> DataFrame:
    """Windowed audio energy: fixed-size sample windows, each emitting
    its EXACT integer sum of squared samples (int16 squares summed in
    int64 — no float ever, so the energy profile hash-checks
    cross-engine; callers derive RMS/dB as a final display step). The
    silence-detection / VAD-precursor shape: one Arrow-batched decode
    pass, rows out proportional to audio length / window."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                media = r["media"]
                d = decode_wav_samples(bytes(media["data"]))
                s = d["samples"]
                for w0 in range(0, len(s), window_samples):
                    chunk = s[w0 : w0 + window_samples]
                    rows.append(
                        {
                            "item_id": r["item_id"],
                            "window_idx": w0 // window_samples,
                            "n_in_window": len(chunk),
                            "sum_sq": int(chunk @ chunk),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, AUDIO_ENERGY_SCHEMA)


IMAGE_TILES_SCHEMA = (
    "item_id bigint, tile_y int, tile_x int, n_px bigint, luma_sum bigint"
)


def extract_image_tiles(df: DataFrame, tile: int = 8) -> DataFrame:
    """Image patchification: fixed ``tile`` x ``tile`` pixel tiles
    (ViT-patch layout; edge tiles partial), each emitting its EXACT
    integer sample sum — the embedding-precursor statistic that stays
    bit-reproducible cross-engine. One Arrow-batched decode pass; rows
    out proportional to image area / tile²."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                media = r["media"]
                d = decode_png(bytes(media["data"]))
                px = d["pixels"].astype(np.int64)  # (h, w, c)
                h, w = d["height"], d["width"]
                for ty in range(0, h, tile):
                    for tx in range(0, w, tile):
                        block = px[ty : ty + tile, tx : tx + tile, :]
                        rows.append(
                            {
                                "item_id": r["item_id"],
                                "tile_y": ty // tile,
                                "tile_x": tx // tile,
                                "n_px": block.shape[0] * block.shape[1],
                                "luma_sum": int(block.sum()),
                            }
                        )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, IMAGE_TILES_SCHEMA)


RESIZED_IMAGE_SCHEMA = (
    "item_id bigint, out_width int, out_height int, png binary"
)


def resize_gray_area(px: np.ndarray, factor: int) -> np.ndarray:
    """Integer area-average downsample of a grayscale pixel grid by
    ``factor`` (floor division of exact block sums — deterministic on
    any platform, no float resampling kernels). Partial edge blocks
    average over their true pixel count. Returns (h', w') uint8."""
    h, w = px.shape[:2]
    g = px.reshape(h, w)[..., None] if px.ndim == 2 else px
    if g.shape[2] != 1:
        raise NotImplementedError("area resize supports grayscale only")
    g = g[:, :, 0].astype(np.int64)
    oh = (h + factor - 1) // factor
    ow = (w + factor - 1) // factor
    out = np.empty((oh, ow), dtype=np.int64)
    for by in range(oh):
        for bx in range(ow):
            block = g[
                by * factor : (by + 1) * factor,
                bx * factor : (bx + 1) * factor,
            ]
            out[by, bx] = block.sum() // block.size
    return out.astype(np.uint8)


def resize_images(df: DataFrame, factor: int = 2) -> DataFrame:
    """mapInPandas grayscale resize: decode PNG, area-downsample by
    ``factor``, re-encode PNG — the thumbnailing/normalization stage
    of an image-corpus pipeline, end to end through the REAL codecs.
    Deterministic integer arithmetic throughout, so resized bytes are
    identical on every run and platform."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                media = r["media"]
                d = decode_png(bytes(media["data"]))
                if d["n_channels"] != 1:
                    raise NotImplementedError("resize path is grayscale")
                small = resize_gray_area(d["pixels"][:, :, 0], factor)
                oh, ow = small.shape
                png = encode_png_gray(
                    ow, oh, [list(map(int, row)) for row in small]
                )
                rows.append(
                    {
                        "item_id": r["item_id"],
                        "out_width": ow,
                        "out_height": oh,
                        "png": png,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, RESIZED_IMAGE_SCHEMA)
