"""Multimodal column plumbing (north-star scope).

Media (image/audio/video) are opaque BINARY columns with typed
metadata. The Spark-side plumbing — schema, partition-friendly batch
iteration, Arrow UDF signatures — is real and tested.

Decode paths:

- ``decode_media_real`` — REAL codecs, stdlib-only (no Pillow /
  librosa in this runtime): PNG (zlib inflate + per-row unfilter,
  8-bit non-interlaced gray/RGB/RGBA), netpbm P5/P6, and RIFF/WAV
  PCM via the ``wave`` module. Deterministic pixel/sample statistics
  out; unknown formats yield kind='unknown' with NULL features (a
  100 TB pipeline quarantines undecodable blobs, it doesn't die).
  Pillow, when installed, is used as an optional fallback for other
  image formats (import-gated).
- ``decode_media(fake_decoder=True)`` — deterministic byte-histogram
  fake, kept as the DuckDB-oracle-checkable pipeline-shape path
  (SQL can replay byte histograms; it cannot inflate a PNG).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)


def attach_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Cheap metadata that needs no codec: byte length + content hash
    (pure column expressions)."""
    m = F.col(media_col)
    return df.withColumn("n_bytes", F.octet_length(m)).withColumn(
        "content_hash", F.md5(m)
    )


def decode_media(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    feature_dim: int = 8,
    fake_decoder: bool = False,
) -> DataFrame:
    """media binary → feature ARRAY<DOUBLE> via mapInPandas (Arrow
    batches). With ``fake_decoder`` the features are a deterministic
    byte-histogram projection (stable across runs, SQL-replayable —
    the DuckDB oracle path); otherwise NotImplementedError pointing
    at ``decode_media_real``, the actual stdlib-codec decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_decoder:
                raise NotImplementedError(
                    "use decode_media_real for actual codecs (PNG/netpbm/"
                    "WAV, stdlib); fake_decoder=True gives the "
                    "SQL-replayable byte-histogram shape"
                )
            feats = []
            for blob in pdf[media_col]:
                # NULL blob -> all-zero histogram (same quarantine
                # stance as decode_media_real; bytes(None) raises)
                arr = np.frombuffer(
                    bytes(blob) if blob is not None else b"", dtype=np.uint8
                )
                hist = np.bincount(arr % feature_dim, minlength=feature_dim).astype(
                    np.float64
                )
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, media_col).mapInPandas(
        batches, schema=f"{id_col} long, features array<double>"
    )


def _decode_png(blob: bytes):
    """Minimal PNG decoder: stdlib zlib + numpy unfilter. Supports
    8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA), non-interlaced — the overwhelming majority of pipeline
    PNGs. Returns (H, W, C) uint8 array."""
    import struct
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, bit_depth, color_type, interlace = 8, 0, 0, 0, 0, 0
    idat = []
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if bit_depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={bit_depth}, interlace={interlace})")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            row += prev
        else:
            # Sub/Average/Paeth need the in-progress row — scalar walk
            # (rows are short; this is a per-batch Arrow UDF, not a
            # per-row JVM crossing)
            cur = row.astype(np.int32)
            pr = prev.astype(np.int32)
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = pr[x]
                c = pr[x - channels] if x >= channels else 0
                if ftype == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
            row = cur.astype(np.uint8)
        out[y] = row
        prev = row
    return out.reshape(height, width, channels)


def _decode_netpbm(blob: bytes):
    """P5 (PGM) / P6 (PPM) binary netpbm → (H, W, C) uint8."""
    parts = []
    pos = 2
    # header: magic, width, height, maxval — whitespace/comment-separated
    while len(parts) < 3 and pos < len(blob):
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = parts
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    channels = 3 if blob[:2] == b"P6" else 1
    n = width * height * channels
    arr = np.frombuffer(blob, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(height, width, channels)


def _decode_wav(blob: bytes):
    """RIFF/WAV PCM via stdlib ``wave`` → (n_frames, n_channels)
    float64 in [-1, 1], plus the sample rate."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        n_ch, sw, rate, n_frames = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(n_frames)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return x.reshape(-1, n_ch), rate


REAL_DECODE_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, "
    "sample_rate int, n_samples long, features array<double>"
)


def _media_features(blob: bytes) -> dict:
    """Dispatch on magic bytes; returns one REAL_DECODE_SCHEMA row.
    Image features: [mean, std, min, max] of the normalized pixels +
    per-channel means (first 4 channels, -1 padding). Audio features:
    [mean, std, min, max, rms, zero-crossing rate, duration_s, -1]."""
    row = {
        "kind": "unknown",
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "n_samples": None,
        "features": None,
    }
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" or blob[:2] in (b"P5", b"P6"):
            img = _decode_png(blob) if blob[:1] == b"\x89" else _decode_netpbm(blob)
            px = img.astype(np.float64) / 255.0
            ch_means = [float(px[:, :, c].mean()) for c in range(min(img.shape[2], 4))]
            ch_means += [-1.0] * (4 - len(ch_means))
            row.update(
                kind="image/png" if blob[:1] == b"\x89" else "image/netpbm",
                width=int(img.shape[1]),
                height=int(img.shape[0]),
                channels=int(img.shape[2]),
                features=[
                    float(px.mean()),
                    float(px.std()),
                    float(px.min()),
                    float(px.max()),
                ]
                + ch_means,
            )
        elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            x, rate = _decode_wav(blob)
            mono = x.mean(axis=1)
            zcr = (
                float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                if len(mono) > 1
                else 0.0
            )
            row.update(
                kind="audio/wav",
                channels=int(x.shape[1]),
                sample_rate=int(rate),
                n_samples=int(x.shape[0]),
                features=[
                    float(mono.mean()) if len(mono) else 0.0,
                    float(mono.std()) if len(mono) else 0.0,
                    float(mono.min()) if len(mono) else 0.0,
                    float(mono.max()) if len(mono) else 0.0,
                    float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0,
                    zcr,
                    float(x.shape[0] / rate) if rate else 0.0,
                    -1.0,
                ],
            )
        else:
            # optional Pillow fallback for other image formats
            try:
                import io

                from PIL import Image  # noqa: import-gated optional dep

                img = np.asarray(Image.open(io.BytesIO(bytes(blob))).convert("RGB"))
                px = img.astype(np.float64) / 255.0
                row.update(
                    kind="image/pil",
                    width=int(img.shape[1]),
                    height=int(img.shape[0]),
                    channels=3,
                    features=[
                        float(px.mean()),
                        float(px.std()),
                        float(px.min()),
                        float(px.max()),
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        -1.0,
                    ],
                )
            except Exception:
                pass
    except Exception:
        row["kind"] = "corrupt"
    return row


def decode_media_real(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL decode over Arrow batches (mapInPandas): PNG / netpbm /
    WAV via stdlib codecs, optional Pillow fallback, per-blob
    quarantine (kind='corrupt'/'unknown', NULL features) instead of
    task failure — at 100 TB a poison blob must not kill the stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                r = _media_features(bytes(blob) if blob is not None else b"")
                r[id_col] = mid
                rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "kind",
                    "width",
                    "height",
                    "channels",
                    "sample_rate",
                    "n_samples",
                    "features",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        batches, schema=REAL_DECODE_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Metadata-only frame sampling: emits (media_id, frame_idx,
    offset) rows from ``meta.duration_ms`` without touching the blob
    — the cheap planning pass that decides WHICH frames to decode.
    The actual per-frame pixel decode is ``sample_frames_real``
    (netpbm streams); compressed containers (H.264 etc.) still need
    an external codec and quarantine as kind='unknown' there."""
    # ceil, not floor: a 2500 ms clip at every_ms=1000 has a planned
    # sample point at 2000 ms (strictly inside the clip) — floor
    # silently dropped the tail frame of every non-multiple duration
    n_frames = F.greatest(
        F.ceil(F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"),
        F.lit(1),
    )
    return df.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "offset_s"),
    ).select(
        id_col, "frame_idx", (F.col("frame_idx") * F.lit(every_ms)).alias("offset_ms")
    )


FRAME_SCHEMA = (
    "media_id long, kind string, frame_idx int, n_frames int, width int, "
    "height int, channels int, features array<double>"
)


def _netpbm_stream_index(blob: bytes) -> list[tuple[int, int, int, int, int]]:
    """Frame index of a concatenated binary netpbm (P5/P6) stream —
    the uncompressed video interchange format ffmpeg emits with
    ``-f image2pipe -vcodec ppm``. Header parsing only: each frame's
    payload is SKIPPED via its computed byte size, so indexing a
    1000-frame blob costs 1000 header parses, not 1000 decodes.
    Returns [(payload_offset, end_offset, w, h, channels), ...]."""
    frames = []
    pos, n = 0, len(blob)
    while pos < n:
        magic = blob[pos : pos + 2]
        if magic not in (b"P5", b"P6"):
            raise ValueError(f"not a netpbm frame at offset {pos}")
        p = pos + 2
        parts: list[int] = []
        while len(parts) < 3 and p < n:
            while p < n and blob[p : p + 1].isspace():
                p += 1
            if blob[p : p + 1] == b"#":
                while p < n and blob[p] != 0x0A:
                    p += 1
                continue
            s = p
            while p < n and not blob[p : p + 1].isspace():
                p += 1
            parts.append(int(blob[s:p]))
        p += 1  # single whitespace after maxval
        if len(parts) < 3:
            raise ValueError("truncated netpbm header")
        w, h, maxval = parts
        if maxval > 255:
            raise ValueError("16-bit netpbm unsupported")
        c = 3 if magic == b"P6" else 1
        end = p + w * h * c
        if end > n:
            raise ValueError("truncated netpbm frame payload")
        frames.append((p, end, w, h, c))
        pos = end
    return frames


def sample_frames_real(
    df: DataFrame,
    every_n: int = 10,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL video frame sampling + decode for concatenated-netpbm
    streams (ffmpeg's ``image2pipe``/ppm output): every ``every_n``-th
    frame (always including frame 0) is located via the O(#frames)
    header index and ONLY those frames are decoded to pixel features
    — exactly how a production sampler seeks keyframes instead of
    decoding the whole clip. Arrow-batched mapInPandas; blobs that
    are not netpbm streams quarantine as kind='unknown', torn streams
    as kind='corrupt' (one poison clip must not kill the stage).
    Features per frame: [mean, std, min, max, per-channel means...]
    of the uint8 pixels scaled to [0, 1]."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                b = bytes(blob) if blob is not None else b""
                base = {
                    id_col: mid,
                    "kind": "unknown",
                    "frame_idx": None,
                    "n_frames": None,
                    "width": None,
                    "height": None,
                    "channels": None,
                    "features": None,
                }
                if b[:2] not in (b"P5", b"P6"):
                    rows.append(base)
                    continue
                try:
                    index = _netpbm_stream_index(b)
                except Exception:
                    rows.append({**base, "kind": "corrupt"})
                    continue
                nf = len(index)
                try:
                    # the per-frame decode sits under its own guard:
                    # a header-valid ZERO-AREA frame ('P5 0 0 255')
                    # passes the index but empty-array reductions
                    # raise — one poison clip must quarantine, not
                    # kill the stage (same contract as the index call)
                    frame_rows = []
                    for i in range(0, nf, every_n):
                        off, end, w, h, c = index[i]
                        px = (
                            np.frombuffer(b, np.uint8, count=end - off, offset=off)
                            .reshape(h, w, c)
                            .astype(np.float64)
                            / 255.0
                        )
                        frame_rows.append(
                            {
                                id_col: mid,
                                "kind": "video/netpbm",
                                "frame_idx": i,
                                "n_frames": nf,
                                "width": w,
                                "height": h,
                                "channels": c,
                                "features": [
                                    float(px.mean()),
                                    float(px.std()),
                                    float(px.min()),
                                    float(px.max()),
                                ]
                                + [float(px[:, :, ch].mean()) for ch in range(c)],
                            }
                        )
                except Exception:
                    rows.append({**base, "kind": "corrupt"})
                    continue
                rows.extend(frame_rows)
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "kind",
                    "frame_idx",
                    "n_frames",
                    "width",
                    "height",
                    "channels",
                    "features",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, kind string, out_w int, out_h int, channels int, "
    "pixels binary"
)


def resize_images(
    df: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode + nearest-neighbor resize to (out_h, out_w) over Arrow
    batches — the thumbnail/normalization step in front of a vision
    encoder. Deterministic integer index math
    (``src_row = i * H // out_h``), no interpolation, so the output
    bytes are reproducible anywhere. Resized uint8 pixels travel as
    one BINARY cell (row-major, channel-last) rather than a
    per-pixel array — the same packed-bytes-through-the-shuffle
    pattern as the IVF kernel. Undecodable blobs quarantine per row
    (kind='corrupt'/'unknown', NULL pixels)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                row = {
                    id_col: mid,
                    "kind": "unknown",
                    "out_w": None,
                    "out_h": None,
                    "channels": None,
                    "pixels": None,
                }
                b = bytes(blob) if blob is not None else b""
                try:
                    img = None
                    if b[:8] == b"\x89PNG\r\n\x1a\n":
                        img, row["kind"] = _decode_png(b), "image/png"
                    elif b[:2] in (b"P5", b"P6"):
                        img, row["kind"] = _decode_netpbm(b), "image/netpbm"
                    if img is not None:
                        h, w = img.shape[0], img.shape[1]
                        ri = (np.arange(out_h, dtype=np.int64) * h) // out_h
                        ci = (np.arange(out_w, dtype=np.int64) * w) // out_w
                        small = img[np.ix_(ri, ci)]
                        row.update(
                            out_w=out_w,
                            out_h=out_h,
                            channels=int(img.shape[2]),
                            pixels=small.astype(np.uint8).tobytes(),
                        )
                except Exception:
                    row["kind"] = "corrupt"
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[id_col, "kind", "out_w", "out_h", "channels", "pixels"],
            )

    return df.select(id_col, media_col).mapInPandas(
        batches, schema=RESIZE_SCHEMA
    )
