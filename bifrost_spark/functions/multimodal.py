"""Multimodal (image/audio/video) column plumbing + dependency-free codecs.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the pattern for 100 TB multimodal training pipelines: Spark moves/filters/
groups bytes and metadata; decode and feature extraction run in Arrow-batched
``mapInPandas`` stages sized by bytes-per-batch, never per-row Python.

Decode is REAL for three containers that need no external library:

- **PGM/PPM** (netpbm P5/P6): header parse + raw-byte image matrix — the
  uncompressed sibling of what PIL would hand back for jpeg/png.
- **WAV** (RIFF PCM 16-bit): ``struct`` header walk + ``frombuffer`` —
  what soundfile/torchaudio produce for real audio.
- **BIFV**: a tiny length-prefixed frame container (concatenated PGM
  frames + per-frame timestamps) standing in for an mp4 demuxer, so the
  frame-sample → per-frame-decode fan-out is exercised end to end.

Compressed codecs (jpeg/mp3/h264 — PIL/ffmpeg not in this container) fall
back per-row: ``decode_stub=True`` produces deterministic digest-seeded
features with the REAL schema and batch shape; ``decode_stub=False`` raises
NotImplementedError at the exact point the codec would be called.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_digest", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


# --------------------------------------------------------------------------
# dependency-free codecs
# --------------------------------------------------------------------------

FEATURE_DIM = 8


def encode_pnm(arr: np.ndarray) -> bytes:
    """uint8 HxW (→ P5 PGM) or HxWx3 (→ P6 PPM) to netpbm bytes."""
    color = arr.ndim == 3
    h, w = arr.shape[:2]
    magic = b"P6" if color else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def decode_pnm(data: bytes) -> np.ndarray:
    """Parse P5/P6 netpbm: magic, whitespace/#-comment header, raw samples.
    Returns uint8 HxW (P5) or HxWx3 (P6)."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    color = data[:2] == b"P6"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = w * h * (3 if color else 1)
    arr = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape((h, w, 3) if color else (h, w))


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes (fmt + data chunks)."""
    pcm = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF chunk walk → (int16 sample array, sample_rate).  Handles extra
    chunks (LIST/fact) between fmt and data like real encoders emit."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, pcm = 12, None, 16, 1, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError("only 16-bit PCM supported")
    samples = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:  # downmix: mean over channels, keep int16 domain
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return samples, rate


def encode_bifv(frames: list[np.ndarray], frame_ms: int) -> bytes:
    """Frame container: BIFV magic, frame interval, then length-prefixed P5
    frames — a demuxable stand-in for mp4 so per-frame decode is testable."""
    out = [b"BIFV", struct.pack("<II", len(frames), frame_ms)]
    for fr in frames:
        payload = encode_pnm(fr)
        out.append(struct.pack("<I", len(payload)))
        out.append(payload)
    return b"".join(out)


def decode_bifv(data: bytes) -> tuple[int, list[np.ndarray]]:
    if data[:4] != b"BIFV":
        raise ValueError("not a BIFV payload")
    n, frame_ms = struct.unpack_from("<II", data, 4)
    pos, frames = 12, []
    for _ in range(n):
        (size,) = struct.unpack_from("<I", data, pos)
        frames.append(decode_pnm(data[pos + 4 : pos + 4 + size]))
        pos += 4 + size
    return frame_ms, frames


# --------------------------------------------------------------------------
# feature kernels (float64 math, float32 output — deterministic, no RNG)
# --------------------------------------------------------------------------

def image_features(arr: np.ndarray) -> list[float]:
    gray = arr.mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)
    gray = gray.astype(np.float64)
    h, w = gray.shape
    hist = np.bincount((gray.ravel() / 16).astype(np.int64).clip(0, 15), minlength=16)
    p = hist / gray.size
    entropy = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
    gx = float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0
    gy = float(np.abs(np.diff(gray, axis=0)).mean()) if h > 1 else 0.0
    return [float(w), float(h), float(gray.mean()) / 255.0, float(gray.std()) / 255.0,
            gx / 255.0, gy / 255.0, entropy, w / h]


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    x = samples.astype(np.float64) / 32768.0
    n = x.size
    spec = np.abs(np.fft.rfft(x))
    dom = int(np.argmax(spec[1:])) + 1 if spec.size > 1 else 0
    energy = spec * spec
    low = float(energy[: energy.size // 2].sum() / energy.sum()) if energy.sum() > 0 else 0.0
    zcr = float((x[1:] * x[:-1] < 0).mean()) if n > 1 else 0.0
    return [n / rate, float(np.sqrt((x * x).mean())), zcr, float(np.abs(x).max()),
            float(np.abs(x).mean()), dom * rate / n / 1000.0, low, rate / 1000.0]


def video_features(frames: list[np.ndarray], frame_ms: int) -> list[float]:
    stack = np.stack([f.astype(np.float64) for f in frames])
    diffs = (
        float(np.abs(stack[1:] - stack[:-1]).mean()) if len(frames) > 1 else 0.0
    )
    return [float(len(frames)), float(stack.shape[2]), float(stack.shape[1]),
            float(stack.mean()) / 255.0, float(stack.std()) / 255.0,
            float(stack[0].mean()) / 255.0, float(stack[-1].mean()) / 255.0,
            diffs / 255.0]


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes) for
    exercising the plumbing at any scale — generated distributed, like the
    CDC generator."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.repeat(F.sha2(F.concat(F.col("media_id").cast("string"), F.lit(seed)), 256),
                 (F.pmod(F.xxhash64("media_id", F.lit(seed + 1)), F.lit(4)) + 1).cast("int")),
        "utf-8",
    )
    return df.select(
        "media_id",
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.when(kind == "image", (F.pmod(F.xxhash64("media_id", F.lit(3)), F.lit(1024)) + 64).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.xxhash64("media_id", F.lit(4)), F.lit(1024)) + 64).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(F.xxhash64("media_id", F.lit(5)), F.lit(60000)) + 1000).cast("int")).alias("duration_ms"),
        payload.alias("payload"),
    )


def synthesize_codec_media(spark, n: int = 192, seed: int = 7) -> DataFrame:
    """Media table whose payloads are REAL container bytes (P5/P6 netpbm,
    RIFF/WAVE PCM, BIFV frame stream), each a closed-form function of
    (media_id, seed) — no RNG — so an oracle can rebuild the underlying
    pixel/sample arrays without parsing and the engine's decode must agree.

    Generated distributed: spark.range → Arrow-batched mapInPandas encoder
    (the encoder is bytes-out compute, exactly where a real pipeline's
    transcode stage sits)."""

    def _payload(mid: int) -> tuple[str, str, bytes, int | None, int | None, int | None]:
        m = mid + seed
        if mid % 3 == 0:  # image: PPM; cycle in a grayscale PGM and a BMP
            w, h = 16 + m % 13, 12 + m % 11
            y, x = np.mgrid[0:h, 0:w]
            sel = (mid // 3) % 4
            if sel == 0:
                arr = ((x * 3 + y * 5 + m * 7) % 256).astype(np.uint8)
                return "image", "image/x-portable-graymap", encode_pnm(arr), w, h, None
            c = np.arange(3)[None, None, :]
            arr = ((x[..., None] * 3 + y[..., None] * 5 + m * 7 + c * 11) % 256).astype(np.uint8)
            if sel == 1:
                return "image", "image/bmp", encode_bmp(arr), w, h, None
            if sel == 2:
                # rotate through all five scanline filters so the PNG
                # unfilter paths are continuously exercised at scale
                return "image", "image/png", encode_png(arr, filter_type=m % 5), w, h, None
            return "image", "image/x-portable-pixmap", encode_pnm(arr), w, h, None
        if mid % 3 == 1:  # audio: two-tone 16-bit PCM
            rate = 8000
            ns = 800 + (m % 800) * 2
            t = np.arange(ns, dtype=np.float64)
            f0 = 100.0 + m % 400
            x = 0.6 * np.sin(2 * np.pi * f0 * t / rate) + 0.25 * np.sin(2 * np.pi * 3 * f0 * t / rate)
            return ("audio", "audio/wav", encode_wav(np.round(x * 20000).astype(np.int16), rate),
                    None, None, int(ns * 1000 / rate))
        nf, frame_ms = 2 + m % 6, 250  # video: BIFV gray frames
        w, h = 8 + m % 8, 8 + m % 5
        y, x = np.mgrid[0:h, 0:w]
        frames = [((x + 3 * y + 17 * k + m) % 256).astype(np.uint8) for k in range(nf)]
        return "video", "video/x-bifv", encode_bifv(frames, frame_ms), w, h, nf * frame_ms

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                kind, mime, payload, w, h, dur = _payload(int(mid))
                rows.append({"media_id": int(mid), "kind": kind, "mime": mime,
                             "width": w, "height": h, "duration_ms": dur,
                             "payload": payload})
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n).mapInPandas(_gen, schema=MEDIA_SCHEMA)


def decode_payload(data: bytes) -> list[float] | None:
    """Magic-sniffing real decode → feature vector; None if the container
    is not one of the dependency-free codecs."""
    if data[:2] in (b"P5", b"P6"):
        return image_features(decode_pnm(data))
    if data[:2] == b"BM":
        return image_features(decode_bmp(data))
    if data[:8] == PNG_MAGIC:
        return image_features(decode_png(data))
    if data[:4] == b"RIFF":
        return audio_features(*decode_wav(data))
    if data[:4] == b"BIFV":
        frame_ms, frames = decode_bifv(data)
        return video_features(frames, frame_ms)
    return None


def extract_features(media: DataFrame, feature_dim: int = 8, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Payloads in a dependency-free container (netpbm / WAV / BIFV) are ALWAYS
    really decoded — header parse, pixel/sample matrix, numpy feature math.
    Anything else (jpeg/mp3/h264 — codec libs absent here) takes the
    ``decode_stub`` branch: deterministic digest-seeded features when True,
    NotImplementedError at the exact codec call site when False.  In a real
    deployment that branch is the PIL/torchaudio/pyav call; the Spark plan —
    Arrow batch exchange, output schema — is identical either way.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def one(b) -> tuple[str, list[float]]:
            raw = bytes(b) if b is not None else b""
            digest = hashlib.sha256(raw).hexdigest()
            # A truncated/corrupt payload that still carries a known magic
            # would otherwise raise out of decode_payload and kill the whole
            # task; on real corpora corrupt media rows are routine, so a
            # failed decode falls back to the stub branch like any other
            # unmatched payload.
            try:
                feats = decode_payload(raw) if raw else None
            except (ValueError, struct.error, IndexError):
                feats = None
            if feats is None:
                if not decode_stub:
                    raise NotImplementedError(
                        "no dependency-free codec matches this payload; "
                        "install PIL/ffmpeg and implement the decode branch"
                    )
                feats = [int(digest[i * 8 : i * 8 + 8], 16) / float(1 << 32)
                         for i in range(feature_dim)]
            fv = np.asarray(feats, dtype=np.float64)[:feature_dim]
            fv = np.pad(fv, (0, feature_dim - fv.size))
            return digest, [float(v) for v in fv.astype(np.float32)]

        for pdf in batches:
            decoded = [one(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "content_digest": [d for d, _ in decoded],
                    "feature": [f for _, f in decoded],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame_mean", T.DoubleType(), False),
        T.StructField("frame_digest", T.StringType(), False),
    ]
)


def extract_frames(media: DataFrame) -> DataFrame:
    """REAL per-frame decode fan-out: demux BIFV payloads into one row per
    frame with the decoded pixel mean + raster digest.  The fan-out happens
    inside the Arrow batch (bytes in, N frame-rows out) — the distributed
    shape of an ffmpeg frame-sampling stage, with the pixel work real."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if raw[:4] != b"BIFV":
                    continue
                try:
                    frame_ms, frames = decode_bifv(raw)
                except (ValueError, struct.error, IndexError):
                    continue
                for k, fr in enumerate(frames):
                    rows.append({
                        "media_id": int(mid), "frame_idx": k,
                        "frame_ts_ms": k * frame_ms,
                        "frame_mean": float(fr.astype(np.float64).mean()),
                        "frame_digest": hashlib.sha256(fr.tobytes()).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").mapInPandas(_frames, schema=FRAME_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode per-frame rows (timestamps)
    from duration metadata — the distributed fan-out is real; the pixel
    decode would slot into extract_features."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.posexplode(frames).alias("frame_idx", "_"))
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))
    )


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 HxWx3 (RGB) → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, 4-byte row padding)."""
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    img = bytearray()
    bgr = arr[:, :, ::-1]  # RGB → BGR
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        img += bgr[y].tobytes() + pad
    data_size = len(img)
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + bytes(img)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 HxWx3 RGB.  Handles bottom-up AND
    top-down (negative height) layouts and 4-byte row padding; rejects
    compressed / non-24-bit variants explicitly."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for i in range(h):
        start = offset + i * row_bytes
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=start).reshape(w, 3)
        rows.append(row[:, ::-1])  # BGR → RGB
    arr = np.stack(rows)
    return arr if top_down else arr[::-1]


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 HxW (grayscale) or HxWx3 (RGB) → PNG bytes — stdlib only
    (struct chunk framing + zlib deflate).  ``filter_type`` picks the
    per-scanline filter (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) so the
    decoder's unfilter paths are all byte-round-trip testable."""
    import zlib

    color = arr.ndim == 3
    h, w = arr.shape[:2]
    bpp = 3 if color else 1
    px = arr.astype(np.uint8).reshape(h, w * bpp).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int16)
    for r in range(h):
        line = px[r]
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int16), prev[:-bpp]])
        if filter_type == 0:
            out = line
        elif filter_type == 1:
            out = line - left
        elif filter_type == 2:
            out = line - prev
        elif filter_type == 3:
            out = line - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            out = line - pred
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        raw.append(filter_type)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if color else 0, 0, 0, 0)
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 HxW or HxWx3 — stdlib-only real decode: chunk walk with
    CRC verification, multi-IDAT zlib inflate, and all five scanline
    unfilters (None/Sub/Up/Average/Paeth).  Supports the shapes real
    screenshot/diagram corpora overwhelmingly contain — 8-bit greyscale
    (color type 0) and truecolor (type 2), non-interlaced; palette/alpha/
    16-bit/interlaced variants are rejected explicitly (PIL territory)."""
    import zlib

    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + size > len(data):
            raise ValueError("truncated PNG chunk")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + size)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or ctype_n not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced gray/RGB PNG supported "
            f"(depth={depth}, color_type={ctype_n}, interlace={interlace})"
        )
    bpp = 3 if ctype_n == 2 else 1
    raw = zlib.decompress(b"".join(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=r * (stride + 1) + 1).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters recur along the scanline
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                up = prev[i]
                upleft = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else upleft)
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG scanline filter {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, bpp)
    return arr[..., 0] if bpp == 1 else arr
