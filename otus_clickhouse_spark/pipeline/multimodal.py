"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape,
mapInPandas signatures) is real and tested. Decode is REAL for
PPM (P6) images, PCM16 WAV audio (numpy alone), 8-bit PNG
(``_decode_png``: chunk parse, stdlib-``zlib`` inflate, numpy
reconstruction of all five row filters), and baseline JPEG
(:mod:`otus_clickhouse_spark.pipeline.jpeg`: pure-numpy Huffman
entropy decode + dequant + IDCT, 4:4:4, validated by an encode/decode
round trip), GIF (``_decode_gif``: pure-python LZW), and the MP4
container (``probe_mp4``: real ISO-BMFF box walking for duration and
track layout — the ffprobe-metadata role; the codec payload stays
opaque) — no external media library anywhere. Only the audio/video
CODEC work itself remains STUBBED (MP3 / MP4-payload decode need
torchaudio/ffmpeg on a real cluster; those payloads get a
deterministic byte-stat feature so the pipeline shape is still
exercised end-to-end).

Scale design: media bytes ride in the same rows as metadata so a single
scan serves both; feature extraction is ``mapInPandas`` (Arrow-batched,
one Python worker per partition, no shuffle); byte-size accounting and
any pruning happen on the cheap metadata columns BEFORE the expensive
decode, so predicate pushdown skips whole row-groups of bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

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
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("data", T.BinaryType(), True),  # opaque payload
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table exercising the binary plumbing."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        (F.col("id") * 33).cast("long").alias("duration_ms"),
        F.encode(F.repeat(F.concat(F.lit("blob-"), F.col("id").cast("string")), 8), "utf-8").alias("data"),
    )
    return df


def make_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """A real P6 PPM image: deterministic RGB gradient (test payloads)."""
    import numpy as np

    x = np.arange(width, dtype=np.uint32)
    y = np.arange(height, dtype=np.uint32)
    r = ((x[None, :] + seed) % 256).astype(np.uint8).repeat(height, 0).reshape(height, width)
    g = ((y[:, None] * 3 + seed) % 256).astype(np.uint8).repeat(width, 1).reshape(height, width)
    b = np.full((height, width), seed % 256, dtype=np.uint8)
    pix = np.stack([r, g, b], axis=-1)
    return f"P6\n{width} {height}\n255\n".encode() + pix.tobytes()


def make_wav(
    n_samples: int = 8000,
    rate: int = 8000,
    freq: float = 440.0,
    amp: float = 0.5,
    bits: int = 16,
    channels: int = 1,
) -> bytes:
    """A real PCM WAV sine tone (numpy + struct): 8/16/24/32-bit int or
    32-bit IEEE float (``bits=-32``), mono or N identical channels —
    the decoder's round-trip partner across every sample layout."""
    import struct

    import numpy as np

    t = np.arange(n_samples) / rate
    wave = np.sin(2 * np.pi * freq * t) * amp
    if channels > 1:
        wave = np.repeat(wave, channels)
    if bits == -32:  # IEEE float
        data = wave.astype("<f4").tobytes()
        audio_fmt, bits_out = 3, 32
    elif bits == 8:
        data = ((wave * 127) + 128).astype(np.uint8).tobytes()
        audio_fmt, bits_out = 1, 8
    elif bits == 16:
        data = (wave * 32767).astype("<i2").tobytes()
        audio_fmt, bits_out = 1, 16
    elif bits == 24:
        v = (wave * ((1 << 23) - 1)).astype(np.int32)
        v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
        b = np.empty((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        data = b.tobytes()
        audio_fmt, bits_out = 1, 24
    elif bits == 32:
        data = (wave * ((1 << 31) - 1)).astype("<i4").tobytes()
        audio_fmt, bits_out = 1, 32
    else:
        raise ValueError("bits must be 8/16/24/32 or -32 (float)")
    block = channels * bits_out // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt " + struct.pack(
        "<IHHIIHH", 16, audio_fmt, channels, rate, rate * block, block, bits_out
    ) + b"data" + struct.pack("<I", len(data))
    return hdr + data


def _decode_ppm(data: bytes) -> list[float]:
    """REAL P6 PPM decode (pure numpy): [width, height, mean_lum, std_lum]."""
    import numpy as np

    parts = data.split(b"\n", 3)
    if len(parts) < 4 or parts[0] != b"P6":
        raise ValueError("not a P6 PPM")
    w, h = (int(v) for v in parts[1].split())
    pix = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    lum = 0.2126 * pix[..., 0] + 0.7152 * pix[..., 1] + 0.0722 * pix[..., 2]
    return [float(w), float(h), float(lum.mean()), float(lum.std())]


def _decode_wav(data: bytes) -> list[float]:
    """REAL PCM WAV decode (numpy + struct): [duration_ms, rms, zcr,
    peak]. Parses the fmt chunk wherever it sits (channels / rate /
    bit depth), supports unsigned 8-bit, signed 16/24/32-bit int and
    32-bit float PCM; multi-channel audio is mean-downmixed before the
    stats so a stereo file matches its mono mixdown."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = audio_fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid, sz = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if raw is None or rate is None:
        raise ValueError("WAV fmt/data chunk not found")
    if audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(raw, dtype="<f4", count=len(raw) // 4).astype(np.float64)
    elif audio_fmt == 1 and bits == 8:  # unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(raw, dtype="<i2", count=len(raw) // 2).astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 24:
        b3 = np.frombuffer(raw, dtype=np.uint8, count=len(raw) // 3 * 3).reshape(-1, 3)
        v = (
            b3[:, 0].astype(np.int32)
            | (b3[:, 1].astype(np.int32) << 8)
            | (b3[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(raw, dtype="<i4", count=len(raw) // 4).astype(np.float64) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}-bit")
    if channels and channels > 1:
        frames = len(x) // channels
        x = x[: frames * channels].reshape(frames, channels).mean(axis=1)
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    return [
        float(len(x) * 1000.0 / rate),
        float(np.sqrt(np.mean(x**2))),
        zcr,
        float(np.abs(x).max() if len(x) else 0.0),
    ]


def _decode_bytes(kind: str, data: bytes) -> list[float]:
    """Dispatch on the container's magic bytes: PPM/WAV/PNG/JPEG
    (baseline SOF0 AND progressive SOF2) decode for real (numpy +
    stdlib only); remaining codecs (MP3, MP4 video/audio payloads)
    fall back to a deterministic byte-stat feature (the documented
    stub — swap in torchaudio/ffmpeg on a cluster that has them)."""
    if data is None:
        raise NotImplementedError("media decode requires image/audio libs not in this container")
    if data[:2] == b"P6":
        return _decode_ppm(data)
    if data[:4] == b"RIFF":
        return _decode_wav(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(data)  # REAL: stdlib zlib + numpy filters
    if data[:2] == b"\xFF\xD8":
        try:
            # REAL: pure-numpy JFIF — baseline + progressive multi-scan,
            # restart intervals included
            return _decode_jpeg_feature(data)
        except ValueError:
            pass  # arithmetic-coded / 12-bit / hierarchical → byte-stat
    if data[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return _decode_gif(data)  # REAL: pure-python LZW, incl. interlaced
        except ValueError:
            pass  # malformed stream → byte-stat fallback below
    if data[:3] == b"ID3" or (len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0):
        try:
            # REAL MPEG-audio frame-header walk (no payload synthesis):
            # exact VBR-correct duration + mean bitrate + sample rate
            info = probe_mp3(data)
            return [
                float(info["duration_ms"]),
                float(info["bitrate_kbps"]),
                float(info["sample_rate"]),
                float(info["n_frames"]),
            ]
        except ValueError:
            pass  # false sync / truncated tag → byte-stat fallback below
    if len(data) >= 12 and data[4:8] == b"ftyp":
        try:
            # REAL container probe (no codec): duration/track layout
            info = probe_mp4(data)
            kinds = info["track_kinds"]
            return [
                float(info["duration_ms"]),
                float(info["n_tracks"]),
                float(kinds.count("video")),
                float(kinds.count("audio")),
            ]
        except ValueError:
            pass
    # compressed codec stub: 4-dim byte-stat stand-in for an embedding
    n = len(data)
    s = sum(data[:64])
    return [float(n), float(s % 251), float(data[0]), float(data[-1])]


def synthetic_real_media(spark, n: int = 16) -> DataFrame:
    """Media table whose payloads are REAL decodable bytes: even ids get
    a PPM image, odd ids a WAV tone (sizes/frequencies vary by id)."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + i, 6 + i // 2
            rows.append((i, "image", "image/x-portable-pixmap", w, h, None, make_ppm(w, h, seed=i)))
        else:
            ms = 250 + 50 * i
            rows.append(
                (i, "audio", "audio/wav", None, None, ms, make_wav(n_samples=8 * ms, rate=8000, freq=220.0 + i))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched, partition-local)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(k, d) if d is not None else None
                for k, d in zip(pdf["kind"], pdf["data"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(d) if d is not None else None for d in pdf["data"]],
                    "feature": feats,
                }
            )

    # prune to needed columns BEFORE the Python boundary: Arrow ships 4 cols
    return media.select("media_id", "kind", "data").mapInPandas(run, FEATURE_SCHEMA)


def _pixels(kind: str, data: bytes) -> "np.ndarray":
    """Pixel-level decode for resize: (h, w, 3) uint8 for the image
    codecs we decode from spec (PPM / PNG / baseline+progressive JPEG)."""
    import numpy as np

    if data[:2] == b"P6":
        parts = data.split(b"\n", 3)
        w, h = (int(v) for v in parts[1].split())
        return np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        pix = _png_pixels(data)
        return pix[..., :3] if pix.ndim == 3 else np.repeat(pix[..., None], 3, axis=2)
    if data[:2] == b"\xff\xd8":
        from otus_clickhouse_spark.pipeline.jpeg import decode_jpeg

        pix = decode_jpeg(data)
        return pix if pix.ndim == 3 else np.repeat(pix[..., None], 3, axis=2)
    raise ValueError(f"resize: unsupported image payload for kind={kind}")


def resize_images(
    media: DataFrame, width: int, height: int, batch_hint: int = 1024
) -> DataFrame:
    """Thumbnail/resize stage (the brief's multimodal op set: decode /
    feature-extract / RESIZE / frame-sample): decode each image payload
    to pixels, resample to (width, height), re-encode as P6 PPM.

    Resampling is area-mean when the source divides evenly into the
    target grid (the anti-aliased thumbnail case) and nearest-neighbor
    otherwise — both deterministic pure-numpy index arithmetic, no
    interpolation library. Same scale shape as extract_features: Arrow
    mapInPandas, partition-local, no shuffle; non-image payloads pass
    through as NULL rather than erroring the batch."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _resize_one(kind: str, data: bytes) -> bytes | None:
        try:
            pix = _pixels(kind, data)
        except ValueError:
            return None
        h, w = pix.shape[:2]
        if h % height == 0 and w % width == 0:
            # exact area mean: reshape into (height, fh, width, fw, 3) blocks
            fh, fw = h // height, w // width
            small = (
                pix.reshape(height, fh, width, fw, 3)
                .mean(axis=(1, 3))
                .round()
                .astype(np.uint8)
            )
        else:
            ys = (np.arange(height) * h // height).astype(int)
            xs = (np.arange(width) * w // width).astype(int)
            small = pix[ys][:, xs]
        header = f"P6\n{width} {height}\n255\n".encode()
        return header + small.tobytes()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _resize_one(k, d) if d is not None else None
                for k, d in zip(pdf["kind"], pdf["data"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return media.select("media_id", "kind", "data").mapInPandas(run, out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame ts.

    The ts grid is computed JVM-side (sequence/explode); only the decode
    of selected frames would cross into Python on a real cluster.
    """
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def _dhash_ppm(data: bytes, size: int = 8) -> int:
    """REAL perceptual difference-hash of a P6 PPM (pure numpy): block-
    mean the luminance to a (size × size+1) grid, compare horizontal
    neighbours, pack the size² bits into an int (row-major, MSB first).
    Near-identical images differ in few bits (Hamming distance)."""
    import numpy as np

    parts = data.split(b"\n", 3)
    if len(parts) < 4 or parts[0] != b"P6":
        raise ValueError("not a P6 PPM")
    w, h = (int(v) for v in parts[1].split())
    pix = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    lum = 0.2126 * pix[..., 0] + 0.7152 * pix[..., 1] + 0.0722 * pix[..., 2]
    return _dhash_from_lum(lum, size)


def _dhash_from_lum(lum, size: int = 8) -> int:
    """Difference hash of a luminance array (shared by PPM and PNG)."""
    import numpy as np

    h, w = lum.shape
    rows = np.linspace(0, h, size + 1, dtype=int)
    cols = np.linspace(0, w, size + 2, dtype=int)
    grid = np.empty((size, size + 1))
    for r in range(size):
        for c in range(size + 1):
            cell = lum[rows[r]:max(rows[r + 1], rows[r] + 1),
                       cols[c]:max(cols[c + 1], cols[c] + 1)]
            grid[r, c] = cell.mean()
    bits = (grid[:, 1:] > grid[:, :-1]).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # two's-complement into signed int64 (bit 63 may be set)
    return out - (1 << 64) if out >= (1 << 63) else out


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """(media_id, phash) for every decodable image — mapInPandas, Arrow-
    batched, partition-local; non-PPM payloads are skipped (compressed
    codecs would flow through the same path once a decoder is present)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if kind != "image" or data is None:
                    continue
                b = bytes(data)
                if b[:2] == b"P6":
                    ids.append(mid)
                    hashes.append(_dhash_ppm(b))
                elif b[:8] == b"\x89PNG\r\n\x1a\n":
                    ids.append(mid)
                    hashes.append(_dhash_png(b))
                elif b[:2] == b"\xFF\xD8":
                    ids.append(mid)
                    hashes.append(_dhash_jpeg(b))
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "phash": pd.Series(hashes, dtype="int64")})

    return media.select("media_id", "kind", "data").mapInPandas(
        run, "media_id long, phash long"
    )


def media_neardup_pairs(media: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Image near-dup pairs by perceptual-hash Hamming distance.

    Scale shape: the 64-bit phash is split into ``max_hamming`` 16-bit
    bands — by pigeonhole, any pair within the Hamming budget agrees on
    at least one band when ``max_hamming < bands`` + 1, so the pair
    search is an equi-join on (band_idx, band_value) buckets, never an
    all-pairs scan. The exact Hamming check (bit_count of xor — JVM,
    codegen'd) runs on bucket-local candidates only. Only the Python
    decode touches bytes; everything after the 8-byte hash is JVM-side.
    """
    n_bands = 4
    ph = perceptual_hashes(media)
    banded = ph.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftrightunsigned(F.col("phash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("media_id", "phash", "band.band_idx", "band.band_val")
    # AQE-exempt repartition before the band-bucket pair expansion
    # (see dedup.lsh_candidate_pairs — same coalesce-collapse class)
    nparts = int(banded.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    banded = banded.repartition(nparts, "band_idx", "band_val")
    a = banded.select(
        F.col("media_id").alias("a"), F.col("phash").alias("pa"), "band_idx", "band_val"
    )
    b = banded.select(
        F.col("media_id").alias("b"), F.col("phash").alias("pb"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def _audio_fingerprint(data: bytes, bands: int = 16) -> int:
    """REAL audio fingerprint of a PCM16 WAV (numpy FFT): split the
    magnitude spectrum into ``bands`` log-spaced bands, emit one bit per
    adjacent-band energy comparison packed with a coarse duration bucket
    — same-content audio collides, different tones/content do not."""
    import numpy as np

    feats = _decode_wav(data)  # validates container; [dur_ms, rms, zcr, peak]
    import struct

    rate = struct.unpack("<I", data[24:28])[0]
    pos, samples = 12, None
    while pos + 8 <= len(data):
        cid, sz = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=sz // 2, offset=pos + 8)
            break
        pos += 8 + sz
    x = samples.astype(np.float64) / 32768.0
    spec = np.abs(np.fft.rfft(x))
    edges = np.unique(np.geomspace(1, len(spec) - 1, bands + 1).astype(int))
    energy = np.array([spec[a:b].sum() for a, b in zip(edges[:-1], edges[1:])])
    bits = energy[1:] > energy[:-1]
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    dur_bucket = int(feats[0] // 250)  # 250 ms granularity
    out = (out << 8) | (dur_bucket & 0xFF)
    return out - (1 << 64) if out >= (1 << 63) else out


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, afp) for every decodable WAV — mapInPandas, Arrow-
    batched, partition-local (mirror of :func:`perceptual_hashes`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if kind == "audio" and data is not None and bytes(data[:4]) == b"RIFF":
                    ids.append(mid)
                    fps.append(_audio_fingerprint(bytes(data)))
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "afp": pd.Series(fps, dtype="int64")})

    return media.select("media_id", "kind", "data").mapInPandas(
        run, "media_id long, afp long"
    )


def audio_dup_groups(media: DataFrame) -> DataFrame:
    """Exact-fingerprint audio dup groups: groupBy the 8-byte fingerprint
    (spectral-shape bits + duration bucket) — the audio analogue of
    exact_dedup, one tiny-key shuffle."""
    return (
        audio_fingerprints(media)
        .groupBy("afp")
        .agg(F.min("media_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def make_textured_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """A real P6 PPM with seeded random texture (PCG64 is platform- and
    version-stable, so payloads are deterministic). Gradient images
    (make_ppm) saturate a difference hash; textured ones behave like
    real photos."""
    import numpy as np

    pix = np.random.default_rng(seed).integers(0, 256, (height, width, 3), dtype=np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + pix.tobytes()


def demo_media_with_dups(spark, n_images: int = 8, n_audio: int = 6) -> DataFrame:
    """Deterministic media table seeded with known duplicates: every odd
    image is a one-byte-perturbed copy of the previous even image
    (near-dup under dHash); one JPEG pair (same texture, one pixel
    nudged, re-encoded — exercises the real baseline-JPEG decode under
    the harness); the first two audio rows are the same tone (exact
    fingerprint dup). Drives the media-dedup registry query."""
    import numpy as np

    from otus_clickhouse_spark.pipeline.jpeg import encode_jpeg, encode_jpeg_progressive

    rows = []
    for i in range(n_images):
        if i % 2 == 0:
            data = make_textured_ppm(24, 18, seed=i)
        else:
            prev = bytearray(make_textured_ppm(24, 18, seed=i - 1))
            prev[-1] = (prev[-1] + 3) % 256
            data = bytes(prev)
        rows.append((i, "image", "image/x-portable-pixmap", 24, 18, None, data))
    pix = np.random.default_rng(77).integers(0, 256, (18, 24, 3), dtype=np.uint8)
    rows.append((50, "image", "image/jpeg", 24, 18, None, encode_jpeg(pix)))
    pix2 = pix.copy()
    pix2[0, 0, 2] = (int(pix2[0, 0, 2]) + 3) % 256
    # the near-dup partner is PROGRESSIVE (SOF2): the pair only dedups if
    # the real multi-scan decode runs — a byte-stat fallback would miss it
    rows.append((51, "image", "image/jpeg", 24, 18, None, encode_jpeg_progressive(pix2)))
    for j in range(n_audio):
        freq = 440.0 if j < 2 else 440.0 + 97.0 * j
        rows.append(
            (100 + j, "audio", "audio/wav", None, None, 500, make_wav(n_samples=4000, freq=freq))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _png_scanlines(data: bytes):
    """Parse a PNG container: returns (width, height, channels,
    interlace, filtered scanline bytes). 8-bit RGB/RGBA/grayscale only
    (the PNG baseline); zlib is in the Python stdlib, so this decode is
    REAL — no external codec library."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    interlace = 0
    idat = b""
    while pos + 8 <= len(data):
        (ln,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", body[:10])
            interlace = body[12]
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace not in (0, 1):
                raise ValueError(f"unsupported PNG interlace {interlace}")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    return w, h, channels, interlace, zlib.decompress(idat)


# Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: bytes, offset: int, h: int, w: int, ch: int):
    """Undo per-row filters (None/Sub/Up/Average/Paeth) for one
    (sub-)image of ``h`` rows × ``w`` pixels starting at ``offset`` in
    the inflated stream; returns (rows array, bytes consumed). Filters
    reference neighbours within the same (sub-)image only — exactly
    the Adam7 rule."""
    import numpy as np

    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = offset
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += stride + 1
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the running left neighbour
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out, pos - offset


def _png_pixels(data: bytes) -> "np.ndarray":
    """Full PNG pixel decode → (h, w, ch) uint8, sequential or Adam7
    interlaced (seven independently-filtered sub-images scattered back
    onto the pixel grid)."""
    import numpy as np

    w, h, ch, interlace, raw = _png_scanlines(data)
    if not interlace:
        rows, _ = _png_unfilter(raw, 0, h, w, ch)
        return rows.reshape(h, w, ch)
    pix = np.zeros((h, w, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw == 0 or ph == 0:
            continue  # empty pass carries no bytes at all
        sub, consumed = _png_unfilter(raw, pos, ph, pw, ch)
        pos += consumed
        pix[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
    return pix


def _decode_png(data: bytes) -> list[float]:
    """REAL PNG decode (stdlib zlib + numpy): parse chunks, inflate,
    undo the per-row filter (None/Sub/Up/Average/Paeth), de-interlace
    Adam7 if flagged, then the same [width, height, mean_lum, std_lum]
    feature as the PPM path."""
    pix = _png_pixels(data)
    h, w, ch = pix.shape
    if ch >= 3:
        lum = 0.2126 * pix[..., 0] + 0.7152 * pix[..., 1] + 0.0722 * pix[..., 2]
    else:
        lum = pix[..., 0].astype("float64")
    return [float(w), float(h), float(lum.mean()), float(lum.std())]


def _png_filter_rows(flat: "np.ndarray", filter_type: int, ch: int = 3) -> bytes:
    """Apply one PNG row filter to an (h, w*ch) int32 sub-image and
    serialize (filter byte + filtered row) per row."""
    import numpy as np

    height, stride = flat.shape
    rows = []
    for y in range(height):
        line = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if filter_type == 0:
            enc = line
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int32), line[:-ch]])
            enc = (line - left) & 0xFF
        elif filter_type == 2:  # Up
            enc = (line - prev) & 0xFF
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int32), line[:-ch]])
            enc = (line - (left + prev) // 2) & 0xFF
        elif filter_type == 4:  # Paeth
            enc = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) & 0xFF
        else:
            raise ValueError("filter 0-4 only")
        rows.append(bytes([filter_type]) + bytes(enc.astype(np.uint8)))
    return b"".join(rows)


def make_png(
    width: int, height: int, seed: int = 0, filter_type: int = 0,
    interlaced: bool = False,
) -> bytes:
    """A real 8-bit RGB PNG (stdlib zlib + numpy): seeded random texture
    encoded with the chosen per-row filter — exercises every decoder
    filter branch in tests. ``interlaced=True`` writes Adam7: seven
    sub-images, each independently filtered (the filters may not reach
    across passes — the decoder symmetry the test pins down)."""
    import struct
    import zlib

    import numpy as np

    pix = np.random.default_rng(seed).integers(0, 256, (height, width, 3), dtype=np.uint8)
    if interlaced:
        body = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = pix[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            body += _png_filter_rows(
                sub.reshape(ph, pw * 3).astype(np.int32), filter_type
            )
    else:
        body = _png_filter_rows(
            pix.reshape(height, width * 3).astype(np.int32), filter_type
        )

    def chunk(ctype: bytes, body_: bytes) -> bytes:
        return (struct.pack(">I", len(body_)) + ctype + body_
                + struct.pack(">I", zlib.crc32(ctype + body_)))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1 if interlaced else 0)
    idat = zlib.compress(body)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def _dhash_png(data: bytes, size: int = 8) -> int:
    """Perceptual difference-hash of a PNG (REAL decode via
    :func:`_png_pixels` — sequential or Adam7 — then the shared
    luminance grid hash)."""
    pix = _png_pixels(data)
    ch = pix.shape[2]
    if ch >= 3:
        lum = 0.2126 * pix[..., 0] + 0.7152 * pix[..., 1] + 0.0722 * pix[..., 2]
    else:
        lum = pix[..., 0].astype("float64")
    return _dhash_from_lum(lum, size)


def _decode_jpeg_feature(data: bytes) -> list[float]:
    """REAL baseline-JPEG decode (pipeline.jpeg, pure numpy) → the
    shared [width, height, mean_lum, std_lum] image feature."""
    from otus_clickhouse_spark.pipeline.jpeg import decode_jpeg

    pix = decode_jpeg(data)
    h, w = pix.shape[:2]
    lum = 0.2126 * pix[..., 0] + 0.7152 * pix[..., 1] + 0.0722 * pix[..., 2]
    return [float(w), float(h), float(lum.mean()), float(lum.std())]


def _dhash_jpeg(data: bytes, size: int = 8) -> int:
    """Perceptual difference-hash of a baseline JPEG (REAL decode)."""
    from otus_clickhouse_spark.pipeline.jpeg import decode_jpeg

    pix = decode_jpeg(data)
    lum = 0.2126 * pix[..., 0] + 0.7152 * pix[..., 1] + 0.0722 * pix[..., 2]
    return _dhash_from_lum(lum, size)


def _gif_interlace_order(h: int) -> list[int]:
    """GIF 4-pass interlace row order (spec appendix E): rows 0,8,16…,
    then 4,12…, then 2,6,10…, then the odd rows."""
    return [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]


def _decode_gif(data: bytes) -> list[float]:
    """REAL GIF decode (pure python LZW + numpy): first frame of an
    87a/89a stream with a global color table, interlaced or not → the
    shared [width, height, mean_lum, std_lum] feature."""
    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w_screen = int.from_bytes(data[6:8], "little")
    h_screen = int.from_bytes(data[8:10], "little")
    packed = data[10]
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        w = int.from_bytes(data[pos + 5:pos + 7], "little")
        h = int.from_bytes(data[pos + 7:pos + 9], "little")
        ipacked = data[pos + 9]
        pos += 10
        interlaced = bool(ipacked & 0x40)
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
            pos += n * 3
        min_code = data[pos]
        pos += 1
        stream = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            stream += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        # --- LZW decode (LSB-first bit packing) ---
        clear, end = 1 << min_code, (1 << min_code) + 1
        width = min_code + 1
        dict_init = [(i,) for i in range(clear)] + [None, None]
        table = list(dict_init)
        out: list[int] = []
        acc = nbits = 0
        prev = None
        for byte in stream:
            acc |= byte << nbits
            nbits += 8
            while nbits >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == clear:
                    table = list(dict_init)
                    width = min_code + 1
                    prev = None
                    continue
                if code == end:
                    acc = nbits = 0
                    break
                if prev is None:
                    entry = table[code]
                elif code < len(table) and table[code] is not None:
                    entry = table[code]
                    table.append(table[prev] + (entry[0],))
                else:  # KwKwK case
                    entry = table[prev] + (table[prev][0],)
                    table.append(entry)
                out.extend(entry)
                prev = code
                if len(table) == (1 << width) and width < 12:
                    width += 1
        if palette is None:
            raise ValueError("GIF without color table")
        idx = np.array(out[: w * h], dtype=np.int32).reshape(h, w)
        if interlaced:
            # stream rows arrive in 4-pass order; scatter them back
            deint = np.empty_like(idx)
            deint[_gif_interlace_order(h)] = idx
            idx = deint
        pix = palette[idx]
        lum = 0.2126 * pix[..., 0] + 0.7152 * pix[..., 1] + 0.0722 * pix[..., 2]
        return [float(w), float(h), float(lum.mean()), float(lum.std())]
    raise ValueError("GIF contains no image block")


def make_gif(width: int, height: int, seed: int = 0, interlaced: bool = False) -> bytes:
    """A real GIF89a (grayscale 256-entry palette, seeded texture). The
    LZW stream uses the all-literals-with-periodic-CLEAR encoding — a
    valid stream any decoder accepts, without implementing compression.
    ``interlaced=True`` stores the rows in the spec's 4-pass order and
    sets the interlace flag — the decoder must scatter them back."""
    import numpy as np

    idx = np.random.default_rng(seed).integers(0, 256, (height, width), dtype=np.uint8)
    if interlaced:
        idx = idx[_gif_interlace_order(height)]
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    for i in range(256):
        out += bytes([i, i, i])  # grayscale palette
    out += b"\x2C" + b"\x00\x00\x00\x00"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00])
    min_code = 8
    clear, end = 256, 257
    out += bytes([min_code])
    # pack 9-bit codes LSB-first: CLEAR, ≤200 literals, repeat, END
    bits = bytearray()
    acc = nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for i, px in enumerate(idx.flatten()):
        if i and i % 200 == 0:
            put(clear)
        put(int(px))
    put(end)
    if nbits:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i:i + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    out += b"\x00\x3B"
    return bytes(out)


def probe_mp4(data: bytes) -> dict:
    """REAL MP4/ISO-BMFF container probe (pure python box parsing —
    the ffprobe-metadata role): walks the box tree to mvhd (movie
    duration/timescale) and per-track tkhd/hdlr. No codec work — the
    mdat payload stays opaque — but duration and track layout are what
    the frame-sampling planner needs, and they come from the real
    container structure, not the metadata column.

    Returns {duration_ms, n_tracks, track_kinds}."""
    import struct

    def walk(buf, start, end, depth=0):
        boxes = []
        pos = start
        while pos + 8 <= end:
            size = struct.unpack(">I", buf[pos:pos + 4])[0]
            btype = buf[pos + 4:pos + 8]
            hdr = 8
            if size == 1:
                size = struct.unpack(">Q", buf[pos + 8:pos + 16])[0]
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("malformed MP4 box")
            boxes.append((btype, pos + hdr, pos + size))
            pos += size
        return boxes

    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 file")
    top = walk(data, 0, len(data))
    moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("MP4 missing moov box")
    duration_ms = None
    track_kinds = []
    for btype, s, e in walk(data, *moov):
        if btype == b"mvhd":
            ver = data[s]
            if ver == 1:
                timescale = int.from_bytes(data[s + 20:s + 24], "big")
                duration = int.from_bytes(data[s + 24:s + 32], "big")
            else:
                timescale = int.from_bytes(data[s + 12:s + 16], "big")
                duration = int.from_bytes(data[s + 16:s + 20], "big")
            duration_ms = int(duration * 1000 / max(timescale, 1))
        elif btype == b"trak":
            kind = "unknown"
            for bt2, s2, e2 in walk(data, s, e):
                if bt2 == b"mdia":
                    for bt3, s3, e3 in walk(data, s2, e2):
                        if bt3 == b"hdlr":
                            handler = data[s3 + 8:s3 + 12]
                            kind = {b"vide": "video", b"soun": "audio"}.get(handler, "other")
            track_kinds.append(kind)
    if duration_ms is None:
        raise ValueError("MP4 missing mvhd")
    return {"duration_ms": duration_ms, "n_tracks": len(track_kinds),
            "track_kinds": track_kinds}


# MPEG audio frame-header tables (public ISO/IEC 11172-3 / 13818-3
# layout): bitrate kbps by (mpeg_version, layer), sample rate by
# version bits. Index 0 = "free", 15 = invalid.
_MP3_BITRATES = {
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000), 25: (11025, 12000, 8000)}


def _mp3_frame(data: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos`` →
    (frame_len, samples, sample_rate, bitrate_kbps) or None."""
    if pos + 4 > len(data) or data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
        return None
    b2, b3 = data[pos + 1], data[pos + 2]
    ver_bits = (b2 >> 3) & 3  # 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (b2 >> 1) & 3  # 0=reserved, 1=LayerIII, 2=II, 3=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    version = {0: 25, 2: 2, 3: 1}[ver_bits]
    layer = 4 - layer_bits  # 1=Layer I, 2=II, 3=III
    br_idx, sr_idx, padding = b3 >> 4, (b3 >> 2) & 3, (b3 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format/invalid bitrate not supported
    bitrate = _MP3_BITRATES[(1 if version == 1 else 2, layer)][br_idx]
    rate = _MP3_RATES[version][sr_idx]
    if layer == 1:
        frame_len = (12 * bitrate * 1000 // rate + padding) * 4
        samples = 384
    else:
        samples = 1152 if (layer == 2 or version == 1) else 576
        frame_len = samples // 8 * bitrate * 1000 // rate + padding
    return (frame_len, samples, rate, bitrate) if frame_len > 4 else None


def probe_mp3(data: bytes) -> dict:
    """REAL MP3 frame-header walk (pure python — the ffprobe-metadata
    role, same class as :func:`probe_mp4`): skip any ID3v2 tag, then
    parse every MPEG audio frame header in sequence — version/layer/
    bitrate/samplerate from the public header layout, frame length from
    the spec arithmetic — summing samples for an exact duration that
    is VBR-correct by construction (no Xing estimate needed). The
    huffman/synthesis-filterbank payload stays opaque by design.

    Returns {duration_ms, bitrate_kbps, sample_rate, n_frames}."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = 0  # syncsafe 28-bit tag length
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    first = _mp3_frame(data, pos)
    # demand two valid CONSECUTIVE frames before trusting the sync word
    # (0xFFEx occurs freely inside arbitrary payloads)
    if first is None or _mp3_frame(data, pos + first[0]) is None:
        raise ValueError("no MPEG audio frame sync")
    n_frames = total_samples = 0
    rate = first[2]
    br_sum = 0
    while (fr := _mp3_frame(data, pos)) is not None:
        frame_len, samples, rate, bitrate = fr
        n_frames += 1
        total_samples += samples
        br_sum += bitrate
        pos += frame_len
    return {
        "duration_ms": int(total_samples * 1000 / rate),
        "bitrate_kbps": int(round(br_sum / n_frames)),
        "sample_rate": rate,
        "n_frames": n_frames,
    }


def make_mp3(
    duration_ms: int = 1000,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    with_id3: bool = True,
) -> bytes:
    """Structurally-valid CBR MPEG1 Layer III stream: real frame
    headers + zeroed payloads (+ an ID3v2 tag to exercise the skip).
    Enough for :func:`probe_mp3` to walk real frame arithmetic — the
    audio payload is silence-of-zeros by design, like make_mp4's empty
    mdat."""
    br_idx = _MP3_BITRATES[(1, 3)].index(bitrate_kbps)
    sr_idx = _MP3_RATES[1].index(sample_rate)
    header = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00]
    )  # MPEG1 Layer III, no CRC, no padding
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = header + bytes(frame_len - 4)
    n_frames = max(1, (duration_ms * sample_rate + 1152_000 - 1) // 1152_000)
    tag = b""
    if with_id3:
        payload = b"TSSE\x00\x00\x00\x05\x00\x00\x00otus"
        sz = len(payload)
        tag = b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + payload
    return tag + frame * n_frames


def make_mp4(duration_ms: int = 2000, tracks: tuple = ("video", "audio")) -> bytes:
    """A minimal structurally-valid MP4: ftyp + moov{mvhd, trak{mdia{
    hdlr}}…} + empty mdat. Enough container for :func:`probe_mp4` to
    exercise real box walking (the codec payload is empty by design)."""
    import struct

    def box(btype, payload=b""):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    timescale = 1000
    mvhd = bytes(12) + struct.pack(">II", timescale, duration_ms) + bytes(80)
    traks = b""
    for kind in tracks:
        handler = {"video": b"vide", "audio": b"soun"}.get(kind, b"meta")
        hdlr = bytes(8) + handler + bytes(12)
        mdia = box(b"mdia", box(b"hdlr", hdlr))
        traks += box(b"trak", mdia)
    moov = box(b"moov", box(b"mvhd", mvhd) + traks)
    return box(b"ftyp", b"isom\x00\x00\x00\x01isom") + moov + box(b"mdat")
