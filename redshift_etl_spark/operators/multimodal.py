"""Multimodal columns — image/audio/video as opaque ``binary`` columns
with typed metadata structs, plus the decode / feature-extract / resize
/ frame-sample plumbing as Arrow-batched ``mapInPandas`` operators.

This extends the reference (whose payloads are all text/JSON) to the
media side of a training-data pipeline. The Spark-side contract is
real and tested: schemas, batch shapes, partition sizing. The actual
codec work is pluggable — this container ships no image/audio libs, so
``decode_fn=None`` selects a clearly-marked deterministic fake (derived
from the bytes' md5) and ``strict_decode_fn`` raises NotImplementedError
to mark where a real decoder (PIL/ffmpeg/torchaudio) plugs in.

Scale notes:
- media bytes dominate row size → repartition so a task's Arrow batch
  stays ~10-100 MB (``rows_per_batch`` guidance below), and NEVER
  shuffle the binary column through a groupBy — extract features first,
  then drop/offload the bytes.
- feature extraction is per-row embarrassing parallelism: mapInPandas
  streams batches, so peak memory is one batch per core, not one
  partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # jpeg|wav|mp4|...
        T.StructField("source_uri", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def fake_image_decode(buf: bytes) -> dict:
    """Deterministic FAKE decoder (no image libs in this container):
    dimensions/luma derived from md5 of the bytes. Stable across runs
    and engines — used to exercise the full pipeline shape."""
    h = hashlib.md5(buf).hexdigest()
    return {
        "width": 1 + int(h[0:4], 16) % 4096,
        "height": 1 + int(h[4:8], 16) % 4096,
        "n_channels": 1 + int(h[8], 16) % 4,
        "mean_luma": round((int(h[9:13], 16) % 25600) / 100.0, 2),
    }


def pil_image_decode(buf: bytes) -> dict:
    """REAL image decoder (PIL), import-guarded: decodes dimensions,
    channel count, and mean luminance from actual image bytes. Raises
    ImportError with a clear message where Pillow isn't installed —
    `default_image_decode` falls back to the deterministic fake there."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise ImportError(
            "pil_image_decode needs Pillow (pip install pillow); "
            "use fake_image_decode or inject a decode_fn instead"
        ) from e
    img = Image.open(io.BytesIO(buf))
    gray = img.convert("L")
    hist = gray.histogram()
    n = sum(hist) or 1
    mean_luma = round(sum(i * c for i, c in enumerate(hist)) / n, 2)
    return {
        "width": img.width,
        "height": img.height,
        "n_channels": len(img.getbands()),
        "mean_luma": mean_luma,
    }


def default_image_decode() -> Callable[[bytes], dict]:
    """The out-of-the-box decoder: real PIL decode when Pillow is
    importable, the deterministic fake otherwise (so the pipeline shape
    runs anywhere and upgrades itself where the codec lib exists)."""
    try:
        import PIL  # noqa: F401  type: ignore[import-not-found]

        return pil_image_decode
    except ImportError:
        return fake_image_decode


def strict_decode_fn(buf: bytes) -> dict:
    """Marker for a strict integration: refuses to run without a real
    codec rather than silently using the fake."""
    raise NotImplementedError(
        "real image decode requires PIL/libvips — not available in this "
        "container; inject a decode_fn or use fake_image_decode"
    )


# --- audio: REAL decoder, zero dependencies ---------------------------------
# WAV (RIFF/PCM) parses with the stdlib `wave` module, so unlike the
# image path this decoder is real everywhere — actual codec work over
# actual media bytes, no import guard needed.

AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak_amplitude", T.IntegerType()),
    ]
)


def wav_audio_decode(buf: bytes) -> dict:
    """REAL WAV decode via the stdlib: channel layout, sample rate,
    frame count, duration, and peak |amplitude| over the PCM samples."""
    import array
    import io
    import wave

    with wave.open(io.BytesIO(buf)) as w:
        n_channels = w.getnchannels()
        n_frames = w.getnframes()
        rate = w.getframerate()
        width = w.getsampwidth()
        pcm = w.readframes(n_frames)
    if width == 2:
        samples = array.array("h")
        samples.frombytes(pcm)
        peak = max((abs(s) for s in samples), default=0)
    else:  # 8-bit PCM is unsigned with a 128 bias
        peak = max((abs(b - 128) for b in pcm), default=0)
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate if rate else 0,
        "peak_amplitude": peak,
    }


def synth_wav(
    n_samples: int, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """Deterministic 16-bit PCM WAV bytes (a ramp capped at 999·16) —
    the fixture generator for round-tripping the real decoder."""
    import array
    import io
    import wave

    out = io.BytesIO()
    with wave.open(out, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        samples = array.array(
            "h", ((i % 1000) * 16 for i in range(n_samples * n_channels))
        )
        w.writeframes(samples.tobytes())
    return out.getvalue()


def extract_audio_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], dict] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Audio analog of extract_image_features, with a REAL default
    decoder (stdlib WAV). Same posture: bytes consumed batch-wise, only
    scalar features survive to shuffle."""
    decode = decode_fn or wav_audio_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                buf = bytes(buf) if buf is not None else b""
                d = decode(buf)
                rows.append({"media_id": mid, "byte_len": len(buf), **d})
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES])

    return media.select(id_col, content_col).mapInPandas(
        run, schema=AUDIO_FEATURES
    )


def extract_image_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], dict] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode + feature-extract over Arrow batches. One output row per
    media row; the binary column is consumed here and NOT carried
    forward (drop the bytes before any shuffle)."""
    decode = decode_fn or fake_image_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                buf = bytes(buf) if buf is not None else b""
                d = decode(buf)
                rows.append(
                    {
                        "media_id": mid,
                        "byte_len": len(buf),
                        "content_md5": hashlib.md5(buf).hexdigest(),
                        **d,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES])

    return media.select(id_col, content_col).mapInPandas(
        run, schema=IMAGE_FEATURES
    )


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: binary in → binary out, same schema + new dims
    in meta. Fake path: content passes through unchanged (resize is a
    codec concern); the Spark contract — batch iteration, schema, byte
    passthrough — is the tested part."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(buf) if buf is not None else b""
                out = resize_fn(buf, target_w, target_h) if resize_fn else buf
                rows.append(
                    {
                        "media_id": mid,
                        "content": out,
                        "width": target_w,
                        "height": target_h,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return media.select("media_id", "content").mapInPandas(run, schema=out_schema)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    n_frames: int = 3,
    extract_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Frame-sample plumbing (video → rows of frame bytes): one input
    row fans out to ``n_frames`` rows — the mapInPandas generator yields
    more rows than it receives, the shape a real ffmpeg sampler needs.
    Fake path: frame i = md5-derived slice marker over the source bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fake_frames(buf: bytes, k: int) -> list[bytes]:
        return [
            hashlib.md5(buf + str(i * every_n).encode()).digest() for i in range(k)
        ]

    fn = extract_fn or fake_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(buf) if buf is not None else b""
                for i, frame in enumerate(fn(buf, n_frames)):
                    rows.append(
                        {"media_id": mid, "frame_index": i, "frame": frame}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return media.select("media_id", "content").mapInPandas(run, schema=out_schema)


def attach_media(
    df: DataFrame,
    content_col: str,
    media_type: str,
    fmt: str,
    uri_col: str | None = None,
) -> DataFrame:
    """Wrap a raw binary column into the canonical (content, meta)
    shape."""
    uri = F.col(uri_col) if uri_col else F.lit(None).cast("string")
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            uri.alias("source_uri"),
        ),
    ).withColumnRenamed(content_col, "content")


# --- perceptual hashing + near-dup -----------------------------------------

def ahash64_real(buf: bytes) -> int:
    """Real 64-bit average-hash (aHash): 8×8 grayscale downsample,
    bit i = pixel_i > mean. PIL-guarded like `pil_image_decode`."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise ImportError("ahash64_real needs Pillow") from e
    px = list(Image.open(io.BytesIO(buf)).convert("L").resize((8, 8)).getdata())
    mean = sum(px) / 64.0
    out = 0
    for i, p in enumerate(px):
        if p > mean:
            out |= 1 << i
    # map unsigned 64-bit into signed int64 (bit 63 set would overflow
    # the `phash long` Arrow schema otherwise) — same convention as
    # ahash64_fake; Hamming distances are XOR-based so unaffected
    return out - (1 << 63)


def ahash64_fake(buf: bytes) -> int:
    """Deterministic stand-in where no codec exists: 64 bits straight
    from md5 of the content — identical bytes collide (distance 0),
    everything else is far apart, which is exactly the property the
    pipeline-shape tests need."""
    return int(hashlib.md5(buf).hexdigest()[:16], 16) - (1 << 63)


def perceptual_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    hash_fn: Callable[[bytes], int] | None = None,
) -> DataFrame:
    """(id, phash): Arrow-batched perceptual hashing of a binary media
    column — real aHash when Pillow exists, md5-derived fake otherwise
    (decided once, driver-side, like `default_image_decode`)."""
    if hash_fn is None:
        try:
            import PIL  # noqa: F401  type: ignore[import-not-found]

            hash_fn = ahash64_real
        except ImportError:
            hash_fn = ahash64_fake

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "phash": [hash_fn(bytes(b)) for b in pdf[content_col]],
                }
            )

    return media.select(id_col, content_col).mapInPandas(
        kernel, "media_id long, phash long"
    )


def hamming_near_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Generic banded-Hamming near-pair join over any integer signature
    column (pHash here; SimHash elsewhere): split into ``bands`` equal
    bit-bands, candidates = per-band equi-joins (bucketed, never
    all-pairs), exact popcount rescoring. Pigeonhole: distance ≤
    bands−1 is guaranteed complete, so the default (4 bands, ≤3) is
    lossless. Returns (id_a, id_b, hamming) with id_a < id_b."""
    if max_hamming > bands - 1:
        raise ValueError("need bands >= max_hamming + 1 for completeness")
    w = bits // bands
    mask = (1 << w) - 1
    s = sigs.select(
        F.col(id_col).alias("id"),
        F.col(sig_col).alias("sig"),
        *[
            (
                F.shiftrightunsigned(F.col(sig_col), i * w)
                .bitwiseAND(F.lit(mask))
            ).alias(f"b{i}")
            for i in range(bands)
        ],
    )
    pairs = None
    for i in range(bands):
        a = s.select(
            F.col("id").alias("id_a"),
            F.col("sig").alias("sig_a"),
            F.col(f"b{i}").alias("band"),
        )
        b = s.select(
            F.col("id").alias("id_b"),
            F.col("sig").alias("sig_b"),
            F.col(f"b{i}").alias("band"),
        )
        p = a.join(b, "band").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", "sig_a", "sig_b"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.distinct()
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
