"""Multimodal plumbing: schemas, mapInPandas batch shapes, fan-out,
stubbed decode."""

from __future__ import annotations

import hashlib

import pytest

from redshift_etl_spark.operators import multimodal as MM


def _media(spark, n=6):
    rows = [(i, f"payload-{i}".encode() * (i + 1), None) for i in range(n)]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


@pytest.mark.slow
def test_extract_image_features_fake_decode(spark):
    media = _media(spark)
    feats = MM.extract_image_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 6
    r0 = rows[0]
    buf = b"payload-0"
    assert r0["byte_len"] == len(buf)
    assert r0["content_md5"] == hashlib.md5(buf).hexdigest()
    d = MM.fake_image_decode(buf)
    assert (r0["width"], r0["height"], r0["n_channels"]) == (
        d["width"], d["height"], d["n_channels"],
    )
    # deterministic across runs
    again = {r["media_id"]: r for r in MM.extract_image_features(media).collect()}
    assert again[3]["content_md5"] == rows[3]["content_md5"]


def test_strict_decode_raises():
    with pytest.raises(NotImplementedError, match="real image decode"):
        MM.strict_decode_fn(b"x")


def test_resize_passthrough_contract(spark):
    media = _media(spark, 3)
    out = MM.resize_images(media, 224, 224)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    assert bytes(rows[0]["content"]) == b"payload-0"


def test_sample_frames_fanout(spark):
    media = _media(spark, 4)
    frames = MM.sample_frames(media, every_n=10, n_frames=3)
    rows = frames.collect()
    assert len(rows) == 12  # 4 media × 3 frames
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_index"])
    assert all(sorted(v) == [0, 1, 2] for v in by_media.values())
    # frame bytes deterministic
    f0 = [bytes(r["frame"]) for r in rows if r["media_id"] == 1 and r["frame_index"] == 0]
    assert f0[0] == hashlib.md5(b"payload-1" * 2 + b"0").digest()


def test_attach_media_schema(spark):
    df = spark.createDataFrame([(1, b"xx")], "media_id long, blob binary")
    out = MM.attach_media(df, "blob", "image", "jpeg")
    got = out.schema["meta"].dataType
    assert [(f.name, f.dataType) for f in got.fields] == [
        (f.name, f.dataType) for f in MM.MEDIA_META.fields
    ]
    row = out.first()
    assert row["meta"]["media_type"] == "image"
    assert bytes(row["content"]) == b"xx"


def test_wav_decode_real_round_trip():
    """REAL codec path, no Spark: synthesized PCM WAV parses back to
    its exact synthesis parameters via the stdlib decoder."""
    buf = MM.synth_wav(120, sample_rate=8000, n_channels=2)
    d = MM.wav_audio_decode(buf)
    assert d == {
        "n_channels": 2,
        "sample_rate": 8000,
        "n_frames": 120,
        "duration_ms": 120 * 1000 // 8000,
        "peak_amplitude": (120 * 2 - 1) * 16,
    }
    assert len(buf) == 44 + 2 * 120 * 2  # canonical header + 16-bit PCM


def test_extract_audio_features_distributed(spark):
    """The mapInPandas audio operator decodes real WAV bytes
    executor-side and only scalar features come back."""
    rows = [(i, MM.synth_wav(50 + i, 8000, 1)) for i in range(1, 9)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in MM.extract_audio_features(media).collect()}
    assert len(out) == 8
    for i in range(1, 9):
        assert out[i]["n_frames"] == 50 + i
        assert out[i]["sample_rate"] == 8000
        assert out[i]["byte_len"] == 44 + 2 * (50 + i)


def test_default_image_decode_falls_back_without_pil():
    """Out-of-the-box resolver: real PIL decode where Pillow exists,
    the deterministic fake here (container ships no Pillow)."""
    try:
        import PIL  # noqa: F401

        assert MM.default_image_decode() is MM.pil_image_decode
    except ImportError:
        assert MM.default_image_decode() is MM.fake_image_decode
        import pytest

        with pytest.raises(ImportError, match="Pillow"):
            MM.pil_image_decode(b"\x89PNG")


# --- perceptual hash near-dup ----------------------------------------------

def test_hamming_near_pairs_lossless_and_exact(spark):
    """Banded candidates find EVERY pair within the guarantee radius;
    popcount rescoring is exact (verified vs python popcount)."""
    import random

    from redshift_etl_spark.operators.multimodal import hamming_near_pairs

    rng = random.Random(7)
    base = rng.getrandbits(63)
    sigs = [(0, base)]
    # planted near neighbors at distances 1..3 and far noise
    for i, d in enumerate((1, 2, 3), start=1):
        v = base
        for b in rng.sample(range(60), d):
            v ^= 1 << b
        sigs.append((i, v))
    for i in range(4, 40):
        sigs.append((i, rng.getrandbits(63)))
    df = spark.createDataFrame(sigs, "media_id long, phash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_pairs(
            df, "media_id", "phash", bands=4, max_hamming=3
        ).collect()
    }
    want = {}
    for i, (ia, va) in enumerate(sigs):
        for ib, vb in sigs[i + 1:]:
            h = bin(va ^ vb).count("1")
            if h <= 3:
                want[(min(ia, ib), max(ia, ib))] = h
    assert got == want
    assert {(0, 1), (0, 2), (0, 3)} <= set(got)


def test_perceptual_hash_pipeline_finds_duplicate_media(spark):
    """End-to-end over binary media: identical buffers hash identically
    (distance 0) regardless of decoder availability."""
    from redshift_etl_spark.operators.multimodal import (
        hamming_near_pairs,
        perceptual_hashes,
    )

    payload = bytes(range(256)) * 4
    other = b"something else entirely" * 40
    media = spark.createDataFrame(
        [(1, payload), (2, payload), (3, other)],
        "media_id long, content binary",
    )
    ph = perceptual_hashes(media)
    pairs = hamming_near_pairs(ph, "media_id", "phash").collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [
        (1, 2, 0)
    ]
