"""Real multimodal decode: pure-numpy PPM/PGM/BMP codecs, the
``fake=False`` feature-extraction path end-to-end on Spark against the
generator's pixel ground truth, and real nearest-neighbor resize.

Unlike the PIL-gated containers, these paths run fully in-env — the
decode kernel the brief names is exercised on real bytes, not a stub."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.multimodal import (
    decode_image,
    encode_bmp,
    encode_ppm,
    extract_features,
    media_dims,
    media_pixels,
    resize_plan,
    synthesize_media,
)


def _arr(w=13, h=7, seed=5):
    return media_pixels(seed, w, h)


def test_ppm_roundtrip_rgb_and_gray():
    a = _arr()
    assert np.array_equal(decode_image(encode_ppm(a)), a)
    g = a[:, :, 0]
    assert np.array_equal(decode_image(encode_ppm(g)), g)


def test_ppm_header_comments_and_whitespace():
    a = _arr(w=3, h=2)
    body = a.tobytes()
    payload = b"P6 # wide\n# comment line\n 3\n2 # h\n255\n" + body
    assert np.array_equal(decode_image(payload), a)


def test_bmp_roundtrip_includes_row_padding():
    # w=13 -> 39-byte rows pad to 40: the stride path is exercised
    a = _arr(w=13, h=7)
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    a2 = _arr(w=16, h=4)  # stride == w*3: no padding
    assert np.array_equal(decode_image(encode_bmp(a2)), a2)


def test_unknown_container_raises_value_error():
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\nnot really")
    with pytest.raises(ValueError):
        decode_image(b"plain text payload")


@pytest.mark.parametrize("codec", ["ppm", "bmp"])
def test_real_decode_matches_generator_ground_truth(spark, codec):
    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = synthesize_media(docs, codec=codec)
    feats = {
        r.doc_id: r
        for r in extract_features(media, fake=False).collect()
    }
    assert len(feats) == 40
    for d in range(40):
        w, h = media_dims(d)
        px = media_pixels(d, w, h)
        r = feats[d]
        assert (r.width, r.height) == (w, h)
        assert r.checksum == int(px.astype(np.int64).sum())  # exact
        gray = px.mean(axis=2, dtype=np.float64).astype(np.float32)
        q = max(h // 4, 1)
        want = [float(gray[i * q:(i + 1) * q].mean()) for i in range(4)]
        assert r.feat == pytest.approx(want, rel=1e-5)


def test_real_resize_nearest_neighbor_ground_truth(spark):
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = synthesize_media(docs, codec="bmp")
    got = {
        r.doc_id: r
        for r in resize_plan(media, max_dim=16, fake=False).collect()
    }
    for d in range(12):
        w, h = media_dims(d)
        px = media_pixels(d, w, h)
        r = got[d]
        if max(w, h) <= 16:
            assert (r.dst_width, r.dst_height) == (w, h)
            assert bytes(r.payload) == encode_bmp(px)  # pass-through
            continue
        sc = 16 / max(w, h)
        dw, dh = max(int(w * sc), 1), max(int(h * sc), 1)
        assert (r.dst_width, r.dst_height) == (dw, dh)
        out = decode_image(bytes(r.payload))
        assert out.shape == (dh, dw, 3)
        ys = (np.arange(dh) * (h / dh)).astype(np.int64)
        xs = (np.arange(dw) * (w / dw)).astype(np.int64)
        assert np.array_equal(out, px[ys][:, xs])


# -- WAV PCM audio codec ---------------------------------------------------

def test_wav_roundtrip():
    from binlog_processer_spark.multimodal import (
        decode_wav,
        encode_wav,
        media_samples,
    )

    s = media_samples(5, 300)
    got, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and np.array_equal(got, s)


def test_wav_chunk_walk_skips_extra_chunks():
    # a LIST chunk between fmt and data is legal WAV; odd-size chunks pad
    import struct

    from binlog_processer_spark.multimodal import decode_wav, encode_wav

    s = np.array([1, -2, 3], dtype=np.int16)
    canonical = encode_wav(s, 8000)
    fmt = canonical[12:36]
    data = canonical[36:]
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # padded
    payload = (
        struct.pack("<4sI4s", b"RIFF", len(fmt) + len(extra) + len(data), b"WAVE")
        + fmt + extra + data
    )
    got, rate = decode_wav(payload)
    assert rate == 8000 and np.array_equal(got, s)


def test_wav_unsupported_encodings_raise_value_error():
    from binlog_processer_spark.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"ID3\x04mp3 payload here")
    stereo = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
    stereo[22] = 2  # channels=2
    with pytest.raises(ValueError):
        decode_wav(bytes(stereo))


def test_real_audio_decode_matches_generator_ground_truth(spark):
    from binlog_processer_spark.multimodal import (
        media_audio_params,
        media_samples,
    )

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = synthesize_media(docs, codec="wav")
    feats = {
        r.doc_id: r
        for r in extract_features(media, fake=False).collect()
    }
    assert len(feats) == 40
    for d in range(40):
        n, rate = media_audio_params(d)
        s = media_samples(d, n)
        r = feats[d]
        assert r.modality == "audio"
        assert (r.width, r.height) == (n, rate)  # n_samples, sample_rate
        assert r.n_bytes == 44 + n * 2  # canonical header + 16-bit mono
        assert r.checksum == int(s.astype(np.int64).sum())  # exact
        q = max(n // 4, 1)
        want = [
            float(np.sqrt(np.mean(s[i * q:(i + 1) * q].astype(np.float64) ** 2)))
            for i in range(4)
        ]
        assert r.feat == pytest.approx(want, rel=1e-5)
