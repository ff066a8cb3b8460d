"""The in-repo numpy PPM/WAV decoder (VERDICT r11 ask #7): unit decode
tests on real container bytes, plus the e2e registration path through
media_features — real bytes through the registered decoder, not the
byte-slice fallback."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from pandas_ta_spark.ext.decoders import decode_ppm, decode_wav, numpy_decoder


def _ppm_bytes(h, w, maxval=127, comment=False):
    """A real binary P6 file; pixel bytes <= maxval (ASCII-safe when
    <= 127, so the payload survives the corpus's utf-8 text column)."""
    head = b"P6\n"
    if comment:
        head += b"# a netpbm comment\n"
    head += f"{w} {h}\n{maxval}\n".encode()
    pix = (np.arange(h * w * 3, dtype=np.uint8) % (maxval + 1))
    return head + pix.tobytes(), pix.reshape(h, w, 3)


def _wav_bytes(samples: bytes, channels=1, bits=8, rate=8000):
    """A real RIFF/WAVE PCM file (8-bit mono stays ASCII-safe)."""
    block = channels * bits // 8
    fmt = (b"\x01\x00" + channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + bits.to_bytes(2, "little"))
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(samples).to_bytes(4, "little") + samples
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_decode_ppm_p6_and_p5():
    payload, pix = _ppm_bytes(4, 5, comment=True)
    out = decode_ppm(payload)
    assert out.shape == (4, 5, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, pix)
    # P5 grayscale
    gray = bytes(range(12))
    p5 = b"P5\n4 3\n255\n" + gray
    out5 = decode_ppm(p5)
    assert out5.shape == (3, 4)
    np.testing.assert_array_equal(out5.ravel(), np.frombuffer(gray, np.uint8))


def test_decode_ppm_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="P6/P5"):
        decode_ppm(b"JFIF....")
    payload, _ = _ppm_bytes(4, 5)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(payload[:-10])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_decode_wav_mono8_stereo16():
    samples = bytes(range(64, 96))
    out = decode_wav(_wav_bytes(samples))
    assert out.shape == (32,) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, np.frombuffer(samples, np.uint8))
    # 16-bit stereo: interleaved L/R frames -> (2, n)
    inter = np.array([1, -1, 2, -2, 3, -3], dtype="<i2")  # L,R pairs
    out2 = decode_wav(_wav_bytes(inter.tobytes(), channels=2, bits=16))
    assert out2.shape == (2, 3)
    np.testing.assert_array_equal(out2[0], [1, 2, 3])
    np.testing.assert_array_equal(out2[1], [-1, -2, -3])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")


def test_numpy_decoder_e2e_through_media_features(spark, tmp_path):
    """Real container bytes through the REGISTERED decoder path: the
    corpus carries an actual P6 image and an actual PCM WAV (both
    ASCII-safe so the utf-8 text->payload plumbing is byte-lossless),
    plus one undecodable row that must degrade per-row."""
    ppm, pix = _ppm_bytes(3, 4)          # (3,4,3) -> frame_count 3 (ndim 3)
    wav_samples = bytes(range(32, 80))   # 48 8-bit samples
    wav = _wav_bytes(wav_samples)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [ppm.decode("utf-8"), wav.decode("utf-8"), "plain text"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": [len(ppm), len(wav), 10],
    })
    docs.to_parquet(f"{tmp_path}/documents.parquet")
    from pandas_ta_spark.ext import media as M

    try:
        M.set_decoder(numpy_decoder)
        feats = (M.SUITE["media_features"].query(spark, str(tmp_path))
                 .toPandas().sort_values("doc_id").reset_index(drop=True))
    finally:
        M.clear_decoder()

    # PPM row: decoded (3,4,3) tensor — ndim>=3 counts shape[0] frames,
    # first_frame_hash fingerprints the first pixel ROW, mean over the
    # DECODED array (≠ payload bytes: the header is not in the tensor)
    assert feats["n_bytes"][0] == len(ppm)
    assert feats["frame_count"][0] == 3
    assert feats["first_frame_hash"][0] == hashlib.md5(
        pix[0].tobytes().hex().upper().encode()).hexdigest()
    exp_mean = np.floor(pix.mean() * 1e6 + 0.5) / 1e6
    assert feats["mean_byte"][0] == exp_mean
    # the fallback would report n_bytes//16 frames and hash the first 16
    # PAYLOAD bytes — different on both counts, proving the real branch
    assert feats["frame_count"][0] != len(ppm) // 16

    # WAV row: the fake corpus mime is 'application/*' so the op
    # requests kind='image'; r13 kind-contract enforcement degrades the
    # container-class mismatch per-row (audio-as-image would otherwise
    # hand a (channels, n_samples) matrix to image ops silently)
    assert feats["n_bytes"][1] == len(wav)
    assert pd.isna(feats["frame_count"][1])
    assert pd.isna(feats["first_frame_hash"][1])

    # undecodable row: ValueError -> row kept, tensor features NULL
    assert feats["n_bytes"][2] == 10
    assert pd.isna(feats["frame_count"][2])
    assert pd.isna(feats["first_frame_hash"][2])


def test_numpy_decoder_kind_contract():
    """Container class must match the requested kind (r12 ADVICE):
    audio-as-image / image-as-audio degrade per-row instead of silently
    swapping shape contracts; still-image-as-1-frame-video stays legal."""
    ppm, pix = _ppm_bytes(2, 3)
    wav = _wav_bytes(bytes(range(40, 56)))
    np.testing.assert_array_equal(numpy_decoder(ppm, "image"),
                                  pix.reshape(2, 3, 3))
    assert numpy_decoder(ppm, "video").shape == (1, 2, 3, 3)
    assert numpy_decoder(wav, "audio").shape == (16,)
    with pytest.raises(ValueError, match="not audio"):
        numpy_decoder(ppm, "audio")
    with pytest.raises(ValueError, match="audio, not image"):
        numpy_decoder(wav, "image")
    with pytest.raises(ValueError, match="audio, not video"):
        numpy_decoder(wav, "video")


def test_media_features_audio_kind_e2e(spark):
    """A media_meta.mime of audio/* routes kind='audio' into the
    registered decoder, so a real WAV decodes e2e (1-D samples -> one
    frame, stats over samples — the path the suite's 'application/fake'
    corpus can't reach)."""
    from pyspark.sql import functions as F

    from pandas_ta_spark.ext import media as M

    samples = bytes(range(32, 80))
    wav = _wav_bytes(samples)
    sdf = (spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "payload": [bytearray(wav)]}))
        .select(
            "doc_id", F.col("payload").cast("binary").alias("content"),
            F.struct(
                F.lit("audio/wav").alias("mime"),
                F.length("payload").alias("n_bytes"),
                F.lit(0).alias("width"), F.lit(0).alias("height"),
            ).alias("media_meta")))
    try:
        M.set_decoder(numpy_decoder)
        feats = M.extract_features(sdf).toPandas()
    finally:
        M.clear_decoder()
    samp = np.frombuffer(samples, np.uint8)
    assert feats["frame_count"][0] == 1
    assert feats["first_frame_hash"][0] == hashlib.md5(
        samp.tobytes().hex().upper().encode()).hexdigest()
    assert feats["mean_byte"][0] == np.floor(samp.mean() * 1e6 + 0.5) / 1e6
