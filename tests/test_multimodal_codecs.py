"""Real dependency-free codecs (llmops/multimodal.py): byte-exact PPM/WAV
round-trips, malformed-input rejection, and the decoded-feature pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.llmops import multimodal as mm
from ecommerce_etl_pipeline_spark.sources.io import load_table


def test_ppm_round_trip_exact():
    px = bytes((11 + i * 13) % 256 for i in range(3 * 12 * 7))
    b = mm.encode_ppm(12, 7, px)
    assert b.startswith(b"P6\n12 7\n255\n")
    assert mm.decode_ppm(b) == (12, 7, px)


def test_ppm_comment_tolerant_and_malformed():
    px = bytes(range(3 * 2 * 1))
    with_comment = b"P6\n# a comment\n2 1\n255\n" + px
    assert mm.decode_ppm(with_comment) == (2, 1, px)
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P5\n2 1\n255\n" + px)  # wrong magic
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P6\n2 1\n65535\n" + px)  # 16-bit maxval unsupported
    with pytest.raises(ValueError):
        mm.decode_ppm(mm.encode_ppm(2, 1, px)[:-2])  # truncated raster


def test_wav_round_trip_exact():
    samples = [(-1) ** j * (j * 321 % 32768) for j in range(100)]
    b = mm.encode_wav(samples, sample_rate=16000)
    assert len(b) == 44 + 2 * len(samples)
    rate, got = mm.decode_wav(b)
    assert rate == 16000 and list(got) == samples


def test_wav_malformed_and_unsupported():
    good = mm.encode_wav([1, 2, 3])
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFX" + good[4:])  # wrong magic
    with pytest.raises(ValueError):
        mm.decode_wav(good[:30])  # truncated chunk
    stereo = bytearray(good)
    stereo[22] = 2  # channels=2
    with pytest.raises(ValueError):
        mm.decode_wav(bytes(stereo))


def test_wav_short_fmt_chunk_raises_value_error_not_struct_error():
    # A fmt chunk of declared size 8-13 passes the truncation check but is
    # too short for the bits-per-sample unpack at fmt[14:16]; must surface
    # as the documented ValueError, not struct.error.
    for fmt_size in (0, 4, 8, 12, 13):
        fmt_body = bytes(fmt_size)
        data_body = b"\x00\x00"
        chunks = (
            b"fmt " + fmt_size.to_bytes(4, "little") + fmt_body
            + (b"\x00" if fmt_size % 2 else b"")
            + b"data" + len(data_body).to_bytes(4, "little") + data_body
        )
        wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
        with pytest.raises(ValueError):
            mm.decode_wav(wav)


def test_decode_features_matches_local_decode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    assets = mm.synthesize_media_assets(docs)
    feats = {r["asset_id"]: r for r in mm.decode_features(assets).collect()}
    payloads = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    assert len(feats) == 20
    for aid, b in payloads.items():
        r = feats[aid]
        assert r["n_bytes"] == len(b)
        if aid % 2 == 0:
            w, h, data = mm.decode_ppm(b)
            assert (r["width"], r["height"]) == (w, h)
            assert r["sum_r"] == sum(data[0::3])
            assert r["n_samples"] is None
        else:
            _, samples = mm.decode_wav(b)
            assert r["n_samples"] == len(samples)
            assert r["sum_amp"] == sum(samples)
            assert r["width"] is None


def test_decode_features_raises_on_unknown_container(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"JUNKJUNK"), 8, "x")],
        schema=mm.ASSET_SCHEMA,
    )
    with pytest.raises(Exception, match="unknown container"):
        mm.decode_features(bad).collect()
