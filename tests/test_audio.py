"""Tests for the WAV/PCM audio codec and the audio feature pipeline."""

import numpy as np
import pytest


def test_wav_roundtrip_mono_and_stereo():
    from tsne_flink_spark.pipeline.audio import decode_wav, encode_wav

    mono = (np.sin(np.linspace(0, 20, 500)) * 20000).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (500, 1)
    assert np.array_equal(s[:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (500, 2)
    assert np.array_equal(s2, stereo)


def test_wav_8bit_and_extra_chunks():
    import struct

    from tsne_flink_spark.pipeline.audio import decode_wav

    # hand-built 8-bit mono WAV with a LIST chunk between fmt and data
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255, 128])
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = decode_wav(payload)
    assert rate == 8000 and s.shape == (4, 1)
    # unsigned 8-bit midpoint 128 -> 0; extremes widen to +-int16 range
    assert s[:, 0].tolist() == [-32768, 0, 32512, 0]


def test_wav_malformed_inputs_fail_loudly():
    import struct

    from tsne_flink_spark.pipeline.audio import decode_wav, encode_wav

    good = encode_wav(np.zeros(100, dtype=np.int16))
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + good[4:])  # wrong magic
    with pytest.raises(ValueError):
        decode_wav(good[:30])  # truncated data chunk
    with pytest.raises(ValueError):
        decode_wav(good[:12])  # no chunks at all
    # non-PCM format code
    bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="unsupported WAVE format"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # fuzz: random corruptions either decode or raise ValueError, never
    # crash with anything else
    rng = np.random.default_rng(11)
    for _ in range(50):
        buf = bytearray(good)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        try:
            decode_wav(bytes(buf))
        except ValueError:
            pass


def test_audio_feature_kernel_known_signal():
    from tsne_flink_spark.pipeline.audio import audio_feature_arrays

    rate = 8000
    t = np.arange(rate) / rate  # exactly 1 second
    tone = (np.sin(2 * np.pi * 1000 * t) * 16384).astype(np.int16)[:, None]
    f = audio_feature_arrays(tone, rate)
    assert f["duration_s"] == pytest.approx(1.0)
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert f["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    # a 1 kHz tone crosses zero 2000 times per second
    assert f["zero_crossing_rate"] == pytest.approx(2000 / rate, rel=1e-2)
    bands = np.array(f["band_energy"])
    assert bands.shape == (8,)
    assert bands.sum() == pytest.approx(1.0)
    assert bands.max() > 0.99  # a pure tone concentrates in one band


def test_audio_feature_kernel_degenerate_clips():
    """Tiny and silent clips must neither crash nor break the band
    invariant: sum(bands) is 1 for any clip with spectral energy, exactly
    0 for silent/degenerate ones."""
    from tsne_flink_spark.pipeline.audio import audio_feature_arrays

    one = np.array([[1234]], dtype=np.int16)
    f1 = audio_feature_arrays(one, 8000)
    assert sum(f1["band_energy"]) in (pytest.approx(1.0), 0.0)

    two = np.array([[10000], [-10000]], dtype=np.int16)
    f2 = audio_feature_arrays(two, 8000)
    assert f2["rms"] > 0
    assert sum(f2["band_energy"]) == pytest.approx(1.0)  # was all-zero

    silent = np.zeros((2000, 1), dtype=np.int16)
    fs = audio_feature_arrays(silent, 8000)
    assert fs["rms"] == 0.0
    assert sum(fs["band_energy"]) == 0.0  # the explicit silent marker

    empty = np.zeros((0, 1), dtype=np.int16)
    fe = audio_feature_arrays(empty, 8000)
    assert fe["duration_s"] == 0.0 and sum(fe["band_energy"]) == 0.0


def test_synth_seed_changes_payloads():
    from tsne_flink_spark.pipeline.audio import _synth_samples
    from tsne_flink_spark.pipeline.multimodal import _synth_pixels

    assert not np.array_equal(_synth_samples("x", seed=1), _synth_samples("x", seed=2))
    assert not np.array_equal(_synth_pixels("x", seed=1), _synth_pixels("x", seed=2))


def test_audio_pipeline_spark(spark):
    from tsne_flink_spark.pipeline.audio import (
        attach_audio_payload,
        extract_audio_features,
        resample_audio,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text") for i in range(6)],
        "doc_id bigint, text string",
    )
    with_audio = attach_audio_payload(docs)
    feats = extract_audio_features(with_audio).collect()
    assert len(feats) == 6
    for r in feats:
        assert r["duration_s"] == pytest.approx(0.25)
        assert 0.0 < r["rms"] <= 1.0
        assert 0.0 <= r["zero_crossing_rate"] <= 1.0
        assert len(r["band_energy"]) == 8
        assert sum(r["band_energy"]) == pytest.approx(1.0)
    # determinism: same text -> identical features
    again = extract_audio_features(attach_audio_payload(docs)).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))

    res = resample_audio(with_audio, target_rate=4000).collect()
    for r in res:
        assert r["rate"] == 4000
        assert r["n_samples"] == 1000  # 0.25 s at 4 kHz
        from tsne_flink_spark.pipeline.audio import decode_wav

        s, rate = decode_wav(r["payload"])
        assert rate == 4000 and s.shape == (1000, 1)
