"""WAV (RIFF/WAVE) codec round-trips + container edge cases + the
audio_features stage contract (functions/wav.py, stages/multimodal.py)."""

import numpy as np
import pytest

from whitebox_tools_ray.functions.wav import decode_wav, encode_wav


def test_roundtrip_mono16():
    rng = np.random.default_rng(0)
    s = rng.integers(-32768, 32768, 1001).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert dec.shape == (1001, 1)
    assert (dec[:, 0] == s).all()


def test_roundtrip_stereo16():
    rng = np.random.default_rng(1)
    s = rng.integers(-32768, 32768, (500, 2)).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert dec.shape == (500, 2)
    assert (dec == s).all()


def test_roundtrip_pcm8():
    # PCM8 round-trips exactly for samples that are multiples of 256
    rng = np.random.default_rng(2)
    s = (rng.integers(-128, 128, 333).astype(np.int16) << 8)
    dec, rate = decode_wav(encode_wav(s, 8000, bits=8))
    assert rate == 8000
    assert (dec[:, 0] == s).all()


def test_unknown_chunks_skipped_and_pad_byte():
    s = np.arange(-100, 100, dtype=np.int16)
    # odd-length LIST payload forces the word-alignment pad byte; a second
    # unknown chunk after it verifies the walk resumes at the right offset
    data = encode_wav(s, 22050, extra_chunks=(
        (b"LIST", b"INFOISFTabc"), (b"fact", b"\x01\x02\x03\x04")))
    dec, rate = decode_wav(data)
    assert rate == 22050
    assert (dec[:, 0] == s).all()


def test_extremes_roundtrip():
    s = np.array([-32768, 32767, 0, -1, 1], np.int16)
    dec, _ = decode_wav(encode_wav(s, 8000))
    assert (dec[:, 0] == s).all()


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(b"not a riff at all, definitely")
    good = encode_wav(np.zeros(10, np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(good[:30])  # truncated inside the fmt chunk
    # non-PCM format tag -> NotImplementedError, not silent garbage
    bad = bytearray(good)
    bad[20] = 85  # fmt audio_format field (offset 12+8)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_audio_feature_stage_matches_numpy(ray_session):
    """The actor-pool stage's features equal a direct numpy computation on
    the pre-encode samples — i.e. the REAL decode is lossless end to end."""
    import ray.data

    from whitebox_tools_ray.sources.synthetic import splitmix64
    from whitebox_tools_ray.stages.multimodal import (WavFeatureExtract,
                                                      synth_audio_table)

    tbl = synth_audio_table(50, seed=7)
    out = (ray.data.from_arrow(tbl)
           .map_batches(WavFeatureExtract, batch_size=16,
                        batch_format="pyarrow", concurrency=2)
           .to_pandas().sort_values("item_id").reset_index(drop=True))
    h = splitmix64(np.arange(50, dtype=np.uint64) + np.uint64(7))
    for i in range(50):
        n = 500 + int(h[i] % np.uint64(1500))
        a = 1 + int((h[i] >> np.uint64(8)) % np.uint64(64))
        b = int((h[i] >> np.uint64(16)) % np.uint64(4096))
        t = np.arange(n, dtype=np.int64)
        s = (a * t + b) % 4096 - 2048
        neg = s < 0
        row = out.iloc[i]
        assert row["n_samples"] == n
        assert row["sum_sq"] == int((s * s).sum())
        assert row["zero_cross"] == int((neg[1:] != neg[:-1]).sum())
        assert row["peak_abs"] == int(np.abs(s).max())
