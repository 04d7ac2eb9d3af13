"""Property-based round-trips for the round-5 codecs (hypothesis):
arbitrary payloads through WAV, GIF, and WARC must decode bit-exact.
Bounded sizes keep each case sub-second; the generators still reach the
interesting regions (1-pixel frames, extreme samples, odd chunk sizes,
max-palette indices, LZW width growth)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from whitebox_tools_ray.functions.gif import decode_gif, encode_gif
from whitebox_tools_ray.functions.wav import decode_wav, encode_wav
from whitebox_tools_ray.sources.warc import read_warc_records, write_warc


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 4000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, ch, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    dec, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert dec.shape == (n, ch)
    assert (dec == s).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    nf=st.integers(1, 5),
    npal=st.integers(2, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, nf, npal, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    frames = [rng.integers(0, npal, (h, w)).astype(np.uint8)
              for _ in range(nf)]
    delays = [int(x) for x in rng.integers(0, 600, nf)]
    out, dpal, ddel = decode_gif(encode_gif(frames, pal, delays_cs=delays))
    assert ddel == delays
    assert (dpal[:npal] == pal).all()
    for a, b in zip(frames, out):
        assert (a == b).all()


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 30),
    gz=st.booleans(),
    data=st.data(),
)
def test_warc_roundtrip_property(n, gz, data, tmp_path_factory):
    payloads = [data.draw(st.binary(min_size=0, max_size=400))
                for _ in range(n)]
    recs = [(i, f"https://x.example/{i}", "2024-01-01T00:00:00Z", p)
            for i, p in enumerate(payloads)]
    p = str(tmp_path_factory.mktemp("warc") / "t.warc")
    write_warc(p, recs, gzip_members=gz)
    df = read_warc_records(p)
    assert len(df) == n
    for i in range(n):
        assert df["page_id"].iloc[i] == i
        assert df["payload"].iloc[i] == payloads[i]
        assert df["content_len"].iloc[i] == len(payloads[i])
