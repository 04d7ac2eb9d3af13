"""Multimodal plumbing: schema, stubbed codec boundary, actor stage flow."""

import numpy as np
import pytest

from whitebox_tools_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    FrameSampler,
    MediaFeatureExtract,
    decode_image,
    synth_media_table,
)


def test_media_table_schema_and_determinism():
    t1 = synth_media_table(50)
    t2 = synth_media_table(50)
    assert t1.schema.equals(MEDIA_SCHEMA)
    assert t1.equals(t2)
    assert set(t1["media_type"].to_pylist()) <= {"image", "audio", "video"}


def test_decode_is_stubbed_without_fake():
    t = synth_media_table(1)
    with pytest.raises(NotImplementedError):
        decode_image(t["payload"][0].as_py())
    img = decode_image(t["payload"][0].as_py(), fake=True)
    assert img.shape == (48, 48)


def test_feature_extract_stage_direct():
    t = synth_media_table(20)
    out = MediaFeatureExtract(fake_decode=True)(t)
    assert out.num_rows == 20
    feats = np.stack(out["feature"].to_pylist())
    assert feats.shape == (20, 16)
    # deterministic across calls (model state fixed per actor)
    out2 = MediaFeatureExtract(fake_decode=True)(t)
    np.testing.assert_array_equal(feats, np.stack(out2["feature"].to_pylist()))


def test_frame_sampler_fanout():
    t = synth_media_table(30)
    out = FrameSampler(stride_ms=10_000)(t)
    dur = t["duration_ms"].to_numpy()
    want = int(sum(max(1, int(d) // 10_000) for d in dur))
    assert out.num_rows == want


@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_end_to_end():
    import ray.data

    from whitebox_tools_ray.stages.multimodal import media_feature_pipeline

    media = ray.data.from_arrow(synth_media_table(200))
    feats = media_feature_pipeline(media, batch_size=64, concurrency=(1, 2), fake_decode=True)
    df = feats.to_pandas()
    assert len(df) == sum(1 for m in synth_media_table(200)["media_type"].to_pylist()
                          if m != "video")
    assert {"item_id", "media_type", "feature"} <= set(df.columns)


def test_png_codec_round_trip_all_filters():
    import numpy as np

    from whitebox_tools_ray.functions.png import decode_png, encode_png

    rng = np.random.default_rng(3)
    for shape in [(9, 7), (12, 5, 3), (6, 6, 4), (5, 8, 2)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(arr, filter_type=ft))
            assert out.shape == arr.shape
            assert (out == arr).all()


def test_media_features_decode_planted_image(ray_session):
    """The features of a PLANTED image equal the features computed from the
    raw pixels directly — the decode boundary is real, not a hash stub."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from whitebox_tools_ray.functions.png import encode_png
    from whitebox_tools_ray.stages.multimodal import (
        MEDIA_SCHEMA, MediaFeatureExtract, resize_nearest)

    img = (np.arange(20 * 30, dtype=np.int64) % 256).astype(np.uint8) \
        .reshape(20, 30)
    t = pa.table({
        "item_id": pa.array([7], pa.int64()),
        "url": pa.array(["https://x.example/planted.png"], pa.string()),
        "media_type": pa.array(["image"], pa.string()),
        "payload": pa.array([encode_png(img, filter_type=4)], pa.binary()),
        "width": pa.array([30], pa.int32()),
        "height": pa.array([20], pa.int32()),
        "duration_ms": pa.array([0], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    ex = MediaFeatureExtract()
    got = np.asarray(ex(t)["feature"].to_pylist()[0])
    want = resize_nearest(img.astype(np.float64), 48, 48).ravel() @ ex.proj
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_synth_image_table_payloads_decode(ray_session):
    """Mixed PNG/JPEG payload corpus: every payload decodes through the
    real codec boundary to metadata-matching pixel dims, and both formats
    are actually present."""
    import numpy as np

    from whitebox_tools_ray.stages.multimodal import synth_image_table

    t = synth_image_table(25)
    seen = set()
    for i in range(25):
        p = t["payload"][i].as_py()
        seen.add("jpg" if p[:2] == b"\xff\xd8" else "png")
        img = decode_image(p)
        assert img.shape[:2] == (t["height"][i].as_py(),
                                 t["width"][i].as_py())
        assert t["url"][i].as_py().endswith(
            ".jpg" if p[:2] == b"\xff\xd8" else ".png")
    assert seen == {"jpg", "png"}
