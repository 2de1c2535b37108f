"""Round-2 multimodal extensions: real nearest-neighbor resize kernel,
audio decode/feature stage, exact histogram quantiles."""

import numpy as np
import pyarrow as pa
import pytest

from pdf2doi_ray.stages.multimodal import (
    AudioFeatures,
    ImageResize,
    decode_audio,
    resize_nearest,
    synth_audio,
    synth_image,
)


def test_resize_nearest_on_gradient():
    # non-uniform input: the kernel must gather the right source pixels
    pix = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = resize_nearest(pix, 4, 4)
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(small, pix[ys[:, None], xs[None, :]])
    # upscale too
    big = resize_nearest(pix, 16, 16)
    assert big.shape == (16, 16)
    assert big[0, 0] == pix[0, 0] and big[15, 15] == pix[7, 7]


def test_image_resize_stage_degrades_bad_rows():
    stage = ImageResize(out_w=4, out_h=4)
    batch = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "image": pa.array([synth_image(7), b"garbage"], type=pa.binary()),
    })
    out = stage(batch)
    assert out["width"][0].as_py() == 4
    assert out["mean_pixel"][0].as_py() == 7 % 251
    assert out["width"][1].as_py() is None          # degraded, not raised
    assert "image" not in out.column_names          # payload projected away


def test_audio_roundtrip_and_features():
    x = decode_audio(synth_audio(5))
    assert len(x) == 1000 + 5 % 500
    assert x.dtype == np.int16
    stage = AudioFeatures()
    batch = pa.table({
        "doc_id": pa.array([5, 6], type=pa.int64()),
        "audio": pa.array([synth_audio(5), b"nope"], type=pa.binary()),
    })
    out = stage(batch)
    xs = x.astype(np.int64)
    assert out["n_samples"][0].as_py() == len(x)
    assert out["peak"][0].as_py() == int(np.abs(xs).max())
    assert out["energy_mean"][0].as_py() == int((xs * xs).sum() // len(xs))
    assert out["n_samples"][1].as_py() is None


@pytest.mark.usefixtures("ray_session")
def test_token_count_quantiles_matches_explicit_rank():
    import ray.data

    from pdf2doi_ray.stages.textstats import token_count_quantiles

    rng = np.random.RandomState(11)
    counts = rng.randint(1, 50, size=237)
    texts = [" ".join(["w"] * int(c)) for c in counts]
    # c tokens joined by single spaces → string_split yields c tokens
    t = pa.table({"doc_id": pa.array(np.arange(237), type=pa.int64()),
                  "text": pa.array(texts)})
    out = token_count_quantiles(ray.data.from_arrow(t).repartition(4))
    srt = np.sort(counts)
    for q, v in zip(out["q_permille"], out["value"]):
        rank = -(-int(q) * len(srt) // 1000)
        assert int(v) == int(srt[rank - 1]), q


@pytest.mark.usefixtures("ray_session")
def test_token_count_quantiles_empty_input():
    import ray.data

    from pdf2doi_ray.stages.textstats import token_count_quantiles

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    out = token_count_quantiles(ray.data.from_arrow(t))
    assert len(out) == 4
    assert out["value"].isna().all()
