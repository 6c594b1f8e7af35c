"""Multimodal binary-column plumbing: schemas, batching, explode semantics,
poison-pill tolerance. The image decode is the stubbed FIMG container; audio
PCM features are real math."""

import numpy as np
import pytest

from ddsketch_ruby_spark.functions.multimodal import (
    audio_features,
    decode_images,
    sample_frames,
    synth_audio,
    synth_image,
    synth_video,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, synth_image(8, 4, seed=1)),
        (2, synth_image(16, 16, seed=2)),
        (3, b"\x89PNG not actually decodable here"),  # poison pill
    ]
    images = spark.createDataFrame(rows, "img_id long, img binary")
    videos = spark.createDataFrame(
        [(10, synth_video(6, 4, 4, seed=3)), (11, synth_video(3, 2, 2, seed=4))],
        "vid_id long, vid binary",
    )
    audio = spark.createDataFrame(
        [(20, synth_audio(16000, 16000, seed=5)), (21, b"JUNK")],
        "aud_id long, aud binary",
    )
    return images, videos, audio


def test_decode_images(spark, media):
    images, _, _ = media
    out = {r["img_id"]: r.asDict() for r in decode_images(images, "img", "img_id").collect()}
    assert out[1]["width"] == 8 and out[1]["height"] == 4
    assert out[2]["width"] == 16
    assert len(out[1]["histogram"]) == 16
    assert abs(sum(out[1]["histogram"]) - 1.0) < 1e-9
    assert 0 <= out[1]["mean_intensity"] <= 255
    # poison pill: NULL features, row preserved, task not failed
    assert out[3]["width"] is None and out[3]["histogram"] is None


def test_decode_partition_invariant(spark, media):
    images, _, _ = media
    a = sorted(map(tuple, decode_images(images, "img", "img_id").collect()))
    b = sorted(
        map(tuple, decode_images(images.repartition(3), "img", "img_id").collect())
    )
    assert [x[0:3] for x in a] == [x[0:3] for x in b]


def test_sample_frames(spark, media):
    _, videos, _ = media
    frames = sample_frames(videos, "vid", "vid_id", every_n=2).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["vid_id"], []).append(r)
    assert [r["frame_idx"] for r in by_vid[10]] == [0, 2, 4]
    assert [r["frame_idx"] for r in by_vid[11]] == [0, 2]
    # sampled frames are themselves decodable images
    f = by_vid[10][0]
    assert bytes(f["frame"])[:4] == b"FIMG"
    assert f["width"] == 4 and f["height"] == 4
    frame_df = spark.createDataFrame(
        [(r["vid_id"] * 100 + r["frame_idx"], bytes(r["frame"])) for r in frames],
        "fid long, img binary",
    )
    decoded = decode_images(frame_df, "img", "fid").collect()
    assert all(d["width"] is not None for d in decoded)


def test_audio_features(spark, media):
    _, _, audio = media
    out = {r["aud_id"]: r.asDict() for r in audio_features(audio, "aud", "aud_id").collect()}
    a = out[20]
    assert a["sample_rate"] == 16000
    assert a["duration_sec"] == pytest.approx(1.0)
    assert 7000 < a["rms"] < 9000  # sigma=8000 gaussian
    assert 0.3 < a["zero_crossing_rate"] < 0.7
    assert out[21]["sample_rate"] is None  # junk tolerated


def test_resize_images_area_mean(spark):
    """Downsample = exact area mean over integer cell edges; garbage
    blobs yield NULL pixels; output tensors have the fixed target shape."""
    import numpy as np

    from ddsketch_ruby_spark.functions.multimodal import (
        resize_images,
        synth_image,
    )

    blob = synth_image(20, 10, seed=7)
    rows = [(1, blob), (2, b"not an image"), (3, synth_image(2, 2, seed=1))]
    df = spark.createDataFrame(rows, "img_id long, data binary")
    got = {
        r["img_id"]: r
        for r in resize_images(df, "data", "img_id", 4, 4).collect()
    }
    # reference area mean for the 20x10 -> 4x4 case
    px = np.frombuffer(blob[12:], dtype=np.uint8).reshape(10, 20).astype(float)
    ye = np.linspace(0, 10, 5).astype(int)
    xe = np.linspace(0, 20, 5).astype(int)
    ref = np.empty((4, 4))
    for i in range(4):
        for j in range(4):
            ref[i, j] = px[ye[i]:ye[i+1], xe[j]:xe[j+1]].mean()
    ref = np.clip(ref, 0, 255).astype(np.uint8)
    out = np.frombuffer(bytes(got[1]["pixels"]), dtype=np.uint8).reshape(4, 4)
    assert np.array_equal(out, ref)
    assert (got[1]["width"], got[1]["height"]) == (4, 4)
    assert got[2]["pixels"] is None and got[2]["width"] is None
    # upsampling a 2x2 image still yields a full 4x4 tensor
    assert len(bytes(got[3]["pixels"])) == 16
