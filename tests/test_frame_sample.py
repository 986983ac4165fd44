"""m09 frame sampling: container roundtrip, stride arithmetic, frame
pixels ≡ independently re-derived frames, seekability (unsampled
frames never decoded), corrupt-container tolerance, parallelism
invariance."""

import hashlib

import numpy as np

from common_crawl___autumn_2025_spark import synthetic as syn
from common_crawl___autumn_2025_spark.operators.multimodal import (
    FRAME_STRIDE,
    N_VIDEOS,
    decode_video_frames,
    encode_video,
    m09_frame_sample,
    make_video_record,
    sample_frames,
    videos_df,
)


def test_container_roundtrip_exact():
    frames = [
        syn.make_image(syn.h64(5, "frame", j), min_side=8, max_side=16)
        for j in range(5)
    ]
    data = encode_video(frames)
    got = dict(decode_video_frames(data, stride=1))
    assert sorted(got) == [0, 1, 2, 3, 4]
    for j, f in enumerate(frames):
        assert np.array_equal(got[j], f)


def test_stride_skips_without_decoding(monkeypatch):
    """Sampling must not decode unsampled frames — the seekable
    container property. Count decode_image calls via monkeypatch."""
    from common_crawl___autumn_2025_spark.operators import multimodal as mm
    from common_crawl___autumn_2025_spark import codecs

    frames = [
        syn.make_image(syn.h64(6, "frame", j), min_side=8, max_side=16)
        for j in range(8)
    ]
    data = encode_video(frames)
    calls = []
    real = codecs.decode_image

    def counting(d, fmt):
        calls.append(fmt)
        return real(d, fmt)

    monkeypatch.setattr(codecs, "decode_image", counting)
    got = dict(mm.decode_video_frames(data, stride=3))
    assert sorted(got) == [0, 3, 6]
    assert len(calls) == 3  # exactly the sampled frames


def test_m09_operator_rows(spark, sf_dir):
    out = m09_frame_sample(spark, sf_dir).collect()
    # every video contributes ceil(8/3) = 3 sampled frames
    assert len(out) == N_VIDEOS * 3
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.video_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 3, 6] for v in by_vid.values())
    # spot-check frame pixels against the independently re-derived
    # frame generator (same derivation records use)
    r0 = min(out, key=lambda r: (r.video_id, r.frame_idx))
    vid_idx = int(r0.video_id.removeprefix("vid"))
    key = syn.h64(42, "video", vid_idx)
    ref = syn.make_image(syn.h64(key, "frame", 0), min_side=8, max_side=16)
    want = int.from_bytes(
        hashlib.md5(ref.tobytes()).digest()[:8], "big", signed=True
    )
    assert r0.frame_hash == want
    assert r0.mean_r == round(float(ref[:, :, 0].astype(np.float64).mean()), 4)


def test_corrupt_container_skipped(spark):
    good = make_video_record("vid000000", syn.h64(42, "video", 0))
    bad = {"video_id": "vid000001", "bytes": b"NOPE" + b"\x00" * 20,
           "n_frames": 3}
    videos = spark.createDataFrame(
        [tuple(r[k] for k in ("video_id", "bytes", "n_frames"))
         for r in (good, bad)],
        "video_id string, bytes binary, n_frames int",
    )
    out = sample_frames(videos).collect()
    assert {r.video_id for r in out} == {"vid000000"}


def test_m09_parallelism_invariance(spark):
    a = sorted(
        tuple(r)
        for r in sample_frames(videos_df(spark, 12, partitions=2)).collect()
    )
    b = sorted(
        tuple(r)
        for r in sample_frames(videos_df(spark, 12, partitions=8)).collect()
    )
    assert a == b and len(a) == 12 * 3
