"""m08 bilinear resize: the vectorized kernel must equal an
independent per-pixel reference (same half-pixel-center convention,
written as explicit loops), be an exact identity at equal dims,
preserve constants, and the operator must be duplicate-consistent and
parallelism-invariant."""

import hashlib

import numpy as np

from common_crawl___autumn_2025_spark import synthetic as syn
from common_crawl___autumn_2025_spark.operators.multimodal import (
    RESIZE_TO,
    bilinear_resize,
    m08_image_resize,
    resize_records,
)


def _reference_bilinear(img, out_h, out_w):
    """Per-pixel spelling of the same convention — an independent
    implementation to pin the vectorized kernel against."""
    h, w = img.shape[:2]
    out = np.zeros((out_h, out_w, 3), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            y = (i + 0.5) * h / out_h - 0.5
            x = (j + 0.5) * w / out_w - 0.5
            y0 = min(max(int(np.floor(y)), 0), h - 1)
            x0 = min(max(int(np.floor(x)), 0), w - 1)
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            wy = min(max(y - y0, 0.0), 1.0)
            wx = min(max(x - x0, 0.0), 1.0)
            for c in range(3):
                top = img[y0, x0, c] * (1 - wx) + img[y0, x1, c] * wx
                bot = img[y1, x0, c] * (1 - wx) + img[y1, x1, c] * wx
                out[i, j, c] = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def test_kernel_matches_perpixel_reference():
    for key in (1, 7, 42):
        img = syn.make_image(syn.h64(9, "record", key))
        for oh, ow in ((16, 16), (7, 13), (32, 8)):
            got = bilinear_resize(img, oh, ow)
            want = _reference_bilinear(img, oh, ow)
            assert np.array_equal(got, want), (key, oh, ow)


def test_kernel_identity_and_constant():
    img = syn.make_image(syn.h64(3, "record", 5))
    h, w = img.shape[:2]
    assert np.array_equal(bilinear_resize(img, h, w), img)  # identity
    const = np.full((11, 19, 3), 77, dtype=np.uint8)
    assert (bilinear_resize(const, 16, 16) == 77).all()


def test_m08_operator_rows(spark, sf_dir):
    out = m08_image_resize(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.out_w == RESIZE_TO and r.out_h == RESIZE_TO
        assert 0.0 <= r.mean_r <= 255.0
    # spot-check one row against a local recompute from the payload
    r0 = out[0]
    idx = int(r0.image_id.removeprefix("img"))
    ref = syn.make_image(syn.h64(42, "record", idx))
    small = bilinear_resize(ref, RESIZE_TO, RESIZE_TO)
    want = int.from_bytes(
        hashlib.md5(small.tobytes()).digest()[:8], "big", signed=True
    )
    assert r0.resize_hash == want
    assert r0.mean_r == round(float(small[:, :, 0].mean()), 4)


def test_m08_duplicates_and_parallelism(spark):
    rec = syn.record_for_key("img000000000", syn.h64(11, "record", 0))
    twin = dict(rec, image_id="img000000001")
    cols = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    records = spark.createDataFrame(
        [tuple(r[k] for k in cols) for r in (rec, twin)], syn.RECORD_SCHEMA
    )
    out = {r.image_id: r for r in resize_records(records).collect()}
    assert (
        out["img000000000"].resize_hash == out["img000000001"].resize_hash
    )
    a = sorted(
        tuple(r)
        for r in resize_records(
            syn.records_df(spark, 24, seed=42, partitions=2)
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in resize_records(
            syn.records_df(spark, 24, seed=42, partitions=8)
        ).collect()
    )
    assert a == b and len(a) == 24


def test_corrupt_payload_skipped_not_fatal(spark):
    """m07/m08 contract: an undecodable payload contributes zero rows
    and never fails the job."""
    from common_crawl___autumn_2025_spark.operators.multimodal import (
        extract_patches,
    )

    rec = syn.record_for_key("img000000000", syn.h64(13, "record", 0))
    bad = dict(rec, image_id="img000000001", bytes=b"\x00garbage\xff")
    cols = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    records = spark.createDataFrame(
        [tuple(r[k] for k in cols) for r in (rec, bad)], syn.RECORD_SCHEMA
    )
    rz = resize_records(records).collect()
    assert {r.image_id for r in rz} == {"img000000000"}
    pt = extract_patches(records).collect()
    assert {r.image_id for r in pt} == {"img000000000"}
