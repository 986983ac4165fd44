"""m07 ViT-style patch extraction: geometry (grid dims from image
dims), exact reconstruction against independently re-derived lossless
pixels, duplicate-image patch-hash equality, and parallelism
invariance."""

import hashlib

import numpy as np

from common_crawl___autumn_2025_spark import synthetic as syn
from common_crawl___autumn_2025_spark.operators.multimodal import (
    N_RECORDS,
    PATCH,
    extract_patches,
    m07_image_patches,
)


def test_m07_grid_geometry(spark, sf_dir):
    """Every decodable image yields exactly (h//P)*(w//P) patches at
    the right grid positions."""
    out = m07_image_patches(spark, sf_dir).collect()
    recs = {
        r["image_id"]: r
        for r in syn.records_pandas(N_RECORDS, seed=42).to_dict("records")
    }
    by_img = {}
    for r in out:
        by_img.setdefault(r.image_id, []).append((r.prow, r.pcol))
    assert len(by_img) == N_RECORDS  # every record decodes (png/ppm)
    for image_id, cells in by_img.items():
        rec = recs[image_id]
        gh, gw = rec["h"] // PATCH, rec["w"] // PATCH
        assert sorted(cells) == [
            (i, j) for i in range(gh) for j in range(gw)
        ]


def test_m07_patches_match_rederived_pixels(spark):
    """For lossless payloads the patch means/std/hash must equal the
    values recomputed from the independently re-derived reference
    image — the per-patch analogue of m01's PSNR invariant."""
    records = syn.records_df(spark, 12, seed=42)  # default png/ppm
    out = extract_patches(records).collect()
    assert out
    for r in out:
        idx = int(r.image_id.removeprefix("img"))
        ref = syn.make_image(syn.h64(42, "record", idx))
        block = ref[
            r.prow * PATCH : (r.prow + 1) * PATCH,
            r.pcol * PATCH : (r.pcol + 1) * PATCH,
        ]
        assert r.mean_r == round(float(block[:, :, 0].mean()), 4)
        assert r.mean_g == round(float(block[:, :, 1].mean()), 4)
        assert r.mean_b == round(float(block[:, :, 2].mean()), 4)
        assert r.patch_std == round(float(block.astype(np.float64).std()), 4)
        want = int.from_bytes(
            hashlib.md5(block.tobytes()).digest()[:8], "big", signed=True
        )
        assert r.patch_hash == want


def test_m07_duplicate_images_share_patch_hashes(spark):
    """Two records with identical pixels produce identical patch-hash
    grids — patch-level exact dedup reduces to a hash groupBy."""
    rec = syn.record_for_key("img000000000", syn.h64(7, "record", 0))
    twin = dict(rec, image_id="img000000001")
    records = spark.createDataFrame(
        [tuple(r[k] for k in (
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
        )) for r in (rec, twin)],
        syn.RECORD_SCHEMA,
    )
    out = extract_patches(records).collect()
    a = sorted(
        (r.prow, r.pcol, r.patch_hash)
        for r in out if r.image_id == "img000000000"
    )
    b = sorted(
        (r.prow, r.pcol, r.patch_hash)
        for r in out if r.image_id == "img000000001"
    )
    assert a == b and len(a) > 0


def test_m07_parallelism_invariance(spark):
    """partitions=2 vs partitions=8 → identical patch tables."""
    a = sorted(
        tuple(r)
        for r in extract_patches(
            syn.records_df(spark, 32, seed=42, partitions=2)
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in extract_patches(
            syn.records_df(spark, 32, seed=42, partitions=8)
        ).collect()
    )
    assert a == b and len(a) > 0
