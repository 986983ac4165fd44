"""Multimodal record operators: decode / verify / feature-extract over
the canonical image+caption record table (``input_hint`` schema).

The records are engine-generated (deterministic, seeded) because the
driver testdata has no binary column; every operator here is
rows-only for the oracle harness (binary payloads are not
SQL-expressible) and is additionally pytest-asserted.

Decode for png/ppm/jpeg is REAL (own codecs — jpeg covers baseline
AND progressive SOF2, 4:4:4/4:2:2/4:2:0 sampling; see ``jpeg.py``).
Video frame-sampling (m09) is real too, over the engine's own
seekable SVID container of length-prefixed PPM frames; compressed
video codecs proper (H.264 etc. — no media libraries ship in this
environment) would slot in behind the same decode-per-frame seam,
and payloads in formats the runtime cannot decode flow through the
same plumbing row-flagged, never crashing the job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from .. import synthetic as syn
from ..codecs import LOSSLESS_FMTS, decode_image, phash64, psnr
from ..plans import register

N_RECORDS = 256

DECODE_SCHEMA = (
    "image_id string, w int, h int, fmt string, decode_ok boolean, "
    "psnr_db double, phash_match boolean, caption_tokens int"
)


def decode_verify(records, ref_seed: int | None = None):
    """records DF -> per-row decode verification (mapInPandas).

    With ``ref_seed`` given (the seed the record table was generated
    from), every payload is verified AGAINST INDEPENDENTLY RE-DERIVED
    reference pixels — ``syn.make_image`` from the record key, exactly
    like ``tests/test_crawl_replay.py`` does — so ``psnr_db`` is a
    genuine cross-derivation measurement and a corrupted payload is
    flagged. The acceptance criterion follows the input_hint
    invariant per format: lossless payloads (png/ppm) must match the
    reference EXACTLY; lossy ones (jpeg) must clear the
    PSNR >= 40 dB floor. Without a seed (records of unknown
    provenance) the reference is unavailable and ``psnr_db`` is NULL.

    Any decode failure (unsupported modality, corrupt bytes) flags the
    row instead of crashing the job — a crawl pipeline must tolerate
    malformed payloads.
    """

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                base = {
                    "image_id": row.image_id,
                    "w": row.w,
                    "h": row.h,
                    "fmt": row.fmt,
                    "caption_tokens": len((row.caption or "").split()),
                }
                try:
                    px = decode_image(bytes(row.bytes), row.fmt)
                    ok = px.shape == (row.h, row.w, 3)
                    p = None
                    if ref_seed is not None:
                        idx = int(row.image_id.removeprefix("img"))
                        ref = syn.make_image(syn.h64(ref_seed, "record", idx))
                        ok = ok and ref.shape == px.shape
                        p = (
                            float(min(psnr(ref, px), 99.0)) if ok else 0.0
                        )
                        if row.fmt in LOSSLESS_FMTS:
                            ok = ok and np.array_equal(ref, px)
                        else:  # lossy: the input_hint PSNR floor
                            ok = ok and p >= 40.0
                    out.append(
                        {
                            **base,
                            "decode_ok": bool(ok),
                            "psnr_db": p,
                            "phash_match": bool(phash64(px) == row.phash),
                        }
                    )
                except Exception:  # noqa: BLE001 — flag, don't crash
                    out.append(
                        {
                            **base,
                            "decode_ok": False,
                            "psnr_db": 0.0 if ref_seed is not None else None,
                            "phash_match": False,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["image_id", "w", "h", "fmt", "decode_ok",
                         "psnr_db", "phash_match", "caption_tokens"],
            )

    return records.mapInPandas(run, schema=DECODE_SCHEMA)


@register("m01_records_decode_verify")  # rows-only: binary payloads
def m01_records_decode_verify(spark, sf_dir):
    """Generate the canonical record table distributively, decode every
    payload, verify pixels against the independently re-derived
    reference (PSNR + allclose + phash) — the per-row invariant
    pipeline."""
    records = syn.records_df(spark, N_RECORDS, seed=42)
    return decode_verify(records, ref_seed=42).orderBy("image_id")


FEATURE_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "contrast double, thumb_hash long"
)


@register("m02_image_features")  # rows-only: binary payloads
def m02_image_features(spark, sf_dir):
    """Feature extraction: per-channel means, contrast, 8x8 thumbnail
    hash — the decode→feature stage of a multimodal pipeline (resize
    = block-mean; real, not stubbed)."""
    records = syn.records_df(spark, N_RECORDS, seed=42)

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = decode_image(bytes(row.bytes), row.fmt).astype(np.float64)
                out.append(
                    {
                        "image_id": row.image_id,
                        "mean_r": round(float(px[:, :, 0].mean()), 4),
                        "mean_g": round(float(px[:, :, 1].mean()), 4),
                        "mean_b": round(float(px[:, :, 2].mean()), 4),
                        "contrast": round(float(px.std()), 4),
                        "thumb_hash": phash64(px.astype(np.uint8)),
                    }
                )
            yield pd.DataFrame(out)

    return records.mapInPandas(run, schema=FEATURE_SCHEMA).orderBy("image_id")


@register("m03_phash_near_dup")  # rows-only
def m03_phash_near_dup(spark, sf_dir):
    """Perceptual-hash near-duplicate candidates: band the 64-bit
    phash into four 16-bit keys (any-band-equal blocking — Hamming
    ≤ distance guarantee analog of LSH), verify with exact popcount.
    All JVM-side bit arithmetic."""
    records = syn.records_df(spark, N_RECORDS, seed=42).select("image_id", "phash")
    bands = records.select(
        "image_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("image_id", "phash", "bk.band", "bk.key").localCheckpoint(
        eager=True
    )  # self-joined below; avoids regenerating the records twice
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .where(F.col("hamming") <= 16)
    )
    return pairs.orderBy("img_a", "img_b")


@register("m04_modality_stub")  # rows-only; key kept stable across rounds
def m04_modality_stub(spark, sf_dir):
    """Mixed-modality decode path. jpeg rows carry REAL baseline-JPEG
    payloads (own codec, ``jpeg.py``) and must verify against the
    lossy PSNR >= 40 dB floor; rows relabeled to a modality the
    runtime genuinely cannot decode (webm — no media libs in this
    environment) flow through the same plumbing and come back
    flagged, never crashing the job (the per-row except). Real
    audio/video decoders drop in by extending codecs.decode_image."""
    records = syn.records_df(
        spark, 32, seed=7, fmts=("png", "ppm", "jpeg")
    ).withColumn(
        "fmt",
        F.when(F.col("phash") % 5 == 0, F.lit("webm")).otherwise(F.col("fmt")),
    )
    return (
        decode_verify(records, ref_seed=7)
        .groupBy("fmt", "decode_ok")
        .agg(F.count("*").alias("n"))
        .orderBy("fmt", "decode_ok")
    )


VARIANTS = (
    ("baseline_444", "444", False),
    ("baseline_422", "422", False),
    ("baseline_420", "420", False),
    ("progressive_420", "420", True),
)

N_VARIANT_KEYS = 24

VARIANT_SCHEMA = (
    "variant string, n bigint, n_decode_ok bigint, min_psnr_db double, "
    "exact_vs_sequential bigint"
)


@register("m05_jpeg_variants")  # rows-only: binary payloads
def m05_jpeg_variants(spark, sf_dir):
    """Real-corpus JPEG layouts end-to-end: baseline 4:4:4, 4:2:2,
    4:2:0 and progressive (SOF2) 4:2:0 payloads are encoded AND
    decoded by the engine's own codec inside one ``mapInPandas``
    pass. Every variant must decode with PSNR >= 40 dB against the
    pre-encode reference pixels (smooth low-frequency content — the
    chroma a 4:2:0 web image actually carries), and every progressive
    payload must decode bit-identical to its sequential twin (same
    quantized coefficients; the entropy layer is lossless).

    4:2:0 baseline is the dominant real-web JPEG layout and SOF2 the
    second; both were refused-and-flagged before round 4 — this entry
    is the driver-visible evidence they now decode."""
    from ..jpeg import decode_jpeg, encode_jpeg

    base = spark.range(
        0, N_VARIANT_KEYS, 1, spark.sparkContext.defaultParallelism
    )

    def run(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                img = syn.make_smooth_image(syn.h64("m05", int(i)))
                for variant, sub, prog in VARIANTS:
                    data = encode_jpeg(
                        img, quality=98, subsampling=sub, progressive=prog
                    )
                    try:
                        px = decode_jpeg(data)
                        ok = px.shape == img.shape
                        p = float(min(psnr(img, px), 99.0)) if ok else 0.0
                        seq_exact = True
                        if prog:
                            seq = decode_jpeg(
                                encode_jpeg(img, quality=98, subsampling=sub)
                            )
                            seq_exact = bool(np.array_equal(px, seq))
                    except Exception:  # noqa: BLE001 — flag, don't crash
                        ok, p, seq_exact = False, 0.0, False
                    out.append(
                        {
                            "variant": variant,
                            "decode_ok": bool(ok and p >= 40.0),
                            "psnr_db": p,
                            "exact_vs_sequential": bool(seq_exact),
                        }
                    )
            yield pd.DataFrame(out)

    per_payload = base.mapInPandas(
        run,
        schema=(
            "variant string, decode_ok boolean, psnr_db double, "
            "exact_vs_sequential boolean"
        ),
    )
    return (
        per_payload.groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("decode_ok").cast("long")).alias("n_decode_ok"),
            F.round(F.min("psnr_db"), 4).alias("min_psnr_db"),
            F.sum(F.col("exact_vs_sequential").cast("long")).alias(
                "exact_vs_sequential"
            ),
        )
        .orderBy("variant")
    )


# -- E5: end-to-end IMAGE curation (the multimodal twin of e04) -------------

E05_N = 96
E05_TWIN_OFFSET = 1_000_000
E05_HAMMING = 8


def image_near_dup_pairs(hashed, max_hamming: int = E05_HAMMING):
    """(doc_a, doc_b) near-duplicate image pairs from PIXEL-derived
    phashes: 16-bit band blocking (any-band-equal — the m03 LSH
    analog, never all-pairs) + exact popcount verify, all JVM-side.
    ``hashed``: (img_id long, ph long)."""
    bands = hashed.select(
        "img_id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("ph"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("img_id", "ph", "bk.band", "bk.key").localCheckpoint(eager=True)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("doc_a"),
            F.col("b.img_id").alias("doc_b"),
            F.bit_count(
                F.col("a.ph").bitwiseXOR(F.col("b.ph"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b")
    )


@register("e05_image_curation")  # rows-only: binary payloads
def e05_image_curation(spark, sf_dir):
    """E5: the full IMAGE-corpus curation flow — what the crawl's
    record table feeds at 100 TB — with every stage in its scale
    shape:

    1. corpus with PLANTED near-duplicates: every 3rd record is
       re-encoded as 4:2:0 JPEG under a shifted id (same pixels,
       different bytes AND different container — the classic
       re-hosted-thumbnail duplicate);
    2. decode → perceptual hash derived FROM PIXELS inside one
       ``mapInPandas`` pass (metadata is never trusted — exactly the
       m01 posture);
    3. banded phash near-dup pairs (16-bit bands, popcount verify —
       blocked, never all-pairs);
    4. connected components via the O(log n) large-star/small-star
       algorithm (d06 — the 100 TB component path);
    5. keep the min-id representative per component, aggregate the
       curated corpus per format.

    Deterministic end to end (rows-only for the oracle harness:
    binary payloads + own-codec decode are not SQL-expressible); the
    planted-twin containment is pytest-asserted."""
    from ..jpeg import encode_jpeg
    from .dedup import dup_components_star

    base = syn.records_df(spark, E05_N, seed=11, fmts=("png", "ppm", "jpeg"))

    def make_twins(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                idx = int(row.image_id.removeprefix("img"))
                if idx % 3:
                    continue
                px = decode_image(bytes(row.bytes), row.fmt)
                data = encode_jpeg(px, quality=90, subsampling="420")
                out.append(
                    {
                        "image_id": f"img{idx + E05_TWIN_OFFSET:09d}",
                        "bytes": data,
                        "w": row.w,
                        "h": row.h,
                        "fmt": "jpeg",
                        "caption": row.caption,
                        "phash": row.phash,  # re-derived from pixels below
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption",
                         "phash"],
            )

    corpus = base.unionByName(base.mapInPandas(make_twins, schema=syn.RECORD_SCHEMA))

    def hash_pixels(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = decode_image(bytes(row.bytes), row.fmt)
                out.append(
                    {
                        "img_id": int(row.image_id.removeprefix("img")),
                        "fmt": row.fmt,
                        "ph": phash64(px),
                    }
                )
            yield pd.DataFrame(out, columns=["img_id", "fmt", "ph"])

    hashed = corpus.mapInPandas(
        hash_pixels, schema="img_id long, fmt string, ph long"
    ).localCheckpoint(eager=True)  # consumed by bands AND the final agg

    pairs = image_near_dup_pairs(hashed)
    comps = dup_components_star(pairs)
    dropped = comps.where(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias("img_id")
    )
    kept = hashed.join(dropped, on=["img_id"], how="left_anti")
    return (
        kept.groupBy("fmt")
        .agg(F.count("*").alias("n_kept"))
        .join(
            hashed.groupBy("fmt").agg(F.count("*").alias("n_in")),
            on=["fmt"],
        )
        .select("fmt", "n_in", "n_kept", (F.col("n_in") - F.col("n_kept")).alias("n_dropped"))
        .orderBy("fmt")
    )


@register("m06_image_dup_groups")  # rows-only: phash from binary payloads
def m06_image_dup_groups(spark, sf_dir):
    """Image dedup END-TO-END: m03's banded phash near-dup pairs
    clustered into duplicate GROUPS — (image_id, group_id = the
    lexicographically smallest member, group_size) for every image
    that near-duplicates another; the dedup keep-set is "one row per
    group_id". Completes the multimodal family the way d05/d06
    complete d02/d03: pairs alone cannot drive removal when
    duplicates chain (A~B, B~C, A!~C needs one canonical group).

    Scale shape: image ids enter the component computation as
    xxhash64 surrogates (``dup_components_star`` labels 64-bit ids;
    a collision merging two unrelated groups is a ~2^-64 per-pair
    event, the standard digest-key tradeoff this engine documents on
    every hash-keyed shuffle), the O(log n) large-star/small-star
    rounds do the clustering, and the id mapping back is one join
    against the (id, hash) relation. Rows-only: phash derives from
    binary payloads, outside DuckDB's reach — semantics pytest-gated
    (groups ⊇ pairs, group label = min member, planted chain)."""
    from .dedup import dup_components_star

    # pinned: the pair derivation pays the full synthetic record
    # generation (image encoding included) once; everything below —
    # the surrogate map, the edge list, the label join — derives from
    # these pairs, so the record table is never regenerated
    pairs = m03_phash_near_dup(spark, sf_dir).localCheckpoint(eager=True)
    surr = (
        pairs.select(F.col("img_a").alias("image_id"))
        .unionByName(pairs.select(F.col("img_b").alias("image_id")))
        .distinct()
        .select("image_id", F.xxhash64("image_id").alias("h"))
    )
    lp = pairs.select(
        F.xxhash64("img_a").alias("doc_a"),
        F.xxhash64("img_b").alias("doc_b"),
    )
    comps = dup_components_star(lp)
    labeled = comps.join(surr, comps.doc_id == surr.h).select(
        "image_id", "component"
    )
    w = Window.partitionBy("component")
    return (
        labeled.select(
            "image_id",
            F.min("image_id").over(w).alias("group_id"),
            F.count("*").over(w).cast("long").alias("group_size"),
        )
        .orderBy("group_id", "image_id")
    )


# -- m07: ViT-style patch extraction ------------------------------------------

PATCH = 8  # patch side in pixels (ViT-style non-overlapping grid)

PATCH_SCHEMA = (
    "image_id string, prow int, pcol int, mean_r double, mean_g double, "
    "mean_b double, patch_std double, patch_hash long"
)


def extract_patches(records, patch: int = PATCH):
    """records DF -> one row per non-overlapping ``patch`` x ``patch``
    tile (mapInPandas): grid position, per-channel means, in-patch
    std, and an 8-byte content hash of the raw tile bytes.

    This is the patchification stage of a vision-training pipeline
    (ViT tokenization): downstream consumers need per-patch tensors,
    and the content hash makes PATCH-level exact dedup a plain
    hash-groupBy with no pixel shuffle — the patch analogue of d01's
    digest-only shape. Incomplete edge tiles are cropped (ViT
    semantics: resize/crop upstream decides coverage); undecodable
    payloads contribute zero rows instead of failing the job.

    100 TB shape: one Arrow-batched decode pass, pixels never leave
    the task that decoded them — only O(HW/P^2) scalar rows per image
    flow out, so the exchange after this operator carries statistics
    and 8-byte digests, never image tensors. Per-image work is
    vectorized (one reshape + mean/std over the tile axes); the only
    per-tile Python is the digest, on P*P*3 = 192-byte blocks.
    """
    import hashlib

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    img = decode_image(bytes(row.bytes), row.fmt)
                except Exception:  # noqa: BLE001 — flag-free skip
                    continue
                h, w = img.shape[:2]
                gh, gw = h // patch, w // patch
                if gh == 0 or gw == 0:
                    continue
                crop = img[: gh * patch, : gw * patch]
                grid = crop.reshape(gh, patch, gw, patch, 3)
                means = grid.astype(np.float64).mean(axis=(1, 3))
                stds = grid.astype(np.float64).std(axis=(1, 3, 4))
                for i in range(gh):
                    for j in range(gw):
                        block = crop[
                            i * patch : (i + 1) * patch,
                            j * patch : (j + 1) * patch,
                        ]
                        digest = hashlib.md5(block.tobytes()).digest()[:8]
                        out.append(
                            {
                                "image_id": row.image_id,
                                "prow": i,
                                "pcol": j,
                                "mean_r": round(float(means[i, j, 0]), 4),
                                "mean_g": round(float(means[i, j, 1]), 4),
                                "mean_b": round(float(means[i, j, 2]), 4),
                                "patch_std": round(float(stds[i, j]), 4),
                                "patch_hash": int.from_bytes(
                                    digest, "big", signed=True
                                ),
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "prow", "pcol", "mean_r", "mean_g",
                    "mean_b", "patch_std", "patch_hash",
                ],
            )

    return records.mapInPandas(run, schema=PATCH_SCHEMA)


@register("m07_image_patches")  # rows-only: binary payloads
def m07_image_patches(spark, sf_dir):
    """Patchify the canonical record table: decode every payload and
    emit the ViT-style 8x8 patch grid (position, channel means, std,
    content hash) — the tokenization stage of an image training
    pipeline. Rows-only for the oracle harness (pixels are not
    SQL-expressible); geometry, reconstruction, duplicate-detection,
    and parallelism-invariance are pytest-gated
    (tests/test_image_patches.py)."""
    records = syn.records_df(spark, N_RECORDS, seed=42)
    return extract_patches(records).orderBy("image_id", "prow", "pcol")


# -- m08: bilinear resize -----------------------------------------------------

RESIZE_TO = 16  # output side (square), the thumbnail/normalize target

RESIZE_SCHEMA = (
    "image_id string, in_w int, in_h int, out_w int, out_h int, "
    "mean_r double, mean_g double, mean_b double, resize_hash long"
)


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample to (out_h, out_w, 3), half-pixel-center
    convention (align_corners=False, the OpenCV/PIL default): source
    coord x = (i + 0.5) * in/out - 0.5, edge-clamped. Fully
    vectorized; when in == out this is an exact identity (x lands on
    integer centers), which the tests pin."""
    h, w = img.shape[:2]
    # multiply-then-divide: the canonical (i + 0.5) * in / out - 0.5
    # float-op order, kept bit-identical to the per-pixel reference
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def resize_records(records, out_h: int = RESIZE_TO, out_w: int = RESIZE_TO):
    """records DF -> one row per image with the resized thumbnail's
    channel means and content hash (mapInPandas). The resize/normalize
    stage of an image training pipeline: models consume fixed-shape
    tensors, the crawl yields arbitrary dims.

    100 TB shape: decode + resample + reduce in ONE Arrow pass —
    what leaves the task is a fixed-width scalar row per image
    (stats + an 8-byte digest of the resized tensor), so downstream
    exact-dedup ON THE NORMALIZED IMAGE (the hash catches
    re-encodes/crops-to-same-thumb) is a plain hash-groupBy.
    Undecodable payloads are skipped, never fatal."""
    import hashlib

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    img = decode_image(bytes(row.bytes), row.fmt)
                except Exception:  # noqa: BLE001 — skip, don't crash
                    continue
                small = bilinear_resize(img, out_h, out_w)
                digest = hashlib.md5(small.tobytes()).digest()[:8]
                m = small.astype(np.float64).mean(axis=(0, 1))
                out.append(
                    {
                        "image_id": row.image_id,
                        "in_w": int(img.shape[1]),
                        "in_h": int(img.shape[0]),
                        "out_w": out_w,
                        "out_h": out_h,
                        "mean_r": round(float(m[0]), 4),
                        "mean_g": round(float(m[1]), 4),
                        "mean_b": round(float(m[2]), 4),
                        "resize_hash": int.from_bytes(
                            digest, "big", signed=True
                        ),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "in_w", "in_h", "out_w", "out_h",
                    "mean_r", "mean_g", "mean_b", "resize_hash",
                ],
            )

    return records.mapInPandas(run, schema=RESIZE_SCHEMA)


@register("m08_image_resize")  # rows-only: binary payloads
def m08_image_resize(spark, sf_dir):
    """Bilinear-resize every decoded payload to the fixed
    normalization target (16x16) and emit the thumbnail's stats +
    content hash — the resize stage of SURVEY §2.10's decode /
    feature-extract / resize family. Rows-only (pixels are not
    SQL-expressible); the resample kernel itself is pytest-pinned
    against an independent per-pixel reference implementation
    (tests/test_image_resize.py)."""
    records = syn.records_df(spark, N_RECORDS, seed=42)
    return resize_records(records).orderBy("image_id")


# -- m09: video container + frame sampling ------------------------------------

VIDEO_MAGIC = b"SVID"
N_VIDEOS = 48
FRAME_STRIDE = 3

FRAME_SCHEMA = (
    "video_id string, frame_idx int, n_frames int, mean_r double, "
    "mean_g double, mean_b double, frame_hash long"
)


def encode_video(frames) -> bytes:
    """Serialize RGB frames as the engine's video container: magic,
    big-endian u32 frame count, then length-prefixed binary-PPM
    frames. A REAL (if minimal) container — the frame-sample
    operator parses and decodes it, nothing is stubbed; video codecs
    proper (no media libraries ship here) would slot in behind the
    same ``decode_image``-per-frame seam."""
    from ..codecs import encode_image

    out = [VIDEO_MAGIC, len(frames).to_bytes(4, "big")]
    for f in frames:
        ppm = encode_image(f, "ppm")
        out.append(len(ppm).to_bytes(4, "big"))
        out.append(ppm)
    return b"".join(out)


def decode_video_frames(data: bytes, stride: int = 1):
    """Yield (frame_idx, pixels) for every ``stride``-th frame.
    Parsing SKIPS unsampled frames by their length prefix — the
    container is seekable, so sampling cost is O(sampled frames),
    not O(stream), the property frame-sampling exists to exploit."""
    from ..codecs import decode_image

    if data[:4] != VIDEO_MAGIC:
        raise ValueError("not an SVID container")
    n = int.from_bytes(data[4:8], "big")
    off = 8
    for i in range(n):
        flen = int.from_bytes(data[off : off + 4], "big")
        off += 4
        if i % stride == 0:
            yield i, decode_image(data[off : off + flen], "ppm")
        off += flen


def make_video_record(video_id: str, key: int, n_frames: int = 8) -> dict:
    """Deterministic synthetic video: frame j's pixels derive from
    (key, j) via the same generator the image corpus uses."""
    frames = [
        syn.make_image(syn.h64(key, "frame", j), min_side=8, max_side=16)
        for j in range(n_frames)
    ]
    return {
        "video_id": video_id,
        "bytes": encode_video(frames),
        "n_frames": n_frames,
    }


def videos_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed synthetic video table (spark.range -> mapInPandas,
    rows derived independently from (seed, id) — same scaling shape
    as records_df)."""
    base = spark.range(
        0, n, 1, partitions or spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        for pdf in batches:
            rows = [
                make_video_record(
                    f"vid{int(i):06d}", syn.h64(seed, "video", int(i))
                )
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen, schema="video_id string, bytes binary, n_frames int"
    )


def sample_frames(videos, stride: int = FRAME_STRIDE):
    """videos DF -> one row per SAMPLED frame (mapInPandas): index,
    channel means, 8-byte content hash — the frame-sample stage of a
    video training pipeline (§2.10 decode / feature-extract / resize
    / frame-sample family).

    100 TB shape: sampling happens INSIDE the task against the
    seekable container (unsampled frames are skipped by length
    prefix, never decoded), and only O(n_frames / stride) scalar
    rows leave the decode pass — the exchange carries statistics and
    digests, not frames. Corrupt containers contribute zero rows."""
    import hashlib

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    frames = list(
                        decode_video_frames(bytes(row.bytes), stride)
                    )
                except Exception:  # noqa: BLE001 — skip, don't crash
                    continue
                for idx, px in frames:
                    m = px.astype(np.float64).mean(axis=(0, 1))
                    digest = hashlib.md5(px.tobytes()).digest()[:8]
                    out.append(
                        {
                            "video_id": row.video_id,
                            "frame_idx": idx,
                            "n_frames": int(row.n_frames),
                            "mean_r": round(float(m[0]), 4),
                            "mean_g": round(float(m[1]), 4),
                            "mean_b": round(float(m[2]), 4),
                            "frame_hash": int.from_bytes(
                                digest, "big", signed=True
                            ),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "video_id", "frame_idx", "n_frames", "mean_r",
                    "mean_g", "mean_b", "frame_hash",
                ],
            )

    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


@register("m09_frame_sample")  # rows-only: binary payloads
def m09_frame_sample(spark, sf_dir):
    """Frame-sample the synthetic video table (every 3rd frame of
    8-frame SVID containers): parse the container, decode ONLY the
    sampled frames, emit per-frame stats + content hash. Rows-only
    (video bytes aren't SQL-expressible); sampling arithmetic, frame
    pixel equality vs independently re-derived frames, skip-cost
    seekability, and corrupt-container tolerance are pytest-gated
    (tests/test_frame_sample.py)."""
    return sample_frames(videos_df(spark, N_VIDEOS, seed=42)).orderBy(
        "video_id", "frame_idx"
    )
