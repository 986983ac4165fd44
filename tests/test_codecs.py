"""Codec + payload invariants (BASELINE.json:input_hint — decoded-pixel
allclose / PSNR >= 40 dB + caption equality)."""

import numpy as np
import pytest

from common_crawl___autumn_2025_spark import synthetic as syn
from common_crawl___autumn_2025_spark.codecs import (
    decode_image,
    decode_png,
    decode_ppm,
    encode_image,
    hamming64,
    phash64,
    psnr,
)


@pytest.mark.parametrize("key", range(8))
@pytest.mark.parametrize("fmt", ["png", "ppm"])
def test_roundtrip_exact(key, fmt):
    img = syn.make_image(key)
    back = decode_image(encode_image(img, fmt), fmt)
    assert np.array_equal(img, back)
    assert psnr(img, back) == float("inf")


def test_psnr_threshold():
    img = syn.make_image(1).astype(np.int16)
    noisy = np.clip(img + 2, 0, 255).astype(np.uint8)  # tiny perturbation
    assert psnr(img.astype(np.uint8), noisy) >= 40.0
    very_noisy = np.clip(img + 64, 0, 255).astype(np.uint8)
    assert psnr(img.astype(np.uint8), very_noisy) < 40.0


def test_png_foreign_filters():
    """Decoder handles Up-filtered scanlines (other encoders use them)."""
    import struct
    import zlib

    from common_crawl___autumn_2025_spark.codecs import _PNG_SIG, _chunk

    img = syn.make_image(3)
    h, w = img.shape[:2]
    rows = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        cur = img[y].reshape(-1)
        rows.append(b"\x02" + (cur - prev).astype(np.uint8).tobytes())  # Up filter
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_ppm_with_comment():
    img = syn.make_image(2)
    data = b"P6\n# c\n%d %d\n255\n" % (img.shape[1], img.shape[0]) + img.tobytes()
    assert np.array_equal(decode_ppm(data), img)


def test_unsupported_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", "jpeg")
    with pytest.raises(NotImplementedError):
        encode_image(syn.make_image(0), "webp")


def test_phash_properties():
    a = syn.make_image(10)
    assert phash64(a) == phash64(a.copy())
    # mild noise keeps hash close; different image is far
    noisy = np.clip(a.astype(np.int16) + 4, 0, 255).astype(np.uint8)
    assert hamming64(phash64(a), phash64(noisy)) <= 12
    b = syn.make_image(11)
    assert hamming64(phash64(a), phash64(b)) > 4
    assert -(1 << 63) <= phash64(a) < (1 << 63)  # fits Spark LongType


def test_records_generator_deterministic():
    a = syn.records_pandas(10, seed=42)
    b = syn.records_pandas(10, seed=42)
    assert (a["caption"] == b["caption"]).all()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    for _, r in a.iterrows():
        px = decode_image(r["bytes"], r["fmt"])
        assert px.shape == (r["h"], r["w"], 3)
        assert phash64(px) == r["phash"]


def test_decode_verify_flags_corrupted_payload(spark):
    """m01's per-row invariant is a real cross-derivation check:
    mutate one payload byte -> that row (and only that row) is
    flagged via PSNR/allclose vs the independently re-derived
    reference pixels."""
    from pyspark.sql import functions as F

    from common_crawl___autumn_2025_spark import synthetic as syn
    from common_crawl___autumn_2025_spark.operators.multimodal import (
        decode_verify,
    )

    pdf = syn.records_pandas(24, seed=42)
    # corrupt one mid-payload byte of row 5 (header intact so the
    # decode itself may still succeed -> pixels must catch it)
    b = bytearray(pdf.loc[5, "bytes"])
    b[len(b) // 2] ^= 0xFF
    pdf.loc[5, "bytes"] = bytes(b)
    records = spark.createDataFrame(pdf)
    out = {
        r.image_id: r
        for r in decode_verify(records, ref_seed=42).collect()
    }
    bad = out[pdf.loc[5, "image_id"]]
    assert (not bad.decode_ok) or bad.psnr_db < 40.0 or not bad.phash_match
    good = [r for iid, r in out.items() if iid != pdf.loc[5, "image_id"]]
    assert all(r.decode_ok and r.psnr_db >= 40.0 and r.phash_match for r in good)


def test_png_decode_all_filter_types():
    """Foreign PNGs use filters 1-4; the decoder must invert every
    filter type exactly. Encode the same pixels with each filter
    forced on all scanlines and check byte-exact round trips."""
    import struct
    import zlib

    import numpy as np

    from common_crawl___autumn_2025_spark import codecs as C

    def encode_with_filter(px, ftype):
        h, w = px.shape[:2]
        stride = w * 3
        flat = px.reshape(h, stride).astype(np.int16)
        lines = bytearray()
        for y in range(h):
            row = flat[y]
            prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int16)
            if ftype == 0:
                enc = row
            elif ftype == 1:
                left = np.concatenate([[0, 0, 0], row[:-3]])
                enc = row - left
            elif ftype == 2:
                enc = row - prev
            elif ftype == 3:
                left = np.concatenate([[0, 0, 0], row[:-3]])
                enc = row - ((left + prev) >> 1)
            else:
                left = np.concatenate([[0, 0, 0], row[:-3]])
                ul = np.concatenate([[0, 0, 0], prev[:-3]])
                pred = np.array(
                    [
                        C._paeth_scalar(int(a), int(b), int(c))
                        for a, b, c in zip(left, prev, ul)
                    ],
                    dtype=np.int16,
                )
                enc = row - pred
            lines.append(ftype)
            lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        idat = zlib.compress(bytes(lines), 6)
        return (
            C._PNG_SIG
            + C._chunk(b"IHDR", ihdr)
            + C._chunk(b"IDAT", idat)
            + C._chunk(b"IEND", b"")
        )

    rng = np.random.Generator(np.random.PCG64(21))
    px = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for ftype in range(5):
        data = encode_with_filter(px, ftype)
        got = C.decode_png(data)
        assert np.array_equal(got, px), f"filter {ftype} round trip failed"
