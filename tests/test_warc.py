"""WARC source/sink: byte-exact round trip, format validity,
corruption contract, determinism."""

import glob
import gzip
import shutil
import tempfile

import pytest

from common_crawl___autumn_2025_spark import synthetic as syn
from common_crawl___autumn_2025_spark.sources.warc import (
    parse_warc_member,
    read_warc,
    record_id_for,
    write_warc,
)


def _collect(df):
    return sorted(
        (
            r.image_id,
            bytes(r.bytes) if r.bytes is not None else None,
            r.w, r.h, r.fmt, r.caption, r.phash,
        )
        for r in df.collect()
    )


def test_warc_roundtrip_byte_exact(spark):
    recs = syn.records_df(spark, 60, partitions=4)
    want = _collect(recs)
    root = tempfile.mkdtemp(prefix="warc_")
    try:
        n = write_warc(recs, root)
        assert n == 60
        files = glob.glob(root + "/*.warc.gz")
        assert 1 < len(files) <= 4  # one per non-empty partition
        got = _collect(read_warc(spark, root))
        assert got == want  # payload bytes, caption, every header field
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_warc_format_is_standard(spark):
    """The archive must be real WARC/1.0 member-gzip: each member
    decompresses independently, records carry the mandatory headers,
    and Content-Length frames the payload exactly."""
    recs = syn.records_df(spark, 10, partitions=1)
    root = tempfile.mkdtemp(prefix="warc_fmt_")
    try:
        write_warc(recs, root)
        [f] = glob.glob(root + "/*.warc.gz")
        blob = gzip.decompress(open(f, "rb").read())
        assert blob.startswith(b"WARC/1.0\r\n")
        rows = parse_warc_member(blob)
        assert len(rows) == 10
        # member-gzip: a SINGLE member (the first record) also parses
        raw = open(f, "rb").read()
        one = gzip.GzipFile(fileobj=__import__("io").BytesIO(raw)).read()
        assert parse_warc_member(one)  # concatenation handled
        # the archive opens with a warcinfo record (CC convention)...
        head = blob.split(b"\r\n\r\n", 1)[0].decode("latin-1")
        assert "WARC-Type: warcinfo" in head
        assert "Content-Type: application/warc-fields" in head
        # ...and every record carries the mandatory headers
        body = blob.decode("latin-1", errors="replace")
        for required in (
            "WARC-Type: resource",
            "WARC-Record-ID: <urn:uuid:",
            "WARC-Date: ",
            "Content-Length: ",
            "WARC-Payload-Digest: sha1:",
        ):
            assert required in body
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_warc_deterministic_and_distinct_ids(spark):
    recs = syn.records_df(spark, 20, partitions=2)
    r1 = tempfile.mkdtemp(prefix="warc_d1_")
    r2 = tempfile.mkdtemp(prefix="warc_d2_")
    try:
        write_warc(recs, r1)
        write_warc(recs, r2)
        f1 = {p.split("/")[-1] for p in glob.glob(r1 + "/*.warc.gz")}
        f2 = {p.split("/")[-1] for p in glob.glob(r2 + "/*.warc.gz")}
        assert f1 == f2  # same partitioning -> same file names
        by_name1 = {p.split("/")[-1]: open(p, "rb").read()
                    for p in glob.glob(r1 + "/*.warc.gz")}
        by_name2 = {p.split("/")[-1]: open(p, "rb").read()
                    for p in glob.glob(r2 + "/*.warc.gz")}
        assert by_name1 == by_name2  # byte-identical archives
        ids = [record_id_for(f"img{i}") for i in range(1000)]
        assert len(set(ids)) == 1000
        assert all(i.startswith("urn:uuid:") and len(i) == 45 for i in ids)
    finally:
        shutil.rmtree(r1, ignore_errors=True)
        shutil.rmtree(r2, ignore_errors=True)


def test_warc_caption_header_safe_roundtrip(spark):
    """Captions with CRLFs / colons / non-latin text survive the
    one-line header encoding."""
    nasty = "a: b\r\nWARC-Type: evil\r\n\r\npayload — ünïcode 画像"
    df = spark.createDataFrame(
        [("x1", bytearray(b"\x00\x01"), 2, 1, "png", nasty, 7)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    root = tempfile.mkdtemp(prefix="warc_nasty_")
    try:
        write_warc(df, root)
        [r] = read_warc(spark, root).collect()
        assert r.caption == nasty
        assert bytes(r.bytes) == b"\x00\x01"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_warc_corruption_raises_value_error():
    with pytest.raises(ValueError, match="not a WARC record"):
        parse_warc_member(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="truncated WARC header"):
        parse_warc_member(b"WARC/1.0\r\nWARC-Type: resource")
    good = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 10\r\n"
        b"\r\nshort\r\n\r\n"
    )
    with pytest.raises(ValueError, match="truncated WARC payload"):
        parse_warc_member(good)
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_member(b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n")


def test_cdx_cluster_corpus_wide_lookup(spark):
    """Corpus-wide cluster index (Common Crawl cluster.idx pattern):
    a point lookup touches only the O(1) index partitions whose key
    range covers the id — NOT one CDX file per archive — and the
    located record round-trips bytes + caption exactly. Unknown ids
    answer None without touching any archive."""
    import json
    import os as _os

    from common_crawl___autumn_2025_spark.sources.warc import (
        _cluster_candidates,
        build_cdx_cluster,
        lookup_cdx,
        lookup_warc_record,
    )

    recs = syn.records_df(spark, 60, partitions=6)  # 6 archives
    want = {
        r.image_id: (bytes(r.bytes), r.caption) for r in recs.collect()
    }
    root = tempfile.mkdtemp(prefix="warc_cluster_")
    try:
        assert write_warc(recs, root, cdx=True) == 60
        out = build_cdx_cluster(spark, root, partitions=4)
        assert out["rows"] == 60 and out["files"] >= 2
        with open(_os.path.join(root, "cdx-cluster", "cluster.json")) as fh:
            cluster = json.load(fh)
        # prefix index is sorted and non-overlapping across files
        firsts = [e["first"] for e in cluster["files"]]
        assert firsts == sorted(firsts)
        for a, b in zip(cluster["files"], cluster["files"][1:]):
            assert a["last"] <= b["first"]
        for image_id, (wb, wc) in want.items():
            # O(1) partitions touched: every key range-resolves to at
            # most 2 of the index files (boundary keys), usually 1
            cands = _cluster_candidates(cluster, image_id)
            assert 1 <= len(cands) <= 2
            rows = lookup_cdx(root, image_id)
            assert len(rows) == 1
            got = lookup_warc_record(root, image_id)
            assert got["bytes"] == wb and got["caption"] == wc
        assert lookup_warc_record(root, "no-such-id") is None
        # REBUILD over the existing index: publish swaps old aside ->
        # new in (never an index-less window), leaves no .old residue,
        # and lookups still resolve
        out2 = build_cdx_cluster(spark, root, partitions=2)
        assert out2["rows"] == 60
        assert not _os.path.isdir(_os.path.join(root, "cdx-cluster.old"))
        some_id = next(iter(want))
        assert lookup_warc_record(root, some_id)["bytes"] == want[some_id][0]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_cdx_index_point_lookup(spark):
    """CDX index: every record point-reads back exactly via its
    (file, offset, length) triple, and the digest column matches the
    standard sha1:<b32> of the payload."""
    import base64
    import hashlib as hl

    from common_crawl___autumn_2025_spark.sources.warc import (
        read_cdx,
        read_warc_record,
    )

    recs = syn.records_df(spark, 40, partitions=3)
    want = {
        r.image_id: (bytes(r.bytes), r.caption, r.phash)
        for r in recs.collect()
    }
    root = tempfile.mkdtemp(prefix="warc_cdx_")
    try:
        assert write_warc(recs, root, cdx=True) == 40
        idx = read_cdx(spark, root).collect()
        assert len(idx) == 40
        assert len({r.image_id for r in idx}) == 40
        for r in idx:
            got = read_warc_record(root, r.file, r.offset, r.length)
            wb, wc, wp = want[r.image_id]
            assert got["bytes"] == wb
            assert got["caption"] == wc
            assert got["phash"] == wp
            assert r.digest == "sha1:" + base64.b32encode(
                hl.sha1(wb).digest()
            ).decode()
        # offsets tile each archive exactly: contiguous, no overlap
        by_file = {}
        for r in idx:
            by_file.setdefault(r.file, []).append((r.offset, r.length))
        import os as _os

        for fname, spans in by_file.items():
            spans.sort()
            # first resource member sits right after the warcinfo
            # preamble; from there, spans tile to the exact file end
            assert spans[0][0] > 0
            pos = spans[0][0]
            for off, ln in spans:
                assert off == pos
                pos = off + ln
            assert pos == _os.path.getsize(_os.path.join(root, fname))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_warc_reader_ignores_crash_leftover_tmps(spark):
    """A crash between the tmp write and the rename leaves dotfile
    tmps that neither read_warc nor read_cdx may pick up."""
    import os

    from common_crawl___autumn_2025_spark.sources.warc import read_cdx

    recs = syn.records_df(spark, 12, partitions=1)
    want = _collect(recs)
    root = tempfile.mkdtemp(prefix="warc_tmp_")
    try:
        write_warc(recs, root, cdx=True)
        [f] = glob.glob(root + "/*.warc.gz")
        fname = os.path.basename(f)
        # simulate the crash window: a fully-written tmp AND a
        # truncated one, in both the archive dir and cdx/
        shutil.copy(f, os.path.join(root, f".tmp.999.{fname}"))
        open(os.path.join(root, ".tmp.999.trunc.warc.gz"), "wb").write(
            open(f, "rb").read()[:37]
        )
        [c] = glob.glob(root + "/cdx/*.parquet")
        shutil.copy(
            c, os.path.join(root, "cdx", f".tmp.999.{os.path.basename(c)}")
        )
        assert _collect(read_warc(spark, root)) == want  # no dupes/crash
        assert read_cdx(spark, root).count() == 12
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_warc_null_vs_empty_caption_distinct(spark):
    """caption=None and caption='' are distinct after a round trip:
    None omits the WARC-X-Caption header, '' writes it empty."""
    rows = [("a", bytearray(b"x"), 1, 1, "png", None, 1),
            ("b", bytearray(b"y"), 1, 1, "png", "", 2)]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    root = tempfile.mkdtemp(prefix="warc_nullcap_")
    try:
        assert write_warc(df, root) == 2
        got = {r.image_id: r.caption for r in read_warc(spark, root).collect()}
        assert got == {"a": None, "b": ""}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_warc_null_vs_empty_payload_and_unicode_ids(spark):
    """bytes=b'' and bytes=NULL are distinct after a round trip, and
    arbitrary (non-latin-1, CRLF-bearing) image ids / fmts survive."""
    rows = [
        ("empty", bytearray(b""), 0, 0, "png", "cap-empty", 1),
        ("null", None, None, None, None, None, None),
        ("img—ünïcode\r\nWARC-Type: evil", bytearray(b"\x05"), 1, 1,
         "fmt\r\nX: y", "c", 2),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    root = tempfile.mkdtemp(prefix="warc_nullb_")
    try:
        assert write_warc(df, root) == 3
        got = {r.image_id: r for r in read_warc(spark, root).collect()}
        assert set(got) == {r[0] for r in rows}
        assert bytes(got["empty"].bytes) == b""  # empty, NOT null
        assert got["null"].bytes is None  # null, NOT empty
        # NULL caption omits the header entirely and reads back as
        # NULL — not collapsed to "" (ADVICE r4); empty-string caption
        # keeps an empty header and reads back as ""
        assert got["null"].caption is None
        assert got["empty"].caption == "cap-empty"
        nasty = got["img—ünïcode\r\nWARC-Type: evil"]
        assert bytes(nasty.bytes) == b"\x05"
        assert nasty.fmt == "fmt\r\nX: y"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_parse_warc_member_fuzz_never_crashes():
    """Foreign/corrupt archives: arbitrary bytes either parse to
    well-typed rows or raise ValueError — never IndexError/KeyError/
    UnicodeDecodeError/OverflowError (the flag-don't-crash contract
    corrupt real-corpus archives depend on)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # seed corpus: a valid record to mutate around
    valid = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 3\r\n"
        b"WARC-Target-URI: urn:image:x\r\n\r\nabc\r\n\r\n"
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.one_of(
            st.binary(max_size=200),
            st.binary(max_size=60).map(lambda b: valid[: len(b)] + b),
            st.integers(0, len(valid) - 1).flatmap(
                lambda i: st.integers(0, 255).map(
                    lambda v: valid[:i] + bytes([v]) + valid[i + 1:]
                )
            ),
        )
    )
    def run(blob):
        try:
            rows = parse_warc_member(blob)
        except ValueError:
            return
        for r in rows:
            assert isinstance(r["image_id"], str)
            assert r["bytes"] is None or isinstance(r["bytes"], bytes)
            for k in ("w", "h", "phash"):
                assert r[k] is None or isinstance(r[k], int)

    run()


def test_read_real_common_crawl_response_records(spark):
    """Interop: a hand-built archive in REAL Common Crawl shape
    (WARC-Type: response, payload = full HTTP message) ingests with
    the HTTP header block stripped, fmt from the HTTP Content-Type,
    non-2xx skipped, and mixes cleanly with our resource records."""
    import gzip as gz
    import os

    def response_record(uri, status, ctype, body):
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2017-03-06T04:00:00Z\r\n"
            b"WARC-Record-ID: <urn:uuid:0001-2>\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
        )
        return head + b"\r\n" + http + b"\r\n\r\n"

    blob = (
        response_record("http://a.example/x.png", 200, "image/png",
                        b"\x89PNGfake")
        + response_record("http://a.example/page", 200,
                          "text/html; charset=utf-8", b"<html>hi")
        + response_record("http://a.example/gone", 404, "image/png",
                          b"notfound")
    )
    root = tempfile.mkdtemp(prefix="warc_cc_")
    try:
        with open(os.path.join(root, "cc.warc.gz"), "wb") as fh:
            fh.write(gz.compress(blob, 6))
        rows = {r.image_id: r for r in read_warc(spark, root).collect()}
        assert set(rows) == {
            "http://a.example/x.png", "http://a.example/page"
        }  # 404 skipped
        png = rows["http://a.example/x.png"]
        assert bytes(png.bytes) == b"\x89PNGfake"  # HTTP headers stripped
        assert png.fmt == "png"  # from the HTTP Content-Type
        html = rows["http://a.example/page"]
        assert bytes(html.bytes) == b"<html>hi"
        assert html.fmt is None  # not a known image MIME type
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_warc_phash_precision_with_nulls_in_batch(spark):
    """A null in the batch must not float64-coerce sibling 64-bit
    phashes (exact only up to 2^53 there): extreme int64 values
    round-trip bit-exact alongside a null row."""
    big = (1 << 63) - 1
    rows = [
        ("p1", bytearray(b"x"), 1, 1, "png", "c", big),
        ("p2", bytearray(b"y"), 1, 1, "png", "c", -big - 1),
        ("p3", bytearray(b"z"), None, None, "png", "c", None),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    ).coalesce(1)  # one partition -> one pandas batch with the null
    root = tempfile.mkdtemp(prefix="warc_phash_")
    try:
        write_warc(df, root)
        got = {r.image_id: r.phash for r in read_warc(spark, root).collect()}
        assert got == {"p1": big, "p2": -big - 1, "p3": None}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_cc_response_encodings_and_foreign_uris(spark):
    """Real-corpus HTTP bodies: chunked framing decoded, gzip
    content-encoding decompressed, unknown encodings skipped (never
    corrupt), and a foreign resource record's percent-containing URI
    passes through undecoded."""
    import gzip as gz

    def rec(headers, payload):
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers
        ) + f"Content-Length: {len(payload)}\r\n".encode()
        return head + b"\r\n" + payload + b"\r\n\r\n"

    def resp(uri, http_headers, body):
        http = (
            b"HTTP/1.1 200 OK\r\n"
            + b"".join(f"{k}: {v}\r\n".encode() for k, v in http_headers)
            + b"\r\n" + body
        )
        return rec(
            [("WARC-Type", "response"), ("WARC-Target-URI", uri),
             ("Content-Type", "application/http; msgtype=response")],
            http,
        )

    img = b"\x89PNG-raw-bytes"
    chunked = b"6\r\n\x89PNG-r\r\n8\r\naw-bytes\r\n0\r\n\r\n"
    blob = (
        resp("http://x/chunked", [("Content-Type", "image/png"),
                                  ("Transfer-Encoding", "chunked")], chunked)
        + resp("http://x/gzipped", [("Content-Type", "image/jpeg"),
                                    ("Content-Encoding", "gzip")],
               gz.compress(img, 6))
        + resp("http://x/brotli", [("Content-Type", "image/png"),
                                   ("Content-Encoding", "br")], b"\x00junk")
        + rec(
            [("WARC-Type", "resource"),
             ("WARC-Target-URI", "http://host/a%20b%2Fc")],
            b"foreignpayload",
        )
    )
    rows = {r["image_id"]: r for r in parse_warc_member(blob)}
    assert rows["http://x/chunked"]["bytes"] == img  # de-chunked
    assert rows["http://x/gzipped"]["bytes"] == img  # decompressed
    assert rows["http://x/gzipped"]["fmt"] == "jpeg"
    assert "http://x/brotli" not in rows  # skipped, not corrupted
    # foreign URI: literal %xx preserved (no writer-side encoding)
    assert rows["http://host/a%20b%2Fc"]["bytes"] == b"foreignpayload"

    with pytest.raises(ValueError, match="chunk"):
        parse_warc_member(
            resp("http://x/bad", [("Transfer-Encoding", "chunked")],
                 b"ZZ\r\nnope\r\n0\r\n\r\n")
        )
