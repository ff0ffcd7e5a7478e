"""Web-corpus ingestion: WARC/WET source, HTML->text, URL hygiene."""
from __future__ import annotations

import gzip
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sedona_db_spark.functions.web import (dedup_by_url,
                                           filter_url_blocklist,
                                           html_to_text, url_host,
                                           url_normalize, url_path_depth)


# ----------------------------------------------------------------------
# HTML -> text
# ----------------------------------------------------------------------

def _extract(spark, html: str) -> str:
    return spark.range(1).select(
        html_to_text(F.lit(html)).alias("t")).first()["t"]


def test_html_basic_blocks(spark):
    html = ("<html><head><title>T</title><script>var x = '<p>';</script>"
            "<style>p { color: red }</style></head>"
            "<body><h1>Head line</h1><p>para one</p>"
            "<p>two &amp; three &lt;ok&gt;</p><!-- secret --></body></html>")
    out = _extract(spark, html)
    assert out == "T Head line\npara one\ntwo & three <ok>"


def test_html_script_content_never_leaks(spark):
    out = _extract(spark, "<script>document.evil()</script><p>kept</p>")
    assert "evil" not in out and out == "kept"


def test_html_nbsp_and_br(spark):
    out = _extract(spark, "a&nbsp;b<br>c<br/>d")
    assert out == "a b\nc\nd"


def test_html_whitespace_collapse(spark):
    out = _extract(spark, "<div>  a\t b </div>\n\n<div> c </div>")
    assert out == "a b\nc"


# ----------------------------------------------------------------------
# URL features
# ----------------------------------------------------------------------

def test_url_host_and_depth(spark):
    df = spark.createDataFrame(
        [("https://User:pw@WWW.Example.COM:8080/a/b/c?q=1#f",),
         ("http://plain.org",),
         ("not a url",)], "url string")
    got = df.select(url_host("url").alias("h"),
                    url_path_depth("url").alias("d")).collect()
    assert (got[0]["h"], got[0]["d"]) == ("www.example.com", 3)
    assert (got[1]["h"], got[1]["d"]) == ("plain.org", 0)
    assert got[2]["h"] == ""


def test_url_normalize_rule(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Site.com/Path/#frag",),
         ("http://site.com/Path",)], "url string")
    got = [r[0] for r in df.select(url_normalize("url")).collect()]
    # aggressive rule: lowercase, strip scheme/www/fragment/trailing /
    assert got[0] == "site.com/path"
    assert got[1] == "site.com/path"


def test_blocklist_label_boundary(spark):
    df = spark.createDataFrame(
        [(1, "https://example.com/x"),
         (2, "https://ads.example.com/x"),
         (3, "https://notexample.com/x"),
         (4, "https://fine.org/x")], "doc_id long, url string")
    kept = filter_url_blocklist(df, ["example.com"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]


def test_blocklist_dataframe_mixed_case(spark):
    """ADVICE r8: a DataFrame-form blocklist with mixed-case hosts must
    still block (the URL host is lowercased, so the list side must be
    too)."""
    df = spark.createDataFrame(
        [(1, "https://example.com/x"), (2, "https://ADS.Example.com/x"),
         (3, "https://fine.org/x")], "doc_id long, url string")
    bl = spark.createDataFrame([("Example.COM",)], "host string")
    kept = filter_url_blocklist(df, bl)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3]


def test_dedup_by_url_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(5, "https://www.a.com/p/"), (3, "http://a.com/p"),
         (9, "https://a.com/p#top"), (7, "https://b.com/q")],
        "doc_id long, url string")
    kept = dedup_by_url(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 7]


# ----------------------------------------------------------------------
# WARC source
# ----------------------------------------------------------------------

def _mk_warc(tmpdir: str, records: list[dict], compress=True,
             members=True) -> str:
    """Hand-assemble a .warc(.gz): one gzip member per record when
    members=True, a single member otherwise (both legal)."""
    from sedona_db_spark.sources.warc import _record_bytes
    blobs = [_record_bytes(r) for r in records]
    path = os.path.join(tmpdir, "t.warc.gz" if compress else "t.warc")
    with open(path, "wb") as f:
        if not compress:
            f.write(b"".join(blobs))
        elif members:
            for b in blobs:
                f.write(gzip.compress(b, mtime=0))
        else:
            f.write(gzip.compress(b"".join(blobs), mtime=0))
    return path


_RECS = [
    {"warc_type": "warcinfo", "record_id": "<urn:uuid:0>",
     "date": "2020-01-01T00:00:00Z",
     "content_type": "application/warc-fields",
     "content": b"software: test\r\n"},
    {"warc_type": "conversion", "record_id": "<urn:uuid:1>",
     "url": "https://a.com/x", "date": "2020-01-01T00:00:01Z",
     "content_type": "text/plain", "content": "hello wéb".encode()},
    {"warc_type": "response", "record_id": "<urn:uuid:2>",
     "url": "https://b.com/y", "date": "2020-01-01T00:00:02Z",
     "content_type": "application/octet-stream",
     "content": bytes(range(256))},
]


@pytest.mark.parametrize("compress,members", [(True, True), (True, False),
                                              (False, True)])
def test_warc_read_variants(spark, tmp_path, compress, members):
    from sedona_db_spark.sources.warc import read_warc
    p = _mk_warc(str(tmp_path), _RECS, compress=compress, members=members)
    out = read_warc(spark, p).orderBy("record_id").collect()
    assert [r["warc_type"] for r in out] == \
        ["warcinfo", "conversion", "response"]
    assert out[1]["url"] == "https://a.com/x"
    assert out[1]["text"] == "hello wéb"
    assert bytes(out[2]["content"]) == bytes(range(256))
    assert out[2]["text"] is None
    assert out[0]["url"] is None


def test_warc_write_read_roundtrip(spark, tmp_path):
    from sedona_db_spark.sources.warc import read_warc, write_warc
    df = spark.createDataFrame(pd.DataFrame({
        "record_id": [f"<urn:uuid:rt{i}>" for i in range(20)],
        "warc_type": ["conversion"] * 20,
        "url": [f"https://site{i % 3}.com/p{i}" for i in range(20)],
        "date": ["2021-02-03T04:05:06Z"] * 20,
        "content_type": ["text/plain"] * 20,
        "content": [f"doc {i} body".encode() for i in range(20)],
    }))
    out_dir = str(tmp_path / "out")
    write_warc(df, out_dir)
    back = read_warc(spark, out_dir + "/*.warc.gz")
    got = {r["record_id"]: r for r in back.collect()}
    assert len(got) == 20
    for i in range(20):
        r = got[f"<urn:uuid:rt{i}>"]
        assert r["text"] == f"doc {i} body"
        assert r["url"] == f"https://site{i % 3}.com/p{i}"
        assert r["content_length"] == len(f"doc {i} body")


def test_warc_corrupt_tail_raises(spark, tmp_path):
    from sedona_db_spark.sources.warc import read_warc
    p = os.path.join(str(tmp_path), "bad.warc")
    with open(p, "wb") as f:
        f.write(b"WARC/1.0\r\nContent-Length: 5\r\n\r\nhello\r\n\r\ngarbage")
    with pytest.raises(Exception, match="malformed WARC"):
        read_warc(spark, p).collect()


def test_warc_truncated_payload_raises(spark, tmp_path):
    """ADVICE r8: a Content-Length running past the end of the shard is
    a truncated file — raise loud, never emit a short record."""
    from sedona_db_spark.sources.warc import read_warc
    p = os.path.join(str(tmp_path), "trunc.warc")
    with open(p, "wb") as f:
        f.write(b"WARC/1.0\r\nContent-Length: 100\r\n\r\nhello")
    with pytest.raises(Exception, match="truncated WARC"):
        read_warc(spark, p).collect()


def test_warc_registered_as_external_format(spark):
    from sedona_db_spark.sources.external import (format_for_path,
                                                  lookup_format)
    assert lookup_format("warc").name == "warc"
    assert format_for_path("x/crawl.wet.gz").name == "warc"


# ----------------------------------------------------------------------
# property invariants (hypothesis)
# ----------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_URL_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
             "0123456789-._~/?=&", min_size=0, max_size=20)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from(["http://", "https://", "HTTPS://"]),
    st.sampled_from(["", "www.", "WWW.", "sub."]),
    st.sampled_from(["a.com", "B.org", "x.y.net"]),
    _URL_CHARS,
    st.sampled_from(["", "/", "#frag", "/#Frag"])),
    min_size=1, max_size=25))
def test_url_normalize_idempotent(spark, parts):
    """normalize(normalize(u)) == normalize(u) for URL-shaped inputs —
    the dedup key is a fixpoint."""
    urls = ["".join(p) for p in parts]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(url_normalize("url").alias("n1"))
    twice = once.select(F.col("n1").alias("url")) \
        .select(url_normalize("url").alias("n2"))
    assert [r[0] for r in once.collect()] == \
        [r[0] for r in twice.collect()]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 \t.,!?'",
    min_size=0, max_size=60), min_size=1, max_size=25))
def test_html_roundtrip_plain_text(spark, texts):
    """For markup-free single-line text (no < or &; newlines are
    line-break-preserving by design), wrapping in <p> tags and
    extracting returns the whitespace-normalized text exactly."""
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(
        html_to_text(F.concat(F.lit("<p>"), F.col("t"),
                              F.lit("</p>"))).alias("o")).collect()
    import re as _re
    for t, row in zip(texts, got):
        want = _re.sub(r"\s+", " ", t).strip()
        assert row["o"] == want, (t, row["o"])


def test_warc_stream_matches_batch(spark, tmp_path):
    """Streaming ingestion of a shard landing dir == the batch reader,
    row for row, and the downstream web pipeline (stateless column
    expressions) composes on the stream unchanged."""
    from sedona_db_spark.sources.warc import (read_warc, read_warc_stream,
                                              write_warc)
    df = spark.createDataFrame(pd.DataFrame({
        "record_id": [f"<urn:uuid:st{i}>" for i in range(12)],
        "warc_type": ["conversion"] * 12,
        "url": [f"https://www.s{i % 4}.com/p{i}#f" for i in range(12)],
        "date": ["2022-01-01T00:00:00Z"] * 12,
        "content_type": ["text/html"] * 12,
        "content": [f"<p>body {i} &amp; more</p>".encode()
                    for i in range(12)],
    }))
    land = str(tmp_path / "landing")
    write_warc(df, land)

    from sedona_db_spark.functions.web import html_to_text, url_normalize
    def pipe(src):
        return src.select(
            "record_id", url_normalize(F.col("url")).alias("nurl"),
            html_to_text(F.col("text")).alias("body"))

    batch = pipe(read_warc(spark, land + "/*.warc.gz"))
    stream = pipe(read_warc_stream(spark, land))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("warc_stream_t")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "SELECT record_id, nurl, body FROM warc_stream_t").collect()))
    want = sorted(map(tuple, batch.select(
        "record_id", "nurl", "body").collect()))
    assert got == want and len(got) == 12
    assert got[0][2].endswith("& more")


# ----------------------------------------------------------------------
# flat-batch quality kernel parity (round 8)
# ----------------------------------------------------------------------

def test_quality_kernel_bit_equals_native_cell(spark):
    """quality_score_fast must equal quality_score_cell BIT-for-bit on
    adversarial ASCII (edge tabs/newlines, empties, punct-only, long
    runs, stopword boundary cases) — the native cell is the executable
    spec."""
    from sedona_db_spark.functions.text import (quality_score_cell,
                                                quality_score_fast)
    rows = [
        "", " ", "\t\t", "\n",
        "the", "the the the the the",
        "a b c d e f g h i j k",
        "THE AND OF TO", "The!And?Of.",
        "word " * 200,
        "!!!???;;;", "x" * 50,
        "  leading and trailing  ",
        "\tthe quick brown fox\n",
        "of", "ofx", "xof", "o f",
        "that that that thatx xthat",
        "for for4 4for FOR For fOr",
        "in in in is is it it a a to to",
        "multi\nline\ntext with the usual words in it",
        "punct,heavy;text:with/lots\\of@punct!chars?",
        None,
        "mixed \t whitespace \x0b and \x0c forms \r here",
    ] + [f"doc {i} with some of the usual filler words for it "
         * (i % 7 + 1) for i in range(60)]
    import pandas as pd
    df = spark.createDataFrame(
        pd.DataFrame({"text": pd.Series(rows, dtype=object)}))
    out = df.select(
        quality_score_cell(F.col("text")).alias("native"),
        quality_score_fast(F.col("text")).alias("fast")).collect()
    for r in out:
        assert (r["native"] is None) == (r["fast"] is None)
        if r["native"] is not None:
            assert r["native"] == r["fast"], (r["native"], r["fast"])


def test_quality_kernel_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st2

    from sedona_db_spark.functions.text import (quality_score_cell,
                                                quality_score_fast)

    @settings(max_examples=6, deadline=None)
    @given(st2.lists(st2.text(
        alphabet=("abcdefghijklmnopqrstuvwxyz"
                  "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
                  " \t\n\x0b\x0c\r.,!?;:'\"()[]{}@#$%^&*-_=+/\\|<>~`"),
        min_size=0, max_size=120), min_size=1, max_size=30))
    def run(texts):
        import pandas as pd
        df = spark.createDataFrame(
            pd.DataFrame({"text": pd.Series(texts, dtype=object)}))
        out = df.select(
            quality_score_cell(F.col("text")).alias("a"),
            quality_score_fast(F.col("text")).alias("b")).collect()
        for r in out:
            assert r["a"] == r["b"], (r["a"], r["b"])

    run()


def test_token_count_kernel_bit_equals_native(spark):
    from sedona_db_spark.functions.text import token_count, token_count_fast
    rows = ["", " ", "\t", "a", " a ", "\ta b\tc\n", "x " * 99, None,
            "one\ntwo\vthree\ffour\rfive", "  many   spaces   here  "]
    import pandas as pd
    df = spark.createDataFrame(
        pd.DataFrame({"text": pd.Series(rows, dtype=object)}))
    out = df.select(token_count(F.col("text")).cast("long").alias("a"),
                    token_count_fast(F.col("text")).alias("b")).collect()
    for r in out:
        assert r["a"] == r["b"], (r["a"], r["b"])


def test_quality_tokens_kernel_bit_equals_split_kernels(spark):
    """quality_tokens_fast (the r11 combined one-pass struct kernel) must
    equal (quality_score_fast, token_count_fast) bit-for-bit, nulls
    included — it is substituted for the pair in composed pipelines."""
    from sedona_db_spark.functions.text import (quality_score_fast,
                                                quality_tokens_fast,
                                                token_count_fast)
    rows = [
        "", " ", "\t\t", "\n", None,
        "the", "the the the the the",
        "a b c d e f g h i j k",
        "word " * 200, "!!!???;;;", "x" * 50,
        "multi\nline\ntext with the usual words in it",
        "mixed \t whitespace \x0b and \x0c forms \r here",
    ] + [f"doc {i} with some of the usual filler words for it "
         * (i % 7 + 1) for i in range(40)]
    import pandas as pd
    df = spark.createDataFrame(
        pd.DataFrame({"text": pd.Series(rows, dtype=object)}))
    out = df.select(
        quality_score_fast(F.col("text")).alias("q0"),
        token_count_fast(F.col("text")).alias("n0"),
        quality_tokens_fast(F.col("text")).alias("qt")).collect()
    for r in out:
        assert (r["q0"] is None) == (r["qt"] is None or r["qt"]["q"] is None)
        if r["q0"] is not None:
            assert r["q0"] == r["qt"]["q"], (r["q0"], r["qt"])
            assert r["n0"] == r["qt"]["nt"], (r["n0"], r["qt"])
