"""Web-corpus text functions: HTML -> text, URL features, URL dedup.

The processing stage between a WARC crawl (sources/warc.py) and the
text-quality pipeline: every function here is a PURE native Catalyst
expression chain (regexp_replace / replace / lower — whole-stage
codegen, zero Python), and every regex is written in the common
Java-regex/RE2 subset (no backreferences, no lookaround) so the exact
same algorithm runs as the DuckDB oracle — the contract queries are
hash-green, not approximately-similar.

``html_to_text`` is a DOCUMENTED simplified extractor (the C4-class
pipeline stage), not a browser:
  1. drop <script>/<style> elements (case-insensitive, dotall)
  2. drop <!-- comments -->
  3. block-level closers and <br> become newlines
  4. every remaining tag becomes a space
  5. decode the six common entities, &amp; LAST (single-pass decode)
  6. whitespace-normalize: runs of spaces/tabs collapse, newline runs
     collapse, edges trim
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_CLOSERS = r"(?i)<(br|/p|/div|/h[1-6]|/li|/ul|/ol|/tr|/table|/section|/article|/blockquote|/pre)\b[^>]*>"


def html_to_text(col) -> Column:
    """Visible text of an HTML document (simplified C4-class extractor,
    algorithm documented in the module header)."""
    c = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, _BLOCK_CLOSERS, "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    # literal entity decode: replace() (codegen StringReplace) instead of
    # regexp_replace — the six patterns contain no regex metacharacters,
    # so the semantics are identical and each pass drops the regex
    # engine's per-char machinery (guide §1.2 per-task work)
    for ent, ch in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n[ \n]*", "\n")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(col) -> Column:
    """Lower-cased hostname of an absolute URL ('' when unparseable)."""
    return F.lower(F.regexp_extract(col, _HOST_RE, 1))


def url_domain(col) -> Column:
    """Registrable-ish domain: the last two host labels (a pure-regex
    approximation — no public-suffix list in a from-scratch engine;
    documented as such)."""
    return F.regexp_extract(url_host(col), r"([^.]+\.[^.]+)$", 1)


def url_path_depth(col) -> Column:
    """Number of non-empty path segments."""
    path = F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    squashed = F.regexp_replace(F.regexp_replace(path, "/+", "/"),
                                "^/|/$", "")
    return F.when(F.length(squashed) == 0, F.lit(0)).otherwise(
        F.length(squashed) - F.length(F.regexp_replace(squashed, "/", ""))
        + 1).cast("int")


def url_normalize(col) -> Column:
    """Aggressive dedup-normalization (documented rule, applied
    identically in the SQL oracle): lowercase, strip the scheme, strip
    one leading ``www.``, drop the #fragment, drop ALL trailing slashes
    (one-slash stripping is not a fixpoint — caught by the hypothesis
    idempotence property)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"^[a-z][a-z0-9+.-]*://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"#.*$", "")
    return F.regexp_replace(c, r"/+$", "")


def filter_url_blocklist(df: DataFrame, blocked_hosts, url_col: str = "url",
                         ) -> DataFrame:
    """Drop rows whose URL host (or any parent domain of it) is on the
    blocklist — the standard crawl-hygiene gate.  ``blocked_hosts`` is a
    list of hosts/domains or a 1-column DataFrame; matching is
    suffix-at-label-boundary (``ads.example.com`` is blocked by
    ``example.com`` but ``notexample.com`` is not).  The blocklist side
    broadcasts (blocklists are small by nature)."""
    spark = df.sparkSession
    if isinstance(blocked_hosts, DataFrame):
        # lowercase DataFrame-form entries too: the URL host is
        # lowercased, so a mixed-case blocklist row would silently
        # fail to block (ADVICE r8)
        bl = blocked_hosts.toDF("__bl_host") \
            .select(F.lower(F.col("__bl_host")).alias("__bl_host"))
    else:
        bl = spark.createDataFrame([(h.lower(),) for h in blocked_hosts],
                                   "__bl_host string")
    host = url_host(F.col(url_col))
    tagged = df.withColumn("__host", host)
    cond = (F.col("__host") == F.col("__bl_host")) | \
        F.col("__host").endswith(F.concat(F.lit("."), F.col("__bl_host")))
    return tagged.join(F.broadcast(bl), cond, "left_anti").drop("__host")


def dedup_by_url(df: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """URL-level exact dedup (C4 rule): keep the row with the minimum id
    per normalized URL.

    ONE hash shuffle via ``row_number() = 1`` over (url, id): Spark's
    WindowGroupLimit pushes a partial per-partition top-1 BELOW the
    exchange, so a hot boilerplate URL ships one candidate per map task
    (the window-skew hazard does not apply to rank<=k windows), and —
    unlike a groupBy + semi-join — the plan reads ``df`` exactly ONCE,
    so a composed upstream pipeline is never evaluated twice."""
    from pyspark.sql import Window
    norm = url_normalize(F.col(url_col))
    w = Window.partitionBy("__nurl").orderBy(F.col(id_col).asc())
    return (df.withColumn("__nurl", norm)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__nurl", "__rn"))
