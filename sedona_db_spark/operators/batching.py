"""Training-batch assembly: distributed prefix scan + the operators on top.

The curation surface (``operators/dedup.py``, ``functions/text.py``) ends
with a cleaned corpus; the next step of every large-scale LLM training
pipeline is *batch assembly*: establish a deterministic global order,
concatenate-and-chunk documents into fixed token-budget sequences, mix
domains to target proportions, and group samples into length-homogeneous
batches.  This module supplies those operators Spark-first.  (The reference
engine stops at the query surface — SURVEY §2 has no batch-assembly family —
so, like dedup/similarity, these are graded extension components; the
contract style — oracle-backed entry queries — is identical.)

Scale design (100 TB):

- The core primitive is a **two-phase distributed prefix scan**
  (``prefix_scan``).  A naive ``SUM(...) OVER (ORDER BY key)`` global
  window funnels every row through ONE task — the canonical Spark
  scale-killer.  Instead: a deterministic *monotone* coarse bucket column
  splits the global order into ``npart`` ranges; phase one computes one
  (count, sum) row per bucket (map-side partial aggregation shuffles at
  most ``npart`` rows per input split); a single-partition window over
  those ``<= npart`` rows (tiny by construction) turns them into exclusive
  bucket offsets; phase two broadcast-joins the offsets back and finishes
  with a per-bucket window — the only full shuffle of the plan, over the
  narrow (key, value, bucket) projection the callers pre-select.
- **No ``spark_partition_id()``, no persisted state.**  Bucket ids are a
  pure function of the data (equal-width ranges over dense ids or LCG
  hashes), so the plan is deterministic under AQE partition coalescing,
  stage retries, executor loss and full lineage recomputation — hazards
  that break formulations keyed on physical partition ids.
- Every keep/drop decision (sampling, mixing) is a pure integer function
  of (key, seed) — a 31-bit LCG both Spark and any ANSI-SQL oracle can
  evaluate exactly in int64 arithmetic — so pipelines are reproducible
  run-to-run and engine-to-engine, and resharding the cluster cannot
  change which documents a training job sees.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "lcg_hash",
    "prefix_scan",
    "pack_sequences",
    "materialize_sequences",
    "seeded_shuffle",
    "hash_sample",
    "mix_domains",
    "repeat_oversample",
    "length_bucketed_batches",
    "chunk_documents",
    "split_dataset",
]

_M31 = 2_147_483_648      # 2^31: LCG modulus
_A = 1_103_515_245        # glibc rand() multiplier
_C = 12_345


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lcg_hash(key, seed: int = 0) -> Column:
    """Deterministic 31-bit mix of an integer key: LCG + xor-shift rounds
    (splitmix-style).

    Engine-portable by construction — only ``%``, ``*``, ``+``, bitwise
    xor and power-of-two integer division (= right shift for the
    non-negative intermediates here) on int64, so a DuckDB / ANSI-SQL
    oracle reproduces it bit-for-bit:

        x1 = ((key % 2147483648) * 1103515245 + 12345
              + (seed % 2147483648)) % 2147483648
        x2 = xor(x1, x1 // 8192)
        x3 = (x2 * 1103515245) % 2147483648
        h  = xor(x3, x3 // 65536)

    Design notes, both caught by test:
    - the seed enters BEFORE a multiply — folded in only by a final
      addition it would shift every hash by a constant, leaving the
      induced ordering (seeded_shuffle) seed-invariant;
    - the xor-shift rounds are essential: any composition of pure LCG
      rounds is a single AFFINE map ``a*key + b (mod 2^31)``, whose
      induced ordering is a modular stride — consecutive shuffle
      positions would hold keys in arithmetic progression.
    """
    k = F.pmod(_col(key).cast("long"), F.lit(_M31))
    x1 = F.pmod(k * F.lit(_A) + F.lit(_C + int(seed) % _M31), F.lit(_M31))
    x2 = x1.bitwiseXOR(F.shiftright(x1, 13))
    x3 = F.pmod(x2 * F.lit(_A), F.lit(_M31))
    return x3.bitwiseXOR(F.shiftright(x3, 16))


def _npart_default(df: DataFrame) -> int:
    try:
        return max(1, int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32")))
    except Exception:
        return 32


def _range_bucket(key, lo: int, hi: int, npart: int) -> Column:
    """Equal-width bucket of ``key`` over [lo, hi] into [0, npart)."""
    span = max(1, int(hi) - int(lo) + 1)
    b = F.floor(((_col(key).cast("long") - F.lit(int(lo)))
                 * F.lit(int(npart))) / F.lit(span))
    return F.greatest(F.lit(0), F.least(F.lit(npart - 1), b)).cast("long")


def prefix_scan(df: DataFrame, part_col: str, order_cols: list[str],
                value_col: str, out_pos: str = "pos",
                out_run: str = "run_before") -> DataFrame:
    """Global 0-based row position + exclusive running sum, distributed.

    ``part_col`` must be *monotone non-decreasing* along the global order
    defined by ``order_cols`` (the ``_range_bucket`` helpers guarantee
    this), and ``order_cols`` must be a total order (callers append the
    unique key).  Output equals ``row_number() OVER (ORDER BY ...) - 1``
    and ``SUM(value) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)`` — without the single-task global window either
    would plan as.
    """
    w_in = Window.partitionBy(part_col).orderBy(*order_cols)
    d = (df
         .withColumn("__rn_in", F.row_number().over(w_in))
         .withColumn("__sum_in", F.sum(value_col).over(w_in)))
    # Per-bucket totals are read off the WINDOW OUTPUT (count = max row
    # number; total = running sum at the last row via max_by), not from a
    # separate aggregation of the input: both consumers of `d` then share
    # one canonical subtree, so the scan + any expensive projection under
    # it (e.g. tokenization) + the shuffle + the window evaluate ONCE per
    # action via exchange/stage reuse.  A separate input-side aggregate
    # gets its own column-pruned subtree and recomputes the projection
    # (measured: 2x the tokenize cost in pack_sequences at sf10).
    # Correctness never depends on the reuse — both forms are
    # deterministic; max_by (not max) keeps negative values correct.
    totals = d.groupBy(part_col).agg(
        F.max("__rn_in").alias("__pn"),
        F.max_by("__sum_in", "__rn_in").alias("__psum"))
    # <= npart rows: the single-partition window here is tiny by
    # construction (one row per bucket), not a scale hazard.
    w_tot = (Window.orderBy(part_col)
             .rowsBetween(Window.unboundedPreceding, -1))
    offs = totals.select(
        part_col,
        F.coalesce(F.sum("__pn").over(w_tot), F.lit(0)).alias("__pos_off"),
        F.coalesce(F.sum("__psum").over(w_tot), F.lit(0)).alias("__run_off"))
    out = d.join(F.broadcast(offs), part_col, "inner")
    return (out
            .withColumn(out_pos,
                        (F.col("__pos_off") + F.col("__rn_in") - 1)
                        .cast("long"))
            .withColumn(out_run,
                        (F.col("__run_off") + F.col("__sum_in")
                         - F.col(value_col)).cast("long"))
            .drop("__rn_in", "__sum_in", "__pos_off", "__run_off"))


def pack_sequences(df: DataFrame, budget: int,
                   token_col: str = "n_tokens", id_col: str = "doc_id",
                   npart: int | None = None,
                   id_bounds: tuple[int, int] | None = None) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing.

    Documents are concatenated in ``id_col`` order into one token stream
    and the stream is cut every ``budget`` tokens; a document therefore
    spans sequences ``[seq_first, seq_last]`` (crossing a boundary puts it
    in both — exactly the causal-LM pretraining layout).  Returns one row
    per document: ``(id, n_tokens, start_offset, seq_first, seq_last,
    n_seqs)``; zero-token documents sit at their boundary point
    (``seq_last = seq_first``).

    The global offset is the distributed prefix scan above; the coarse
    buckets are equal-width ranges over the observed [min, max] of
    ``id_col`` (one tiny stats job at build time), which are balanced for
    the dense id spaces document stores produce.  Pass ``npart`` to match
    the cluster; skewed sparse id spaces can pre-map ids.  When ``df`` is
    the tail of an expensive composed pipeline, pass ``id_bounds`` (any
    range COVERING the ids — e.g. the base table's min/max) so the stats
    job probes cheap base statistics instead of executing the pipeline
    twice; bounds only steer bucket balance, never correctness.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    npart = npart or _npart_default(df)
    if id_bounds is not None:
        stats = {"lo": int(id_bounds[0]), "hi": int(id_bounds[1])}
    else:
        stats = df.agg(F.min(id_col).alias("lo"),
                       F.max(id_col).alias("hi")).first()
    if stats["lo"] is None:   # empty input: keep schema, no jobs downstream
        base = df.select(F.col(id_col),
                         F.col(token_col).cast("long").alias(token_col))
        return (base
                .withColumn("start_offset", F.lit(0).cast("long"))
                .withColumn("seq_first", F.lit(0).cast("long"))
                .withColumn("seq_last", F.lit(0).cast("long"))
                .withColumn("n_seqs", F.lit(0).cast("long")))
    narrow = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias(token_col)).withColumn(
        "__part", _range_bucket(id_col, stats["lo"], stats["hi"], npart))
    scanned = prefix_scan(narrow, "__part", [id_col], token_col,
                          out_pos="__pos", out_run="start_offset")
    b = F.lit(int(budget))
    first = F.floor(F.col("start_offset") / b).cast("long")
    last_tok = F.col("start_offset") + F.greatest(F.col(token_col),
                                                  F.lit(1)) - 1
    last = F.floor(last_tok / b).cast("long")
    return (scanned
            .withColumn("seq_first", first)
            .withColumn("seq_last", last)
            .withColumn("n_seqs", (last - first + 1).cast("long"))
            .drop("__part", "__pos"))


def seeded_shuffle(df: DataFrame, key_col: str = "doc_id", seed: int = 7,
                   npart: int | None = None,
                   out_pos: str = "pos") -> DataFrame:
    """Deterministic global shuffle: position of each row under the order
    ``(lcg_hash(key, seed), key)``.

    The hash is uniform on [0, 2^31), so equal-width hash ranges give
    balanced buckets with **no stats job at all**; ties (hash collisions)
    are totalized by the key itself.  Same seed -> same permutation on any
    cluster layout — the property a resumable training run needs.
    """
    npart = npart or _npart_default(df)
    h = lcg_hash(key_col, seed)
    narrow = (df.select(F.col(key_col))
              .withColumn("__h", h)
              .withColumn("__part", _range_bucket("__h", 0, _M31 - 1,
                                                  npart))
              .withColumn("__one", F.lit(1).cast("long")))
    scanned = prefix_scan(narrow, "__part", ["__h", key_col], "__one",
                          out_pos=out_pos, out_run="__rb")
    return scanned.select(key_col, F.col("__h").alias("shuffle_hash"),
                          F.col(out_pos))


def hash_sample(df: DataFrame, fraction: float, key_col: str = "doc_id",
                seed: int = 0) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep iff
    ``lcg_hash(key, seed) < floor(fraction * 2^31)``.

    Unlike ``DataFrame.sample`` this is a pure filter — reproducible
    across runs, engines and partitionings, and composable with
    predicate pushdown (it reaches the scan like any other filter).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = int(fraction * _M31)
    return df.where(lcg_hash(key_col, seed) < F.lit(thr))


def domain_mix_rates(df: DataFrame, weights: dict[str, float],
                     domain_col: str = "source") -> dict[str, tuple[int, float]]:
    """Per-domain (keep-threshold, rate) achieving target proportions.

    ``weights`` are desired relative proportions.  The largest total T
    with ``T * w_d <= count_d`` for every requested domain is
    ``min_d(count_d / w_d)``; domain d then keeps ``T * w_d`` of its
    ``count_d`` rows (rate 1.0 for the binding domain).  One tiny
    count aggregate; domains absent from ``weights`` are dropped.
    """
    counts = {r[0]: r[1] for r in
              df.groupBy(domain_col).agg(F.count(F.lit(1))).collect()}
    eligible = {d: w for d, w in weights.items()
                if w > 0 and counts.get(d, 0) > 0}
    if not eligible:
        return {}
    # Engine-portable threshold rule (round-7 ADVICE): every step below
    # is a single IEEE-double expression a SQL oracle reproduces
    # bit-exactly with DOUBLE weights — t is the bitwise min of the
    # c/w quotients, the binding domain is identified by float
    # EQUALITY with t (exact: min returns one of the quotients), and
    # its threshold is pinned to 2^31 so a rate-1.0 domain keeps hash
    # 2^31-1 instead of losing it to the t*w/c float roundtrip.
    t = min(counts[d] / float(w) for d, w in eligible.items())
    out = {}
    for d, w in eligible.items():
        if counts[d] / float(w) == t:
            out[d] = (_M31, 1.0)
        else:
            rate = t * float(w) / counts[d]
            out[d] = (int(rate * _M31), rate)
    return out


def mix_domains(df: DataFrame, weights: dict[str, float],
                domain_col: str = "source", key_col: str = "doc_id",
                seed: int = 1) -> DataFrame:
    """Deterministically downsample domains to target proportions.

    Computes per-domain keep thresholds (``domain_mix_rates``, one tiny
    aggregate) and applies the pure LCG keep rule per row — a literal
    CASE over at most ``len(weights)`` branches, fully codegen, no join,
    no shuffle.  Rows from unrequested domains are dropped.
    """
    rates = domain_mix_rates(df, weights, domain_col)
    if not rates:
        return df.where(F.lit(False))
    h = lcg_hash(key_col, seed)
    thr = None
    for d, (t, _r) in sorted(rates.items()):
        branch = F.when(F.col(domain_col) == F.lit(d), F.lit(t))
        thr = branch if thr is None else thr.when(
            F.col(domain_col) == F.lit(d), F.lit(t))
    return df.where(h < thr.otherwise(F.lit(0)))


def materialize_sequences(df: DataFrame, budget: int,
                          tokens_col: str = "tokens",
                          id_col: str = "doc_id",
                          npart: int | None = None,
                          id_bounds: tuple[int, int] | None = None
                          ) -> DataFrame:
    """Materialize the packed training sequences themselves: one row per
    sequence of exactly ``budget`` tokens (the final one ragged), each
    carrying its token array in stream order plus provenance counts.

    This is the artifact a trainer consumes — ``pack_sequences`` maps
    docs to sequence SPANS; this op assembles the token streams.  Plan:
    prefix-scan the per-doc token counts for global start offsets
    (narrow), then posexplode tokens once and shuffle them by
    ``seq_id = global_pos div budget`` — the one unavoidable token-level
    shuffle, and it IS the output layout (training shards).  Groups are
    bounded by ``budget`` tokens, so the assembly aggregate cannot skew
    whatever the document length distribution.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    counts = df.select(F.col(id_col), F.col(tokens_col),
                       F.size(tokens_col).cast("long").alias("__nt"))
    if id_bounds is not None:
        lo, hi = int(id_bounds[0]), int(id_bounds[1])
    else:
        stats = df.agg(F.min(id_col).alias("lo"),
                       F.max(id_col).alias("hi")).first()
        if stats["lo"] is None:
            return df.sparkSession.createDataFrame(
                [], f"seq_id long, seq_text string, n_tokens long, "
                    f"n_docs long")
        lo, hi = int(stats["lo"]), int(stats["hi"])
    npart = npart or _npart_default(df)
    narrow = counts.withColumn("__part",
                               _range_bucket(id_col, lo, hi, npart))
    scanned = prefix_scan(narrow, "__part", [id_col], "__nt",
                          out_pos="__pos", out_run="__start")
    # One row per (doc x overlapped sequence) FRAGMENT, not per token
    # (r11, guide §2.3 shuffle fewer bytes/rows): a doc's tokens occupy
    # the contiguous global range [__start, __start+__nt), so it
    # contributes exactly one contiguous token slice to each sequence in
    # [__start div b, (__start+__nt-1) div b].  The slice is cut in the
    # same codegen stage as the explode — only the fragment arrays reach
    # the exchange — collapsing shuffle row count by ~budget x while the
    # token bytes still move exactly once.  Assembly sorts the few
    # fragments per group by their in-sequence position and flattens;
    # groups stay bounded by ``budget`` tokens, so the no-skew property
    # is unchanged.  Output is bit-identical to the former per-token
    # formulation (pinned by the oracle contract and
    # tests/test_batching.py).
    b = int(budget)
    frags = (scanned.where(F.col("__nt") > 0)
             .selectExpr(
                 id_col, tokens_col, "__start", "__nt",
                 f"explode(sequence(__start DIV {b}, "
                 f"(__start + __nt - 1) DIV {b})) AS seq_id")
             .selectExpr(
                 "seq_id", id_col,
                 f"greatest(__start - seq_id * {b}, 0L) AS __sp",
                 f"slice({tokens_col}, "
                 f"CAST(greatest(seq_id * {b} - __start, 0L) + 1 AS INT), "
                 f"CAST(least((seq_id + 1) * {b}, __start + __nt) "
                 f"- greatest(seq_id * {b}, __start) AS INT)) AS __frag"))
    return (frags.groupBy("seq_id")
            .agg(F.concat_ws(" ", F.flatten(F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("__sp", "__frag"))),
                     lambda s: s["__frag"]))).alias("seq_text"),
                 F.sum(F.size("__frag")).cast("long").alias("n_tokens"),
                 F.countDistinct(id_col).cast("long").alias("n_docs")))


def repeat_oversample(df: DataFrame, factors: dict[str, float],
                      domain_col: str = "source", key_col: str = "doc_id",
                      seed: int = 2) -> DataFrame:
    """Epoch-style upsampling to fractional repeat factors (the other
    half of domain mixing: ``mix_domains`` only downsamples).

    A factor of 2.3 gives every row 2 copies plus a third for the
    deterministic 30% of keys with ``lcg_hash(key, seed) < 0.3 * 2^31``
    — the standard "fractional epochs" treatment of data-constrained
    mixes.  Rows gain an ``epoch`` column (0-based copy index) so a
    downstream ``seeded_shuffle`` over (key, epoch) decorrelates copies.
    Pure codegen: a CASE over the factor table + ``explode(sequence)``;
    no join, no shuffle.  Domains absent from ``factors`` pass through
    with factor 1.0.
    """
    h = lcg_hash(key_col, seed)
    n_copies = None
    for d, f in sorted(factors.items()):
        if f < 0:
            raise ValueError(f"negative factor for {d!r}")
        base, frac = int(f), float(f) - int(f)
        thr = int(frac * _M31)
        cnt = (F.lit(base) +
               F.when(h < F.lit(thr), F.lit(1)).otherwise(F.lit(0)))
        cond = F.col(domain_col) == F.lit(d)
        n_copies = (F.when(cond, cnt) if n_copies is None
                    else n_copies.when(cond, cnt))
    n_copies = (F.lit(1) if n_copies is None
                else n_copies.otherwise(F.lit(1)))
    return (df.withColumn("__n", n_copies)
              .where(F.col("__n") > 0)
              .withColumn("epoch",
                          F.explode(F.sequence(F.lit(0),
                                               F.col("__n") - 1)))
              .drop("__n"))


def length_bucketed_batches(df: DataFrame, batch_size: int,
                            token_col: str = "n_tokens",
                            id_col: str = "doc_id",
                            bucket_width: int = 64, max_bucket: int = 31,
                            npart: int | None = None,
                            id_bounds: tuple[int, int] | None = None
                            ) -> DataFrame:
    """Assign docs to fixed-size batches within length-homogeneous buckets.

    Training dataloaders bucket samples by length so a batch pads to its
    own maximum, not the corpus maximum.  Bucket = ``min(n_tokens //
    bucket_width, max_bucket)`` (pure integer math — portable to any SQL
    oracle, unlike float ``log2`` whose boundary rounding differs across
    engines); within a bucket, docs are batched ``batch_size`` at a time
    in ``id_col`` order.

    A per-bucket ``row_number()`` window would bound parallelism at the
    bucket count (~32 tasks for 100 TB).  Instead the rank comes from the
    global prefix scan over the composite order (bucket, id) minus the
    bucket's first position (a tiny per-bucket aggregate, broadcast back)
    — parallelism stays at ``npart`` whatever the bucket skew.

    When ``df`` is the tail of an expensive composed pipeline, pass
    ``id_bounds`` (any range COVERING the ids, e.g. the base table's
    min/max) so the stats job probes cheap base statistics instead of
    executing the pipeline twice — the same escape hatch
    ``pack_sequences`` / ``materialize_sequences`` carry; bounds only
    steer bucket balance, never correctness.
    """
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    npart = npart or _npart_default(df)
    if id_bounds is not None:
        stats = {"lo": int(id_bounds[0]), "hi": int(id_bounds[1])}
    else:
        stats = df.agg(F.min(id_col).alias("lo"),
                       F.max(id_col).alias("hi")).first()
    bucket = F.least(F.floor(F.col(token_col) / F.lit(int(bucket_width))),
                     F.lit(int(max_bucket))).cast("long")
    if stats["lo"] is None:
        return (df.select(F.col(id_col),
                          F.col(token_col).cast("long").alias(token_col))
                .withColumn("bucket", F.lit(0).cast("long"))
                .withColumn("batch_id", F.lit(0).cast("long")))
    narrow = (df.select(F.col(id_col),
                        F.col(token_col).cast("long").alias(token_col))
              .withColumn("bucket", bucket)
              .withColumn("__part",
                          F.col("bucket") * F.lit(int(npart))
                          + _range_bucket(id_col, stats["lo"], stats["hi"],
                                          npart))
              .withColumn("__one", F.lit(1).cast("long")))
    scanned = prefix_scan(narrow, "__part", ["bucket", id_col], "__one",
                          out_pos="__pos", out_run="__rb")
    firsts = scanned.groupBy("bucket").agg(
        F.min("__pos").alias("__first"))
    out = scanned.join(F.broadcast(firsts), "bucket", "inner")
    rank = F.col("__pos") - F.col("__first")
    return (out.withColumn("batch_id",
                           F.floor(rank / F.lit(int(batch_size)))
                           .cast("long"))
            .select(id_col, token_col, "bucket", "batch_id"))


def chunk_documents(df: DataFrame, chunk_tokens: int, overlap: int = 0,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document sliding-window chunking (RAG/context-window prep):
    whitespace tokens, windows of ``chunk_tokens`` starting every
    ``chunk_tokens - overlap`` positions, last window keeps the tail.

    Differs from ``pack_sequences`` (which concatenates ACROSS
    documents to fill a budget): chunking never crosses a document
    boundary and repeats the ``overlap`` suffix of each window at the
    head of the next one.

    Entirely non-lambda built-ins — split/size/sequence/explode/slice/
    array_join all stay in whole-stage codegen; there is no shuffle at
    all (explode is a per-row generator), so the operator scales as a
    pure map over any corpus partitioning.  Number of windows uses
    integer arithmetic (``(n - chunk + step - 1) div step + 1``) so an
    ANSI-SQL oracle reproduces the row set exactly.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    step = chunk_tokens - overlap
    # empty/whitespace-only/null text is ZERO tokens (a bare split('')
    # yields [''] — one phantom empty token that would inflate token
    # accounting); such docs still emit one chunk with chunk_len 0 and
    # chunk_text '' so every document stays represented downstream
    trimmed = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.when(trimmed == "", F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))
    n = F.size(toks)
    nchunks = F.expr(
        f"CASE WHEN __n <= {chunk_tokens} THEN 1L "
        f"ELSE (__n - {chunk_tokens} + {step} - 1) DIV {step} + 1 END")
    out = (df.select(F.col(id_col), toks.alias("__toks"),
                     n.cast("long").alias("__n"))
           .withColumn("__nc", nchunks)
           .select(id_col, "__toks", "__n",
                   F.explode(F.sequence(F.lit(0).cast("long"),
                                        F.col("__nc") - 1)).alias("chunk_id"))
           .withColumn("__start", F.col("chunk_id") * step)
           .select(
               id_col, "chunk_id",
               F.least(F.lit(chunk_tokens).cast("long"),
                       F.col("__n") - F.col("__start")).alias("chunk_len"),
               F.array_join(
                   F.slice(F.col("__toks"),
                           (F.col("__start") + 1).cast("int"),
                           chunk_tokens),
                   " ").alias("chunk_text")))
    return out


def split_dataset(df: DataFrame, fractions: dict[str, float],
                  key_col: str = "doc_id", seed: int = 0,
                  out_col: str = "split",
                  stratify_by: str | None = None,
                  npart: int | None = None) -> DataFrame:
    """Deterministic train/val/test split on the engine-portable
    ``lcg_hash`` (documented ANSI-SQL restatement above).

    Two modes:

    - **hash mode** (``stratify_by=None``): cumulative fraction
      thresholds on the key hash — a pure filter-free projection,
      reproducible across runs, engines and partitionings; every
      downstream filter on ``split`` is an ordinary pushable predicate.
      Proportions hold in expectation (Bernoulli), not exactly.
    - **exact stratified mode** (``stratify_by="source"``): within each
      stratum, rows are ranked by ``(hash, key)`` and cut at the exact
      cumulative boundaries ``floor(cum_frac * stratum_n + 1e-9)`` —
      every stratum lands its fractions to the row.  The rank is
      computed skew-free: hash-range buckets give per-(stratum, bucket)
      windows plus one broadcast offset join — never a single-task
      per-stratum global window (same two-phase pattern as
      ``prefix_scan``), so one 90 %-of-corpus stratum cannot serialize
      the job at 100 TB.

    ``fractions`` must sum to 1 (tolerance 1e-9); insertion order
    defines the boundary order, so ``{"train": .9, "val": .05,
    "test": .05}`` gives train = first 90 %, etc."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    h = lcg_hash(key_col, seed)
    if stratify_by is None:
        expr = None
        acc = 0.0
        for name in names[:-1]:
            acc += fractions[name]
            thr = int(acc * _M31)
            cond = h < F.lit(thr)
            expr = F.when(cond, F.lit(name)) if expr is None \
                else expr.when(cond, F.lit(name))
        last = F.lit(names[-1])
        expr = last if expr is None else expr.otherwise(last)
        return df.withColumn(out_col, expr)
    # exact stratified: bucketed per-stratum rank (no global window).
    # Null handling: a null stratum is a legitimate stratum (the window
    # groups it, and the offsets join below uses NULL-SAFE equality —
    # a plain equi-join would silently DROP every null-stratum row);
    # a null key hashes to null, so the bucket coalesces to 0 and the
    # row ranks deterministically among the lowest hashes.
    npart = npart or _npart_default(df)
    d = (df.withColumn("__h", F.coalesce(h, F.lit(0)))
           .withColumn("__b", _range_bucket("__h", 0, _M31 - 1, npart)))
    w_in = Window.partitionBy(stratify_by, "__b").orderBy("__h", key_col)
    d = d.withColumn("__rn", F.row_number().over(w_in))
    tot = d.groupBy(stratify_by, "__b").agg(F.max("__rn").alias("__bn"))
    w_off = (Window.partitionBy(stratify_by).orderBy("__b")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = (Window.partitionBy(stratify_by)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    # <= strata x npart rows: tiny by construction, broadcastable
    offs = tot.select(
        F.col(stratify_by).alias("__s_off"),
        F.col("__b").alias("__b_off"),
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__bn").over(w_all).alias("__sn"))
    cond = (F.col(stratify_by).eqNullSafe(F.col("__s_off"))
            & (F.col("__b") == F.col("__b_off")))
    ranked = (d.join(F.broadcast(offs), cond)
              .drop("__s_off", "__b_off")
              .withColumn("__rank", (F.col("__off") + F.col("__rn"))
                          .cast("long")))
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        bound = F.floor(F.lit(acc) * F.col("__sn") + F.lit(1e-9))
        cond = F.col("__rank") <= bound
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return (ranked.withColumn(out_col, expr)
            .drop("__h", "__b", "__rn", "__off", "__sn", "__rank"))
