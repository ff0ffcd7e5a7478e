"""Benchmark harness (driver contract).

Runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Measurement protocol (round 6, after the round-5 verdict found up to 13x
session-order swings on identical queries):

- **Process-group isolation**: the suite runs as one fresh subprocess
  (own JVM, own python-worker pool) per query FAMILY, so a heavy python
  -kernel family can never perturb the timing of the native-SQL families
  that run after it.  Full per-query isolation was measured at ~17 s of
  JVM+prep per query (~13 min/suite) — family granularity keeps the
  overhead at ~7 subprocesses while separating the interference classes
  actually observed.  ``SPARK_GRAFT_BENCH_ISOLATE=0`` falls back to the
  single-session path.
- **Full warmup**: each query's warmup run is the SAME full noop write as
  the timed run (the former ``limit(1)`` warmup compiled a DIFFERENT
  plan — AQE short-circuits limits — so first timed runs still paid
  python-worker spin-up).
- **Load tagging**: the emitted JSON carries the host load average at
  suite start/end and a ``load_warning`` flag, so round-over-round
  comparisons can discard contended runs instead of chasing phantom
  regressions.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


HEADLINE = [
    "tpch_q1",
    "tpch_q3_top10",
    "tpch_q5_nation_rev",
    "window_rownum",
    "events_sessionization",
    "events_hourly_counts",
    "st_point_accessors",
    "st_distance_pairs",
    "st_contains_point_in_box",
    "spatial_join_grid_within",
    "spatial_join_broadcast_within",
    "predicates_random_100k",
    "knn_join_k3",
    "st_buffer_area",
    "text_token_stats",
    "text_quality_score",
    "text_fingerprint_dedup",
    "dedup_minhash_pairs",
    "text_ngram_jaccard_pairs",
    "sim_cosine_topk",
    "sim_label_centroid_dist",
    "geo_distance_sphere",
    "raster_zonal_stats",
    "asof_join_events",
    "dedup_transitive_cc",
    "knn_join_polygons_k2",
    # round-4 additions
    "st_transform_osgb",
    "s2_cellid_points",
    "multimodal_jpeg_decode",
    # round-5: bulk variants whose work grows with SF (the fixed-window
    # micro-queries above measure the scheduling floor; these measure
    # marginal throughput — the number that matters at 100 TB)
    "st_distance_pairs_bulk",
    "geo_distance_sphere_bulk",
    "knn_join_polygons_bulk",
    # round-7: batch-assembly family (work grows with SF).  NOTE for
    # round-over-round comparison: these three are NEW in r7 — the suite
    # total is no longer comparable to BENCH_r06's 32-query total;
    # compare per-query.
    "pack_sequences_gpt",
    "dedup_exact_substring",
    "materialize_sequences_512",
    # round-8: web-corpus ingestion family (work grows with SF; NEW in
    # r8 — excluded from core32_sec like the r7 additions)
    "html_extract_text",
    "url_blocklist_dedup",
    "pipeline_web_compose",
    # round-9: the persisted bucketed-by-cell layout variant of the grid
    # join (r8 verdict #6).  NEW in r9 — excluded from core32_sec.  Its
    # first (warmup) run pays the one-time layout write; timed runs
    # measure the query-time plan, the same way an indexed database
    # benchmarks index reads, not index builds.
    "spatial_join_bucketed_within",
    # round-9: geography RELATION join (spherical cell-cover; the only
    # other plan is vanilla's pair-explosion, 107x slower at sf0.1).
    # NEW in r9 — excluded from core32_sec.
    "sql_geography_intersects_join",
    # round-10: layout distance join (stored-cell radius-padded lookup,
    # three-branch native refine), multi-predicate lattice through SQL,
    # and the skew-salted clustered geography join.  NEW in r10 —
    # excluded from core32_sec.
    "spatial_join_bucketed_distance",
    "sql_two_spatial_predicates_left",
    "geo_skew_join_clustered",
    # round-11: sliding-window chunking (zero-shuffle generator over the
    # documents corpus) and int8-quantized cosine top-k (packed-byte
    # scorer — 4x fewer scan bytes than the float path).  NEW in r11 —
    # excluded from core32_sec.
    "chunk_documents_overlap",
    "sim_quantized_topk",
]

# Isolation groups: one subprocess (fresh JVM + python workers) each.
# Families are grouped by interference class — python-kernel-heavy
# families never precede native-SQL families inside a process.
GROUPS: dict[str, list[str]] = {
    "tpch": ["tpch_q1", "tpch_q3_top10", "tpch_q5_nation_rev",
             "window_rownum", "events_sessionization",
             "events_hourly_counts"],
    "geom_micro": ["st_point_accessors", "st_distance_pairs",
                   "st_contains_point_in_box", "st_buffer_area",
                   "geo_distance_sphere", "st_transform_osgb",
                   "s2_cellid_points"],
    "spatial_join": ["spatial_join_grid_within",
                     "spatial_join_broadcast_within",
                     "spatial_join_bucketed_within",
                     "spatial_join_bucketed_distance",
                     "sql_geography_intersects_join",
                     "sql_two_spatial_predicates_left",
                     "geo_skew_join_clustered",
                     "predicates_random_100k", "knn_join_k3",
                     "knn_join_polygons_k2"],
    "text_dedup": ["text_token_stats", "text_quality_score",
                   "text_fingerprint_dedup", "dedup_minhash_pairs",
                   "text_ngram_jaccard_pairs", "dedup_transitive_cc"],
    "sim_media": ["sim_cosine_topk", "sim_label_centroid_dist",
                  "multimodal_jpeg_decode", "raster_zonal_stats",
                  "asof_join_events", "sim_quantized_topk"],
    "bulk": ["st_distance_pairs_bulk", "geo_distance_sphere_bulk",
             "knn_join_polygons_bulk"],
    "assembly": ["pack_sequences_gpt", "dedup_exact_substring",
                 "materialize_sequences_512", "chunk_documents_overlap"],
    "web": ["html_extract_text", "url_blocklist_dedup",
            "pipeline_web_compose"],
}
assert sorted(n for g in GROUPS.values() for n in g) == sorted(HEADLINE)

# Round 8 (round-7 verdict #3/#6): min-of-3 for EVERY query.  The
# round-7 driver run regressed tpch_q1/q3/q5 and predicates_random_100k
# 15-27% with no plan changes — the documented episodic hypervisor
# stalls (phantom loadavg with vmstat idle) land on whichever query is
# running, not just the join-heavy set the old _STALL_PRONE list
# guessed.  One extra rep across the ~35-query suite costs ~12 s of
# bench wall and bounds the stall error everywhere.
_STALL_PRONE = set(HEADLINE)


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


def _run_queries(names: list[str], sf_dir: str) -> dict[str, float]:
    """Warm + time each query in the current process's session."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from sedona_db_spark import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # shared warmup: JVM codegen machinery, python worker pool, parquet
    # footers, temp-view prep — all outside any timed region
    entrymod._prep(spark, sf_dir)
    spark.sql("SELECT ST_AsText(ST_Point(1.0, 1.0))").collect()
    spark.table("lineitem").limit(1).count()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        # per-query warmup: the SAME full plan as the timed run (noop
        # write), so codegen AND the python workers this query needs are
        # warm — a limit(1) warmup compiles a different (short-circuited)
        # plan and leaves the workers cold
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception:
            pass                    # surfaced in the timed run instead
        # best-of-N timed runs (pytest-benchmark's min methodology):
        # host noise on this box is strictly upward — the minimum is the
        # engine's actual cost, the mean is the engine + whoever else ran.
        # Join-heavy plans see episodic multi-second hypervisor stalls
        # (tpch_q3: 4.6-17 s on identical plans), so they get one extra
        # rep — min-of-3 bounds the stall error tighter than min-of-2.
        default_reps = 3 if name in _STALL_PRONE else 2
        reps = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPS",
                                      str(default_reps))), 1)
        best = None
        for _ in range(reps):
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
            except Exception as e:  # report but keep the suite going
                best = -1.0
                print(f"# bench error {name}: {e}", file=sys.stderr)
                break
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    spark.stop()
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if len(sys.argv) >= 3 and sys.argv[1] == "--group":
        # child mode: run one isolation group, print one JSON line
        names = GROUPS[sys.argv[2]]
        gl0 = _loadavg()
        timings = _run_queries(names, sf_dir)
        print(json.dumps({"group": sys.argv[2], "queries": timings,
                          "load": [gl0, _loadavg()]}))
        return

    load0 = _loadavg()
    isolate = os.environ.get("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0"

    # Load gate (round 9, r8 verdict #4): BENCH_r08 ran under ambient
    # loadavg 6.35 and four queries read +16-30% with zero plan changes.
    # The ambient sample is taken at SUITE start — before any of our own
    # JVMs inflate the 1-minute average (a 32-thread Spark burst raises
    # loadavg for ~a minute after it exits, so PER-GROUP readings cannot
    # distinguish a noisy neighbor from our own previous group).  Above
    # the threshold every group runs twice (per-query min), bounding
    # sustained-contention error the way min-of-3 bounds episodic stalls.
    load_thr = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_THR", "2.0"))
    contended = bool(load0 and load0[0] > load_thr)

    timings: dict[str, float] = {}
    # per-query minima drawn ONLY from group runs whose start loadavg
    # was under the threshold (r11 verdict #8: two driver benches in a
    # row carried load_warning and manufactured phantom regressions up
    # to 4.8x; this additive field lets round-over-round comparisons go
    # quiet-vs-quiet without touching the existing fields)
    quiet: dict[str, float] = {}
    group_loads: dict[str, list] = {}
    retried: list[str] = []
    if isolate:
        here = os.path.abspath(__file__)

        def run_group(gname: str) -> dict[str, float]:
            r = subprocess.run(
                [sys.executable, here, "--group", gname],
                capture_output=True, text=True, timeout=900,
                cwd=os.path.dirname(here))
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("{")][-1]
            payload = json.loads(line)
            group_loads.setdefault(gname, []).append(payload.get("load"))
            got = payload["queries"]
            try:
                gl0 = payload["load"][0][0]
            except (KeyError, IndexError, TypeError):
                gl0 = None
            # a run is quiet when the SUITE's ambient start was quiet
            # (later group-start readings include our own previous
            # groups' decaying 32-thread bursts — self-load, constant
            # across rounds, not contention) or when its own group
            # start reads under the threshold despite a contended
            # ambient (the retry that found a calm window)
            if (not contended) or (gl0 is not None and gl0 <= load_thr):
                for k, v in got.items():
                    if v is not None and v > 0:
                        quiet[k] = min(quiet.get(k, v), v)
            return got

        for gname in GROUPS:
            try:
                got = run_group(gname)
                if contended:
                    retried.append(gname)
                    again = run_group(gname)
                    # keep the best POSITIVE timing: a -1.0 failure
                    # sentinel from either run must never win the min
                    # and mask a valid measurement (round-9 review)
                    def _best(a, b):
                        ok = [v for v in (a, b) if v is not None and v > 0]
                        return min(ok) if ok else a
                    got = {k: _best(v, again.get(k)) for k, v in got.items()}
                timings.update(got)
            except Exception as e:
                print(f"# group {gname} subprocess failed ({e}); "
                      "running in-process", file=sys.stderr)
                timings.update(_run_queries(GROUPS[gname], sf_dir))
    else:
        timings = _run_queries(HEADLINE, sf_dir)

    total = sum(v for v in timings.values() if v > 0)
    # round-over-round comparability: the r7 assembly additions are NEW —
    # core32_sec is the sum over exactly BENCH_r06's 32-query set, the
    # number comparable to value=23.921 there.
    r7_new = (set(GROUPS["assembly"]) | set(GROUPS["web"])
              | {"spatial_join_bucketed_within",
                 "sql_geography_intersects_join",
                 "spatial_join_bucketed_distance",
                 "sql_two_spatial_predicates_left",
                 "geo_skew_join_clustered",
                 "chunk_documents_overlap", "sim_quantized_topk"})
    core32 = sum(v for k, v in timings.items() if v > 0 and k not in r7_new)
    load1 = _loadavg()
    # The driver keeps only the LAST ~2000 chars of stdout: the r9 line
    # with full per-group load triples exceeded that and the headline
    # was truncated away (BENCH_r09 "parsed": null).  The stdout line
    # stays compact — headline fields first, 1-minute loads only — and
    # the full diagnostics (per-group load triples per run, retry list,
    # thresholds) go to bench_full.json next to this script instead.
    full = {
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "core32_sec": round(core32, 3),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "isolation": "process-group" if isolate else "none",
        "warmup": "full-plan",
        "loadavg_start": load0,
        "loadavg_end": load1,
        "group_loads": group_loads,
        "load_threshold": load_thr,
        "load_warning": contended,
        "load_retried_groups": retried,
        "queries_quiet": quiet,
    }
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_full.json"), "w") as f:
            json.dump(full, f)
    except OSError:
        pass
    # stdout line stays compact (the driver keeps only its tail): the
    # full queries_quiet map lives in bench_full.json; the line carries
    # how many queries have a quiet reading so a contended run is
    # self-describing
    print(json.dumps({
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "core32_sec": round(core32, 3),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load1m": [round(load0[0], 2) if load0 else None,
                   round(load1[0], 2) if load1 else None],
        "load_warning": contended,
        "n_quiet": len(quiet),
    }))


if __name__ == "__main__":
    main()
