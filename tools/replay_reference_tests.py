"""Mine the reference's own scalar unit tests and replay them here.

Extracts (function, WKT arg, expected) triples from every
`invoke_scalar(...)` / `assert_scalar_result_equals(...)` pair in the
reference's rust + c test files and runs the equivalent SQL through
this engine, comparing exact strings (geometry results via ST_AsText)
with numeric tolerance fallback.

Round 11: this replay surfaced six semantic/orientation gaps (boundary
mod-2 + collection recursion, buildarea linework + empty type,
makevalid collapse->linework, normalize canonical form, CW shells from
hull/polygonize/buildarea/overlay) — all fixed and pinned in
tests/test_reference_parity_goldens.py.

Usage: python tools/replay_reference_tests.py [--verbose]
Known acceptable divergences (reported as SKIP-DIVERGENCE, not failures):
- MULTIPOINT WKT inner parentheses (ours: ((1 1), (2 2)); GEOS: (1 1, 2 2))
  — both valid ISO WKT, changing the writer would break every stored pin.
- nested-GeometryCollection boundary grouping (the reference's own two
  st_boundary.rs asserts use different rules; we match the flat one).
- spherical earth radius: this engine uses the IUGG mean radius
  6371008.8 m everywhere (kernels, codegen peephole, goldens, every
  DuckDB oracle restates it); the reference's s2 layer uses S2Earth's
  6371010.0 m.  Geodesic area/length/perimeter therefore differ by a
  systematic ~1.9e-7 relative factor — numeric cases from
  c/sedona-s2geography within 5e-7 relative are skipped with this
  reason rather than failed.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

GEOM_KW = ("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
           "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")
ALIAS = {"st_convex_hull": "st_convexhull", "st_unary_union": "st_unaryunion",
         "st_sym_difference": "st_symdifference",
         "st_end_point": "st_endpoint",
         "st_geometry_type": "st_geometrytype"}
# files where several UDFs share one test module and the nearest-name
# heuristic mispairs invoke/assert rows — excluded from automatic replay
# (their functions are covered by explicit goldens instead)
UNRELIABLE = {"st_srid", "st_crs", "st_hasm", "st_hasz", "st_geomfromwkt",
              "st_geogfromwkt", "st_endpoint", "st_start_point"}
# nearest-name mispairs corrected by hand (multi-udf test modules)
FN_OVERRIDE = {
    ("rust/sedona-functions/src/st_points.rs",
     "LINESTRING (1 2, 3 4, 5 6)"): "st_points",
}
# (src, arg) pairs with a documented acceptable divergence (module docstring)
DIVERGENCES = {
    ("c/sedona-geos/src/st_boundary.rs",
     "GEOMETRYCOLLECTION(LINESTRING(1 1,2 2),GEOMETRYCOLLECTION("
     "POLYGON((3 3,4 4,5 5,3 3)),GEOMETRYCOLLECTION(LINESTRING(6 6,7 7),"
     "POLYGON((8 8,9 9,10 10,8 8)))))"),
    # the reference's layers disagree on boundary-of-collection: the c
    # layer pins the per-member form WITH empty members preserved
    # (GC(GC EMPTY, MULTIPOINT, LINESTRING)), while the python layer
    # (tests/functions/test_functions.py::test_st_boundary, 7 cases)
    # pins the flattened form grouped by dimension with empties dropped
    # (GC(MULTIPOINT, <lineal>)).  This engine follows the python layer.
    ("c/sedona-geos/src/st_boundary.rs",
     "GEOMETRYCOLLECTION(MULTIPOINT(-2 3, -2 2), LINESTRING(5 5, 10 10), "
     "POLYGON((-7 4.2, -7.1 5, -7.1 4.3, -7 4.2)))"),
}


def mine(ref_root: str) -> list[dict]:
    cases, seen = [], set()
    files = (glob.glob(f"{ref_root}/rust/sedona-functions/src/*.rs")
             + glob.glob(f"{ref_root}/c/*/src/*.rs"))
    for f in files:
        txt = re.sub(r"\s+", " ", open(f).read())
        name_events = [(m.start(), m.group(1) or m.group(2) or m.group(3))
                       for m in
                       re.finditer(r'(?:from_impl|SedonaScalarUDF::new|s2_udf)\(\s*"([a-z0-9_]+)"'
                                   r"|=\s*(st_[a-z0-9_]+?)_udf\(\)"
                                   r'|s2_udf\(\s*"([a-z0-9_]+)"', txt)]
        inv_events = [(m.start(), m.group(1), m.group(2)) for m in
                      re.finditer(r'invoke_scalar\(\s*"([^"]+)"\s*(?:,\s*([^)]*?))?\)', txt)]
        for am in re.finditer(
                r'assert_scalar_result_equals\(\s*\w+\s*,\s*(?:"([^"]*)"|([-\w\. ]+))\s*\)',
                txt):
            pos = am.start()
            cands = [e for e in inv_events if 0 < pos - e[0] < 400]
            names = [e for e in name_events if e[0] < pos]
            if not cands or not names:
                continue
            inv = max(cands, key=lambda e: e[0])
            arg = inv[1]
            if not arg.upper().startswith(GEOM_KW):
                continue
            exp = am.group(1) if am.group(1) is not None \
                else am.group(2).strip()
            c = {"fn": names[-1][1], "arg": arg, "extra": inv[2],
                 "expect": exp, "src": f.split("/reference/")[-1]}
            k = (c["fn"], c["arg"], str(c["extra"]), c["expect"])
            if k not in seen:
                seen.add(k)
                cases.append(c)
    return cases


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from sedona_db_spark import get_spark
    spark = get_spark("replay_reference")
    verbose = "--verbose" in sys.argv
    cases = mine("/root/reference")
    ok = bad = skip = 0
    fails = []
    for c in cases:
        c["fn"] = FN_OVERRIDE.get((c["src"], c["arg"]), c["fn"])
        fn = ALIAS.get(c["fn"], c["fn"])
        if fn.startswith("simple_udf") or fn in UNRELIABLE:
            skip += 1
            continue
        if not spark.catalog.functionExists(fn):
            fails.append(("NOFN", fn, c["src"]))
            bad += 1
            continue
        ctor = "ST_GeogFromWKT" if ("geog" in fn or
                                    "s2geography" in c["src"]) \
            else "ST_GeomFromWKT"
        args = [f"{ctor}('{c['arg']}')"]
        extra = (c["extra"] or "").strip()
        if extra:
            if not re.fullmatch(r"[-0-9_.eE]+(_f64|_i32|f64|i32)?", extra):
                skip += 1
                continue
            args.append(re.sub(r"_?(f64|i32|i64)", "", extra))
        expr = f"{fn}({', '.join(args)})"
        exp = str(c["expect"]).strip()
        exp = re.sub(r"_(i32|i64|u32|f64)$", "", exp)
        wrap = f"ST_AsText({expr})" if exp.upper().startswith(GEOM_KW) \
            else expr
        if (c["src"], c["arg"]) in DIVERGENCES:
            skip += 1  # SKIP-DIVERGENCE (documented, see module docstring)
            continue
        val = None
        for attempt in (0, 1):   # retry once: spark reuses python
            try:                 # workers, and an earlier test's raise
                val = str(       # can poison the next call transiently
                    spark.sql(f"SELECT {wrap}").collect()[0][0])
                break
            except Exception as e:
                err = str(e)[:90]
        if val is None:
            fails.append(("ERR", expr, err))
            bad += 1
            continue

        def norm(s):
            s = re.sub(r"[ ]", "", s)
            # MULTIPOINT writer style: strip inner parentheses around
            # bare coordinate pairs (ours emits ((1 1), (2 2)), GEOS
            # (1 1, 2 2) — both valid ISO WKT), anywhere in the string
            return re.sub(r"\((-?[0-9.eE+-]+(?:,-?[0-9.eE+-]+)*?)\)"
                          r"(?=[,)])", r"\1", s)
        match = val == exp or norm(val) == norm(exp)
        if not match and exp.upper().startswith(GEOM_KW):
            # final fallback: structural equality via this engine's WKT
            # parser (exact coords, ring order AND orientation compared;
            # only the writer's optional parentheses/spacing forgiven)
            try:
                from sedona_db_spark.geom import core as _core
                from sedona_db_spark.geom import wkt as _wkt
                match = _core.to_wkb(_wkt.from_wkt(val)) \
                    == _core.to_wkb(_wkt.from_wkt(exp))
                if match:
                    skip += 1  # SKIP-DIVERGENCE (writer formatting)
                    continue
            except Exception:
                pass
        if not match:
            try:
                match = abs(float(val) - float(exp)) \
                    <= 1e-9 * max(1.0, abs(float(exp)))
            except Exception:
                pass
        if not match and "s2geography" in c["src"]:
            try:
                rel = abs(float(val) - float(exp)) / max(1.0,
                                                         abs(float(exp)))
                if rel < 5e-7:
                    skip += 1  # SKIP-DIVERGENCE (earth-radius convention)
                    continue
            except Exception:
                pass
        if not match and exp in ("true", "false"):
            match = val.lower() == exp
        if match:
            ok += 1
        else:
            bad += 1
            fails.append(("MISMATCH", expr, f"got {val!r} want {exp!r}",
                          c["src"]))
    print(json.dumps({"mined": len(cases), "ok": ok, "mismatch": bad,
                      "skipped": skip}))
    for f in fails:
        print(f)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
