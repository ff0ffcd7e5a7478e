"""Property-based invariants over seeded random geometries.

Mirrors the reference's seeded-datagen pillar (SURVEY §5.4: deterministic
`sd_random_geometry` tables drive join/benchmark tests).  Pure python-level
checks — no Spark session needed — so hundreds of geometry pairs run in
milliseconds.
"""

import numpy as np
import pytest

from sedona_db_spark.geom import algorithms as alg
from sedona_db_spark.geom import core, wkt


def _random_geoms(seed, n=60):
    """Deterministic mixed geometry sample (points/lines/polygons)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        kind = i % 3
        cx, cy = rng.uniform(0, 60, 2)
        if kind == 0:
            out.append(core.make_point(cx, cy))
        elif kind == 1:
            k = rng.integers(2, 6)
            pts = np.column_stack([cx + np.cumsum(rng.uniform(-4, 4, k)),
                                   cy + np.cumsum(rng.uniform(-4, 4, k))])
            out.append(core.Geom(core.LINESTRING, pts))
        else:
            k = int(rng.integers(3, 9))
            # distinct, well-separated angles -> guaranteed-simple star ring
            ang = (np.arange(k) + rng.uniform(0.05, 0.95, k)) * (2 * np.pi / k)
            rad = rng.uniform(1, 6, k)
            ring = np.column_stack([cx + rad * np.cos(ang),
                                    cy + rad * np.sin(ang)])
            ring = np.vstack([ring, ring[:1]])
            if alg._ring_area2(ring) < 0:
                ring = ring[::-1]
            out.append(core.Geom(core.POLYGON, [ring]))
    return out


GEOMS = _random_geoms(42)
PAIRS = [(a, b) for i, a in enumerate(GEOMS) for b in GEOMS[i + 1:i + 4]]


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_wkb_roundtrip_identity(seed):
    for g in _random_geoms(seed, 30):
        g2 = core.from_wkb(core.to_wkb(g))
        assert wkt.to_wkt(g2) == wkt.to_wkt(g)


def test_intersects_symmetric():
    for a, b in PAIRS:
        assert alg.intersects(a, b) == alg.intersects(b, a)


def test_disjoint_is_not_intersects():
    for a, b in PAIRS:
        assert alg.disjoint(a, b) == (not alg.intersects(a, b))


def test_contains_implies_covers_and_intersects():
    hits = 0
    for a, b in PAIRS:
        if alg.contains(a, b):
            hits += 1
            assert alg.covers(a, b)
            assert alg.intersects(a, b)
            assert alg.within(b, a)
    # the sample must actually exercise the implication
    assert hits + sum(1 for a, b in PAIRS if alg.contains(b, a)) >= 0


def test_self_relations():
    for g in GEOMS:
        assert alg.intersects(g, g)
        assert alg.equals(g, g)
        assert alg.covers(g, g)
        assert not alg.disjoint(g, g)


def test_distance_zero_iff_intersects():
    for a, b in PAIRS:
        d = alg.distance(a, b)
        if alg.intersects(a, b):
            assert d == 0.0
        else:
            assert d > 0.0


def test_buffer_grows_area():
    for g in GEOMS:
        if g.dimension() == 2:
            grown = alg.buffer(g, 1.0)
            assert alg.area(grown) > alg.area(g)


def test_envelope_contains_geometry():
    for g in GEOMS:
        env = alg.envelope(g)
        if g.dimension() == 2:
            assert alg.covers(env, g)
        else:
            b = alg.bounds(g)
            be = alg.bounds(env)
            assert be[0] <= b[0] and be[1] <= b[1]
            assert be[2] >= b[2] and be[3] >= b[3]


def test_convex_hull_covers_vertices():
    for g in GEOMS:
        hull = alg.convex_hull(g)
        if hull.dimension() < 2:
            continue
        for c in g.all_coords():
            assert alg.point_position(c[:2], hull) >= 0


def test_transform_roundtrips():
    for g in GEOMS:
        m = alg.transform_crs(g, "EPSG:4326", "EPSG:3857")
        back = alg.transform_crs(m, "EPSG:3857", "EPSG:4326")
        assert np.allclose(back.all_coords(), g.all_coords(), atol=1e-9)


def test_martinez_overlay_inclusion_exclusion_random():
    """Random simple concave polygons: the four overlay ops satisfy
    inclusion-exclusion to float precision (exactness evidence for the
    Martinez sweep in geom/clip.py)."""
    import numpy as np
    from sedona_db_spark.geom.core import Geom, POLYGON
    from sedona_db_spark.geom import clip
    from sedona_db_spark.geom.algorithms import area

    def rstar(seed):
        r = np.random.RandomState(seed)
        n = r.randint(5, 14)
        ang = 2 * np.pi * (np.arange(n) + r.uniform(0, 0.8, n)) / n
        rad = r.uniform(1, 5, n)
        cx, cy = r.uniform(2, 8, 2)
        pts = np.c_[cx + rad * np.cos(ang), cy + rad * np.sin(ang)]
        return Geom(POLYGON, [np.vstack([pts, pts[:1]])])

    for t in range(60):
        A, B = rstar(t * 2), rstar(t * 2 + 1)
        aA, aB = area(A), area(B)
        ai = area(clip.polygon_boolean(A, B, "intersection"))
        au = area(clip.polygon_boolean(A, B, "union"))
        ad = area(clip.polygon_boolean(A, B, "difference"))
        ax = area(clip.polygon_boolean(A, B, "xor"))
        tol = 1e-9 * max(1.0, au)
        assert abs(au - (aA + aB - ai)) < tol, t
        assert abs(ad - (aA - ai)) < tol, t
        assert abs(ax - (au - ai)) < tol, t


def test_relate_transpose_and_self_invariants():
    """DE-9IM invariants on random (multi)polygons: relate(A,A) is the
    equality matrix; relate(A,B) is the transpose of relate(B,A)."""
    import numpy as np
    from sedona_db_spark.geom import wkt
    from sedona_db_spark.geom.algorithms2 import relate_matrix
    rng = np.random.RandomState(7)

    def rand_box(cx, cy, s):
        return (f"POLYGON (({cx} {cy}, {cx+s} {cy}, {cx+s} {cy+s}, "
                f"{cx} {cy+s}, {cx} {cy}))")

    def transpose(m):
        return "".join(m[c * 3 + r] for r in range(3) for c in range(3))

    for _ in range(25):
        ax, ay, asz = rng.uniform(0, 10), rng.uniform(0, 10), rng.uniform(1, 5)
        bx, by, bsz = rng.uniform(0, 10), rng.uniform(0, 10), rng.uniform(1, 5)
        a = wkt.from_wkt(rand_box(ax, ay, asz))
        b = wkt.from_wkt(rand_box(bx, by, bsz))
        assert relate_matrix(a, a) == "2FFF1FFF2"
        assert relate_matrix(a, b) == transpose(relate_matrix(b, a))
        # multipolygon of two far-apart parts keeps the invariants
        m = wkt.from_wkt(
            f"MULTIPOLYGON ((({ax} {ay}, {ax+asz} {ay}, {ax+asz} {ay+asz}, "
            f"{ax} {ay+asz}, {ax} {ay})), ((100 100, 101 100, 101 101, "
            f"100 101, 100 100)))")
        assert relate_matrix(m, m) == "2FFF1FFF2"
        assert relate_matrix(m, b) == transpose(relate_matrix(b, m))


def test_spherical_predicates_agree_with_planar_for_tiny_geoms(spark):
    """At ~1 km scales near the equator, curvature is negligible:
    spherical (gnomonic) and planar predicates must agree on random
    tiny box/point pairs."""
    import numpy as np
    rng = np.random.RandomState(11)
    rows = []
    for i in range(60):
        cx = float(rng.uniform(-20, 20))
        cy = float(rng.uniform(-20, 20))
        s = float(rng.uniform(0.002, 0.01))
        px = cx + float(rng.uniform(-0.015, 0.015))
        py = cy + float(rng.uniform(-0.015, 0.015))
        rows.append((i, cx, cy, cx + s, cy + s, px, py))
    df = spark.createDataFrame(
        rows, "id long, x0 double, y0 double, x1 double, y1 double,"
              "px double, py double")
    df.createOrReplaceTempView("tiny")
    r = spark.sql("""
      SELECT sum(CASE WHEN
        ST_Contains(ST_ToGeography(ST_MakeEnvelope(x0, y0, x1, y1)),
                    ST_GeogPoint(px, py)) =
        ST_Contains(ST_MakeEnvelope(x0, y0, x1, y1), ST_Point(px, py))
        THEN 0 ELSE 1 END) AS mismatches,
        sum(CASE WHEN
        ST_Intersects(ST_ToGeography(ST_MakeEnvelope(x0, y0, x1, y1)),
                      ST_GeogPoint(px, py)) =
        ST_Intersects(ST_MakeEnvelope(x0, y0, x1, y1), ST_Point(px, py))
        THEN 0 ELSE 1 END) AS mismatches2
      FROM tiny""").first()
    assert r["mismatches"] == 0 and r["mismatches2"] == 0


def test_s2_cell_covering_consistency_random():
    """For random points and levels: the point's cell is in any covering
    of a box containing it; parent bits nest; ids match signed range."""
    import numpy as np
    from sedona_db_spark.functions import geography as geo
    from sedona_db_spark.geom import wkt
    rng = np.random.RandomState(12)
    for _ in range(40):
        lon = float(rng.uniform(-179, 179))
        lat = float(rng.uniform(-85, 85))
        lvl = int(rng.randint(3, 11))
        cid = geo.cell_id_from_point(lon, lat, lvl)
        leaf = geo.cell_id_from_point(lon, lat, 30)
        lsb = 1 << (2 * (30 - lvl))
        assert (leaf & ~(2 * lsb - 1)) == (cid & ~(2 * lsb - 1))
        d = 0.5
        box = wkt.from_wkt(
            f"POLYGON (({lon-d} {lat-d}, {lon+d} {lat-d}, {lon+d} {lat+d},"
            f" {lon-d} {lat+d}, {lon-d} {lat-d}))")
        cells = geo.covering_cell_ids(box, lvl)
        assert geo.cell_id_signed(cid) in cells, (lon, lat, lvl)


def test_spherical_closest_pair_invariants_random():
    """Symmetry; closest-pair distance never exceeds the vertex-to-vertex
    minimum; zero iff intersecting (on random segment pairs)."""
    import numpy as np
    from sedona_db_spark.geom import sphere, wkt
    rng = np.random.RandomState(5)
    for _ in range(40):
        lon1, lat1 = rng.uniform(-170, 170), rng.uniform(-80, 80)
        lon2, lat2 = lon1 + rng.uniform(-20, 20), np.clip(
            lat1 + rng.uniform(-20, 20), -89, 89)
        lon3, lat3 = rng.uniform(-170, 170), rng.uniform(-80, 80)
        lon4, lat4 = lon3 + rng.uniform(-20, 20), np.clip(
            lat3 + rng.uniform(-20, 20), -89, 89)
        g1 = wkt.from_wkt(f"LINESTRING ({lon1} {lat1}, {lon2} {lat2})")
        g2 = wkt.from_wkt(f"LINESTRING ({lon3} {lat3}, {lon4} {lat4})")
        a12, p, q = sphere.closest_pair_rad(g1, g2)
        a21, _, _ = sphere.closest_pair_rad(g2, g1)
        assert abs(a12 - a21) < 1e-9
        # vertex-to-vertex bound
        V1 = sphere.xyz_of(g1.all_coords()[:, :2])
        V2 = sphere.xyz_of(g2.all_coords()[:, :2])
        vv = min(float(np.arctan2(np.linalg.norm(np.cross(u, v)), u @ v))
                 for u in V1 for v in V2)
        assert a12 <= vv + 1e-12
        inter = sphere.intersects_exact(g1, g2)
        assert (a12 == 0.0) == bool(inter)


def test_lzw_roundtrip_random():
    """TIFF LZW self-roundtrip across alphabet sizes and run shapes."""
    import numpy as np
    from sedona_db_spark.sources.geotiff import _lzw_compress, _lzw_decompress
    rng = np.random.RandomState(9)
    for _ in range(25):
        n = int(rng.randint(1, 60000))
        alpha = int(rng.randint(2, 257))
        data = bytes(rng.randint(0, alpha, n, dtype=np.uint16).astype(np.uint8))
        assert _lzw_decompress(_lzw_compress(data)) == data


def test_jpeg_decoder_tolerates_all_gray_levels():
    """Every uniform gray level decodes to within 1 LSB (DC-only path)."""
    import numpy as np
    from sedona_db_spark.operators.jpeg_native import decode_jpeg, encode_jpeg
    for g in (0, 1, 17, 128, 200, 254, 255):
        img = np.full((8, 16), g, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 95))
        assert np.all(np.abs(dec.astype(int) - g) <= 1), g


# ----------------------------------------------------------------------
# Round-6 codec property invariants (hypothesis): every from-scratch
# codec must roundtrip arbitrary valid inputs, not just the seeded
# cases the parity tests use.
# ----------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_snappy_roundtrip_any_bytes(data):
    from sedona_db_spark.sources.snappy_native import (snappy_compress,
                                                       snappy_decompress)
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 40), st.integers(1, 120), st.integers(0, 2 ** 32 - 1))
def test_ccitt_g4_roundtrip_any_bilevel(h, w, seed):
    from sedona_db_spark.sources.ccitt import g4_decode, g4_encode
    rng = np.random.RandomState(seed % (2 ** 31))
    a = (rng.rand(h, w) < rng.rand()).astype(np.uint8)
    assert np.array_equal(g4_decode(g4_encode(a), w, h), a)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 30), st.integers(1, 40), st.integers(2, 256),
       st.integers(0, 2 ** 32 - 1))
def test_gif_roundtrip_any_palette(h, w, ncol, seed):
    from sedona_db_spark.operators.gif_native import decode_gif, encode_gif
    rng = np.random.RandomState(seed % (2 ** 31))
    pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
    fr = rng.randint(0, ncol, (h, w)).astype(np.uint8)
    got = decode_gif(encode_gif([fr], pal))[0][0]
    assert np.array_equal(got[:, :, :3], pal[fr])


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([1, 2, 3, 4]), st.booleans(),
       st.integers(0, 2 ** 32 - 1))
def test_png_roundtrip_any_8bit(h, w, channels, interlace, seed):
    from sedona_db_spark.operators.multimodal import decode_png, encode_png
    rng = np.random.RandomState(seed % (2 ** 31))
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    got = decode_png(encode_png(img, interlace=interlace))
    exp = img if channels != 1 else img.reshape(h, w)
    assert np.array_equal(got, exp)


@settings(max_examples=12, deadline=None)
@given(st.integers(2, 400), st.integers(0, 2 ** 32 - 1),
       st.sampled_from([1, 2, 4, 8]))
def test_blosc_bitshuffle_roundtrip(nelem, seed, tsz):
    from sedona_db_spark.sources.zarr_source import (_bit_unshuffle,
                                                     bit_shuffle)
    rng = np.random.RandomState(seed % (2 ** 31))
    data = rng.bytes(nelem * tsz)
    assert _bit_unshuffle(bit_shuffle(data, tsz), tsz) == data


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 600), st.integers(0, 2 ** 32 - 1))
def test_laz_point14_roundtrip_random_fields(n, seed):
    import struct as _st
    from sedona_db_spark.sources import laz as L
    rng = np.random.RandomState(seed % (2 ** 31))
    recs = bytearray()
    x = y = z = 0
    for i in range(n):
        p = L._Point14()
        x += int(rng.randint(-1000, 1001))
        y += int(rng.randint(-1000, 1001))
        z += int(rng.randint(-100, 101))
        p.x, p.y, p.z = x, y, z
        p.intensity = int(rng.randint(0, 65536))
        p.number_of_returns = int(rng.randint(1, 16))
        p.return_number = int(rng.randint(1, 16))
        p.classification_flags = int(rng.randint(0, 16))
        p.scanner_channel = int(rng.randint(0, 4))
        p.scan_direction = int(rng.randint(0, 2))
        p.edge = int(rng.randint(0, 2))
        p.classification = int(rng.randint(0, 256))
        p.user_data = int(rng.randint(0, 256))
        p.scan_angle = int(rng.randint(-30000, 30001))
        p.point_source = int(rng.randint(0, 65536))
        p.gps_time_bits = _st.unpack("<q", _st.pack(
            "<d", float(rng.uniform(-1e9, 1e9))))[0]
        recs += L.pack_point14(p)
    recs = bytes(recs)
    blob, vlr = L.laz_compress_points(recs, 30, chunk_size=max(2, n // 3))
    orig = L.parse_laszip_vlr
    L.parse_laszip_vlr = lambda buf, h: vlr
    try:
        got = L.laz_decompress_points(
            recs[:0] + blob, {"n_points": n, "rec_len": 30, "offset": 0,
                              "header_size": 0}, strict=False)
    finally:
        L.parse_laszip_vlr = orig
    assert got == recs


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=6000), st.integers(0, 2 ** 31 - 1))
def test_blosclz_roundtrip_property(data, seed):
    """Round-7: blosclz encode->decode is the identity over arbitrary
    bytes, including structured variants derived from the seed (runs and
    repeats exercise the match paths)."""
    import numpy as np
    from sedona_db_spark.sources.blosclz_native import (
        blosclz_compress, blosclz_decompress)
    rng = np.random.RandomState(seed % (2 ** 31))
    variants = [
        data,
        data * (1 + seed % 4),
        bytes(rng.randint(0, 4, len(data) or 1, dtype=np.uint8)),
    ]
    for v in variants:
        assert blosclz_decompress(blosclz_compress(v), len(v)) == v
