"""Property-based coverage (SURVEY.md §5 depth):

1. hypothesis fuzz of the span round-trip invariant — arbitrary unicode tag
   keys/values (including '=' in values), noise interleaving, media refs.
2. a 100k-case randomized proof of the candidate-join superset invariant:
   every point the reference's quantized bbox±tol predicate accepts for a
   way falls in a cell the way's covering registers. If this ever fails the
   (name, cell) equi-join can silently drop a true nearest-street candidate
   — it is THE correctness precondition of the join strategy.
"""

import math
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_addresses_spark.sources.parser import (  # noqa: E402
    parse_documents,
    serialize_entities,
)

# -- 1. span round-trip fuzz ------------------------------------------------
# generator-encoding constraints (FIXTURES.md §1): header first semantic
# span; tag text must contain '=' (a bare key re-serializes as 'key=' — the
# documented lossy corner); no newlines/spaces constraints on values.
_key = st.text(
    alphabet=st.characters(exclude_characters="=\x00", codec="utf-8"),
    min_size=1,
    max_size=8,
).filter(lambda s: s.strip() != "")
_val = st.text(
    alphabet=st.characters(exclude_characters="\x00", codec="utf-8"), max_size=12
)
_noise = st.one_of(
    st.tuples(st.just("text"), _val, st.just("")),
    st.tuples(st.just("media"), _val, st.just("img://x/1")),
)


@st.composite
def _doc(draw, doc_id):
    is_node = draw(st.booleans())
    osm_id = draw(st.integers(min_value=1, max_value=2**40))
    ts = "2013-01-01T00:00:00Z"
    if is_node:
        lat = draw(st.floats(min_value=-85, max_value=85, allow_nan=False))
        lon = draw(st.floats(min_value=-179, max_value=179, allow_nan=False))
        header = f"node {osm_id} {lat!r} {lon!r} {ts}"
    else:
        header = f"way {osm_id} {ts}"
    spans = [("header", header, "")]
    for k, v in draw(st.lists(st.tuples(_key, _val), max_size=4)):
        spans.append(("tag", f"{k}={v}", ""))
    if not is_node:
        for r in draw(st.lists(st.integers(1, 2**40), max_size=4)):
            spans.append(("ref", str(r), ""))
    # interleave noise at random positions (never before nothing — offsets
    # are positional, any position is legal)
    for noise in draw(st.lists(_noise, max_size=3)):
        pos = draw(st.integers(0, len(spans)))
        spans.insert(pos, noise)
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ],
    }


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.data())
def test_span_roundtrip_fuzz(spark, data):
    docs = [data.draw(_doc(f"d{i}")) for i in range(4)]
    df = spark.createDataFrame(
        docs,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    rebuilt = serialize_entities(parse_documents(df))
    orig = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in df.collect()}
    new = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in rebuilt.collect()}
    assert orig == new


# -- 2. covering ⊇ reference acceptance, in bulk ---------------------------
def test_covering_superset_of_reference_bbox_predicate(spark):
    from osmi_addresses_spark import MAXDIST
    from osmi_addresses_spark.functions import geom_sql as G
    from osmi_addresses_spark.functions.cells import cell_of, covering_cells

    n = 100_000
    rnd = lambda c, lo, hi: (F.pmod(F.xxhash64(F.col("id"), F.lit(c)), 100_000) / 100_000) * (hi - lo) + lo  # noqa: E731
    cases = spark.range(n).select(
        "id",
        rnd(1, -170.0, 170.0).alias("lon1"),
        rnd(2, -80.0, 80.0).alias("lat1"),
        (rnd(3, -0.2, 0.2)).alias("dlon"),
        (rnd(4, -0.2, 0.2)).alias("dlat"),
        (rnd(5, -0.015, 0.015)).alias("px"),
        (rnd(6, -0.015, 0.015)).alias("py"),
    )
    w = F.least("lon1", F.col("lon1") + F.col("dlon"))
    e = F.greatest("lon1", F.col("lon1") + F.col("dlon"))
    s = F.least("lat1", F.col("lat1") + F.col("dlat"))
    nn = F.greatest("lat1", F.col("lat1") + F.col("dlat"))
    # candidate point near the bbox edge (the adversarial region)
    plon = F.col("lon1") + F.col("dlon") + F.col("px")
    plat = F.col("lat1") + F.col("dlat") + F.col("py")
    cases = cases.select(
        w.alias("w"), e.alias("e"), s.alias("s"), nn.alias("n"),
        plon.alias("plon"), plat.alias("plat"),
    )
    # quantize exactly like the street index does (G11/G12), then apply the
    # reference predicate on the dequantized float32 bbox
    accepted = G.is_point_near_bbox(
        G.lat2int16(F.col("n"), True),
        G.lon2int16(F.col("e"), True),
        G.lat2int16(F.col("s"), False),
        G.lon2int16(F.col("w"), False),
        F.col("plon"), F.col("plat"), MAXDIST,
    )
    covered = F.array_contains(
        covering_cells(F.col("w"), F.col("e"), F.col("s"), F.col("n"), MAXDIST),
        cell_of(F.col("plon"), F.col("plat")),
    )
    violations = cases.filter(accepted & ~covered).count()
    n_accepted = cases.filter(accepted).count()
    assert n_accepted > 1000, "fixture should exercise the accepted region"
    assert violations == 0, f"{violations} accepted points missed by the covering"


# -- tiles + haversine fuzz vs pure-python references ----------------------
def _py_tile(lon, lat, z):
    n = float(1 << z)
    xc = (lon + 180.0) / 360.0 * n
    lr = math.radians(lat)
    yc = (1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr)) / math.pi) / 2.0 * n
    hi = (1 << z) - 1

    def clamp(v):
        return max(0, min(int(math.floor(v)), hi))

    return clamp(xc), clamp(yc), xc, yc


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
            st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_tile_xy_fuzz_vs_python(spark, pts):
    """Spark tile_xy == the pure-python slippy formula on arbitrary coords.
    JVM and libm transcendentals may differ in the last ulp, so a point
    whose CONTINUOUS tile coordinate sits within 1e-9 of an integer is
    allowed to land one tile off; everywhere else the match is exact."""
    from osmi_addresses_spark.functions.tiles import tile_xy

    df = spark.createDataFrame(pts, "lon double, lat double")
    for z in (2, 11):
        xt, yt = tile_xy(F.col("lon"), F.col("lat"), z)
        got = df.select("lon", "lat", xt.alias("xt"), yt.alias("yt")).collect()
        for r in got:
            wx, wy, xc, yc = _py_tile(r["lon"], r["lat"], z)
            for g, w, c in ((r["xt"], wx, xc), (r["yt"], wy, yc)):
                if min(c % 1.0, 1.0 - c % 1.0) < 1e-9:
                    assert abs(g - w) <= 1, (r, z)
                else:
                    assert g == w, (r, z)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
            st.floats(min_value=-89.0, max_value=89.0, allow_nan=False),
            st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
            st.floats(min_value=-89.0, max_value=89.0, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_haversine_fuzz_vs_python(spark, quads):
    """haversine_m (Column expr) matches the same formula in python math to
    1e-9 relative (plus 1e-6 m absolute for near-zero distances)."""
    from osmi_addresses_spark.functions.geom_sql import MEAN_EARTH_R_M, haversine_m

    df = spark.createDataFrame(quads, "a double, b double, c double, d double")
    got = df.select(
        "a", "b", "c", "d",
        haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m"),
    ).collect()
    for r in got:
        h = (
            math.sin(math.radians(r["d"] - r["b"]) / 2) ** 2
            + math.cos(math.radians(r["b"]))
            * math.cos(math.radians(r["d"]))
            * math.sin(math.radians(r["c"] - r["a"]) / 2) ** 2
        )
        want = 2.0 * MEAN_EARTH_R_M * math.asin(math.sqrt(min(1.0, h)))
        assert abs(r["m"] - want) <= 1e-6 + 1e-9 * want, r


# -- BPE-ish tokenizer: Java-regex (Spark) vs RE2 (DuckDB) agreement --------
# The pattern is written with an explicit whitespace class precisely so the
# two engines tokenize identically; this fuzzes that claim on adversarial
# text (contractions, digit/symbol runs, accented latin, CJK, and \x0b —
# the code point where Java's \s and RE2's \s disagree).
_bpe_text = st.lists(
    st.sampled_from(
        list("abzAZ09 \t\n\r\f\x0b.,;:!?'-_éß的和🙂") + ["'s", "'ll", "don't"]
    ),
    max_size=40,
).map("".join)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_bpe_text, min_size=1, max_size=25))
def test_bpe_tokenizer_spark_matches_duckdb(spark, texts):
    import duckdb

    from osmi_addresses_spark.driver_queries import _BPE_PAT, _BPE_PAT_SQL

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), F.lit(0))
    nonws = F.filter(toks, lambda t: ~t.rlike(r"^[ \t\n\r\f]+$"))
    got = {r["id"]: r["toks"]
           for r in df.select("id", nonws.alias("toks")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(texts)])
    # the SQL-side pattern is the SHIPPED oracle literal, derived from
    # _BPE_PAT in driver_queries — one source of truth for both engines
    want = dict(con.execute(r"""
        SELECT id, list_filter(
          regexp_extract_all(text, """ + _BPE_PAT_SQL + r"""),
          x -> NOT regexp_matches(x, '^[ \t\n\r\f]+$')) FROM t""").fetchall())
    assert got == want
