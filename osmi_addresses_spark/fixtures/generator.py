"""Deterministic synthetic OSM-world generator (FIXTURES.md §1-§3).

Generates a world of T "towns" (T scales with sf), each containing every
code-path case of the reference fixture /root/reference/test/osmi-testzone.osm
(streets incl. areas / multi-name / degenerate, addr nodes for every
match/not-found outcome, places incl. the J6 last-wins bug cases, buildings,
entrances, postal ways, one interpolation way per validation outcome), plus a
mass of generic address nodes along the town's main streets — "Hauptstraße"
is shared by every town and is the deliberate skew axis.

Everything is derived from integer arithmetic + a seeded RandomState: the
same (sf, seed) always produces byte-identical documents.

Encoding rule (FIXTURES.md §1): per document, semantic spans appear in order
header < tag* < ref*; noise spans (kind text/media) may be interleaved
anywhere; `offset` is the 0-based position of the span within the doc.
"""

from __future__ import annotations

import datetime
import json
import math
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import DOCUMENTS_ARROW

GEN_VERSION = 4  # bump to invalidate cached fixture parquet

LON0 = 8.78
LAT0 = 47.25
TOWN_W = 0.01  # degrees lon used by a town
TOWN_H = 0.005  # degrees lat used by a town
PITCH_LON = 0.04  # town grid pitch (far greater than MAXDIST + lon tolerance)
PITCH_LAT = 0.04

_EPOCH = datetime.datetime(2023, 1, 1)


def _ts(i: int) -> str:
    return (_EPOCH + datetime.timedelta(seconds=(i * 37) % (86400 * 365))).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


@dataclass
class World:
    nodes: list = field(default_factory=list)  # dict(id, lat, lon, tags, ts)
    ways: list = field(default_factory=list)  # dict(id, refs, tags, ts)


class _TownBuilder:
    def __init__(self, world: World, t: int, n_towns: int, rng: np.random.RandomState):
        self.w = world
        self.t = t
        self.rng = rng
        g = max(1, int(math.ceil(math.sqrt(n_towns))))
        self.lon0 = LON0 + PITCH_LON * (t % g)
        self.lat0 = LAT0 + PITCH_LAT * (t // g)
        base = (t + 1) * 1_000_000
        self._nid = base
        self._wid = base

    # -- primitive builders -------------------------------------------------
    def xy(self, u: float, v: float) -> tuple[float, float]:
        return (self.lon0 + u * TOWN_W, self.lat0 + v * TOWN_H)

    def node(self, u: float, v: float, tags: dict | None = None) -> int:
        self._nid += 1
        lon, lat = self.xy(u, v)
        self.w.nodes.append(
            {"id": self._nid, "lat": lat, "lon": lon, "tags": tags or {}, "ts": _ts(self._nid)}
        )
        return self._nid

    def way(self, refs: list[int], tags: dict) -> int:
        self._wid += 1
        self.w.ways.append({"id": self._wid, "refs": refs, "tags": tags, "ts": _ts(self._wid)})
        return self._wid

    def path(self, uvs: list[tuple[float, float]], tags: dict, close: bool = False) -> int:
        refs = [self.node(u, v) for u, v in uvs]
        if close:
            refs.append(refs[0])
        return self.way(refs, tags)

    # -- content ------------------------------------------------------------
    def build(self, n_mass: int):
        t = self.t
        # ---- streets (FirstHandler street-index cases) ----
        # main street shared across all towns (skew axis)
        self.path(
            [(u, 0.5) for u in (0.05, 0.275, 0.5, 0.725, 0.95)],
            {"highway": "residential", "name": "Hauptstraße"},
        )
        # a second way with the same name (argmin chooses between two ways)
        self.path(
            [(u, 0.56) for u in (0.05, 0.5, 0.95)],
            {"highway": "residential", "name": "Hauptstraße"},
        )
        self.path(
            [(0.3, v) for v in (0.1, 0.5, 0.9)],
            {"highway": "residential", "name": f"Bahnhofstrasse {t}"},
        )
        self.path(
            [(0.6, 0.2), (0.75, 0.33), (0.9, 0.45)],
            {"highway": "path", "name": f"Gartenweg {t}"},
        )
        # closed + area=yes -> area-side index entry
        ring = [
            (0.5 + 0.08 * math.cos(a * math.pi / 4), 0.3 + 0.08 * math.sin(a * math.pi / 4))
            for a in range(8)
        ]
        self.path(ring, {"highway": "pedestrian", "name": f"Ringstraße {t}", "area": "yes"}, close=True)
        # closed + area=true
        sq = [(0.70, 0.65), (0.80, 0.65), (0.80, 0.75), (0.70, 0.75)]
        self.path(sq, {"highway": "pedestrian", "name": f"Marktplatz {t}", "area": "true"}, close=True)
        # closed highway WITHOUT area tag -> nonarea side despite being closed
        sq2 = [(0.04, 0.60), (0.10, 0.60), (0.10, 0.68), (0.04, 0.68)]
        self.path(sq2, {"highway": "service", "name": f"Hofrunde {t}"}, close=True)
        # name:left / name:right / name -> 3 index entries for one way
        self.path(
            [(0.5, 0.85), (0.65, 0.85), (0.8, 0.85)],
            {
                "highway": "residential",
                "name": f"Split Rd {t}",
                "name:left": f"Left Rd {t}",
                "name:right": f"Right Rd {t}",
            },
        )
        # alt/official/short/ref names; duplicate values dedup to one entry
        self.path(
            [(0.9, v) for v in (0.55, 0.68, 0.8)],
            {
                "highway": "secondary",
                "name": f"Lange Straße {t}",
                "alt_name": f"Langestr {t}",
                "official_name": f"Lange Straße {t}",  # duplicate of name -> dedup (A2)
                "short_name": f"LS{t}",
                "ref": f"L{t}",
            },
        )
        # unnamed highway -> no index entry
        self.path([(0.1, 0.9), (0.2, 0.9)], {"highway": "track"})
        # zero-length named highway (2 identical refs): indexed in pass 1,
        # skipped by the nonzero-length guard in pass 2
        zn = self.node(0.05, 0.05)
        self.way([zn, zn], {"highway": "footway", "name": f"Punktweg {t}"})
        # 1-node way: ignored everywhere (size<2 in pass 1, zero length pass 2)
        self.way([self.node(0.06, 0.05)], {"highway": "footway", "name": f"Stummelweg {t}"})
        # dangling-ref way: only usable contribution would be geometry -> none
        self.way(
            [self.node(0.07, 0.05), 999_999_999_000 + t],
            {"highway": "footway", "name": f"Geisterpfad {t}"},
        )
        # street for the *next* town's street_not_found test
        self.path([(0.02, 0.02), (0.06, 0.02)], {"highway": "residential", "name": f"Nirgendwo {t}"})
        # street whose name collides with the town's place name
        self.path([(0.45, 0.62), (0.55, 0.62)], {"highway": "residential", "name": f"Dorf {t}"})

        # tie-break cases: three ways sharing one vertex, same name.
        # The addr node sits EXACTLY on the shared vertex: all candidates are
        # at segment distance 0.0 (an exact tie), so the area-first /
        # insertion-order tie-break is what decides — under the GEOS segment
        # metric an off-vertex point almost never ties.
        xs = self.node(0.15, 0.25)  # shared vertex
        tri = [self.node(0.13, 0.22), self.node(0.17, 0.22), xs]
        self.way(tri + [tri[0]], {"highway": "pedestrian", "name": f"Doppelgasse {t}", "area": "yes"})
        self.way([xs, self.node(0.12, 0.28)], {"highway": "residential", "name": f"Doppelgasse {t}"})
        self.way([xs, self.node(0.18, 0.28)], {"highway": "residential", "name": f"Doppelgasse {t}"})
        # nonarea-only insertion-order tie (again exactly on the vertex)
        xs2 = self.node(0.85, 0.25)
        self.way([xs2, self.node(0.82, 0.28)], {"highway": "residential", "name": f"Zwillingsweg {t}"})
        self.way([xs2, self.node(0.88, 0.28)], {"highway": "residential", "name": f"Zwillingsweg {t}"})
        self.node(0.15, 0.25, {"addr:street": f"Doppelgasse {t}", "addr:housenumber": "1"})
        self.node(0.85, 0.25, {"addr:street": f"Zwillingsweg {t}", "addr:housenumber": "2"})
        # off-vertex probes: segment distance (not vertex distance) must pick
        # the winner — the nearest *segment* belongs to a different way than
        # the nearest vertex for these points
        self.node(0.151, 0.253, {"addr:street": f"Doppelgasse {t}", "addr:housenumber": "3"})
        self.node(0.853, 0.251, {"addr:street": f"Zwillingsweg {t}", "addr:housenumber": "4"})
        # addr whose only same-name candidate is an area highway: a
        # guaranteed nearest_areas row under any selection metric
        self.node(0.75, 0.66, {"addr:street": f"Marktplatz {t}", "addr:housenumber": "5"})

        # ---- places ----
        self.node(0.5, 0.6, {"place": "village", "name": f"Dorf {t}"})
        self.node(0.52, 0.6, {"place": "hamlet", "name": f"Dorf {t}"})  # later nody, same name
        self.node(0.2, 0.7, {"place": "locality", "name": f"Altstadt {t}"})  # nody beaten by wayy
        alt1 = [(0.22, 0.72), (0.28, 0.72), (0.28, 0.78), (0.22, 0.78)]
        self.path(alt1, {"place": "suburb", "name": f"Altstadt {t}"}, close=True)
        alt2 = [(0.28, 0.76), (0.33, 0.76), (0.33, 0.81), (0.28, 0.81)]
        self.path(alt2, {"place": "suburb", "name": f"Altstadt {t}"}, close=True)  # last wayy wins
        # non-closed place way -> NOT in the place index
        self.path([(0.6, 0.9), (0.7, 0.9)], {"place": "suburb", "name": f"Neustadt {t}"})

        # ---- entrances ----
        for i, e in enumerate(["yes", "main", "service", "exit", "emergency"]):
            self.node(0.1 + 0.08 * i, 0.95, {"entrance": e})
        self.node(0.6, 0.95, {"building": "entrance"})  # entrance field stays NULL

        # ---- postal-code ways ----
        self.path([(0.05, 0.45), (0.3, 0.45)], {"postal_code": f"76{t % 90:02d}1"})
        self.path([(0.55, 0.45), (0.9, 0.45)], {"highway": "residential", "name": f"Poststraße {t}", "postal_code": f"76{t % 90:02d}2"})

        # ---- addr special nodes ----
        sp = {"addr:street": "Hauptstraße", "addr:housenumber": "901", "addr:postcode": "76001"}
        self.node(0.5, 0.52, sp)
        # street exists only ~1 lon degree away -> bbox prefilter fails -> street_not_found
        self.node(0.4, 0.4, {"addr:street": "Fernstraße", "addr:housenumber": "902"})
        # street name that exists nowhere -> gate fails -> street_not_found
        self.node(0.42, 0.4, {"addr:street": "Geisterweg", "addr:housenumber": "903"})
        # no addr:street but other addr tags -> no_addr_street
        self.node(0.44, 0.4, {"addr:housenumber": "904", "addr:postcode": "76002"})
        # place matches
        self.node(0.49, 0.58, {"addr:place": f"Dorf {t}", "addr:housenumber": "905"})
        self.node(0.24, 0.74, {"addr:place": f"Altstadt {t}", "addr:housenumber": "906"})
        self.node(0.46, 0.4, {"addr:place": "Phantomdorf", "addr:housenumber": "907"})
        self.node(0.48, 0.4, {"addr:place": "FernDorf", "addr:housenumber": "908"})
        # addr:street naming both a street and a place -> street match + place fallback
        self.node(0.5, 0.615, {"addr:street": f"Dorf {t}", "addr:housenumber": "909"})
        # addr:street naming only a place -> place fallback only (road_id stays unset)
        self.node(0.25, 0.73, {"addr:street": f"Altstadt {t}", "addr:housenumber": "910"})
        # both street and place tags
        self.node(0.52, 0.55, {"addr:street": "Hauptstraße", "addr:place": f"Dorf {t}", "addr:housenumber": "911"})

        # ---- buildings ----
        def bsq(cu, cv, r=0.006):
            return [(cu - r, cv - r), (cu + r, cv - r), (cu + r, cv + r), (cu - r, cv + r)]

        self.path(bsq(0.35, 0.52), {"building": "yes", "addr:street": "Hauptstraße", "addr:housenumber": "20", "addr:city": f"Town {t}"}, close=True)
        self.path(bsq(0.45, 0.57), {"building": "house", "addr:place": f"Dorf {t}"}, close=True)
        self.path(bsq(0.55, 0.52), {"building": "yes", "addr:housenumber": "22"}, close=True)
        # non-closed building way with addr tag -> addrx_on_nonclosed_way
        self.path([(0.6, 0.52), (0.62, 0.52), (0.62, 0.54)], {"building": "yes", "addr:housenumber": "23"})
        # non-closed way, exotic addr key -> addrx
        self.path([(0.64, 0.52), (0.66, 0.52)], {"addr:suburb": f"Altstadt {t}"})
        # closed NON-building way with addr:street -> connection line but no wwa/nwa row
        self.path(bsq(0.65, 0.56), {"amenity": "parking", "addr:street": "Hauptstraße", "addr:housenumber": "24"}, close=True)
        # closed building, street beyond reach -> wwa + nwa row with road_id NULL
        self.path(bsq(0.75, 0.52), {"building": "yes", "addr:street": "Fernstraße", "addr:housenumber": "25"}, close=True)

        # ---- interpolation ways (one per outcome; InterpolationWriter.hpp) ----
        self._interp(0.05, "all", "2", "8")  # valid: 3..7
        self._interp(0.07, "odd", "1", "9")  # valid: 3,5,7
        self._interp(0.09, "even", "2", "10")  # valid: 4,6,8
        self._interp(0.11, "alphabetic", "12a", "12e")  # valid: 12b..12d
        self._interp(0.13, "all", "9", "5")  # descending: 8,7,6 mirrored
        self._interp(0.15, "fancy", "2", "8")  # unknown interpolation type
        self._interp(0.17, "all", "2", "12%&")  # endpoint has wrong format
        self._interp(0.19, "all", "2", None)  # missing endpoint number -> wrong format
        self._interp(0.21, "all", "2", "2000")  # range too large
        self._interp(0.23, "all", "5", "6")  # needless interpolation
        self._interp(0.25, "even", "2", "4")  # needless interpolation
        self._interp(0.27, "even", "3", "7")  # even but number odd
        self._interp(0.29, "odd", "2", "6")  # odd but number even
        self._interp(0.31, "all", "2", "8", last_extra={"addr:city": "Elsewhere"})  # different tags
        self._interp(0.33, "alphabetic", "12", "14")  # no alphabetic part
        self._interp(0.35, "alphabetic", "12a", "14c")  # numeric parts not identical
        # alphabetic error overwritten by different-tags (cascade order)
        self._interp(0.37, "alphabetic", "12", "14", last_extra={"addr:city": "Elsewhere"})
        # closed interpolation way
        a = self.node(0.39, 0.10, {"addr:housenumber": "2", "addr:street": "Hauptstraße"})
        b = self.node(0.40, 0.10)
        c = self.node(0.40, 0.12)
        self.way([a, b, c, a], {"addr:interpolation": "all"})
        # valid interp whose street is unknown -> is_ip rows with road_id NULL
        self._interp(0.41, "all", "30", "34", street="Geisterweg")
        # valid interp with no street tag at all -> is_ip rows, no match attempt
        self._interp(0.43, "all", "40", "44", street=None)
        # leading-zero endpoint -> wrong format ("07" len 2 != floor(log10(7))+1)
        self._interp(0.45, "all", "07", "11")
        # interp way with a dangling ref: registers endpoints in pass 1 but is
        # skipped entirely in pass 2
        d1 = self.node(0.47, 0.10, {"addr:housenumber": "50", "addr:street": "Hauptstraße"})
        self.way([d1, 999_999_998_000 + t], {"addr:interpolation": "all"})
        # generic valid interps
        for k in range(3):
            self._interp(0.55 + 0.06 * k, "all", str(2 + 2 * k), str(14 + 2 * k))

        # ---- mass generic addr nodes ----
        u = self.rng.uniform(0.06, 0.94, n_mass)
        main = self.rng.rand(n_mass) < 0.7
        v = np.where(
            main,
            0.5 + self.rng.uniform(-0.04, 0.04, n_mass),
            0.5,  # placeholder, replaced below for vertical street
        )
        uu = np.where(main, u, 0.3 + self.rng.uniform(-0.02, 0.02, n_mass))
        vv = np.where(main, v, self.rng.uniform(0.12, 0.88, n_mass))
        hn = (np.arange(n_mass) % 197) + 1
        for i in range(n_mass):
            tags = {
                "addr:street": "Hauptstraße" if main[i] else f"Bahnhofstrasse {t}",
                "addr:housenumber": str(int(hn[i])),
            }
            if i % 3 == 0:
                tags["addr:postcode"] = f"76{t % 90:02d}{i % 10}"
            if i % 4 == 0:
                tags["addr:city"] = f"Town {t}"
            if i % 10 == 0:
                tags["addr:country"] = "DE"
            if i % 17 == 0:
                tags["addr:full"] = f"Full Addr {i}, Town {t}"
            self.node(float(uu[i]), float(vv[i]), tags)

    def _interp(self, v, typ, first, last, street="Hauptstraße", last_extra=None):
        base = {"addr:street": street, "addr:postcode": "76000", "addr:city": "Interptown"}
        if street is None:
            base = {"addr:postcode": "76000", "addr:city": "Interptown"}
        ft = dict(base)
        if first is not None:
            ft["addr:housenumber"] = first
        lt = dict(base)
        if last is not None:
            lt["addr:housenumber"] = last
        if last_extra:
            lt.update(last_extra)
        a = self.node(0.05, v, ft)
        m = self.node(0.05 + 0.06, v + 0.004)  # interior vertex, slight bend
        b = self.node(0.05 + 0.12, v, lt)
        self.way([a, m, b], {"addr:interpolation": typ})


def generate_world(sf: float, seed: int = 42, n_mass_per_town: int | None = None) -> World:
    """Build the deterministic world for a scale factor."""
    n_towns = max(1, int(round(sf * 1000)))
    if n_mass_per_town is None:
        n_mass_per_town = 1200
    world = World()
    # global far-away entities (street_not_found / place-too-far targets)
    far_nid = 900_000_001
    world.nodes.append({"id": far_nid, "lat": LAT0, "lon": LON0 - 1.0, "tags": {}, "ts": _ts(far_nid)})
    world.nodes.append({"id": far_nid + 1, "lat": LAT0, "lon": LON0 - 0.999, "tags": {}, "ts": _ts(far_nid + 1)})
    world.nodes.append(
        {"id": far_nid + 2, "lat": LAT0, "lon": LON0 - 0.998, "tags": {"place": "village", "name": "FernDorf"}, "ts": _ts(far_nid + 2)}
    )
    world.ways.append(
        {"id": 900_000_001, "refs": [far_nid, far_nid + 1], "tags": {"highway": "residential", "name": "Fernstraße"}, "ts": _ts(900_000_001)}
    )
    for t in range(n_towns):
        rng = np.random.RandomState(seed + t)
        _TownBuilder(world, t, n_towns, rng).build(n_mass_per_town)
    # reference scan order: id order within type (OSM files are id-sorted)
    world.nodes.sort(key=lambda n: n["id"])
    world.ways.sort(key=lambda w: w["id"])
    return world


# --------------------------------------------------------------- documents
def world_to_documents(world: World) -> pa.Table:
    """Encode the world as the interleaved-document table (FIXTURES.md §1)."""
    doc_ids: list[str] = []
    kinds: list[str] = []
    texts: list[str] = []
    media: list[str] = []
    offs: list[int] = []
    lengths: list[int] = []

    def emit(doc_id: str, spans: list[tuple[str, str, str]]):
        doc_ids.append(doc_id)
        lengths.append(len(spans))
        for i, (k, tx, m) in enumerate(spans):
            kinds.append(k)
            texts.append(tx)
            media.append(m)
            offs.append(i)

    for n in world.nodes:
        spans = [("header", f"node {n['id']} {n['lat']!r} {n['lon']!r} {n['ts']}", "")]
        if n["id"] % 3 == 0:
            spans.append(("text", f"note for node {n['id']}", ""))
        for k, v in n["tags"].items():
            spans.append(("tag", f"{k}={v}", ""))
        if n["id"] % 5 == 0:
            spans.append(("media", f"photo of {n['id']}", f"img://n{n['id']}/0"))
        emit(f"n{n['id']}", spans)
    for w in world.ways:
        spans = [("header", f"way {w['id']} {w['ts']}", "")]
        for k, v in w["tags"].items():
            spans.append(("tag", f"{k}={v}", ""))
        if w["id"] % 4 == 0:
            spans.insert(1, ("text", f"note for way {w['id']}", ""))
        for r in w["refs"]:
            spans.append(("ref", str(r), ""))
        if w["id"] % 6 == 0:
            spans.append(("media", f"aerial of {w['id']}", f"img://w{w['id']}/0"))
        emit(f"w{w['id']}", spans)

    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(media, pa.string()),
            pa.array(offs, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    offsets = pa.array(np.concatenate([[0], np.cumsum(lengths)]), pa.int32())
    spans_col = pa.ListArray.from_arrays(offsets, span_struct)
    tbl = pa.table({"doc_id": pa.array(doc_ids, pa.string()), "spans": spans_col})
    return tbl.cast(DOCUMENTS_ARROW)


# Note on the text "note for way" span sitting between header and tags: the
# encoding rule only fixes the relative order of semantic spans, noise can sit
# anywhere — the parser records its offset and reproduces it exactly.


def fixture_dir(sf: float, root: str = "/root/repo/fixtures") -> str:
    return os.path.join(root, f"osm_sf{sf:g}_v{GEN_VERSION}")


def generate_world_chunk(
    towns: range, n_towns: int, seed: int, with_far: bool, n_mass_per_town: int
) -> World:
    """Chunk of towns (ids are town-local, so chunking is order-independent)."""
    world = World()
    if with_far:
        far_nid = 900_000_001
        world.nodes.append({"id": far_nid, "lat": LAT0, "lon": LON0 - 1.0, "tags": {}, "ts": _ts(far_nid)})
        world.nodes.append({"id": far_nid + 1, "lat": LAT0, "lon": LON0 - 0.999, "tags": {}, "ts": _ts(far_nid + 1)})
        world.nodes.append(
            {"id": far_nid + 2, "lat": LAT0, "lon": LON0 - 0.998, "tags": {"place": "village", "name": "FernDorf"}, "ts": _ts(far_nid + 2)}
        )
        world.ways.append(
            {"id": 900_000_001, "refs": [far_nid, far_nid + 1], "tags": {"highway": "residential", "name": "Fernstraße"}, "ts": _ts(900_000_001)}
        )
    for t in towns:
        rng = np.random.RandomState(seed + t)
        _TownBuilder(world, t, n_towns, rng).build(n_mass_per_town)
    world.nodes.sort(key=lambda n: n["id"])
    world.ways.sort(key=lambda w: w["id"])
    return world


def _write_fixture_chunk(args: tuple) -> tuple[int, int, int]:
    docs_dir, start, end, n_towns, seed, n_mass = args
    world = generate_world_chunk(
        range(start, end), n_towns, seed, with_far=(start == 0), n_mass_per_town=n_mass
    )
    tbl = world_to_documents(world)
    pq.write_table(
        tbl, os.path.join(docs_dir, f"part-{start:06d}.parquet"), row_group_size=16384
    )
    return tbl.num_rows, len(world.nodes), len(world.ways)


def write_fixture(sf: float, out_dir: str | None = None, seed: int = 42) -> str:
    """Generate (if absent) the documents parquet for a scale factor.

    Chunked by groups of towns so generation memory stays flat at any sf
    (the per-town id blocks make chunking order-independent)."""
    out_dir = out_dir or fixture_dir(sf)
    marker = os.path.join(out_dir, "meta.json")
    if os.path.exists(marker):
        return out_dir
    n_towns = max(1, int(round(sf * 1000)))
    chunk = 50
    # `documents.parquet` is a DIRECTORY of part files (committed small
    # fixtures remain single files — Spark reads both): chunks generate and
    # write in parallel, and multiple files give the parse stage full input
    # parallelism from the first task. meta.json stays the commit marker —
    # a crashed generation leaves no marker and is redone from scratch.
    docs_dir = os.path.join(out_dir, "documents.parquet")
    if os.path.isfile(docs_dir):
        os.remove(docs_dir)
    os.makedirs(docs_dir, exist_ok=True)
    starts = list(range(0, n_towns, chunk))
    n_docs = n_nodes = n_ways = 0
    from concurrent.futures import ProcessPoolExecutor

    jobs = [
        (docs_dir, s, min(s + chunk, n_towns), n_towns, seed, 1200) for s in starts
    ]
    if len(jobs) == 1:
        results = [_write_fixture_chunk(jobs[0])]
    else:
        with ProcessPoolExecutor(max_workers=min(16, os.cpu_count() or 4)) as ex:
            results = list(ex.map(_write_fixture_chunk, jobs))
    for nd, nn, nw in results:
        n_docs += nd
        n_nodes += nn
        n_ways += nw
    meta = {
        "sf": sf,
        "seed": seed,
        "gen_version": GEN_VERSION,
        "n_docs": n_docs,
        "n_nodes": n_nodes,
        "n_ways": n_ways,
    }
    with open(marker, "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    d = write_fixture(args.sf, args.out)
    print(d)
