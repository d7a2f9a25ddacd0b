"""Pure-python single-threaded oracle: an independent reimplementation of the
reference's two-pass semantics (/root/reference/osmi/*.hpp), used to golden-
compare the Spark engine's layer outputs row-for-row.

Control flow (scan order, multimap insertion order, strict-< argmin, the J6
last-wins bug, the interpolation cascade incl. overwrites) is implemented
directly from the C++ reading — NOT from the Spark code. Low-level float
kernels (centroid, linear referencing, mercator refine, bbox test) are shared
with the engine so both sides agree bit-for-bit; those kernels have their own
hand-computed unit tests.
"""

from __future__ import annotations

import math

import numpy as np

from osmi_addresses_spark.functions.geom_np import (
    is_point_near_bbox,
    lat2int16,
    lon2int16,
    min_segment_dist,
    refine_foot_point,
    ring_centroid,
    value_along_multi,
)

MAXDIST = 0.01
NAME_KEYS = ["name", "name:left", "name:right", "alt_name", "official_name", "short_name", "ref"]
ADDR7 = ["addr:street", "addr:housenumber", "addr:postcode", "addr:city",
         "addr:country", "addr:full", "addr:place"]
ADDRX_KEYS = [
    "addr:street", "addr:housenumber", "addr:full", "addr:conscriptionnumber",
    "addr:housename", "addr:place", "addr:postcode", "addr:flats", "addr:door",
    "addr:unit", "addr:floor", "addr:city", "addr:country", "addr:hamlet",
    "addr:suburb", "addr:district", "addr:subdistrict", "addr:province",
    "addr:region", "addr:state",
]


def _atoi(s: str) -> int:
    i, n = 0, len(s)
    while i < n and s[i].isspace():
        i += 1
    j = i
    if j < n and s[j] in "+-":
        j += 1
    k = j
    while k < n and s[k].isdigit():
        k += 1
    if k == j:
        return 0
    return int(s[i:k])


def _isalpha_ascii(ch: str) -> bool:
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z")


class Oracle:
    def __init__(self, world):
        self.nodes = world.nodes  # already id-sorted
        self.ways = world.ways
        self.node_by_id = {n["id"]: n for n in self.nodes}
        self.layers: dict[str, list[dict]] = {
            k: []
            for k in [
                "connection_line", "nearest_points", "nearest_roads", "nearest_areas",
                "interpolation", "nodes_with_addresses", "ways_with_addresses",
                "ways_with_postal_code", "entrances", "addrx_on_nonclosed_way", "buildings",
            ]
        }
        self._roads_written: set[int] = set()
        self._areas_written: set[int] = set()

    # ---------------------------------------------------------------- helpers
    def way_coords(self, way):
        pts = []
        for r in way["refs"]:
            n = self.node_by_id.get(r)
            if n is None:
                return None
            pts.append((n["lon"], n["lat"]))
        return pts

    def is_closed(self, way):
        return way["refs"][0] == way["refs"][-1]

    def nonzero_length(self, coords):
        if coords is None or len(coords) < 2:
            return False
        return any(c[0] != coords[0][0] or c[1] != coords[0][1] for c in coords)

    # ------------------------------------------------------------------ pass 1
    def pass1(self):
        self.n2h_area: dict[str, list] = {}
        self.n2h_nonarea: dict[str, list] = {}
        self.n2p_nody: dict[str, list] = {}
        self.n2p_wayy: dict[str, list] = {}
        self.interp_node_set: set[int] = set()

        for n in self.nodes:  # FirstHandler::node
            if "place" in n["tags"] and "name" in n["tags"]:
                self.n2p_nody.setdefault(n["tags"]["name"], []).append(
                    (n["id"], n["lon"], n["lat"])
                )
        for w in self.ways:  # FirstHandler::way
            if len(w["refs"]) < 2:
                continue
            if "addr:interpolation" in w["tags"]:
                self.interp_node_set.add(w["refs"][0])
                self.interp_node_set.add(w["refs"][-1])
            coords = self.way_coords(w)
            if "highway" in w["tags"]:
                if coords is None:
                    continue  # invalid_location caught: skips rest of way()
                names = sorted({w["tags"][k] for k in NAME_KEYS if k in w["tags"]})
                lats = [c[1] for c in coords]
                lons = [c[0] for c in coords]
                entry = {
                    "way_id": w["id"],
                    "bbox": (
                        lat2int16(max(lats), True),
                        lon2int16(max(lons), True),
                        lat2int16(min(lats), False),
                        lon2int16(min(lons), False),
                    ),
                    "coords": coords,
                    "lastchange": w["ts"],
                }
                area = w["tags"].get("area")
                side = (
                    self.n2h_area
                    if area in ("yes", "true") and self.is_closed(w)
                    else self.n2h_nonarea
                )
                for name in names:
                    side.setdefault(name, []).append(entry)
            if "place" in w["tags"] and "name" in w["tags"] and self.is_closed(w):
                if coords is None:
                    continue
                clon, clat = ring_centroid(
                    np.array([c[0] for c in coords]), np.array([c[1] for c in coords])
                )
                self.n2p_wayy.setdefault(w["tags"]["name"], []).append((w["id"], clon, clat))

    # -------------------------------------------------------------- matching
    def get_closest_way(self, plon, plat, name):
        best = None
        best_dist = math.inf
        for side, is_area in ((self.n2h_area, True), (self.n2h_nonarea, False)):
            for e in side.get(name, []):
                bn, be, bs, bw = e["bbox"]
                if not is_point_near_bbox(bn, be, bs, bw, plon, plat, MAXDIST):
                    continue
                d = min_segment_dist(
                    np.array([c[0] for c in e["coords"]], dtype=np.float64),
                    np.array([c[1] for c in e["coords"]], dtype=np.float64),
                    plon,
                    plat,
                )
                if d < best_dist:
                    best = (e, is_area)
                    best_dist = d
        return best

    def get_closest_place(self, plon, plat, name):
        """The J6 bug: best_dist never updated → last candidate < MAXDIST
        wins; wayy side scanned after nody."""
        best = None
        for side, is_nody in ((self.n2p_nody, True), (self.n2p_wayy, False)):
            for obj_id, qlon, qlat in side.get(name, []):
                d = math.sqrt((qlon - plon) ** 2 + (qlat - plat) ** 2)
                if d < MAXDIST:
                    best = (qlon, qlat, is_nody)
        return best

    def handle_street(self, plon, plat, objectid, obj_type, addrname):
        """ConnectionLinePreprocessor::handle_connection_line_street."""
        got = self.get_closest_way(plon, plat, addrname)
        if got is None:
            return ""
        e, is_area = got
        lons = np.array([c[0] for c in e["coords"]])
        lats = np.array([c[1] for c in e["coords"]])
        flon, flat = refine_foot_point(lons, lats, plon, plat)
        self.layers["connection_line"].append(
            {
                "node_id": str(objectid) if obj_type == "node" else None,
                "way_id": str(objectid) if obj_type == "way" else None,
                "geom": [(plon, plat), (flon, flat)],
            }
        )
        if is_area:
            if e["way_id"] not in self._areas_written:
                self._areas_written.add(e["way_id"])
                self.layers["nearest_areas"].append(
                    {
                        "way_id": str(e["way_id"]),
                        "name": addrname,
                        "lastchange": e["lastchange"],
                        "geom": list(e["coords"]),
                    }
                )
        else:
            if e["way_id"] not in self._roads_written:
                self._roads_written.add(e["way_id"])
                self.layers["nearest_roads"].append(
                    {
                        "way_id": str(e["way_id"]),
                        "name": addrname,
                        "lastchange": e["lastchange"],
                        "geom": list(e["coords"]),
                    }
                )
        self.layers["nearest_points"].append({"way_id": str(e["way_id"]), "geom": (flon, flat)})
        return "1"

    def handle_place(self, plon, plat, obj_type, addrname):
        got = self.get_closest_place(plon, plat, addrname)
        if got is None:
            return None
        qlon, qlat, is_nody = got
        self.layers["connection_line"].append(
            {
                "node_id": "0" if obj_type == "node" else None,
                "way_id": "0" if obj_type == "way" else None,
                "geom": [(plon, plat), (qlon, qlat)],
            }
        )
        return is_nody

    def has_highway(self, name):
        return name in self.n2h_area or name in self.n2h_nonarea

    def has_place(self, name):
        return name in self.n2p_nody or name in self.n2p_wayy

    # ------------------------------------------------------------------ pass 2
    def pass2(self):
        self.interp_node_map: dict[int, dict] = {}
        for n in self.nodes:
            self._node2(n)
        for w in self.ways:
            self._way2(w)

    def _node2(self, n):
        t = n["tags"]
        # entrances
        if "entrance" in t or t.get("building") == "entrance":
            self.layers["entrances"].append(
                {
                    "node_id": str(n["id"]),
                    "lastchange": n["ts"],
                    "entrance": t.get("entrance"),
                    "geom": (n["lon"], n["lat"]),
                }
            )
        road_id, nody_id, wayy_id = "", "", ""
        street = t.get("addr:street")
        if street and self.has_highway(street):
            road_id = self.handle_street(n["lon"], n["lat"], n["id"], "node", street)
        if street and self.has_place(street):
            got = self.handle_place(n["lon"], n["lat"], "node", street)
            if got is not None:
                if got:
                    nody_id = "1"
                else:
                    wayy_id = "1"
        place = t.get("addr:place")
        if place and self.has_place(place):
            got = self.handle_place(n["lon"], n["lat"], "node", place)
            if got is not None:
                if got:
                    nody_id = "1"
                else:
                    wayy_id = "1"
        if any(k in t for k in ADDR7):
            self.layers["nodes_with_addresses"].append(
                {
                    "node_id": str(n["id"]),
                    "way_id": None,
                    "ip_id": None,
                    "is_ip": 0,
                    "street": t.get("addr:street"),
                    "houseno": t.get("addr:housenumber"),
                    "postcode": t.get("addr:postcode"),
                    "city": t.get("addr:city"),
                    "country": t.get("addr:country"),
                    "fulladdr": t.get("addr:full"),
                    "place": t.get("addr:place"),
                    "road_id": road_id or None,
                    "nody_place_id": nody_id or None,
                    "wayy_place_id": wayy_id or None,
                    "lastchange": n["ts"],
                    "geom": (n["lon"], n["lat"]),
                }
            )
        if n["id"] in self.interp_node_set:
            self.interp_node_map[n["id"]] = {k: t.get(k, "") for k in ADDR7}

    def _way2(self, w):
        coords = self.way_coords(w)
        if not self.nonzero_length(coords):
            return
        t = w["tags"]
        self._interp(w, coords)
        # addrx_on_nonclosed_way
        if not self.is_closed(w) and any(k in t for k in ADDRX_KEYS):
            self.layers["addrx_on_nonclosed_way"].append(
                {"way_id": str(w["id"]), "lastchange": w["ts"], "geom": list(coords)}
            )
        # ways_with_addresses
        if "building" in t and self.is_closed(w) and (
            "addr:street" in t or "addr:housenumber" in t or "addr:place" in t
        ):
            self.layers["ways_with_addresses"].append(
                {
                    "way_id": str(w["id"]),
                    "street": t.get("addr:street"),
                    "houseno": t.get("addr:housenumber"),
                    "postcode": t.get("addr:postcode"),
                    "city": t.get("addr:city"),
                    "country": t.get("addr:country"),
                    "fulladdr": t.get("addr:full"),
                    "place": t.get("addr:place"),
                    "lastchange": w["ts"],
                    "geom": list(coords),
                }
            )
        if "postal_code" in t:
            self.layers["ways_with_postal_code"].append(
                {
                    "way_id": str(w["id"]),
                    "lastchange": w["ts"],
                    "postalcode": t["postal_code"],
                    "geom": list(coords),
                }
            )
        # process_way + nwa way row (closed only for matching)
        road_id, nody_id, wayy_id = "", "", ""
        if self.is_closed(w):
            clon, clat = ring_centroid(
                np.array([c[0] for c in coords]), np.array([c[1] for c in coords])
            )
            street = t.get("addr:street")
            if street and self.has_highway(street):
                road_id = self.handle_street(clon, clat, w["id"], "way", street)
            place = t.get("addr:place")
            if place and self.has_place(place):
                got = self.handle_place(clon, clat, "way", place)
                if got is not None:
                    if got:
                        nody_id = "1"
                    else:
                        wayy_id = "1"
            if "building" in t and ("addr:street" in t or "addr:housenumber" in t):
                self.layers["nodes_with_addresses"].append(
                    {
                        "node_id": None,
                        "way_id": str(w["id"]),
                        "ip_id": None,
                        "is_ip": 0,
                        "street": t.get("addr:street"),
                        "houseno": t.get("addr:housenumber"),
                        "postcode": t.get("addr:postcode"),
                        "city": t.get("addr:city"),
                        "country": t.get("addr:country"),
                        "fulladdr": t.get("addr:full"),
                        "place": t.get("addr:place"),
                        "road_id": road_id or None,
                        "nody_place_id": nody_id or None,
                        "wayy_place_id": wayy_id or None,
                        "lastchange": w["ts"],
                        "geom": (clon, clat),
                    }
                )

    # ------------------------------------------------------------ interpolation
    def _interp(self, w, coords):
        t = w["tags"]
        typ = t.get("addr:interpolation")
        if typ is None:
            return
        first_id, last_id = w["refs"][0], w["refs"][-1]
        ftags = self.interp_node_map.get(first_id, {k: "" for k in ADDR7})
        ltags = self.interp_node_map.get(last_id, {k: "" for k in ADDR7})
        first_raw = ftags.get("addr:housenumber", "")
        last_raw = ltags.get("addr:housenumber", "")
        first = _atoi(first_raw) if first_raw else 0
        last = _atoi(last_raw) if last_raw else 0
        first_numeric = last_numeric = ""
        is_alpha_correct = False
        error = None
        if (
            typ == "alphabetic"
            and len(first_raw) >= 2
            and len(last_raw) >= 2
            and not _isalpha_ascii(first_raw[-2])
            and not _isalpha_ascii(last_raw[-2])
        ):
            if _isalpha_ascii(first_raw[-1]) and _isalpha_ascii(last_raw[-1]):
                first_numeric = first_raw[:-1]
                last_numeric = last_raw[:-1]
                if first_numeric == last_numeric:
                    first = ord(first_raw[-1])
                    last = ord(last_raw[-1])
                    is_alpha_correct = True
                else:
                    error = "numeric parts of housenumbers not identical"
            else:
                error = "no alphabetic part in addr:housenumber"

        def digits_len(v):
            return math.floor(math.log10(v)) + 1 if v > 0 else -1

        absdiff = abs(first - last)
        if typ not in ("all", "even", "odd", "alphabetic"):
            error = "unknown interpolation type"
        elif typ != "alphabetic" and (
            first <= 0
            or last <= 0
            or len(first_raw) != digits_len(first)
            or len(last_raw) != digits_len(last)
        ):
            error = "endpoint has wrong format"
        elif absdiff > 1000:
            error = "range too large"
        elif (typ in ("even", "odd") and absdiff == 2) or (typ == "all" and absdiff == 1):
            error = "needless interpolation"
        elif typ == "even" and (first % 2 == 1 or last % 2 == 1):
            error = "interpolation even but number odd"
        elif typ == "odd" and (first % 2 == 0 or last % 2 == 0):
            error = "interpolation odd but number even"
        elif any(
            ftags.get(k, "") != ltags.get(k, "")
            for k in ["addr:street", "addr:postcode", "addr:city", "addr:country",
                      "addr:full", "addr:place"]
        ):
            error = "different tags on endpoints"
        elif w["refs"][0] == w["refs"][-1]:
            error = "interpolation is a closed way"
        elif typ in ("all", "odd", "even") or is_alpha_correct:
            self._densify(w, coords, typ, first, last, first_numeric, ftags)

        self.layers["interpolation"].append(
            {
                "way_id": str(w["id"]),
                "typename": typ,
                "firstid": str(first_id),
                "lastid": str(last_id),
                "firstno": first_raw or None,
                "lastno": last_raw or None,
                "error": error,
                "lastchange": w["ts"],
                "geom": list(coords),
            }
        )

    def _densify(self, w, coords, typ, first, last, first_numeric, ftags):
        if first == last:
            return
        inc = 2 if typ in ("even", "odd") else 1
        lons = np.array([c[0] for c in coords])
        lats = np.array([c[1] for c in coords])
        seg = np.hypot(np.diff(lons), np.diff(lats))
        length = 0.0
        for sv in seg:
            length += float(sv)
        if first < last:
            lower = first
            frac = 1.0 / float(last - first)
            nrs = list(range(first + inc, last, inc))
            dists = [(nr - lower) * frac * length for nr in nrs]
        else:
            lower = last
            frac = 1.0 / float(first - last)
            nrs = list(range(first - inc, lower, -inc))
            dists = [(1.0 - ((nr - lower) * frac)) * length for nr in nrs]
        if not nrs:
            return
        plon, plat = value_along_multi(lons, lats, np.array(dists, dtype=np.float64))
        street = ftags.get("addr:street", "")
        for k, nr in enumerate(nrs):
            road_id = ""
            if self.has_highway(street):
                road_id = self.handle_street(float(plon[k]), float(plat[k]), 0, "ip", street)
            houseno = str(nr) if typ != "alphabetic" else first_numeric + chr(nr)
            self.layers["nodes_with_addresses"].append(
                {
                    "node_id": None,
                    "way_id": None,
                    "ip_id": None,
                    "is_ip": 1,
                    "street": street,
                    "houseno": houseno,
                    "postcode": ftags.get("addr:postcode", ""),
                    "city": ftags.get("addr:city", ""),
                    "country": ftags.get("addr:country", ""),
                    "fulladdr": ftags.get("addr:full", ""),
                    "place": ftags.get("addr:place", ""),
                    "road_id": road_id or None,
                    "nody_place_id": None,
                    "wayy_place_id": None,
                    "lastchange": None,
                    "geom": (float(plon[k]), float(plat[k])),
                }
            )


def run_reference(world) -> dict[str, list[dict]]:
    o = Oracle(world)
    o.pass1()
    o.pass2()
    return o.layers
