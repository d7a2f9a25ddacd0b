"""Fixed StructTypes for the engine (SURVEY.md §1.4: no schema inference).

Layer schemas mirror the reference writer field configs
(osmi/NodesWithAddressesWriter.hpp:21-37, osmi/InterpolationWriter.hpp:27-36,
etc.): all attribute fields string except is_ip (int); unset fields are NULL;
ids are formatted into strings. Geometry is coordinate arrays/structs
(lon, lat) in CRS84 — no geometry objects.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# ---------------------------------------------------------------- documents
SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
    ]
)

SPAN_ARROW = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS_ARROW = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_ARROW)),
    ]
)

# ------------------------------------------------------------ parsed entities
# One row per document. `tags_kv` keeps the original tag order (for lossless
# re-serialization); `tags` is the map view used by queries. `noise` carries
# the interleaved text/media spans untouched (with original offsets).
ENTITY_ARROW = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("entity", pa.string()),  # 'node' | 'way'
        pa.field("osm_id", pa.int64()),
        pa.field("lat", pa.float64()),  # nodes only
        pa.field("lon", pa.float64()),
        pa.field("lastchange", pa.string()),
        pa.field("tags", pa.map_(pa.string(), pa.string())),
        pa.field(
            "tags_kv",
            pa.list_(
                pa.struct([pa.field("key", pa.string()), pa.field("value", pa.string())])
            ),
        ),
        pa.field("refs", pa.list_(pa.int64())),  # ways only
        pa.field("noise", pa.list_(SPAN_ARROW)),
    ]
)

ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("osm_id", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lastchange", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "tags_kv",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), False),
                        T.StructField("value", T.StringType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("refs", T.ArrayType(T.LongType()), True),
        T.StructField("noise", T.ArrayType(SPAN_STRUCT), True),
    ]
)

# Minimal entity projection for the pipeline hot path: the layer pipeline
# drops doc_id/tags_kv/noise immediately, so the parse UDF can skip building
# and shipping them (≈half the Arrow IPC volume and several large string
# filter kernels per batch — measurably better multi-worker scaling).
ENTITY_MIN_ARROW = pa.schema([f for f in ENTITY_ARROW if f.name not in ("doc_id", "tags_kv", "noise")])
ENTITY_MIN_SCHEMA = T.StructType(
    [f for f in ENTITY_SCHEMA.fields if f.name not in ("doc_id", "tags_kv", "noise")]
)

POINT = T.StructType(
    [T.StructField("lon", T.DoubleType(), True), T.StructField("lat", T.DoubleType(), True)]
)
LINESTRING = T.ArrayType(POINT)

# Output layer schemas (FIXTURES.md §4). Names == reference table names minus
# the 'osmi_addresses_' prefix.
LAYER_FIELDS: dict[str, list[tuple[str, T.DataType]]] = {
    "connection_line": [
        ("node_id", T.StringType()),
        ("way_id", T.StringType()),
        ("geom", LINESTRING),
    ],
    "nearest_points": [("way_id", T.StringType()), ("geom", POINT)],
    "nearest_roads": [
        ("way_id", T.StringType()),
        ("name", T.StringType()),
        ("lastchange", T.StringType()),
        ("geom", LINESTRING),
    ],
    "nearest_areas": [
        ("way_id", T.StringType()),
        ("name", T.StringType()),
        ("lastchange", T.StringType()),
        ("geom", LINESTRING),
    ],
    "interpolation": [
        ("way_id", T.StringType()),
        ("typename", T.StringType()),
        ("firstid", T.StringType()),
        ("lastid", T.StringType()),
        ("firstno", T.StringType()),
        ("lastno", T.StringType()),
        ("error", T.StringType()),
        ("lastchange", T.StringType()),
        ("geom", LINESTRING),
    ],
    "nodes_with_addresses": [
        ("node_id", T.StringType()),
        ("way_id", T.StringType()),
        ("ip_id", T.StringType()),
        ("is_ip", T.IntegerType()),
        ("street", T.StringType()),
        ("houseno", T.StringType()),
        ("postcode", T.StringType()),
        ("city", T.StringType()),
        ("country", T.StringType()),
        ("fulladdr", T.StringType()),
        ("place", T.StringType()),
        ("road_id", T.StringType()),
        ("nody_place_id", T.StringType()),
        ("wayy_place_id", T.StringType()),
        ("lastchange", T.StringType()),
        ("geom", POINT),
    ],
    "ways_with_addresses": [
        ("way_id", T.StringType()),
        ("street", T.StringType()),
        ("houseno", T.StringType()),
        ("postcode", T.StringType()),
        ("city", T.StringType()),
        ("country", T.StringType()),
        ("fulladdr", T.StringType()),
        ("place", T.StringType()),
        ("lastchange", T.StringType()),
        ("geom", LINESTRING),
    ],
    "ways_with_postal_code": [
        ("way_id", T.StringType()),
        ("lastchange", T.StringType()),
        ("postalcode", T.StringType()),
        ("geom", LINESTRING),
    ],
    "entrances": [
        ("node_id", T.StringType()),
        ("lastchange", T.StringType()),
        ("entrance", T.StringType()),
        ("geom", POINT),
    ],
    "addrx_on_nonclosed_way": [
        ("way_id", T.StringType()),
        ("lastchange", T.StringType()),
        ("geom", LINESTRING),
    ],
    "buildings": [
        ("way_id", T.StringType()),
        ("lastchange", T.StringType()),
        ("geom", LINESTRING),
    ],
}


def layer_schema(name: str) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in LAYER_FIELDS[name]])


LAYER_NAMES = list(LAYER_FIELDS)
