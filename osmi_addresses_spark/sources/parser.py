"""Explode-free Arrow span parser (SURVEY.md §2.1 S1, §2.8 parse_spans).

``parse_documents`` turns one document into one typed entity row via
``mapInArrow`` — no relational explode of the spans array, no per-row Python
in the hot path (all span processing is vectorized numpy/pandas over the
flattened Arrow list values).

The per-row invariant (BASELINE.json input_hint) is span-sequence equality:
``serialize_entities(parse_documents(docs))`` reproduces the exact
``(kind, text, media_ref, offset order)`` per doc_id. Noise spans
(kind text/media) are carried through losslessly in the ``noise`` column;
semantic spans are guaranteed by the encoding to appear in order
header < tag* < ref*, so their offsets are recoverable as the offsets not
occupied by noise.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ENTITY_ARROW, ENTITY_SCHEMA, SPAN_ARROW


def _list_offsets_values(col: pa.Array) -> tuple[np.ndarray, pa.Array]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.LargeListArray):
        offs = col.offsets.to_numpy()
    else:
        offs = col.offsets.to_numpy()
    return offs.astype(np.int64), col.values


def _group_list(
    doc_idx: np.ndarray, mask: np.ndarray, n_docs: int, values: pa.Array
) -> pa.ListArray:
    """Regroup a filtered flat array back into per-doc lists (order kept)."""
    counts = np.bincount(doc_idx[mask], minlength=n_docs)
    offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]), pa.int32())
    return pa.ListArray.from_arrays(offsets, values)


def _parse_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    n = batch.num_rows
    doc_id = batch.column("doc_id")
    offs, spans = _list_offsets_values(batch.column("spans"))
    base = offs[0]
    # mapInArrow may hand us a RecordBatch whose list values are a slice
    spans = spans.slice(base, offs[-1] - base)
    offs = offs - base
    lengths = np.diff(offs)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)

    kind = np.asarray(spans.field("kind"))
    text = spans.field("text")
    media = spans.field("media_ref")
    offset = spans.field("offset")

    is_header = kind == "header"
    is_tag = kind == "tag"
    is_ref = kind == "ref"
    is_noise = ~(is_header | is_tag | is_ref)

    # ---- header: exactly one per doc, at semantic position 0 ----
    header_text = pd.Series(np.asarray(text)[is_header])
    if len(header_text) != n:
        raise ValueError("malformed documents: expected exactly one header span per doc")
    parts = header_text.str.split(" ")
    etype = parts.str[0].to_numpy()
    osm_id = parts.str[1].astype(np.int64).to_numpy()
    is_node = etype == "node"
    lat = np.full(n, np.nan)
    lon = np.full(n, np.nan)
    if is_node.any():
        lat[is_node] = parts[is_node].str[2].astype(np.float64)
        lon[is_node] = parts[is_node].str[3].astype(np.float64)
    lastchange = np.where(is_node, parts.str[-1].to_numpy(), parts.str[2].to_numpy())

    # ---- tags: split on first '=' ----
    tag_text = pd.Series(np.asarray(text.filter(pa.array(is_tag))), dtype=object)
    kv = tag_text.str.split("=", n=1, expand=True)
    if len(tag_text):
        keys = pa.array(kv[0].to_numpy(), pa.string())
        items = pa.array(kv[1].fillna("").to_numpy(), pa.string())
    else:
        keys = pa.array([], pa.string())
        items = pa.array([], pa.string())
    tag_counts = np.bincount(doc_idx[is_tag], minlength=n)
    tag_offsets = pa.array(np.concatenate([[0], np.cumsum(tag_counts)]), pa.int32())
    tags_map = pa.MapArray.from_arrays(tag_offsets, keys, items)
    tags_kv = pa.ListArray.from_arrays(
        tag_offsets, pa.StructArray.from_arrays([keys, items], names=["key", "value"])
    )

    # ---- refs ----
    ref_vals = pa.array(
        pd.Series(np.asarray(text.filter(pa.array(is_ref)))).astype(np.int64), pa.int64()
    )
    refs = _group_list(doc_idx, is_ref, n, ref_vals)

    # ---- noise spans, verbatim with original offsets ----
    noise_struct = pa.StructArray.from_arrays(
        [
            spans.field("kind").filter(pa.array(is_noise)),
            text.filter(pa.array(is_noise)),
            media.filter(pa.array(is_noise)),
            offset.filter(pa.array(is_noise)),
        ],
        names=["kind", "text", "media_ref", "offset"],
    ).cast(SPAN_ARROW)
    noise = _group_list(doc_idx, is_noise, n, noise_struct)

    return pa.RecordBatch.from_arrays(
        [
            doc_id,
            pa.array(etype, pa.string()),
            pa.array(osm_id, pa.int64()),
            pa.array(np.where(is_node, lat, np.nan), pa.float64(), mask=~is_node),
            pa.array(np.where(is_node, lon, np.nan), pa.float64(), mask=~is_node),
            pa.array(lastchange, pa.string()),
            tags_map,
            tags_kv,
            refs,
            noise,
        ],
        schema=ENTITY_ARROW,
    )


def _parse_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in it:
        if batch.num_rows:
            yield _parse_batch(batch)


def parse_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → one typed entity row per document."""
    return documents.mapInArrow(_parse_batches, schema=ENTITY_SCHEMA)


def nodes_view(entities: DataFrame) -> DataFrame:
    """nodes(node_id, lat, lon, lastchange, tags, seq) — FIXTURES.md §2.

    ``seq``-equivalent ordering = (entity type: nodes first, then osm_id);
    since ids are the scan order, osm_id itself is the within-type tiebreak
    key (SURVEY.md §2.5) — no global row_number shuffle needed.
    """
    return entities.filter(F.col("entity") == "node").select(
        F.col("osm_id").alias("node_id"),
        "lat",
        "lon",
        "lastchange",
        "tags",
    )


def ways_view(entities: DataFrame) -> DataFrame:
    return entities.filter(F.col("entity") == "way").select(
        F.col("osm_id").alias("way_id"),
        "refs",
        "lastchange",
        "tags",
    )


# --------------------------------------------------------------- serializer
def _serialize_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    """Rebuild (doc_id, spans) from parsed entities (test utility — per-doc
    python regroup; the hot path is parse, not re-serialization)."""
    tbl = batch.to_pydict()
    n = batch.num_rows
    doc_ids, all_kind, all_text, all_media, all_off, lengths = [], [], [], [], [], []
    for i in range(n):
        etype = tbl["entity"][i]
        if etype == "node":
            header = (
                f"node {tbl['osm_id'][i]} {tbl['lat'][i]!r} {tbl['lon'][i]!r} "
                f"{tbl['lastchange'][i]}"
            )
        else:
            header = f"way {tbl['osm_id'][i]} {tbl['lastchange'][i]}"
        sem: list[tuple[str, str, str]] = [("header", header, "")]
        for kv in tbl["tags_kv"][i] or []:
            sem.append(("tag", f"{kv['key']}={kv['value']}", ""))
        for r in tbl["refs"][i] or []:
            sem.append(("ref", str(r), ""))
        noise = tbl["noise"][i] or []
        total = len(sem) + len(noise)
        slots: list[tuple[str, str, str] | None] = [None] * total
        for sp in noise:
            slots[sp["offset"]] = (sp["kind"], sp["text"], sp["media_ref"])
        si = iter(sem)
        for j in range(total):
            if slots[j] is None:
                slots[j] = next(si)
        doc_ids.append(tbl["doc_id"][i])
        lengths.append(total)
        for j, (k, tx, m) in enumerate(slots):  # type: ignore[misc]
            all_kind.append(k)
            all_text.append(tx)
            all_media.append(m)
            all_off.append(j)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(all_kind, pa.string()),
            pa.array(all_text, pa.string()),
            pa.array(all_media, pa.string()),
            pa.array(all_off, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    offsets = pa.array(np.concatenate([[0], np.cumsum(lengths)]), pa.int32())
    return pa.RecordBatch.from_arrays(
        [pa.array(doc_ids, pa.string()), pa.ListArray.from_arrays(offsets, struct)],
        names=["doc_id", "spans"],
    )


def serialize_entities(entities: DataFrame) -> DataFrame:
    """Inverse of parse_documents (span-sequence equality invariant)."""
    from ..schemas import DOCUMENTS_SCHEMA

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            if batch.num_rows:
                yield _serialize_batch(batch)

    return entities.mapInArrow(gen, schema=DOCUMENTS_SCHEMA)
