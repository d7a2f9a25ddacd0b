"""Explode-free Arrow span parser (SURVEY.md §2.1 S1, §2.8 parse_spans).

``parse_documents`` turns one document into one typed entity row via
``mapInArrow`` — no relational explode of the spans array, no per-row Python
in the hot path. All span processing runs in pyarrow C++ compute kernels
(split_pattern / list_element / binary_join / cast) over the flattened Arrow
list values; the only numpy is numeric regrouping (bincount/cumsum). This
matters for multi-worker scaling: pandas object-dtype string ops allocate
one PyObject per token, and with 16+ concurrent workers the page-fault and
allocator churn makes every copy slower (measured 3.4× CPU inflation at 16
workers vs 4 on this box); Arrow kernels write contiguous buffers and keep
per-worker cost flat as parallelism grows.

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
import pyarrow as pa
import pyarrow.compute as _pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import (
    ENTITY_ARROW,
    ENTITY_MIN_ARROW,
    ENTITY_MIN_SCHEMA,
    ENTITY_SCHEMA,
    SPAN_ARROW,
)


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


def _parse_batch(batch: pa.RecordBatch, minimal: bool = False) -> pa.RecordBatch:
    pc = _pc
    n = batch.num_rows
    doc_id = batch.column("doc_id")
    offs, spans = _list_offsets_values(batch.column("spans"))
    base = offs[0]
    # mapInArrow may hand us a RecordBatch whose list values are a slice
    spans = spans.slice(base, offs[-1] - base)
    offs = offs - base
    lengths = np.diff(offs)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)

    kind = spans.field("kind")
    text = spans.field("text")
    media = spans.field("media_ref")
    offset = spans.field("offset")

    is_header_a = pc.equal(kind, "header")
    is_tag_a = pc.equal(kind, "tag")
    is_ref_a = pc.equal(kind, "ref")
    is_noise_a = pc.invert(pc.or_(pc.or_(is_header_a, is_tag_a), is_ref_a))
    is_tag = is_tag_a.to_numpy(zero_copy_only=False)
    is_ref = is_ref_a.to_numpy(zero_copy_only=False)
    is_noise = is_noise_a.to_numpy(zero_copy_only=False)

    # ---- header: exactly one per doc, at semantic position 0 ----
    # node header = "node <id> <lat> <lon> <ts>"; way header = "way <id> <ts>"
    header_text = text.filter(is_header_a)
    if len(header_text) != n:
        raise ValueError("malformed documents: expected exactly one header span per doc")
    parts = pc.split_pattern(header_text, " ")
    etype = pc.list_element(parts, 0)
    osm_id = pc.cast(pc.list_element(parts, 1), pa.int64())
    is_node_a = pc.equal(etype, "node")
    is_node = is_node_a.to_numpy(zero_copy_only=False)
    lat = np.full(n, np.nan)
    lon = np.full(n, np.nan)
    if is_node.any():
        parts_n = parts.filter(is_node_a)
        lat[is_node] = pc.cast(pc.list_element(parts_n, 2), pa.float64()).to_numpy()
        lon[is_node] = pc.cast(pc.list_element(parts_n, 3), pa.float64()).to_numpy()
    # lastchange = last whitespace token (reverse → split-once → reverse:
    # constant-time per row, no per-row list length logic)
    lastchange = pc.utf8_reverse(
        pc.list_element(
            pc.split_pattern(pc.utf8_reverse(header_text), " ", max_splits=1), 0
        )
    )

    # ---- tags: split on first '=' ("k" → value ""; "a=b=c" → "b=c") ----
    tag_text = text.filter(is_tag_a)
    kv = pc.split_pattern(tag_text, "=", max_splits=1)
    keys = pc.list_element(kv, 0)
    items = pc.binary_join(pc.list_slice(kv, 1), "=")
    tag_counts = np.bincount(doc_idx[is_tag], minlength=n)
    tag_offsets = pa.array(np.concatenate([[0], np.cumsum(tag_counts)]), pa.int32())
    tags_map = pa.MapArray.from_arrays(tag_offsets, keys, items)

    # ---- refs ----
    ref_vals = pc.cast(text.filter(is_ref_a), pa.int64())
    refs = _group_list(doc_idx, is_ref, n, ref_vals)

    lat_a = pa.array(lat, pa.float64(), mask=~is_node)
    lon_a = pa.array(lon, pa.float64(), mask=~is_node)
    if minimal:
        return pa.RecordBatch.from_arrays(
            [etype, osm_id, lat_a, lon_a, lastchange, tags_map, refs],
            schema=ENTITY_MIN_ARROW,
        )

    tags_kv = pa.ListArray.from_arrays(
        tag_offsets, pa.StructArray.from_arrays([keys, items], names=["key", "value"])
    )

    # ---- noise spans, verbatim with original offsets ----
    noise_struct = pa.StructArray.from_arrays(
        [
            kind.filter(is_noise_a),
            text.filter(is_noise_a),
            media.filter(is_noise_a),
            offset.filter(is_noise_a),
        ],
        names=["kind", "text", "media_ref", "offset"],
    ).cast(SPAN_ARROW)
    noise = _group_list(doc_idx, is_noise, n, noise_struct)

    return pa.RecordBatch.from_arrays(
        [
            doc_id,
            etype,
            osm_id,
            lat_a,
            lon_a,
            lastchange,
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


def _parse_batches_minimal(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in it:
        if batch.num_rows:
            yield _parse_batch(batch, minimal=True)


def parse_documents(documents: DataFrame, minimal: bool = False) -> DataFrame:
    """documents(doc_id, spans) → one typed entity row per document.

    ``minimal=True`` omits doc_id/tags_kv/noise (the layer-pipeline
    projection) so the UDF neither computes nor ships them.
    """
    if minimal:
        return documents.mapInArrow(_parse_batches_minimal, schema=ENTITY_MIN_SCHEMA)
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
