"""osmi_addresses_spark — a from-scratch PySpark-native address-validation
and spatial-join engine with the computed semantics of ltog/osmi-addresses
(reference at /root/reference, C++/libosmium/GDAL).

Architecture (Spark-first, NOT a port):

- Input is an Iceberg-style table ``documents(doc_id, spans)`` of interleaved
  text+media documents, each encoding one OSM entity (see FIXTURES.md).
- Spans are parsed by an explode-free Arrow UDF (``mapInArrow``) into typed
  ``nodes`` / ``ways`` DataFrames; the per-row invariant is span-sequence
  equality (kind, text, media_ref, order) per doc_id.
- All layer computations are declarative DataFrame plans (Catalyst optimizes
  pushdown/pruning/join order); numpy-vectorized pandas UDFs are used only
  where relational ops cannot express the semantics (mercator foot-point
  refinement, interpolation densification).
- Spatial candidate generation is a (name, grid-cell) equi-join: the street
  side registers every cell its tolerance-padded bbox touches, the address
  side joins on its own cell — a strict superset of the reference's
  bbox±tolerance prefilter (osmi/GeometryHelper.hpp:127-152), which is then
  applied exactly as a post-join filter.
"""

__version__ = "0.1.0"

MAXDIST = 0.01  # degrees; osmi/ConnectionLinePreprocessor.hpp:11
