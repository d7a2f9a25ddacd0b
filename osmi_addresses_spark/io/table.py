"""Iceberg-lite table store: partitioned Parquet + JSON manifest with
per-partition lineage and metrics (SURVEY.md §7: no Iceberg runtime jar in
this sandbox; the real `iceberg-spark-runtime` swap-in point is `write`/
`read` below).

Provides the north-rule requirements:
- atomic per-table commit (manifest written last, via tempfile rename),
- per-partition lineage + row-count metrics in the manifest,
- resumable re-runs: `write_once` skips tables whose manifest matches the
  input fingerprint (a re-run after a crash recomputes only missing tables).

Also the engine's answer to "cache vs recompute" at 100 TB: wide shared
intermediates (parsed entities, assembled way geometries) are checkpointed
here so every downstream consumer gets a column-pruned parquet scan instead
of a racy in-memory cache rebuild.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession


def _fingerprint(path: str) -> dict:
    """Cheap lineage fingerprint of an input dataset path."""
    out = {}
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            fp = os.path.join(path, f)
            if os.path.isfile(fp):
                st = os.stat(fp)
                out[f] = [st.st_size, int(st.st_mtime)]
    elif os.path.isfile(path):
        st = os.stat(path)
        out[os.path.basename(path)] = [st.st_size, int(st.st_mtime)]
    return out


class TableStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.manifest.json")

    def manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def exists(self, name: str, lineage: dict | None = None) -> bool:
        m = self.manifest(name)
        if m is None:
            return False
        if lineage is not None and m.get("lineage") != lineage:
            return False
        return True

    def write(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        lineage: dict | None = None,
        options: dict | None = None,
    ) -> str:
        """Write + commit. The data lands first; the manifest (the commit
        point) is renamed into place last — a crashed write leaves no
        manifest and the table reads as absent."""
        path = self._dir(name)
        if os.path.exists(path):
            shutil.rmtree(path)
        t0 = time.time()
        # v1 committer for committed tables: task attempts write under
        # _temporary/ and only the job commit renames them into place, so a
        # failed/retried task attempt can never leak files into the table
        # (the session default is the faster v2 committer, which is safe
        # only for scratch/shuffle-like output). The option lands in the
        # write job's hadoop conf (newHadoopConfWithOptions).
        w = df.write.mode("errorifexists").option(  # osmi/main.cpp:50-57 semantics
            "mapreduce.fileoutputcommitter.algorithm.version", "1"
        )
        for k, v in (options or {}).items():
            w = w.option(k, v)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        elapsed = round(time.time() - t0, 3)
        if os.environ.get("SPARK_GRAFT_PHASE_LOG"):
            import sys

            print(f"[table] {name}: {elapsed}s", file=sys.stderr)
        # per-partition metrics from the written files (row counts come from
        # parquet footers — metadata reads only, no data scan)
        import pyarrow.parquet as _pq

        parts: dict[str, dict] = {}
        for dirpath, dirnames, filenames in os.walk(path):
            # never count files from in-flight/aborted task attempts
            dirnames[:] = [d for d in dirnames if not d.startswith("_")]
            rel = os.path.relpath(dirpath, path)
            pfiles = [
                f for f in filenames
                if f.endswith(".parquet") and f.startswith("part-")
            ]
            if not pfiles:
                continue
            nbytes = sum(os.path.getsize(os.path.join(dirpath, f)) for f in pfiles)
            nrows = 0
            for f in pfiles:
                try:
                    nrows += _pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
                except Exception:
                    nrows = -1
                    break
            parts[rel] = {"files": len(pfiles), "bytes": nbytes, "rows": nrows}
        manifest = {
            "table": name,
            "write_seconds": elapsed,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "schema": df.schema.jsonValue(),
            "partition_by": partition_by or [],
            "partitions": parts,
            "lineage": lineage or {},
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(name))
        return path

    def write_once(
        self,
        name: str,
        df_factory,
        source_path: str | None = None,
        partition_by: list[str] | None = None,
    ) -> str:
        """Resumable write: skip if a committed manifest matches the source
        fingerprint; otherwise (re)compute. df_factory is called lazily."""
        lineage = {"source": source_path, "inputs": _fingerprint(source_path)} if source_path else None
        if self.exists(name, lineage):
            return self._dir(name)
        return self.write(name, df_factory(), partition_by=partition_by, lineage=lineage)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._dir(name))
