"""Snapshot-checkpointed, resumable multi-stage pipelines + lineage/metrics.

North-rule requirement: jobs over the 10^12-document table must be
resumable from table-snapshot checkpoints with per-partition lineage and
metrics tables, packaged for ``spark-submit --py-files``.

Design (storage-format pluggable):
- A *pipeline* is an ordered list of named stages; each stage is a
  function (spark, inputs) -> DataFrame. Stage outputs are written to
  ``<root>/<stage>/data`` plus a JSON *snapshot manifest*
  ``<root>/<stage>/_SNAPSHOT.json`` recording: stage name, input manifest
  fingerprints, row count, schema, per-partition metrics, wall time.
- Resume: a re-run SKIPS any stage whose manifest exists and whose input
  fingerprints match (the manifest chain is the lineage graph — same role
  as Iceberg snapshot ids). Change an upstream stage and everything
  downstream recomputes; nothing else does.
- Per-partition lineage/metrics: each write records one row per output
  partition (partition id, rows, min/max of the declared key columns)
  into ``<root>/<stage>/_metrics/``, queryable as a plain table.
- On a cluster with an Iceberg catalog, swap ``_write_data``/``_read_data``
  for ``df.writeTo(table).createOrReplace()`` and manifest fingerprints
  for Iceberg snapshot ids — the driver logic is unchanged. This sandbox
  has no Iceberg jars (verified: pyspark 4.1.2 bundle ships none), so the
  parquet + JSON-manifest implementation is the tested path.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_SNAPSHOT.json"


def _fingerprint(payload: dict) -> str:
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    inputs: list[str] = field(default_factory=list)  # upstream stage names
    key_cols: list[str] = field(default_factory=list)  # lineage min/max keys
    version: str = "1"  # bump to force recompute


class Pipeline:
    """Ordered stages with snapshot-resume. ``run`` returns the final
    DataFrame and the list of stages actually executed (vs resumed)."""

    def __init__(self, root: str, stages: list[Stage]):
        self.root = root
        self.stages = stages

    # ---------------------------------------------------------- storage

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), MANIFEST)

    def read_manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            try:
                return json.load(f)
            except json.JSONDecodeError:
                # a torn/corrupt manifest means the snapshot commit never
                # completed — treat as absent so resume recomputes the
                # stage instead of crashing the whole pipeline
                return None

    def _write_data(self, df: DataFrame, stage: Stage) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self._dir(stage.name), "data"))

    def _read_data(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._dir(stage), "data"))

    # ---------------------------------------------------------- lineage

    def _partition_metrics(self, spark: SparkSession, stage: Stage) -> DataFrame:
        df = self._read_data(spark, stage.name)
        aggs = [F.count(F.lit(1)).alias("rows")]
        for k in stage.key_cols:
            aggs += [F.min(k).alias(f"min_{k}"), F.max(k).alias(f"max_{k}")]
        # group by the WRITTEN file, not spark_partition_id() over the
        # re-read: read-time splits pack/split files by maxPartitionBytes,
        # so their ids change with reader settings and misattribute skew;
        # one metrics row per part-file IS the written-partition lineage
        # (an Iceberg backend would record the same per-data-file stats)
        fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
        return df.groupBy(fname.alias("partition_id")).agg(*aggs)

    def metrics(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._dir(stage), "_metrics"))

    def lineage(self) -> list[dict]:
        """The manifest chain: one entry per completed stage with its
        input fingerprints — the snapshot DAG."""
        out = []
        for s in self.stages:
            m = self.read_manifest(s.name)
            if m:
                out.append(
                    {
                        "stage": s.name,
                        "fingerprint": m["fingerprint"],
                        "inputs": m["input_fingerprints"],
                        "rows": m["rows"],
                    }
                )
        return out

    # -------------------------------------------------------------- run

    def _expected_fingerprint(self, stage: Stage, input_fps: dict[str, str]) -> str:
        return _fingerprint(
            {"stage": stage.name, "version": stage.version, "inputs": input_fps}
        )

    def run(
        self, spark: SparkSession, source_fingerprint: str = "source"
    ) -> tuple[DataFrame, list[str]]:
        executed: list[str] = []
        fps: dict[str, str] = {"source": source_fingerprint}
        last: DataFrame | None = None
        for stage in self.stages:
            missing = [i for i in (stage.inputs or ["source"]) if i not in fps]
            if missing:
                raise KeyError(
                    f"stage {stage.name!r}: inputs {missing} not produced by any "
                    "earlier stage (typo or forward reference) — refusing to "
                    "fingerprint without them"
                )
            input_fps = {i: fps[i] for i in (stage.inputs or ["source"])}
            expect = self._expected_fingerprint(stage, input_fps)
            manifest = self.read_manifest(stage.name)
            if manifest and manifest["fingerprint"] == expect:
                fps[stage.name] = expect
                last = self._read_data(spark, stage.name)
                continue

            t0 = time.perf_counter()
            inputs = {
                name: self._read_data(spark, name)
                for name in stage.inputs
                if name != "source"
            }
            df = stage.fn(spark, inputs)
            self._write_data(df, stage)
            out = self._read_data(spark, stage.name)
            rows = out.count()
            pm = self._partition_metrics(spark, stage)
            pm.write.mode("overwrite").parquet(
                os.path.join(self._dir(stage.name), "_metrics")
            )
            manifest = {
                "stage": stage.name,
                "version": stage.version,
                "fingerprint": expect,
                "input_fingerprints": input_fps,
                "rows": rows,
                "schema": out.schema.jsonValue(),
                "wall_s": round(time.perf_counter() - t0, 3),
                "ts": time.time(),
            }
            os.makedirs(self._dir(stage.name), exist_ok=True)
            # atomic commit: the manifest IS the snapshot's commit record
            # (same role as an Iceberg metadata swap) — write-then-rename
            # so a crash can never leave a torn manifest that a resume
            # would misread as a completed stage
            tmp = self._manifest_path(stage.name) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1, default=str)
            os.replace(tmp, self._manifest_path(stage.name))
            fps[stage.name] = expect
            executed.append(stage.name)
            last = out
        assert last is not None, "pipeline has no stages"
        return last, executed


def build_pyfiles_zip(out_path: str = "/tmp/whitebox_tools_spark.zip") -> str:
    """Package the engine for ``spark-submit --py-files``."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return out_path
