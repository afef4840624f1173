"""Per-partition checkpoint lineage — resumable long runs.

North-rule requirement: a 10^12-page job must be resumable from checkpoint
with per-partition lineage + metrics. The reference has no streaming/state
(SURVEY.md §2.10): resumability is an engine-level property we add around
the stateless kernels.

Design: the input is split into `n_buckets` deterministic buckets
(pmod(xxhash64(key), n)) — partition-independent, so the same row lands in
the same bucket on any cluster size or input layout. Each bucket runs the
user's transform and appends parquet under `out/bucket=k/`; a manifest
JSON (`_lineage/k.json`) with row counts and wall time commits the bucket
only AFTER its data is fully written (write-then-commit ordering = at-least
-once with idempotent overwrite per bucket dir → exactly-once output). On
restart, completed buckets are anti-joined away by simply not re-running
them. A crashed bucket left a dir but no manifest → overwritten cleanly.

At cluster scale each bucket is itself a fully parallel Spark job; buckets
bound the blast radius of a failure and give the operator a progress/metrics
stream (the `metrics()` frame) without any external service.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LineageRun:
    def __init__(self, output_dir: str, n_buckets: int = 16, bucket_key: str = "url"):
        self.output_dir = output_dir
        self.n_buckets = n_buckets
        self.bucket_key = bucket_key
        self.manifest_dir = os.path.join(output_dir, "_lineage")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # ---- manifest ---------------------------------------------------------
    def _manifest_path(self, bucket: int) -> str:
        return os.path.join(self.manifest_dir, f"{bucket:05d}.json")

    def completed(self) -> set[int]:
        done = set()
        for name in os.listdir(self.manifest_dir):
            if name.endswith(".json"):
                try:
                    with open(os.path.join(self.manifest_dir, name)) as f:
                        rec = json.load(f)
                    if rec.get("status") == "done":
                        done.add(int(rec["bucket"]))
                except (json.JSONDecodeError, KeyError, ValueError):
                    continue  # torn write = not committed
        return done

    def metrics(self) -> list[dict]:
        out = []
        for b in sorted(self.completed()):
            with open(self._manifest_path(b)) as f:
                out.append(json.load(f))
        return out

    # ---- execution ---------------------------------------------------------
    def bucket_col(self):
        return F.pmod(F.xxhash64(F.col(self.bucket_key)), F.lit(self.n_buckets))

    def run(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        fail_after: int | None = None,
    ) -> int:
        """Process all incomplete buckets. `fail_after` aborts after that
        many buckets (test hook simulating a crash). Returns buckets run."""
        done = self.completed()
        ran = 0
        src = source.withColumn("__bucket", self.bucket_col())
        for b in range(self.n_buckets):
            if b in done:
                continue
            t0 = time.time()
            part = src.where(F.col("__bucket") == b).drop("__bucket")
            out = transform(part)
            path = os.path.join(self.output_dir, f"bucket={b}")
            rows_in = part.count()
            out.write.mode("overwrite").parquet(path)  # idempotent per bucket
            rows_out = (
                out.sparkSession.read.parquet(path).count()
            )
            rec = {
                "bucket": b,
                "status": "done",
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_sec": round(time.time() - t0, 3),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            tmp = self._manifest_path(b) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, self._manifest_path(b))  # atomic commit
            ran += 1
            if fail_after is not None and ran >= fail_after:
                raise RuntimeError(f"simulated crash after {ran} buckets")
        return ran

    def result(self, spark: SparkSession) -> DataFrame:
        """The union of all committed buckets."""
        done = sorted(self.completed())
        if not done:
            raise ValueError("no completed buckets")
        paths = [os.path.join(self.output_dir, f"bucket={b}") for b in done]
        return spark.read.parquet(*paths)
