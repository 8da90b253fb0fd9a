"""Checkpoint-resumable extraction runs with per-partition lineage
(SURVEY.md T1-T5, §4.3; the columnar rewrite of the reference's
split-job cursor protocol, /root/reference/webapp/jobs.py:25-291).

Unit of work = a doc_id hash bucket (the analog of the reference's
per-page cursor). A run:

1. writes a manifest once: (run_id, n_buckets, config snapshot) —
   T1 job creation;
2. processes pending buckets in groups; each group is one Spark job
   that writes ``bucket=<k>/`` parquet partitions (overwrite-by-
   partition discipline -> idempotent re-runs; the Iceberg analog is
   a MERGE/replacePartitions commit) — T3/T4. With
   ``RunConfig.stage_input`` the input is first materialized ONCE as
   bucket-partitioned parquet so each group partition-prunes to its
   buckets instead of re-scanning the full input (G groups = G full
   corpus scans otherwise — the dominant I/O term at 100 TB);
3. after each group commits, writes one lineage record per bucket:
   (run_id, bucket, status, attempt, n_docs, n_spans_in, n_spans_out,
   parse_failures, wall_ms[, checksum60 with
   ``RunConfig.checksum_output``]) as a single JSON file per bucket —
   the write is atomic (tmp + rename), so a crash mid-group leaves
   those buckets pending and the next invocation redoes exactly them —
   T2/T5 rollback-free retry; ``verify_output()`` byte-audits the
   table against the recorded checksums;
4. ``resume()`` = skip buckets whose lineage record exists (the
   anti-join against done work).

Determinism guarantees idempotence: bucket assignment is a pure hash
of doc_id, the kernel is deterministic, and output files are
overwritten whole per bucket.

At cluster scale the same structure holds with Iceberg: manifest ->
table property, lineage -> ``_lineage`` table appended per commit,
bucket -> ``bucket(N, doc_id)`` partition transform.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import IntegerType, StructField, StructType

from ocr_spark.kernel.extract import DEFAULT_CONFIG, ExtractConfig
from ocr_spark.pipeline.extract import extract_documents_with_metrics, weight_partition
from ocr_spark.schema import DOC_WITH_METRICS_SCHEMA

# what the runner's parquet table holds: kernel output + the bucket
# partition column. Passed explicitly to the metrics read so a commit
# group that wrote ZERO rows (possible when n_buckets >> corpus) still
# reads back as an empty frame instead of failing schema inference.
OUTPUT_SCHEMA = StructType(
    DOC_WITH_METRICS_SCHEMA.fields + [StructField("bucket", IntegerType(), True)]
)


@dataclass(frozen=True)
class RunConfig:
    run_id: str
    n_buckets: int = 16
    buckets_per_commit: int = 4
    kernel: ExtractConfig = DEFAULT_CONFIG
    # size-aware skew handling: pre-spread docs across this many hash
    # partitions with heaviest-first ordering before the kernel (LPT
    # heuristic; see pipeline.extract.weight_partition). None = rely on
    # the input's partitioning.
    size_weighted_partitions: int | None = None
    # stage the input ONCE as bucket-partitioned parquet before the
    # commit loop. Without staging every commit group re-scans the
    # FULL input and filters to its buckets (the bucket is a derived
    # hash — no pushdown can prune it), so a run with G commit groups
    # reads the corpus G times: at 100 TB with G=16 that is 1.6 PB of
    # scan for 100 TB of work. Staging costs one extra full
    # write+shuffle, after which each group's read partition-prunes to
    # exactly its buckets — total I/O 2x the corpus instead of Gx.
    # Leave False only when the run fits in one or two commit groups.
    stage_input: bool = False
    # record an order-insensitive content checksum per bucket in the
    # lineage (functions/audit.py modular-sum scheme over the full
    # output row incl. spans). Turns lineage into a byte-level audit:
    # verify_output() re-derives the sums from the files and flags any
    # bucket whose bytes drifted from what its commit recorded. COST:
    # the post-commit metrics scan must read the spans column too (the
    # bulk of the output bytes) instead of the 3 pruned metric ints —
    # one extra full read of each group's freshly-written output, no
    # extra shuffle. Off by default for that reason.
    checksum_output: bool = False
    # caller-declared description of how the INPUT frame was shaped
    # (gates, synthesis, filters) — pinned in the manifest and
    # verified on resume, because done-bucket records are only valid
    # if later invocations feed the identically-shaped input (resuming
    # a half-done run with a different gate would mix gated and
    # ungated buckets in one table). Any JSON-serializable dict;
    # jobs/extract.py passes its gate flags.
    input_config: dict | None = None


def _bucket_col(n_buckets: int):
    # hash of the STRING doc_id: the kernel emits doc_id as string, so
    # casting here makes the bucket computable identically on both the
    # input side (pre-filter) and the output side (post-kernel
    # withColumn) — no join needed to re-attach it.
    # coalesce(…, ''): the kernel renders a NULL doc_id (contract
    # violation -> error row) as '' — without the coalesce the input
    # side buckets NULL by hash(NULL)=42 while the output side buckets
    # the same row by hash(''), a DIFFERENT bucket outside the commit
    # group; the dynamic-partition overwrite would then replace that
    # foreign bucket wholesale, clobbering committed data.
    return F.pmod(
        F.hash(F.coalesce(F.col("doc_id").cast("string"), F.lit(""))),
        F.lit(n_buckets),
    )


def _row_checksum60():
    """Per-row 60-bit content hash over the FULL output row, rendered
    the audit.py way (coalesce each part to chr(0), chr(1) separator —
    concat_ws's silent NULL-skip never fires). ``spans`` is rendered
    via to_json: struct field order and span order are fixed by the
    output contract, so the rendering is deterministic. Spark-side
    self-consistency is all a rebuild audit needs (no DuckDB twin —
    the corpus-level twin lives in functions/audit.py)."""
    from ocr_spark.functions.hashing import md5_long

    parts = [
        F.coalesce(F.col("doc_id"), F.lit("\x00")),
        F.coalesce(F.to_json(F.col("spans")), F.lit("\x00")),
        F.coalesce(F.col("n_spans_in").cast("string"), F.lit("\x00")),
        F.coalesce(F.col("n_spans_out").cast("string"), F.lit("\x00")),
        F.coalesce(F.col("parse_failed").cast("string"), F.lit("\x00")),
    ]
    return md5_long(F.concat_ws("\x01", *parts))


class ExtractionRun:
    def __init__(
        self,
        spark: SparkSession,
        docs: DataFrame,
        output_dir: str,
        cfg: RunConfig,
    ):
        self.spark = spark
        self.docs = docs
        self.out = output_dir.rstrip("/")
        self.cfg = cfg
        self.lineage_dir = f"{self.out}/_lineage/{cfg.run_id}"
        os.makedirs(self.lineage_dir, exist_ok=True)

    # -- T1: manifest ------------------------------------------------------
    def write_manifest(self) -> None:
        """Write the run snapshot — or, on resume, VERIFY the current
        config against it: done-bucket records are only valid under the
        manifest's bucket function and kernel config, so resuming with
        e.g. a different n_buckets would skip buckets that now hold
        different docs and silently corrupt the table."""
        path = f"{self.lineage_dir}/manifest.json"
        if os.path.exists(path):
            with open(path) as f:
                stored = json.load(f)
            current = {
                "n_buckets": self.cfg.n_buckets,
                "kernel": asdict(self.cfg.kernel),
                "input_config": self.cfg.input_config,
            }
            recorded = {
                "n_buckets": stored.get("n_buckets"),
                "kernel": stored.get("kernel"),
                "input_config": stored.get("input_config"),
            }
            if current != recorded:
                raise ValueError(
                    f"run '{self.cfg.run_id}' was created with {recorded}; "
                    f"resuming with {current} would corrupt the output — "
                    "use a new run_id (or cleanup_orphan_runs) to reprocess"
                )
            return  # resume: manifest is immutable per run_id
        manifest = {
            "run_id": self.cfg.run_id,
            "n_buckets": self.cfg.n_buckets,
            "buckets_per_commit": self.cfg.buckets_per_commit,
            "kernel": asdict(self.cfg.kernel),
            "input_config": self.cfg.input_config,
        }
        self._atomic_write(path, json.dumps(manifest, indent=2))

    # -- lineage ----------------------------------------------------------
    def _record_path(self, bucket: int) -> str:
        return f"{self.lineage_dir}/bucket-{bucket:05d}.json"

    def done_buckets(self) -> set[int]:
        done = set()
        for b in range(self.cfg.n_buckets):
            p = self._record_path(b)
            if os.path.exists(p):
                with open(p) as f:
                    if json.load(f).get("status") == "done":
                        done.add(b)
        return done

    def _atomic_write(self, path: str, content: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, path)

    # -- input staging (opt-in, see RunConfig.stage_input) ------------------
    def _staging_dir(self) -> str:
        # underscore prefix: Spark's file listing skips _-prefixed
        # paths, so the staging tree inside the output dir is invisible
        # to the metrics read and to output()
        return f"{self.out}/_staging/{self.cfg.run_id}"

    def _stage_marker(self) -> str:
        return f"{self.lineage_dir}/staged.json"

    def _staged_docs(self) -> DataFrame:
        """Materialize the input as bucket-partitioned parquet once per
        run (resume skips it via the marker — same discipline as the
        bucket lineage records: the write is only trusted after the
        atomic marker write that follows it)."""
        stg = self._staging_dir()
        if not os.path.exists(self._stage_marker()):
            t0 = time.time()
            (
                self.docs.withColumn("bucket", _bucket_col(self.cfg.n_buckets))
                .repartition(self.cfg.n_buckets, "bucket")
                .write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(stg)
            )
            self._atomic_write(
                self._stage_marker(),
                json.dumps(
                    {
                        "run_id": self.cfg.run_id,
                        "n_buckets": self.cfg.n_buckets,
                        "wall_ms": int((time.time() - t0) * 1000),
                    }
                ),
            )
        # explicit schema (input schema + bucket partition col): an
        # EMPTY corpus stages as _SUCCESS-only with no parquet footers,
        # and inference would then throw on every resume (marker
        # already written) — same class as the OUTPUT_SCHEMA fix for
        # zero-row commit groups above
        staged_schema = StructType(
            self.docs.schema.fields + [StructField("bucket", IntegerType(), True)]
        )
        return self.spark.read.schema(staged_schema).parquet(stg)

    # -- T3/T4: process + commit ------------------------------------------
    def _group_df(self, buckets: list[int]) -> DataFrame:
        """The commit-group plan: ONE kernel execution, no joins.

        bucket is a pure function of doc_id (pmod(hash, N)), so it is
        filtered on the input and recomputed on the kernel output with
        a withColumn — the round-1 version re-attached it via a doc_id
        join and ran a second kernel pass for metrics, doubling the
        most expensive stage and adding two shuffles per commit.

        With ``stage_input`` the filter lands on a PARTITION column of
        the staged table (PartitionFilters in the scan — only the
        group's bucket directories are read); without it the filter is
        a full-scan predicate on the derived hash."""
        src = (
            self._staged_docs()
            if self.cfg.stage_input
            else self.docs.withColumn("bucket", _bucket_col(self.cfg.n_buckets))
        )
        subset = src.where(F.col("bucket").isin(buckets)).drop("bucket")
        if self.cfg.size_weighted_partitions:
            subset = weight_partition(subset, self.cfg.size_weighted_partitions)
        # the trailing where() is defense in depth: bucket is the same
        # pure function on both sides, so it filters nothing — but if a
        # future kernel change ever rewrote an id, the dynamic-partition
        # overwrite would otherwise replace a bucket OUTSIDE this commit
        # group and clobber committed data. Dropping such a row instead
        # leaves its true bucket pending for a later (correct) commit.
        return (
            extract_documents_with_metrics(subset, self.cfg.kernel)
            .withColumn("bucket", _bucket_col(self.cfg.n_buckets))
            .where(F.col("bucket").isin(buckets))
        )

    def _process_group(self, buckets: list[int], attempt: int) -> None:
        t0 = time.time()
        out = self._group_df(buckets)
        (
            out.repartition(len(buckets), "bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.out)
        )
        # per-bucket lineage metrics: a column-pruned, partition-pruned
        # scan of the files just written — NOT a kernel re-execution.
        # (With checksum_output the scan also reads spans; see RunConfig.)
        by_bucket = {r.bucket: r for r in self._bucket_metrics(buckets)}
        wall_ms = int((time.time() - t0) * 1000)
        for b in buckets:
            r = by_bucket.get(b)
            rec = {
                "run_id": self.cfg.run_id,
                "bucket": b,
                "status": "done",
                "attempt": attempt,
                "n_docs": int(r.n_docs) if r else 0,
                "n_spans_in": int(r.n_spans_in) if r else 0,
                "n_spans_out": int(r.n_spans_out) if r else 0,
                "parse_failures": int(r.parse_failures) if r else 0,
                "wall_ms": wall_ms,
            }
            if self.cfg.checksum_output:
                # empty bucket checksums as 0 — the additive identity,
                # matching what the modular sum over zero rows yields
                rec["checksum60"] = int(r.checksum60) if r else 0
            self._atomic_write(self._record_path(b), json.dumps(rec))

    def _bucket_metrics(
        self, buckets: list[int], with_checksum: bool | None = None
    ) -> list:
        if with_checksum is None:
            with_checksum = self.cfg.checksum_output
        aggs = [
            F.count("*").alias("n_docs"),
            F.sum("n_spans_in").alias("n_spans_in"),
            F.sum("n_spans_out").alias("n_spans_out"),
            F.sum("parse_failed").alias("parse_failures"),
        ]
        if with_checksum:
            from ocr_spark.functions.audit import checksum_agg

            aggs.append(checksum_agg(_row_checksum60()).alias("checksum60"))
        return (
            self.spark.read.schema(OUTPUT_SCHEMA).parquet(self.out)
            .where(F.col("bucket").isin(buckets))
            .groupBy("bucket")
            .agg(*aggs)
            .collect()
        )

    def verify_output(self) -> list[int]:
        """Byte-audit the written table against its lineage: re-derive
        each done bucket's order-insensitive checksum from the files
        on disk and return the buckets whose content no longer matches
        what their commit recorded (post-hoc edits, partial rewrites,
        a bad compaction). Requires records written with
        ``checksum_output=True``; records without a checksum are
        skipped — they predate the flag and can't be audited. One scan
        of the audited buckets, one partial-agg shuffle."""
        recorded = {}
        for b in sorted(self.done_buckets()):
            with open(self._record_path(b)) as f:
                rec = json.load(f)
            if "checksum60" in rec:
                recorded[b] = (rec["checksum60"], rec["n_docs"])
        if not recorded:
            return []
        actual = {
            r.bucket: (int(r.checksum60), int(r.n_docs))
            for r in self._bucket_metrics(sorted(recorded), with_checksum=True)
        }
        return sorted(
            b for b, want in recorded.items()
            if actual.get(b, (0, 0)) != want
        )

    # -- T6: cancel / cleanup ---------------------------------------------
    def _abort_path(self) -> str:
        return f"{self.lineage_dir}/aborted.json"

    def abort(self, reason: str = "") -> None:
        """T6 run-abort (reference cancel analog,
        /root/reference/webapp/jobs.py:293-321): mark the run aborted.
        Committed buckets keep their lineage (idempotent output is
        already durable); pending buckets stay pending. The next
        ``run()`` on this run_id clears the marker and resumes."""
        self._atomic_write(
            self._abort_path(),
            json.dumps({"run_id": self.cfg.run_id, "reason": reason}),
        )

    def is_aborted(self) -> bool:
        return os.path.exists(self._abort_path())

    # -- T2/T5: run with resume -------------------------------------------
    def run(self, fail_after_groups: int | None = None) -> dict:
        """Process all pending buckets. ``fail_after_groups`` is a test
        hook simulating a mid-run crash. Returns the run summary."""
        self.write_manifest()
        if self.is_aborted():
            os.remove(self._abort_path())  # resuming an aborted run
        done = self.done_buckets()
        pending = [b for b in range(self.cfg.n_buckets) if b not in done]
        attempt = 1 if not done else 2
        groups = [
            pending[i : i + self.cfg.buckets_per_commit]
            for i in range(0, len(pending), self.cfg.buckets_per_commit)
        ]
        for gi, group in enumerate(groups):
            if fail_after_groups is not None and gi >= fail_after_groups:
                raise RuntimeError(f"simulated crash before group {gi}")
            self._process_group(group, attempt)
        # run complete: the staged copy is scratch space — GC it (and
        # its marker, so a hypothetical later re-stage starts clean)
        if self.cfg.stage_input and len(self.done_buckets()) == self.cfg.n_buckets:
            shutil.rmtree(self._staging_dir(), ignore_errors=True)
            if os.path.exists(self._stage_marker()):
                os.remove(self._stage_marker())
        return self.summary()

    def summary(self) -> dict:
        recs = []
        for b in sorted(self.done_buckets()):
            with open(self._record_path(b)) as f:
                recs.append(json.load(f))
        return {
            "run_id": self.cfg.run_id,
            "buckets_done": len(recs),
            "n_buckets": self.cfg.n_buckets,
            "n_docs": sum(r["n_docs"] for r in recs),
            "n_spans_in": sum(r["n_spans_in"] for r in recs),
            "n_spans_out": sum(r["n_spans_out"] for r in recs),
            "parse_failures": sum(r["parse_failures"] for r in recs),
        }

    def output(self) -> DataFrame:
        return self.spark.read.parquet(self.out)


def list_runs(output_dir: str) -> list[str]:
    """run_ids with lineage state under ``output_dir``."""
    root = f"{output_dir.rstrip('/')}/_lineage"
    if not os.path.isdir(root):
        return []
    return sorted(d for d in os.listdir(root) if os.path.isdir(f"{root}/{d}"))


def cleanup_orphan_runs(output_dir: str, keep: set[str] | frozenset[str]) -> list[str]:
    """T6 orphan GC (reference asset-cleanup analog,
    /root/reference/webapp/state.py:229-302): delete lineage/checkpoint
    state for every run_id NOT in ``keep``. The OUTPUT table is never
    touched — lineage dirs are bookkeeping; output partitions are owned
    by whichever run last committed them (idempotent overwrite-by-
    partition). Returns the removed run_ids."""
    removed = []
    root = f"{output_dir.rstrip('/')}/_lineage"
    stg_root = f"{output_dir.rstrip('/')}/_staging"
    for run_id in list_runs(output_dir):
        if run_id not in keep:
            shutil.rmtree(f"{root}/{run_id}")
            # a crashed staged run leaves its bucket-partitioned input
            # copy behind — scratch space, GC'd with the lineage
            shutil.rmtree(f"{stg_root}/{run_id}", ignore_errors=True)
            removed.append(run_id)
    return removed
