"""Results-sink facade (SURVEY.md S11, §7.2(6)): ONE write interface,
two backends behind a capability check.

- **Iceberg** (when the target is a catalog table and the runtime has
  the Iceberg Spark extensions): ``df.writeTo(table).partitionedBy(
  bucket(N, doc_id))`` with ``createOrReplace`` / ``append`` /
  ``overwritePartitions``. This is the north-rule production sink —
  atomic snapshot commits, bucketed partition transform, MERGE-grade
  idempotence.
- **partitioned parquet** (the sandbox fallback, always available):
  explicit ``bucket=K/`` partition dirs + dynamic partition overwrite —
  the same overwrite-by-partition discipline the checkpointed runner
  relies on, so lineage/resume logic is identical across backends.

The reference has no cluster sink at all (its exports are per-row CSV
appends, /root/reference/pipeline.py:517-549); both backends here keep
its append/replace semantics (J1/J2) at table scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.pipeline.sinks import write_results

_MODES = ("overwrite", "append", "replace_partitions")


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True iff ``catalog`` is configured as a Spark catalog AND the
    Iceberg runtime classes are actually loadable in this JVM."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl:
        return False
    try:
        # Spark loads --jars/--packages through its MutableURLClassLoader,
        # which py4j's root classloader (Class.forName's caller) cannot
        # see — resolve through the JVM thread's context classloader so
        # the check works on real clusters, not just lib/ jars.
        jvm = spark._jvm
        jvm.java.lang.Thread.currentThread().getContextClassLoader().loadClass(impl)  # type: ignore[union-attr]
        return True
    except Exception:
        try:
            spark._jvm.java.lang.Class.forName(impl)  # type: ignore[union-attr]
            return True
        except Exception:
            return False


class ResultsWriter:
    """Write ``(doc_id, ...)`` result tables bucketed on a key.

    Exactly one of ``table`` (Iceberg: ``catalog.namespace.name``) or
    ``path`` (parquet dir) selects the backend; an Iceberg target on a
    runtime without the Iceberg jars raises immediately rather than
    failing mid-write.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str | None = None,
        table: str | None = None,
        n_buckets: int = 16,
        bucket_by: str = "doc_id",
        check_catalog: bool = True,
    ):
        if (path is None) == (table is None):
            raise ValueError("pass exactly one of path= or table=")
        self.spark = spark
        self.path = path
        self.table = table
        self.n_buckets = n_buckets
        self.bucket_by = bucket_by
        # check_catalog=False builds the writer WITHOUT the fail-fast
        # catalog probe — for shape-only inspection (iceberg_writer /
        # ddl) on runtimes without the Iceberg jar; write() on such an
        # instance still fails at catalog resolution, never mid-write.
        if table is not None and check_catalog:
            catalog = table.split(".", 1)[0]
            if not iceberg_available(spark, catalog):
                raise RuntimeError(
                    f"catalog '{catalog}' is not an available Iceberg catalog; "
                    "pass path= for the partitioned-parquet backend"
                )

    @property
    def backend(self) -> str:
        return "iceberg" if self.table is not None else "parquet"

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        if mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}")
        if self.table is not None:
            self._write_iceberg(df, mode)
        else:
            self._write_parquet(df, mode)

    # -- Iceberg branch ----------------------------------------------------
    def iceberg_writer(self, df: DataFrame):
        """The exact DataFrameWriterV2 the Iceberg branch commits with:
        target table + bucket(n, key) partition transform. Split out so
        the sandbox (no Iceberg jar -> the action would fail at catalog
        resolution) can still pin the committed write shape — the
        builder is lazy, so the transform list it carries IS what a
        real cluster's createOrReplace/append would snapshot."""
        from pyspark.sql.functions.partitioning import bucket

        return df.writeTo(self.table).partitionedBy(
            bucket(self.n_buckets, F.col(self.bucket_by))
        )

    def ddl(self, df: DataFrame) -> str:
        """Equivalent CREATE TABLE DDL for the Iceberg target (ops
        parity artifact; the write path itself uses writeTo)."""
        if self.table is None:
            raise ValueError("ddl() is only defined for the Iceberg backend")
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        return (
            f"CREATE TABLE {self.table} ({cols}) USING iceberg "
            f"PARTITIONED BY (bucket({self.n_buckets}, {self.bucket_by}))"
        )

    def _write_iceberg(self, df: DataFrame, mode: str) -> None:
        w = self.iceberg_writer(df)
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "append":
            if not self.spark.catalog.tableExists(self.table):
                w.create()
            else:
                df.writeTo(self.table).append()
        else:  # replace_partitions: idempotent re-commit of the touched buckets
            if not self.spark.catalog.tableExists(self.table):
                w.create()
            else:
                df.writeTo(self.table).overwritePartitions()

    # -- parquet branch ----------------------------------------------------
    def _write_parquet(self, df: DataFrame, mode: str) -> None:
        # mode semantics must match the Iceberg branch exactly:
        # overwrite = FULL table replace (static overwrite, stale
        # buckets dropped — createOrReplace's twin); replace_partitions
        # = dynamic overwrite of only the buckets present in df.
        write_mode = "append" if mode == "append" else "overwrite"
        write_results(
            df,
            self.path,
            mode=write_mode,
            bucket_by=self.bucket_by,
            n_buckets=self.n_buckets,
            dynamic=(mode == "replace_partitions"),
        )

    def read(self) -> DataFrame:
        if self.table is not None:
            return self.spark.table(self.table)
        return self.spark.read.parquet(self.path)
