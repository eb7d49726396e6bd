"""Checkpoint & lineage table protocol — resumable batch at partition grain.

Replaces the reference's per-input JSON checkpoint files
(``core/checkpoint.py:17-73``, atomic temp+``os.replace`` writes
``:126-197``) with two append-only tables committed atomically per
partition:

* ``_checkpoint``  (FIXTURES.md §3): one row per (url, status) — the
  anti-join side of resume (reference ``next_page``/set-union semantics,
  ``core/checkpoint.py:33-41``, consumed ``core/pdf_processor.py:1249-1253``);
* ``_lineage``     (FIXTURES.md §4): one row per partition commit —
  snapshot id, partition id, docs, bytes, errors (north_rule lineage).

Durability contract (matches observable reference behavior incl.
cancel-saves ``core/pdf_processor.py:1570-1583``): **no committed doc is
ever reprocessed; uncommitted docs redo.** Commit unit here is a partition,
not a page — per-row commits are untenable at 10^12-doc scale, and the
reference's own "fast temp save every 10 pages"
(``core/pdf_processor.py:1313-1314``) concedes the same batching.

Implementation detail: this sandbox image has no Iceberg runtime jar, so a
"table" is a directory of parquet files where each file is committed by
atomic ``os.replace`` from a temp name (single-filesystem atomicity — the
same primitive the reference relies on, ``core/checkpoint.py:151-170``).
File names are **deterministic functions of partition content**, so a Spark
task retry overwrites its own file idempotently instead of double-appending
(exactly-once per partition). On a real cluster, swap
:func:`commit_parquet_atomic` for an Iceberg ``writeTo(...).append()`` —
the snapshot commit gives the same idempotence via validation.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "config_hash",
    "committed_digests",
    "read_committed",
    "commit_parquet_atomic",
    "content_digest",
    "read_table_dir",
    "completed_urls",
    "CHECKPOINT_PA_SCHEMA",
    "LINEAGE_PA_SCHEMA",
]

CHECKPOINT_PA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("partition_id", pa.int32()),
        ("status", pa.string()),  # completed / skipped / failed
        ("input_snapshot_id", pa.int64()),
        ("config_hash", pa.string()),
        ("commit_digest", pa.string()),  # links the data/lineage files
        ("updated_at", pa.timestamp("us", tz="UTC")),
    ]
)

# SCHEMA EVOLUTION NOTE (round-4 advisor): `n_errors` was ADDED to this
# schema mid-project, so an output directory resumed across versions can
# hold mixed-schema lineage parquet. The in-run path is unaffected
# (run_extraction_job aggregates only the current run's rows); EXTERNAL
# readers of lineage/ must read with schema merging — e.g. DuckDB
# `read_parquet(..., union_by_name=true)` or Spark
# `.option("mergeSchema", "true")` — so pre-change files surface
# `n_errors` as NULL instead of erroring.
LINEAGE_PA_SCHEMA = pa.schema(
    [
        ("commit_digest", pa.string()),
        ("input_snapshot_id", pa.int64()),
        ("partition_id", pa.int32()),
        ("docs", pa.int64()),
        ("bytes", pa.int64()),
        ("errors", pa.list_(pa.string())),  # bounded sample (first N sorted)
        ("n_errors", pa.int64()),  # exact quarantine count (errors is a sample)
        ("skipped", pa.int64()),
        ("blank", pa.int64()),
        ("fallback", pa.int64()),
        ("retry_stats", pa.map_(pa.int32(), pa.int32())),
        ("started_at", pa.timestamp("us", tz="UTC")),
        ("ended_at", pa.timestamp("us", tz="UTC")),
    ]
)


def config_hash(config: dict) -> str:
    """Settings fingerprint — resume is only valid under identical settings
    (reference settings-match validation ``core/pdf_processor.py:1087-1100``,
    dpi/page-count checks; hash check ``core/checkpoint.py:221-224``)."""
    blob = json.dumps(config, sort_keys=True, default=str).encode()
    return hashlib.md5(blob).hexdigest()[:16]


def content_digest(urls: list[str], generation: str = "") -> str:
    """Deterministic digest of a partition's url set, salted with the
    generation identity ``(snapshot, config)`` → idempotent file name
    across task retries, unique across resume waves AND across
    generations: without the salt, rerunning the same input under a
    different config produces identical url sets per partition and would
    silently os.replace the previous generation's committed files."""
    h = hashlib.md5()
    h.update(generation.encode())
    h.update(b"\x00")
    for u in sorted(urls):
        h.update(u.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def commit_parquet_atomic(table: pa.Table, directory: str, name: str) -> str:
    """Write ``name.parquet`` into ``directory`` via temp + atomic replace.

    The write itself can die half-done; the replace cannot — readers never
    observe a torn file (reference's antivirus-hardened atomic save,
    ``core/checkpoint.py:151-170``).
    """
    os.makedirs(directory, exist_ok=True)
    final = os.path.join(directory, f"{name}.parquet")
    tmp = os.path.join(directory, f".tmp-{uuid.uuid4().hex}")
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return final


def committed_digests(spark: SparkSession, checkpoint_dir: str) -> DataFrame | None:
    """Digests of partitions whose CHECKPOINT rename (the single commit
    point) completed. Data/lineage files are renamed first; a crash between
    the renames leaves orphan files whose digest never appears here."""
    ckpt = read_table_dir(spark, checkpoint_dir)
    if ckpt is None:
        return None
    return ckpt.select("commit_digest").distinct()


def read_committed(spark: SparkSession, out_dir: str, sub: str) -> DataFrame | None:
    """Read ``out_dir/{sub}`` restricted to committed partitions — the
    exactly-once read view. Orphans from a crash between renames (data
    present, checkpoint absent) are excluded, so a resumed job's re-emission
    of those urls cannot surface duplicates."""
    import os as _os

    table = read_table_dir(spark, _os.path.join(out_dir, sub))
    if table is None:
        return None
    if "commit_digest" not in table.columns:
        # Data files carry the digest in their NAME (part-{pid}-{digest}),
        # not as a column — the streamed writer can't know the digest until
        # the partition's last batch. Same derivation the janitor uses.
        # The name is the ONLY link between a data file and the checkpoint,
        # so a misnamed-but-present file must fail loudly rather than
        # silently vanish from the committed view (regexp_extract returns
        # '' for non-matches, which would semi-join to nothing).
        import re as _re

        data_dir = _os.path.join(out_dir, sub)
        bad = [
            f
            for f in sorted(_os.listdir(data_dir))
            if f.endswith(".parquet")
            and not f.startswith(".")
            and not _re.search(r"-[0-9a-f]{16}\.parquet$", f)
        ]
        if bad:
            raise ValueError(
                f"read_committed: {len(bad)} data file(s) in {data_dir} carry no "
                f"commit digest in their name (contract: part-<pid>-<16 hex>."
                f"parquet) and would silently drop from the committed view: "
                f"{bad[:5]}"
            )
        table = table.withColumn(
            "commit_digest",
            F.regexp_extract(F.input_file_name(), r"-([0-9a-f]{16})\.parquet$", 1),
        )
    digests = committed_digests(spark, _os.path.join(out_dir, "checkpoint"))
    if digests is None:
        return None  # zero committed partitions — same signal as no data
    return table.join(F.broadcast(digests), "commit_digest", "left_semi")


def read_table_dir(spark: SparkSession, directory: str) -> DataFrame | None:
    """Read a parquet table directory; None if absent/empty."""
    if not os.path.isdir(directory):
        return None
    if not any(f.endswith(".parquet") for f in os.listdir(directory)):
        return None
    return spark.read.parquet(directory)


def completed_urls(
    spark: SparkSession,
    checkpoint_dir: str,
    input_snapshot_id: int,
    cfg_hash: str,
) -> DataFrame | None:
    """Urls already committed under the SAME snapshot and settings.

    Mismatched snapshot/config rows simply don't qualify — the Spark twin of
    checkpoint invalidation-by-deletion (``core/checkpoint.py:199-238``).
    """
    ckpt = read_table_dir(spark, checkpoint_dir)
    if ckpt is None:
        return None
    return (
        ckpt.filter(
            (F.col("input_snapshot_id") == F.lit(input_snapshot_id))
            & (F.col("config_hash") == F.lit(cfg_hash))
        )
        .select("url")
        .distinct()
    )
