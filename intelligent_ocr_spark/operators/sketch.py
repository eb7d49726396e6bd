"""Cardinality sketches: HyperLogLog registers as a relational plan.

Counting distinct URLs/hosts/content-hashes across a 100-TB crawl with
``COUNT(DISTINCT x)`` shuffles every distinct value; the HLL sketch
(Flajolet et al. 2007, public) needs one aggregation whose result is
``2^p`` rows regardless of input size. Spark's built-in
``approx_count_distinct`` is exactly this, but its register layout is
engine-private — this operator materializes the registers themselves
with a fixed public hash (md5, the repo's cross-engine idiom) so that

* the register table is INTEGER-EXACT and deterministic → the DuckDB
  oracle reproduces it bit-for-bit (no float estimate in the gate);
* registers from disjoint corpus shards / incremental runs MERGE by
  ``max`` per bucket (the union property real pipelines rely on);
* the float estimate is a trivial driver-side fold over 2^p rows,
  tested separately against exact distinct counts with the standard
  error bound (1.04/sqrt(m)).

Hash layout (p divisible by 4 so hex slicing is exact): md5 hex of the
key; first ``p/4`` hex chars → bucket, next 14 hex chars → a 56-bit
suffix ``v``; ``rho = (64-p) - bit_length(v) + 1`` (leading-zeros+1),
``v = 0`` → ``(64-p)+1``. ``bit_length`` is ``length(conv(v, 10, 2))``
in Spark and ``length(bin(v))`` in DuckDB — string length of the
minimal binary rendering, exact for all int64.

Scale shape: one partial-aggregated groupBy on ``2^p ≤ 4096`` keys
(map-side combine collapses every task to ≤ m rows before the one tiny
exchange), then a broadcast left join against ``spark.range(m)`` to
surface empty buckets as ``rho = 0``. No distinct, no wide shuffle,
no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_estimate",
    "bloom_build",
    "bloom_maybe_contains",
    "countmin_build",
    "countmin_estimate",
]

# Shared double-hashing layout (Kirsch–Mitzenmacher 2006, public: two
# base hashes simulate k independent ones as h1 + i·h2). One md5 per
# key: h1 = first 8 hex chars, h2 = next 8, forced odd as 2·h2+1 so it
# is coprime with power-of-two table sizes. All int64 arithmetic
# (h1 < 2^32, i ≤ 16 ⇒ no overflow), identical in the DuckDB twins.


def _base_hashes(key, seed: str):
    hx = F.md5(
        F.encode(
            F.concat(
                F.lit(seed),
                F.lit("|"),
                F.col(key) if isinstance(key, str) else key,
            ),
            "UTF-8",
        )
    )
    h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") * 2 + 1
    return h1, h2


def hll_registers(df: DataFrame, key, p: int = 8) -> DataFrame:
    """Register table ``(bucket, rho)`` — all ``2^p`` buckets, empty
    ones at ``rho = 0``. ``key`` is a Column (or name) of string type;
    rows with NULL keys are ignored (SQL aggregate convention)."""
    if p % 4 or not 4 <= p <= 12:
        raise ValueError("p must be divisible by 4, within [4, 12]")
    m = 1 << p
    suffix_bits = 64 - p
    hx = F.md5(F.encode(F.col(key) if isinstance(key, str) else key, "UTF-8"))
    bucket = F.conv(F.substring(hx, 1, p // 4), 16, 10).cast("long")
    v = F.conv(F.substring(hx, p // 4 + 1, 14), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(suffix_bits + 1))
        .otherwise(
            F.lit(suffix_bits) - F.length(F.conv(v.cast("string"), 10, 2)) + 1
        )
        .cast("long")
    )
    regs = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .where(F.col("rho").isNotNull())
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    spark = SparkSession.getActiveSession() or df.sparkSession
    all_buckets = spark.range(m).select(F.col("id").alias("bucket"))
    return (
        all_buckets.join(F.broadcast(regs), "bucket", "left")
        .select("bucket", F.coalesce("rho", F.lit(0)).cast("long").alias("rho"))
    )


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """Standard HLL estimate from a collected register table
    (Flajolet et al. 2007 §4, with the small-range linear-counting
    correction). Driver-side fold over 2^p rows — never a Spark job."""
    m = len(registers)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    s = sum(2.0 ** -rho for _, rho in registers)
    est = alpha * m * m / s
    zeros = sum(1 for _, rho in registers if rho == 0)
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return est


def bloom_build(df: DataFrame, key, m_bits: int = 8192, k: int = 4,
                seed: str = "bf0") -> DataFrame:
    """Bloom filter (Bloom 1970, public) over a key column → the packed
    bit table (word, bits): ``m_bits/32`` words, 32 filter bits per
    int64 word (bit 31 max keeps every value positive in both engines —
    DuckDB raises on ``1::BIGINT << 63``). The crawl-frontier seen-set
    structure: "have we fetched this URL?" across 10^12 documents needs
    a membership test whose state is ``m_bits/8`` BYTES, not the key
    set itself; false positives (re-skipping an unseen URL) are the
    tolerable direction, false negatives never happen.

    Scale shape: one projection exploding each key to its ``k`` probe
    positions (one md5 per key — double hashing, see ``_base_hashes``),
    then ONE map-side-combined ``bit_or`` aggregation on ≤ m_bits/32
    word keys, and a broadcast left join against ``spark.range`` to
    surface never-touched words as 0. Filters from disjoint corpus
    shards merge by OR-ing word-wise (pytest-pinned), the same union
    property as ``hll_registers``."""
    if m_bits % 32 or m_bits < 32:
        raise ValueError("m_bits must be a positive multiple of 32")
    if not 1 <= k <= 16:
        raise ValueError("k must be within [1, 16]")
    h1, h2 = _base_hashes(key, seed)
    touched = (
        df.select(h1.alias("_h1"), h2.alias("_h2"))
        .where(F.col("_h1").isNotNull())
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
            F.col("_h1"),
            F.col("_h2"),
        )
        .select(((F.col("_h1") + F.col("_i") * F.col("_h2")) % m_bits).alias("_pos"))
        .select(
            F.expr("_pos div 32").alias("word"),
            # F.shiftleft needs a literal shift count; the SQL form
            # accepts a column (bit <= 31, so the value stays positive)
            F.expr("shiftleft(1L, cast(_pos % 32 as int))").alias("_val"),
        )
        .groupBy("word")
        .agg(F.bit_or("_val").alias("bits"))
    )
    spark = SparkSession.getActiveSession() or df.sparkSession
    words = spark.range(m_bits // 32).select(F.col("id").alias("word"))
    return words.join(F.broadcast(touched), "word", "left").select(
        "word", F.coalesce("bits", F.lit(0)).cast("long").alias("bits")
    )


def bloom_maybe_contains(bloom: DataFrame, probes: DataFrame, key,
                         m_bits: int = 8192, k: int = 4,
                         seed: str = "bf0") -> DataFrame:
    """Membership probe against a ``bloom_build`` table: one row per
    input probe row with ``maybe_present`` — true iff ALL ``k`` probe
    bits are set (false positives possible at the designed rate
    ``(1-e^(-kn/m))^k``; false negatives never). ``m_bits``/``k``/
    ``seed`` must match the build call.

    Scale shape: probes explode to k (word, bit) lookups, broadcast
    equi-join against the (tiny — m_bits/32 rows) filter table, then
    one map-side-combined min per probe key. The probe side is never
    shuffled on a skewed key: the join key is the word index."""
    h1, h2 = _base_hashes(key, seed)
    kcol = F.col(key) if isinstance(key, str) else key
    probe_bits = (
        probes.select(kcol.alias("probe_key"), h1.alias("_h1"), h2.alias("_h2"))
        .select(
            "probe_key",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
            F.col("_h1"),
            F.col("_h2"),
        )
        .select(
            "probe_key",
            F.expr(f"((_h1 + _i * _h2) % {m_bits}) div 32").alias("word"),
            ((F.col("_h1") + F.col("_i") * F.col("_h2")) % m_bits % 32)
            .cast("int")
            .alias("_bit"),
        )
    )
    hit = F.expr("shiftright(bits, _bit) & 1").alias("_hit")
    return (
        probe_bits.join(F.broadcast(bloom), "word")
        .select("probe_key", hit)
        .groupBy("probe_key")
        .agg((F.min("_hit") == 1).alias("maybe_present"))
    )


def countmin_build(df: DataFrame, key, width: int = 1024, depth: int = 4,
                   seed: str = "cm0") -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public) over a
    key column → the sparse counter table (row, col, c): ``depth``
    hash rows of ``width`` counters, storing only touched cells. The
    fixed-size frequency summary for heavy-hitter questions ("how
    often does this token/URL/host occur?") whose state is
    ``depth·width`` integers regardless of corpus size — the sketch
    complement to the exact ``functions/freq`` heavy-hitter split.

    Scale shape: one projection exploding each occurrence to ``depth``
    (row, col) cells (one md5 per key), then ONE map-side-combined
    count aggregation on ≤ depth·width cell keys. Sketches from
    disjoint shards merge by cell-wise ADDITION (pytest-pinned)."""
    if width < 1 or depth < 1 or depth > 16:
        raise ValueError("width must be >= 1, depth within [1, 16]")
    h1, h2 = _base_hashes(key, seed)
    return (
        df.select(h1.alias("_h1"), h2.alias("_h2"))
        .where(F.col("_h1").isNotNull())
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
            F.col("_h1"),
            F.col("_h2"),
        )
        .select(
            F.col("row").cast("long").alias("row"),
            ((F.col("_h1") + F.col("row") * F.col("_h2")) % width).alias("col"),
        )
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_estimate(cms: DataFrame, probes: DataFrame, key,
                      width: int = 1024, depth: int = 4,
                      seed: str = "cm0") -> DataFrame:
    """Point-frequency estimate from a ``countmin_build`` table: one
    row per probe row with ``est`` = min over the ``depth`` counters at
    the key's cells — an over-estimate by construction (never under;
    pytest-pinned), within ``2n/width`` of truth with probability
    ``1 - 2^-depth``. Parameters must match the build call.

    Scale shape: probes explode to depth cell lookups, broadcast join
    against the (≤ depth·width rows) sketch, one min per probe key."""
    h1, h2 = _base_hashes(key, seed)
    kcol = F.col(key) if isinstance(key, str) else key
    cells = (
        probes.select(kcol.alias("probe_key"), h1.alias("_h1"), h2.alias("_h2"))
        .select(
            "probe_key",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
            F.col("_h1"),
            F.col("_h2"),
        )
        .select(
            "probe_key",
            F.col("row").cast("long").alias("row"),
            ((F.col("_h1") + F.col("row") * F.col("_h2")) % width).alias("col"),
        )
    )
    return (
        cells.join(F.broadcast(cms), ["row", "col"], "left")
        .select("probe_key", F.coalesce("c", F.lit(0)).alias("_c"))
        .groupBy("probe_key")
        .agg(F.min("_c").alias("est"))
    )
