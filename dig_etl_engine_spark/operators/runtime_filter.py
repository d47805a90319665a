"""Runtime join filters: a broadcast Bloom filter that prunes the probe
side of a join BEFORE its shuffle.

Capability superset (the reference has no join operator at all —
SURVEY §2.6): at 100 TB the classic shape is a huge fact table joined to
a *selectively filtered* dimension whose surviving keys are too many to
broadcast-join cheaply as rows, but whose MEMBERSHIP fits a few KiB of
bitset. Shuffling the entire fact table only to drop 95% of it at the
join is the single biggest avoidable cost in that plan; a Bloom filter
built from the dimension keys and applied as a plain `Filter` under the
fact-side `Exchange` removes the dead rows before they are hashed,
serialized, and shipped. This is exactly Spark's own runtime row-level
filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`), expressed
explicitly so the pruning is guaranteed (the built-in injection has
creation-cost heuristics and column-statistics preconditions that a
fresh-written table or a non-equi pattern can fail).

Design for scale:

* The bitset is built with one aggregate over the build side —
  ``groupBy(word) → bit_or`` — and collected as at most ``m/64`` int64
  words REGARDLESS of build-side row count (8 KiB at the default 2^16
  bits): bounded driver memory by construction.
* The probe test is pure codegen — `element_at` on an array literal +
  shift/mask — no UDF, no extra join, no second shuffle. The filter is a
  deterministic expression, so Catalyst pushes it below the fact-side
  Exchange (pinned by `tests/test_layout_and_bloom.py`).
* False positives only REDUCE pruning, never correctness: the exact join
  that follows settles membership. No false negatives (property-tested).
* Hashes are ``xxhash64(key, seed_i)`` — k independent seeds, the same
  64-bit mix Spark uses for shuffle hashing; all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# xxhash64 hashes INT and BIGINT differently even when the values are
# equal, so a bitset built from one width never matches probes of the
# other — silent false negatives where the exact join would up-cast and
# match (external review r7, high). Both hash inputs normalize to one
# canonical width per type family before hashing; the widening lives in
# `functions/hashkey.py`, SHARED with the bucketed KG table's _kb
# assignment (same hazard class) so the two sites cannot drift apart.
from dig_etl_engine_spark.functions.hashkey import (
    canonical_hash_type as _canonical_type,
    widen_for_hash as _hash_key,
)

_DEFAULT_M_BITS = 1 << 16   # 8 KiB bitset
_DEFAULT_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)


def build_bloom(build: DataFrame, key: str, *, m_bits: int = _DEFAULT_M_BITS,
                seeds: tuple[int, ...] = _DEFAULT_SEEDS) -> list[int]:
    """Aggregate the build side's ``key`` column into an ``m_bits``-wide
    Bloom bitset, returned as ``m_bits/64`` int64 words.

    One distributed aggregate (map-side-combined `bit_or` per word), then
    a bounded collect: at most ``m_bits/64`` rows come back no matter how
    large the build side is. Integral keys hash at BIGINT width and
    float keys at DOUBLE (see ``_hash_key``) — a probe side of a
    different width in the same family then hashes identically."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    hkey = _hash_key(F.col(key), build.schema[key].dataType.simpleString())
    pos = [F.pmod(F.xxhash64(hkey, F.lit(s)), F.lit(m_bits))
           for s in seeds]
    bits = build.select(
        F.explode(F.array(*pos)).alias("pos")
    ).select(
        F.shiftright("pos", 6).alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"),
            F.col("pos").bitwiseAND(F.lit(63)).cast("int")).alias("m"),
    ).groupBy("word").agg(F.bit_or("m").alias("bits")).collect()
    words = [0] * (m_bits // 64)
    for row in bits:
        words[row["word"]] = row["bits"]
    return words


def might_contain(words: list[int], key: Column, *,
                  seeds: tuple[int, ...] = _DEFAULT_SEEDS) -> Column:
    """Membership-test Column over the bitset from :func:`build_bloom`.

    An AND of k `element_at`-shift-mask probes on an array LITERAL — the
    bitset rides into every task inside the serialized plan (it is KiB;
    for multi-MiB filters switch to an explicit broadcast variable), and
    the whole test stays inside whole-stage codegen.

    ``key`` must hash at the SAME data type :func:`build_bloom` hashed
    (it widens integral→BIGINT, float→DOUBLE); pass
    ``_hash_key(col, simple_type)`` when the raw column may be
    narrower — :func:`bloom_pruned_join` does this for both sides."""
    m_bits = len(words) * 64
    arr = F.lit(words)
    test = F.lit(True)
    for s in seeds:
        pos = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits))
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + F.lit(1))
        bit = F.call_function("shiftleft", F.lit(1).cast("long"),
                              pos.bitwiseAND(F.lit(63)).cast("int"))
        test = test & (word.bitwiseAND(bit) != F.lit(0))
    return test


def bloom_pruned_join(probe: DataFrame, build: DataFrame, *,
                      probe_key: str, build_key: str, how: str = "inner",
                      m_bits: int = _DEFAULT_M_BITS) -> DataFrame:
    """Equi-join with the probe side Bloom-pruned before its shuffle.

    Row-identical to ``probe.join(build, probe[pk] == build[bk], how)``
    for inner/semi joins — false positives pass the filter but are
    removed by the exact join that follows; false negatives cannot occur
    (property-tested, INCLUDING mixed integral widths: both hash inputs
    widen to a canonical per-family type first — xxhash64 is
    width-sensitive, so an un-widened INT probe against a BIGINT build
    bitset would silently drop every match). Key families that the
    exact join would only reconcile through lossy/implicit casts
    (e.g. string vs numeric) raise instead of guessing.

    The build side feeds TWO consumers (the bitset aggregate's action,
    then the join), so it is pinned (`operators/pin.py`, strategy knob
    honored) — without the pin its lineage re-executes per consumer,
    which at 100 TB means scanning the dimension's source twice."""
    from dig_etl_engine_spark.operators.pin import pin

    if how not in ("inner", "left_semi", "leftsemi"):
        raise ValueError("bloom pruning is sound for inner/semi joins only")
    p_type = _canonical_type(probe.schema[probe_key].dataType.simpleString())
    b_type = _canonical_type(build.schema[build_key].dataType.simpleString())
    if p_type != b_type:
        raise ValueError(
            f"bloom_pruned_join key types diverge beyond integral/float "
            f"widening: probe {probe_key}:{p_type} vs build "
            f"{build_key}:{b_type} — the bitset membership test would "
            f"silently produce false negatives; cast the keys explicitly")
    build = pin(build, eager=False)
    words = build_bloom(build, build_key, m_bits=m_bits)
    probe_hash = _hash_key(
        probe[probe_key], probe.schema[probe_key].dataType.simpleString())
    pruned = probe.filter(might_contain(words, probe_hash))
    return pruned.join(build, pruned[probe_key] == build[build_key], how)
