"""Deterministic, engine-portable hashing.

The dedup / MinHash / SimHash operators need a hash family that produces the
SAME values in Spark and in the DuckDB oracle. Neither engine's native 64-bit
hash matches the other, but both have md5 over strings, so the base hash is
the first 8 hex digits of md5 interpreted as an unsigned 32-bit integer:

    Spark:  cast(conv(substr(md5(s), 1, 8), 16, 10) as bigint)
    DuckDB: ('0x' || substr(md5(s), 1, 8))::BIGINT

The affine family h_i(s) = (a_i * H(s) + b_i) mod p uses a_i < 2^20 so
a_i * H < 2^52 never overflows signed 64-bit in either engine.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

#: prime just above 2^32
MERSENNE_P = 4294967311


def _family(n: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 20) | 1, rng.randrange(0, MERSENNE_P)) for _ in range(n)]


#: fixed 64-member family shared by Spark and oracle SQL
HASH_FAMILY = _family(64)


def md5_u32(s: Column) -> Column:
    """Unsigned 32-bit base hash of a string (Spark side)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def md5_u60(s: Column) -> Column:
    """60-bit base hash (first 15 md5 hex digits) — for join keys where the
    32-bit space's birthday collisions would matter (~n²/2⁶¹ pair-collision
    odds keep 60 bits effectively exact at any realistic shingle count).
    15 digits (not 16) so the value always fits SIGNED 64-bit in both
    engines."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def md5_u60_sql_duckdb(s: str) -> str:
    return f"(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


def md5_u32_sql_duckdb(s: str) -> str:
    return f"(('0x' || substr(md5({s}), 1, 8))::BIGINT)"


def md5_u32_sql_spark(s: str) -> str:
    return f"cast(conv(substr(md5({s}), 1, 8), 16, 10) as bigint)"


def affine(h: Column, i: int) -> Column:
    a, b = HASH_FAMILY[i]
    return (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)


def affine_sql(h: str, i: int) -> str:
    a, b = HASH_FAMILY[i]
    return f"(({a} * {h} + {b}) % {MERSENNE_P})"


def cm_cells(h: Column, depth: int, width: int) -> Column:
    """Array of (d, c) Count-Min cell structs for base hash ``h`` — the ONE
    definition of the sketch geometry, shared by the batch sketch and probe
    (queries/pipelineq.py), the streaming sketch build (streaming/ops.py)
    and the streaming probe epilogue (queries/streamq.py). The build and
    probe sides MUST hash bit-identically or the overestimate guarantee
    silently breaks; a single helper removes that drift risk."""
    return F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            (affine(h, d) % F.lit(width)).alias("c"),
        )
        for d in range(depth)
    ])
