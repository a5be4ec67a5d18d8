"""Portable hashing expressions — md5-derived, identical across engines.

Design constraint: every hash used by an oracle-checked query must produce
byte-identical results in Spark SQL and ANSI/DuckDB SQL, so engine-native
hashes (Spark murmur3 ``hash()``, DuckDB ``hash()``) are out. ``md5`` hex
is the one hash both engines share; hex strings compare lexicographically
the same everywhere, which is all MinHash needs (min over a set).

MinHash background: Broder 1997, "On the resemblance and containment of
documents"; banding/LSH per Leskovec-Rajaraman-Ullman, *Mining of Massive
Datasets* ch. 3 (public).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def salted_md5(value: Column, salt: int) -> Column:
    """``md5(salt || ':' || value)`` — one member of a family of independent
    hash functions indexed by ``salt``."""
    return F.md5(F.concat(F.lit(f"{salt}:"), value))


def md5_bucket(value: Column, num_buckets: int, salt: int = 0) -> Column:
    """Deterministic engine-portable bucket id in ``[0, num_buckets)``.

    Uses the first 8 hex chars of the md5 parsed as an int. Equivalent
    DuckDB SQL uses the same substring via a hex→int conversion.
    """
    return (
        F.conv(F.substring(salted_md5(value, salt), 1, 8), 16, 10).cast("bigint")
        % num_buckets
    )


def minhash_signature(shingle_set: Column, num_hashes: int) -> Column:
    """MinHash signature of an ``array<string>`` shingle set.

    Component ``i`` = lexicographic min over shingles of ``md5(i || ':' || s)``.
    Returns ``array<string>`` of length ``num_hashes``. Pure Column
    expression — scales as a map-side pass, no shuffle, no UDF.
    """
    def component(i: int) -> Column:
        return F.array_min(F.transform(shingle_set, lambda s: salted_md5(s, i)))

    return F.array(*[component(i) for i in range(num_hashes)])


def band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band keys: hash each ``rows_per_band``-slice of the signature.

    Docs sharing any band key become candidate pairs. Returns
    ``array<string>`` of length ``bands`` with the band index prefixed so
    keys from different bands never collide.
    """
    return F.array(
        *[
            F.md5(
                F.concat(
                    F.lit(f"band{b}:"),
                    F.array_join(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band), "|"
                    ),
                )
            )
            for b in range(bands)
        ]
    )


def simhash(toks: Column, bits: int = 48) -> Column:
    """SimHash fingerprint of a token array (Charikar 2002, public) as a long.

    Each distinct token hashes to ``bits`` bits (first 12 hex chars of md5,
    48 bits, sign-safe in a long); fingerprint bit ``j`` is 1 iff at least
    half the tokens set bit ``j``. One per-bit fold over the array — pure
    codegen, map-side only.
    """
    if not 1 <= bits <= 60:
        raise ValueError("bits must be in [1, 60]")
    hashed = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("bigint")
    )
    n = F.size(toks)

    def ones_at(j: int):
        # separate factory per bit: PySpark introspects lambda arity, so the
        # loop variable can't be bound via a default argument
        return F.aggregate(
            hashed,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)),
        )

    out = F.lit(0).cast("bigint")
    for j in range(bits):
        out = out + F.when(ones_at(j) * 2 >= n, F.lit(2**j)).otherwise(F.lit(0)).cast(
            "bigint"
        )
    return out


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two long fingerprints: popcount of the XOR."""
    return F.bit_count(a.bitwiseXOR(b))
