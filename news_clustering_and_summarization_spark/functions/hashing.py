"""Deterministic, cross-engine hashing primitives.

Everything here is built on md5 so the DuckDB oracle can reproduce the
exact same integers: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT``. 15 hex chars = 60 bits,
always positive in a signed 64-bit long. Seeded variants prepend
``'<seed>|'`` to the input.

Used by: the deterministic embedder (operators/embed.py), MinHash /
SimHash / n-gram dedup (operators/dedup.py), document fingerprinting
(operators/text_analysis.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_CHARS = 15  # 60 bits, positive in int64 both engines

# Tokenization shared with the oracle: lowercase, split on runs of
# non-alphanumerics, drop empties.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def tokens_sql(expr: str) -> str:
    return (
        "list_filter(regexp_split_to_array(lower({e}), '[^a-z0-9]+'), "
        "t -> t <> '')"
    ).format(e=expr)


def hash64(col: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit positive hash of a string column."""
    inp = col if seed is None else F.concat(F.lit(f"{seed}|"), col)
    return F.conv(F.substring(F.md5(inp), 1, HASH_HEX_CHARS), 16, 10).cast(
        "long"
    )


def hash64_sql(expr: str, seed: int | None = None) -> str:
    inp = expr if seed is None else f"('{seed}|' || {expr})"
    return f"('0x' || substr(md5({inp}), 1, {HASH_HEX_CHARS}))::BIGINT"


def word_shingles(tok: Column, n: int) -> Column:
    """Word n-grams joined with spaces from a token array.

    Empty result when the document has < n tokens (matches oracle).
    Note Spark's sequence(1, 0) counts DOWN, so short docs need an
    explicit empty-array branch.
    """
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    return F.when(
        F.size(tok) < F.lit(n), F.array().cast("array<string>")
    ).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(tok, i, n), " "))
    )


def word_shingles_sql(tokens_expr: str, n: int) -> str:
    return (
        "list_transform(range(1, greatest(len({t}) - {n} + 1, 0) + 1), "
        "i -> array_to_string(list_slice({t}, i, i + {n} - 1), ' '))"
    ).format(t=tokens_expr, n=n)


# MinHash permutations: one md5 per shingle (base hash), then k affine
# permutations perm_i(h) = (a_i * h31 + b_i) mod P with P = 2^31-1 and
# h31 = hash64(s) mod P. a_i < P and h31 < P keep the product < 2^62 —
# exact in int64 in BOTH engines, and ~k× cheaper than k md5 calls.
MINHASH_PRIME = (1 << 31) - 1


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(k)
    ]


def shingle_hash31(s: Column) -> Column:
    """Base 31-bit shingle hash shared by all permutations."""
    return (
        F.conv(F.substring(F.md5(s), 1, HASH_HEX_CHARS), 16, 10).cast("long")
        % F.lit(MINHASH_PRIME)
    )


def shingle_hash31_sql(expr: str) -> str:
    return (
        f"(('0x' || substr(md5({expr}), 1, {HASH_HEX_CHARS}))::BIGINT"
        f" % {MINHASH_PRIME})"
    )


def minhash_signature(shingles: Column, k: int, seed: int = 42) -> Column:
    """k-permutation MinHash signature as an array column.

    min over an empty shingle set is NULL (documents shorter than the
    shingle width produce a NULL signature slot — callers filter).
    """
    params = minhash_params(k, seed)
    hashes = F.transform(shingles, shingle_hash31)

    def perm(a: int, b: int):
        # plain closure: Spark derives lambda arity from the signature,
        # so default-arg tricks would read as a 3-arg lambda
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)

    return F.array(
        *[F.array_min(F.transform(hashes, perm(a, b))) for a, b in params]
    )


def minhash_signature_sql(shingles_expr: str, k: int, seed: int = 42) -> str:
    params = minhash_params(k, seed)
    h = "list_transform({s}, s -> {h31})".format(
        s=shingles_expr, h31=shingle_hash31_sql("s")
    )
    slots = ", ".join(
        f"list_min(list_transform({h}, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
        for a, b in params
    )
    return f"[{slots}]"


# --- SimHash ----------------------------------------------------------
# 60-bit simhash (hash64 yields 60 random bits; value stays positive in
# a signed 64-bit long in both engines). Bit extraction must stay in
# exact integer arithmetic — float division silently loses precision
# above 2^53 — so bit_j(h) = (h % 2^(j+1)) >= 2^j.

SIMHASH_BITS = 60


def _bit(h: Column, j: Column, pw: Column, pw2: Column) -> Column:
    """Exact bit_j(h) using only %, >= on longs."""
    return F.when(
        (h % F.element_at(pw2, j)) >= F.element_at(pw, j), F.lit(1)
    ).otherwise(F.lit(0))


def _powers() -> tuple[Column, Column]:
    pw = F.array(*[F.lit(1 << j) for j in range(SIMHASH_BITS)])
    pw2 = F.array(*[F.lit(1 << (j + 1)) for j in range(SIMHASH_BITS)])
    return pw, pw2


def simhash(tok: Column) -> Column:
    """SimHash over token hashes: for each bit, sum +/-1 across tokens,
    set the bit when the sum is positive."""
    hashes = F.transform(
        tok,
        lambda t: F.conv(
            F.substring(F.md5(t), 1, HASH_HEX_CHARS), 16, 10
        ).cast("long"),
    )
    pw, pw2 = _powers()
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda s, h: s + (_bit(h, j, pw, pw2) * 2 - 1),
            )
            > 0,
            F.element_at(pw, j),
        ).otherwise(F.lit(0)),
    )


def token_hashes_sql(tokens_expr: str) -> str:
    """Hashed-token list (one 31-hex-bit md5 prefix per token) — hoist
    this into a subquery/CTE column and feed simhash_from_hashes_sql,
    so the per-bit lambda below doesn't re-tokenize + re-md5 the whole
    document once per simhash bit."""
    return (
        "list_transform({t}, s -> "
        "('0x' || substr(md5(s), 1, {hh}))::BIGINT)"
    ).format(t=tokens_expr, hh=HASH_HEX_CHARS)


def simhash_from_hashes_sql(hashes_expr: str) -> str:
    # bit test via shift+mask, NOT via indexing a power-of-two list
    # literal: a list literal inside the inner lambda is rebuilt per
    # element evaluation (bits x tokens x rows times) and dominated
    # the oracle at ~50 ms/row; `(v >> (j-1)) & 1` is equivalent for
    # the non-negative 60-bit hashes and runs ~100x faster
    return (
        "list_sum(list_transform(range(1, {b} + 1), j -> CASE WHEN "
        "list_sum(list_transform({h}, v -> CASE WHEN "
        "((v >> (j - 1)) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
        "THEN (1::BIGINT << (j - 1)) ELSE 0 END))::BIGINT"
    ).format(b=SIMHASH_BITS, h=hashes_expr)


def simhash_sql(tokens_expr: str) -> str:
    # single-expression form: fine for small fixtures; prefer hoisting
    # token_hashes_sql in a subquery for corpus-sized oracles (the
    # hash list re-evaluates once per bit here)
    return simhash_from_hashes_sql(token_hashes_sql(tokens_expr))


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR, same exact-integer bit extraction."""
    x = a.bitwiseXOR(b)
    pw, pw2 = _powers()
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
        F.lit(0),
        lambda acc, j: acc + _bit(x, j, pw, pw2),
    )


def hamming_distance_sql(a: str, b: str) -> str:
    # shift+mask bit test for the same reason as
    # simhash_from_hashes_sql: per-element list literals in the lambda
    # are rebuilt every evaluation
    return (
        "list_sum(list_transform(range(1, {b_} + 1), j -> "
        "(xor({a}, {b}) >> (j - 1)) & 1))::BIGINT"
    ).format(b_=SIMHASH_BITS, a=a, b=b)


# --- Rolling / polynomial fingerprint --------------------------------
# Polynomial rolling hash over token hashes mod 2^61-1 — order
# sensitive, so reordered documents fingerprint differently.
FP_MOD = (1 << 61) - 1
FP_BASE = 1_000_003


def fingerprint(tok: Column) -> Column:
    hashes = F.transform(
        tok,
        lambda t: F.conv(
            F.substring(F.md5(t), 1, HASH_HEX_CHARS), 16, 10
        ).cast("long"),
    )
    # acc*BASE + h can overflow int64; do it in modular steps that fit:
    # acc' = ((acc % MOD) * BASE + h) is still too big for int64 when
    # acc ~ 2^61. Use DECIMAL(38,0) intermediate in both engines.
    return F.aggregate(
        hashes,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, h: (
            acc * F.lit(FP_BASE) + h.cast("decimal(38,0)")
        ) % F.lit(FP_MOD).cast("decimal(38,0)"),
        lambda acc: acc.cast("long"),
    )


def fingerprint_sql(tokens_expr: str) -> str:
    h = (
        "list_transform({t}, s -> "
        "('0x' || substr(md5(s), 1, {hh}))::BIGINT)"
    ).format(t=tokens_expr, hh=HASH_HEX_CHARS)
    return (
        "list_reduce(list_prepend(0::HUGEINT, {h}), "
        "(acc, v) -> (acc * {base}::HUGEINT + v::HUGEINT) % {mod}::HUGEINT"
        ")::BIGINT"
    ).format(h=h, base=FP_BASE, mod=FP_MOD)
