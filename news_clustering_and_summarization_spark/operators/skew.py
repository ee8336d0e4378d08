"""Skew-mitigation join: salting for hot keys.

At 100 TB a handful of hot join keys (one viral article id, one
mega-cluster) put an entire shuffle partition on one executor. AQE's
skew-join splitting handles sort-merge joins after the fact; salting
handles it *by construction* and also covers the cases AQE doesn't
(aggregation-under-join patterns, pre-AQE planners, stream-static
joins). The trade: the small side is replicated ``salt`` times, so use
it when `small` is dimension-sized but too big (or too dynamic) to
broadcast.

Mechanics: every probe-side row gets a deterministic salt in
[0, salt) derived from a hash of the whole row's key + a spread
column; the build side is exploded once per salt value; the join key
becomes (key, salt) — hot keys now spread over ``salt`` partitions.
Results are row-for-row identical to the unsalted join (asserted in
tests and oracle-gated via the `skew_join` catalog query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the hot-key
    shuffle spread over ``salt`` sub-partitions.

    ``big`` rows are salted by a deterministic per-row hash (xxhash64
    over all columns — stable, no rand(), so retries/replays land
    identically); ``small`` is exploded ``salt`` ways. Supported
    ``how``: inner / left (semantics preserved because every big row
    keeps exactly its original match set under (key, salt)).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    big_s = big.withColumn("_salt", bucket.cast("int"))
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")


def adaptive_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = DEFAULT_SALT,
    hot_threshold: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Salt ONLY the detected hot keys; the cold majority takes the
    plain equi-join and pays no replication.

    One counting pass over ``big``'s key column (cheap: partial-agg
    shuffle of distinct keys) finds keys with more than
    ``hot_threshold`` rows. The hot slice joins salted, the cold slice
    joins plain, results union. Row-identical to the plain join for
    inner and left (each big row lands in exactly one slice and keeps
    its full match set).

    This is the production shape: fixed salting multiplies the whole
    small side by ``salt``; adaptive salting multiplies it only by
    (hot keys / all keys) * salt, which at 100 TB is the difference
    between a free insurance policy and doubling the shuffle.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"adaptive_salted_join supports inner/left, got {how}")
    hot_keys = (
        big.groupBy(on)
        .count()
        .where(F.col("count") > hot_threshold)
        .select(on)
    )
    big_hot = big.join(F.broadcast(hot_keys), on, "left_semi")
    big_cold = big.join(F.broadcast(hot_keys), on, "left_anti")
    small_hot = small.join(F.broadcast(hot_keys), on, "left_semi")
    hot_joined = salted_join(big_hot, small_hot, on, salt=salt, how=how)
    cold_joined = big_cold.join(small, on, how)
    return hot_joined.unionByName(cold_joined)
