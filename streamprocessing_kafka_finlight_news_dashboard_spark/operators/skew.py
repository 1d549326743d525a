"""Skew-mitigation joins: manual key salting.

When one join key carries a disproportionate share of rows (hot user,
boilerplate document, zero-id sentinel), the hash shuffle sends the
whole key to ONE reducer and the stage straggles. AQE's
OptimizeSkewedJoin splits oversized partitions at runtime and is the
first line of defense (enabled in the session factory); manual salting
is the deterministic fallback for when AQE is off, for stable
bucketed layouts it can't touch, or when a single key exceeds what
partition-splitting can fix (the splits of one partition still read
one map output).

Mechanics: every fact row gets a pseudo-random-but-deterministic salt
in [0, n_salts) that is NOT a function of the join key, so a hot key's
rows spread across ``n_salts`` reducers; the other side is replicated
once per salt value and the join key becomes (key, salt). Replication
multiplies the small side by ``n_salts`` — use against dimension-sized
right sides only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join of ``fact`` ⋈ ``dim`` on ``fact_key = dim_key`` with a
    ``n_salts``-way salt folded into the shuffle key.

    The salt is ``pmod(xxhash64(all fact columns), n_salts)`` —
    deterministic under task retry (no rand()), uniform, and varying
    WITHIN a key as long as rows differ somewhere. The dim side gets an
    in-row ``sequence(0, n_salts-1)`` explode (no shuffle to replicate).
    Result columns = fact columns + dim columns, exactly like the
    unsalted join.

    Supported ``how``: inner / left / left_semi / left_anti — joins
    where only the FACT side's unmatched rows can surface. Right/full
    outer are rejected: the dim side is pre-replicated per salt, so an
    unmatched dim row would null-extend ``n_salts`` times instead of
    once (dim-outer salting needs the dual construction — salt the dim
    side, replicate the fact side)."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched dim rows "
            f"would be emitted once per salt ({'right/full outer need the '}"
            "dual construction — salt dim, replicate fact)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    salted_fact = fact.withColumn(_SALT, salt)
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact[_SALT] == replicated_dim[_SALT]),
        how,
    )
    return out.drop(salted_fact[_SALT]).drop(replicated_dim[_SALT])
