"""Skew-mitigation joins — salting for hot keys (SURVEY.md §4; the
100 TB-scale complement to AQE's runtime skew-join splitting).

AQE (`spark.sql.adaptive.skewJoin`, on in :mod:`..session`) splits skewed
SHUFFLE partitions after the map stage, which handles most cases.  Salting
is the explicit, planner-independent version for the pathological ones —
a power-law key (the "hot book" every user collected) whose single hash
partition exceeds executor memory before AQE can see it:

- the FACT side tags each row with a random salt in ``[0, salt)``:
  ``key → (key, salt_i)``;
- the DIM side is replicated ``salt`` times: ``key → (key, 0..salt-1)``;
- the join runs on the composite key, spreading one hot key over ``salt``
  tasks; no row is lost or duplicated because each fact row matches exactly
  one replica.

Replication multiplies the dim side by ``salt`` — use only when the dim is
small-ish but above the broadcast threshold (a broadcastable dim should
just be broadcast: no shuffle at all beats a well-balanced one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the fact side salted ``salt``
    ways and the dim side replicated to match.

    Result is row-identical to ``fact.join(dim, on, how)`` for ``inner`` and
    ``left`` joins (the only shapes where replication is safe — a right or
    full join would multiply unmatched dim rows).  The salt is seeded so
    retries/speculative tasks re-derive the same assignment.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salted_fact = fact.withColumn(
        _SALT, (F.rand(seed) * salt).cast("int")
    )
    replicas = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_fact.join(replicas, [*keys, _SALT], how).drop(_SALT)
