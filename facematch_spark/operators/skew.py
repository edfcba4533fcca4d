"""Generic deterministic salted equi-join — the explicit form of the skew
mechanism this engine uses internally (hot-band salting in the LSH tiers,
`salted_probe_join` in `operators/lsh.py`), exposed as a reusable operator.

The shape it fixes: a fact table joined on a LOW-CARDINALITY or skewed key
(5 event types over 10^12 events, one viral document id, one hot band)
hash-partitions every row of a hot key into ONE reducer — the whole cluster
waits on a single task. AQE's skew-join split only helps sort-merge joins
whose skew it can observe at shuffle-read time; pre-AQE stages,
shuffle-hash joins and deliberately-hinted plans don't get it.

The fix: replicate the SMALL side once per salt (×n_salts rows — fine,
it's the small side), give every BIG-side row a salt derived from a
row-unique column, and join on (key, salt): each hot key now spreads over
``n_salts`` reducers. Result multiset == plain join (each big row meets
exactly one replica of each matching small row).

Determinism note (why not `rand()`): the salt is ``pmod(xxhash64(uniq), n)``
— a pure function of the row, so the plan is reproducible across retries,
partitionings and engines; a random salt re-draws per task attempt and
breaks both speculative execution and any value-hash oracle.

Reference parity: the reference's Celery fan-out (tasks.py:69-96) has no
join, hence no skew story; this module is the engine-side mechanism the
north rule names ("salt hot bands ... spill-safe shuffle for skewed
popular shingles").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_equi_join"]


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    uniq_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner-join ``big`` ⋈ ``small`` on column ``on``, spreading each join
    key over ``n_salts`` reducers.

    ``uniq_col`` must be a big-side column that distributes rows within a
    key (a row id, an event id, a timestamp — uniqueness not required, only
    spread). The salt is deterministic (xxhash64 of that column), so the
    join result — and any downstream value hash — is partition-layout- and
    retry-invariant.

    Scale: small side is exploded ×``n_salts`` before its (broadcast or
    shuffle) build — keep ``n_salts ≤`` a few hundred for genuinely small
    dims. The big side gains one map-only projection; the shuffle moves the
    same bytes as the unsalted join but over ``n_salts``× more reducer keys.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    dup = [c for c in small.columns if c != on and c in big.columns]
    if dup:
        raise ValueError(
            f"overlapping non-key columns {dup}; rename before joining"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(uniq_col)), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return salted_big.join(salted_small, [on, "_salt"], "inner").drop("_salt")
