"""Join operators (SURVEY.md §2.3, J1/J2 + the V6 anti-join).

The reference's only joins are two pandas left merges
(``dags/music_streaming_etl_dags.py:178-179``): streams ⟕ songs on
``track_id``, then ⟕ users on ``user_id``. Both dims are
broadcast-sized (50k users); at 100 TB fact scale the dims still fit
— users/songs grow with the catalog, not the event stream — so the
engine broadcasts dims by default and lets Catalyst fall back to
sort-merge when a dim exceeds ``spark.sql.autoBroadcastJoinThreshold``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def left_join_equi(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1/J2 — left equi-join fact ⟕ dim; unmatched fact rows keep
    NULL dim columns (pandas ``merge(how="left")`` semantics).

    ``broadcast_dim=True`` hints a broadcast-hash join (no shuffle of
    the fact side — the scale-critical property). Catalyst ignores the
    hint when the dim is too large and plans sort-merge instead.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=key, how="left")


def anti_join_orphans(
    fact: DataFrame, dim: DataFrame, key: str | list[str]
) -> DataFrame:
    """V6 — referential-integrity orphan finder: fact rows with no
    match in dim (claimed at ``README.md:33`` but never implemented in
    the reference — the NaN-genre rows are silently dropped instead).
    A left-anti join is the distributed equivalent of
    ``NOT EXISTS``."""
    return fact.join(F.broadcast(dim), on=key, how="left_anti")


def semi_join_matched(
    fact: DataFrame, dim: DataFrame, key: str | list[str]
) -> DataFrame:
    """Companion of the orphan finder: fact rows *with* a match
    (``EXISTS``) — used by validation to split good/bad rows in one
    pass without materializing the dim columns."""
    return fact.join(F.broadcast(dim), on=key, how="left_semi")
