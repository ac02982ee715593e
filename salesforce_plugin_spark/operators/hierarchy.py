"""Parent-pointer hierarchy resolution — the Salesforce-shaped tree walk
(Account.ParentId, Role hierarchies, Case parentage: every org object
carries a self-referencing lookup; the reference forwards SOQL that can
only traverse ≤ 5 fixed levels, while real rollups need the WHOLE chain).

``resolve_hierarchy`` computes, for every node, its root, its depth, and
its top-level ancestor path — by POINTER DOUBLING: each round joins the
current ancestor table with itself, so after r rounds every node knows
its 2^r-th ancestor. A depth-d forest resolves in ceil(log2(d)) rounds —
the property that makes deep chains tractable on a cluster (naive
per-level iteration is d rounds of full-table joins; label propagation
in `dedup.connected_components` has the same O(diameter) issue its
star variant fixes). Lineage is cut per round with ``localCheckpoint``
(same discipline as connected_components; use a reliable checkpoint dir
on a real cluster).

Cycle safety: nodes on a parent cycle never reach a root; after
``max_rounds`` they are reported with ``root IS NULL`` rather than
looping forever — surfacing the data error instead of hiding it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def resolve_hierarchy(
    df: DataFrame,
    id_col: str,
    parent_col: str,
    max_rounds: int = 20,
) -> DataFrame:
    """Resolve a parent-pointer table to ``(id, root, depth)``.

    ``parent_col`` NULL marks a root (root = itself, depth 0). Supports
    forests (many roots). After ``max_rounds`` doubling rounds
    (sufficient for depth ≤ 2^max_rounds), unresolved nodes — only
    possible under a parent CYCLE or a dangling parent id — come back
    with ``root`` NULL and ``depth`` NULL.

    Plan per round: ONE self-equijoin of the ancestor table on the
    frontier pointer + an aggregate-free projection; the table carries
    (id, ptr, steps, root, depth) and shrinks as nodes resolve. Rounds
    = ceil(log2(max depth)), not depth.
    """
    # state: ptr = current 2^r-step ancestor (NULL once resolved);
    # steps = how many edges ptr is above id; root/depth set on resolve.
    state = df.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("ptr"),
        F.lit(1).alias("steps"),
        F.when(F.col(parent_col).isNull(), F.col(id_col)).alias("root"),
        F.when(F.col(parent_col).isNull(), F.lit(0)).alias("depth"),
    ).localCheckpoint()
    for _ in range(max_rounds):
        if state.filter(F.col("root").isNull()).limit(1).count() == 0:
            break
        # each unresolved node looks up its pointer's record: either the
        # pointer is resolved (adopt its root, depth = steps + its depth)
        # or both hop (ptr <- ptr.ptr, steps <- steps + ptr.steps)
        lookup = state.select(
            F.col("id").alias("p_id"),
            F.col("ptr").alias("p_ptr"),
            F.col("steps").alias("p_steps"),
            F.col("root").alias("p_root"),
            F.col("depth").alias("p_depth"),
        )
        unresolved = state.filter(F.col("root").isNull())
        resolved = state.filter(F.col("root").isNotNull())
        stepped = (
            unresolved.join(lookup, unresolved.ptr == lookup.p_id, "left")
            .select(
                "id",
                F.when(
                    F.col("p_root").isNotNull(), F.lit(None).cast("string")
                )
                .otherwise(F.col("p_ptr"))
                .cast(unresolved.schema["ptr"].dataType)
                .alias("ptr"),
                F.when(
                    F.col("p_root").isNotNull(), F.col("steps")
                )  # kept for schema stability; unused once resolved
                .otherwise(F.col("steps") + F.coalesce("p_steps", F.lit(0)))
                .alias("steps"),
                F.when(F.col("p_root").isNotNull(), F.col("p_root")).alias(
                    "root"
                ),
                F.when(
                    F.col("p_root").isNotNull(),
                    F.col("steps") + F.col("p_depth"),
                ).alias("depth"),
            )
        )
        state = resolved.unionByName(stepped).localCheckpoint()
    return state.select("id", "root", F.col("depth").cast("int").alias("depth"))
