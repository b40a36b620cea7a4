"""Connected components over a candidate-pair graph — the transitive
closure that turns pairwise near-dup hits into dedup CLUSTERS (a ~ b
and b ~ c must collapse a, b, c together even when a ~ c was never
emitted).

Algorithm: iterative minimum-label propagation on DataFrames. Every
vertex starts labeled with itself; each round every vertex takes the
min label among itself and its neighbors; converged when a round
changes nothing. Rounds needed = graph diameter — for dedup graphs
that is tiny (duplicate clusters are dense blobs, not paths), so the
loop runs 2-4 distributed joins in practice. Each round is a plain
shuffle join + groupBy min, so a 100 TB pair set works exactly like
any other big join. (For adversarial long-path graphs the
log-diameter alternating large-star/small-star scheme of
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14, drops in here — same per-round join shape.)

The driver-side loop is bounded by ``max_iter`` and each round's
convergence check is one aggregate over the label delta; lineage is
cut per round with localCheckpoint so plans don't nest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex with the smallest vertex id reachable from it.

    ``vertices``: one column ``id_col`` (include singletons — they come
    back as their own cluster). ``edges``: undirected pairs in
    ``src_col``/``dst_col``. Returns (id_col, cluster_id).
    Raises if ``max_iter`` rounds don't converge (diameter > max_iter).
    """
    und = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
    und = und.distinct().localCheckpoint(eager=True)
    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("lbl")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und["d"] == labels["v"])
            .groupBy(und["s"].alias("v"))
            .agg(F.min("lbl").alias("nl"))
        )
        new_labels = (
            labels.join(neigh, "v", "left")
            .select("v", F.least("lbl", F.coalesce("nl", "lbl")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("v").alias(id_col), F.col("lbl").alias("cluster_id"))
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
