"""Deterministic quantized Lloyd's KMeans — the IVF coarse quantizer.

Replaces the round-1 MLlib KMeans (whose k-means|| init samples depend
on input partitioning, making the result machine-dependent) with a
from-scratch variant whose EVERY step is exact integer arithmetic:

- coordinates quantize to q = floor(v * 2^20 + 0.5) (BIGINT),
- distances are Σ_d (qv_d - qc_d)^2 — integer sums ≤ 64·(2^21)^2 = 2^48,
  exact in BIGINT *and* in IEEE double, so the value is identical no
  matter which engine or summation order computes it,
- centroid updates are integer sums + a floored rational mean
  qc = floor((2·Σq + n) / (2n)) (i.e. round-half-up of Σq/n),
- init is the quantized embeddings of the k smallest vec_ids,
- ties in the assignment break on the lower cell index (exact ints).

Order-independence of integer addition is what buys determinism across
partitionings AND a value-exact DuckDB oracle (queries.py mirrors the
chain as unrolled per-iteration CTEs) — the reason fixed-iteration
float KMeans stayed rows-only through round 4 (FP summation order).

Scale shape (10^12 rows): per iteration ONE groupBy(cell) with 65
map-side-partial integer aggregates (k·dim ≈ 512 scalars to the
driver — never row data); the assignment is a per-row argmin over k
broadcast literal centroids (no join, no shuffle); the input is
localCheckpoint'd once so each iteration re-reads columnar cache, and
lineage does not grow with the iteration count. The 2^-20 quantization
(≈1e-6 of the coordinate scale) is far below any meaningful cluster
geometry at production embedding scales.

Reference: the IVF pattern follows the reference's coarse-quantizer
usage (SURVEY.md §2 graft additions); there is no KMeans in the
reference itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_BITS = 20
Q_SCALE = float(1 << Q_BITS)


def quantize_col(v):
    """array<long> Column: per-dim floor(v * 2^20 + 0.5)."""
    return F.transform(v, lambda x: F.floor(x * Q_SCALE + 0.5))


def _dist2q(qv, qc: list[int]):
    """Exact integer squared distance between the qv array Column and a
    literal quantized centroid (HOF chain — interpreted, but the whole
    argmin is one pass per row over k·dim cheap integer ops)."""
    lit = F.array(*[F.lit(int(c)) for c in qc])
    return F.aggregate(
        F.zip_with(qv, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_cells(eq: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Adds `cell` = argmin_c dist2q(qv, centroids[c]) (ties -> lower
    cell). Pure per-row Columns — zero shuffle."""
    scored = F.array(
        *[
            F.struct(_dist2q(F.col("qv"), c).alias("d"), F.lit(ci).alias("c"))
            for ci, c in enumerate(centroids)
        ]
    )
    return eq.withColumn("cell", F.element_at(F.array_sort(scored), 1)["c"])


def quantized_kmeans(
    e: DataFrame,
    k: int = 8,
    update_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> tuple[DataFrame, list[list[int]]]:
    """Runs init + `update_iters` x (assign -> integer centroid update)
    and returns (assigned DataFrame with `cell` under the FINAL
    centroids, the final quantized centroids). Deterministic for any
    partitioning; value-mirrored by the DuckDB oracle in queries.py
    (q_ann_ivf_kmeans)."""
    dim_row = e.select(F.size(vec_col)).first()
    if dim_row is None:
        raise ValueError("quantized_kmeans: empty input")
    dim = dim_row[0]
    eq = e.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        quantize_col(F.col(vec_col)).alias("qv"),
    ).localCheckpoint()
    init = eq.orderBy("vec_id").limit(k).select("qv").collect()
    centroids = [list(r["qv"]) for r in init]
    for _ in range(update_iters):
        assigned = assign_cells(eq, centroids)
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("qv", d + 1)).alias(f"s{d}")
                    for d in range(dim)
                ],
            )
            .collect()
        )
        new = dict(enumerate(centroids))  # empty cells keep their centroid
        for r in sums:
            n = int(r["n"])
            new[int(r["cell"])] = [
                (2 * int(r[f"s{d}"]) + n) // (2 * n) for d in range(dim)
            ]
        centroids = [new[i] for i in range(k)]
    return assign_cells(eq, centroids), centroids
