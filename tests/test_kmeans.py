"""Quantized Lloyd's KMeans (operators/kmeans.py): the determinism and
exactness properties that make ann_ivf_kmeans value-oracle-able."""

import numpy as np
import pytest


def _toy(spark, n=120, dim=8, parts=1):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, dim)) * 4
    rows = [
        (int(i), (centers[i % 3] + rng.normal(size=dim) * 0.3).tolist())
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, v array<double>"
    ).repartition(parts)


def test_partitioning_independence(spark):
    """Identical assignments AND centroids for any input partitioning —
    integer sums are order-independent (the property the MLlib
    k-means|| quantizer lacked)."""
    from equi7grid_spark.operators.kmeans import quantized_kmeans

    outs = []
    for parts in (1, 7):
        assigned, cents = quantized_kmeans(_toy(spark, parts=parts), k=3)
        outs.append(
            (sorted((r.vec_id, r.cell) for r in assigned.collect()), cents)
        )
    assert outs[0] == outs[1]


def test_matches_numpy_twin(spark):
    """Spark result == an independent NumPy reimplementation of the
    same quantized chain, exactly (no tolerance)."""
    from equi7grid_spark.operators.kmeans import Q_BITS, quantized_kmeans

    df = _toy(spark)
    rows = sorted((r.vec_id, r.v) for r in df.collect())
    V = np.array([v for _, v in rows])
    Q = np.floor(V * (1 << Q_BITS) + 0.5).astype(np.int64)
    k = 3
    cents = Q[:k].copy()  # k smallest vec_ids (rows sorted)

    def assign(c):
        d = ((Q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # argmin takes the first (lowest cell) on ties

    for _ in range(2):
        a = assign(cents)
        for ci in range(k):
            m = a == ci
            if m.any():
                s, n = Q[m].sum(axis=0), int(m.sum())
                cents[ci] = (2 * s + n) // (2 * n)
    expect_cells = assign(cents)

    assigned, got_cents = quantized_kmeans(df, k=k)
    got = {r.vec_id: r.cell for r in assigned.collect()}
    assert got == {i: int(c) for (i, _), c in zip(rows, expect_cells)}
    assert [list(c) for c in cents] == got_cents


def test_empty_input_raises(spark):
    from equi7grid_spark.operators.kmeans import quantized_kmeans

    empty = spark.createDataFrame([], "vec_id long, v array<double>")
    with pytest.raises(ValueError, match="empty"):
        quantized_kmeans(empty)
