"""IVF coarse-quantizer ANN (operators/ann.ivf_topk)."""

import numpy as np
from pyspark.sql import functions as F


def _clustered(spark, n=160, dim=16, K=4, seed=3):
    rng = np.random.RandomState(seed)
    cents = np.zeros((K, dim))
    for j in range(K):
        cents[j, j] = 1.0
    rows = []
    for i in range(n):
        j = i % K
        v = cents[j] + 0.05 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, cents


def test_ivf_matches_bruteforce_on_separated_clusters(spark):
    from geo_spark.operators.ann import cosine_topk, ivf_topk

    corpus, cents = _clustered(spark)
    queries = corpus.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    ivf = ivf_topk(corpus, queries, cents, k=5, nprobe=1).collect()
    brute = cosine_topk(corpus, queries, k=5).collect()
    key = lambda r: (r["qid"], r["rank"])
    ivf_m = {key(r): (r["vec_id"], round(r["cosine"], 9)) for r in ivf}
    bru_m = {key(r): (r["vec_id"], round(r["cosine"], 9)) for r in brute}
    assert ivf_m == bru_m


def test_ivf_nprobe_widens_candidates(spark):
    # put a query BETWEEN two clusters: nprobe=1 misses neighbors from the
    # second cell, nprobe=2 recovers the true top-k
    from geo_spark.operators.ann import cosine_topk, ivf_topk

    corpus, cents = _clustered(spark)
    mid = (cents[0] + cents[1]) / np.linalg.norm(cents[0] + cents[1])
    q = spark.createDataFrame(
        [(0, [float(x) for x in mid])], "qid long, embedding array<double>"
    )
    brute = {r["vec_id"] for r in cosine_topk(corpus, q, k=8).collect()}
    got1 = {r["vec_id"] for r in ivf_topk(corpus, q, cents, k=8, nprobe=1).collect()}
    got2 = {r["vec_id"] for r in ivf_topk(corpus, q, cents, k=8, nprobe=2).collect()}
    assert got1 != brute  # the IVF recall trade is real at nprobe=1
    assert got2 == brute  # and the probe knob recovers it
