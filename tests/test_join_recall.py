"""Brute-force recall gates for the round-1 wrong-answer defects.

Each test compares a bucketed/banded operator against a brute-force oracle
computed on the same fixture — at the *driver's actual parameters* and at
high latitude, the two regimes the oracle queries didn't cover:

- simhash_near_pairs at max_hamming=6 (banding must be derived from the
  parameter, not fixed at 4×16 bits);
- within_distance_join(metric='haversine') with pairs above |lat| 80°
  (longitude cell rings must widen by 1/cos(lat));
- knn_join(metric='haversine') with polar queries (ring coverage must be
  certified against the k-th distance, not just top-k fill).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

R = 6371008.8


def _hav_np(lon1, lat1, lon2, lat2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlon / 2) ** 2
    return 2 * R * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


# ---------------------------------------------------------------------------
# simhash banding recall
# ---------------------------------------------------------------------------


def test_simhash_recall_at_driver_max_hamming(spark):
    from geo_spark.operators.dedup import simhash_fingerprints, simhash_near_pairs

    # near-duplicate families: a base text with 0..10 token substitutions
    # produces fingerprints across the whole Hamming 0..~20 range
    base_tokens = [f"tok{i}" for i in range(64)]
    rows, did = [], 0
    for fam in range(8):
        fam_tokens = [f"f{fam}_{t}" for t in base_tokens]
        for n_mut in range(0, 11):
            toks = list(fam_tokens)
            for m in range(n_mut):
                toks[(7 * m + fam) % len(toks)] = f"mut{fam}_{m}"
            rows.append((did, " ".join(toks)))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    ids = sorted(fps)
    expected = set()
    ham_seen = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((fps[a] ^ fps[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= 6:
                expected.add((a, b))
                ham_seen.add(h)
    # the fixture must actually exercise the 4..6 band the old code dropped
    assert ham_seen & {4, 5, 6}, f"fixture too tame: hamming values {ham_seen}"

    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, max_hamming=6).collect()
    }
    assert got == expected


def test_simhash_max_hamming_bounds():
    from geo_spark.operators.dedup import simhash_near_pairs

    with pytest.raises(ValueError):
        simhash_near_pairs(None, max_hamming=64)


# ---------------------------------------------------------------------------
# haversine high-latitude distance join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def polar_points():
    # deterministic scatter over the polar caps + midlatitudes; includes
    # antimeridian-straddling lons and near-pole rows where 1 deg lon ≈ 1 km
    rng = np.random.RandomState(1234)
    lats = np.concatenate(
        [
            rng.uniform(80, 89.8, 60),
            -rng.uniform(80, 89.8, 60),
            rng.uniform(-60, 60, 60),
        ]
    )
    lons = rng.uniform(-180, 180, len(lats))
    return lons, lats


def test_within_distance_haversine_polar_recall(spark, polar_points):
    from geo_spark.operators.distance_join import within_distance_join

    lons, lats = polar_points
    ids = np.arange(len(lons))
    max_dist = 200_000.0  # 200 km

    lon_m, lat_m = np.meshgrid(lons, lons), np.meshgrid(lats, lats)
    d = _hav_np(lon_m[0], lat_m[0], lon_m[1], lat_m[1])
    ii, jj = np.where((d <= max_dist) & (ids[None, :] < ids[:, None]))
    expected = {(int(min(a, b)), int(max(a, b))) for a, b in zip(ids[jj], ids[ii])}
    # high-lat pairs with large lon separation are the regression target
    wide = [
        (a, b)
        for (a, b) in expected
        if abs(lats[a]) > 80 and abs(((lons[a] - lons[b] + 180) % 360) - 180) > 3
    ]
    assert wide, "fixture has no wide-lon polar pairs — not exercising the fix"

    df = spark.createDataFrame(
        [(int(i), float(lons[i]), float(lats[i])) for i in ids],
        "id long, lon double, lat double",
    )
    out = within_distance_join(
        df.withColumnRenamed("id", "lid"),
        df.withColumnRenamed("id", "rid"),
        max_dist=max_dist,
        metric="haversine",
        dedup_pairs=True,
    )
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# haversine high-latitude kNN join
# ---------------------------------------------------------------------------


def test_knn_haversine_polar_exact(spark, polar_points):
    from geo_spark.operators.knn_join import knn_join

    lons, lats = polar_points
    n = len(lons)
    k = 4
    df = spark.createDataFrame(
        [(int(i), float(lons[i]), float(lats[i])) for i in range(n)],
        "id long, lon double, lat double",
    )
    queries = df.filter(F.col("lat") > 80).withColumnRenamed("id", "qid")
    targets = df.withColumnRenamed("id", "tid")
    out = knn_join(queries, targets, k=k, res=6, metric="haversine", exclude_self=True)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["tid"]))

    qids = [int(i) for i in range(n) if lats[i] > 80]
    assert set(got) == set(qids)
    for q in qids:
        d = _hav_np(lons, lats, lons[q], lats[q])
        d[q] = np.inf
        order = np.lexsort((np.arange(n), d))[:k]
        want = [int(t) for t in order]
        have = [t for _, t in sorted(got[q])]
        # distances must match to float tolerance even if libm tie-breaks differ
        dw = sorted(d[want])
        dh = sorted(float(_hav_np(lons[t], lats[t], lons[q], lats[q])) for t in have)
        np.testing.assert_allclose(dh, dw, rtol=1e-9)


# ---------------------------------------------------------------------------
# salted tile aggregation
# ---------------------------------------------------------------------------


def test_tile_counts_salted_extra_aggs(spark):
    from geo_spark.operators.tile_agg import tile_counts

    rng = np.random.RandomState(5)
    rows = [
        (float(lon), float(lat), float(v))
        for lon, lat, v in zip(
            rng.uniform(-170, 170, 400),
            rng.uniform(-80, 80, 400),
            rng.uniform(0, 100, 400),
        )
    ]
    df = spark.createDataFrame(rows, "lon double, lat double, v double")
    aggs = [("sum", "v", "v_sum"), ("min", "v", "v_min"), ("max", "v", "v_max")]
    plain = {
        r["tile"]: (r["n"], r["v_sum"], r["v_min"], r["v_max"])
        for r in tile_counts(df, res=3, extra_aggs=aggs).collect()
    }
    salted = {
        r["tile"]: (r["n"], r["v_sum"], r["v_min"], r["v_max"])
        for r in tile_counts(df, res=3, salt_buckets=7, extra_aggs=aggs).collect()
    }
    assert set(plain) == set(salted)
    for t in plain:
        assert plain[t][0] == salted[t][0]
        np.testing.assert_allclose(plain[t][1:], salted[t][1:], rtol=1e-12)


def test_tile_counts_salted_column_aggs_raise(spark):
    from geo_spark.operators.tile_agg import tile_counts

    df = spark.createDataFrame([(1.0, 2.0)], "lon double, lat double")
    with pytest.raises(ValueError):
        tile_counts(df, res=3, salt_buckets=4, extra_aggs=[F.avg("lon").alias("m")])


def test_sin_plane_projections_have_margin(spark):
    # ADVICE r2: the embed_near_pairs / lsh_cosine_topk oracles assume the
    # sketch sign matches between numpy BLAS matmul (Spark) and a sequential
    # SQL fold (DuckDB). A projection within float noise of 0 could flip
    # between the two summation orders; assert every |projection| on the
    # driver's test data clears a wide margin (>> 64 * eps * |v| * |H|).
    import numpy as np

    from geo_spark.operators.ann import sin_planes

    H64 = sin_planes(64, 64)
    H12 = sin_planes(64, 12)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
        M = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in emb])
        # include the planted near-duplicates of _q_embed_near_pairs
        idx = np.arange(len(M))
        planted = M[idx % 50 == 0] + 0.05 * np.roll(M[idx % 50 == 0], -1, axis=1)
        allv = np.vstack([M, planted])
        for H in (H64, H12):
            proj = allv @ H.T
            margin = np.abs(proj).min()
            assert margin > 1e-8, f"sketch sign margin too small: {margin}"


def test_knn_adversarial_empty_hemisphere_bounded_tail(spark):
    # Round-5 VERDICT #7: queries clustered in an empty hemisphere, all
    # targets in the other. The old cascade fell through to an unbounded
    # crossJoin; now the exhaustive tail is a bucketed level-1 join and the
    # set reaching it stays bounded by the straggler count (reported via
    # stats_out). Results must still be exact vs numpy brute force.
    import numpy as np

    from geo_spark.operators.knn_join import knn_join

    rng = np.random.RandomState(5)
    nq, nt, k = 40, 400, 3
    qpts = np.column_stack([rng.uniform(-170, -100, nq), rng.uniform(-60, 60, nq)])
    tpts = np.column_stack([rng.uniform(60, 170, nt), rng.uniform(-60, 60, nt)])
    queries = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(qpts)],
        "qid long, lon double, lat double",
    )
    targets = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(tpts)],
        "tid long, lon double, lat double",
    )
    stats = {}
    out = knn_join(
        queries, targets, k=k, res=6, metric="haversine", stats_out=stats
    ).collect()
    # every query resolved, exactly k rows each
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    assert len(by_q) == nq
    assert all(len(v) == k for v in by_q.values())
    # the exhaustive tail is the whole adversarial query set here — the
    # point is that it is COUNTED and bounded, and resolved via the
    # bucketed level-1 join rather than an unkeyed crossJoin
    assert stats["brute_queries"] <= nq
    # exactness vs numpy haversine brute force
    from geo_spark.kernels.measures import haversine_distance

    for qid, rows in by_q.items():
        d = haversine_distance(
            np.full(nt, qpts[qid, 0]), np.full(nt, qpts[qid, 1]),
            tpts[:, 0], tpts[:, 1],
        )
        exp = np.sort(d)[:k]
        got = np.sort([r["dist"] for r in rows])
        assert np.allclose(got, exp, rtol=1e-9), qid


def test_knn_full_wrap_certificate_first_level(spark):
    # Round-6 optimization: when the per-row longitude ring wraps the whole
    # circle (coarse res / high latitude), the covered radius is the full
    # latitude-cell cover — the lon term (which collapses near the poles)
    # no longer applies. Global queries at a coarse res must then certify
    # at the FIRST level (no retry/tail jobs) and stay exact vs brute force.
    import numpy as np

    from geo_spark.operators.knn_join import knn_join

    rng = np.random.RandomState(11)
    n, k = 300, 3
    lons = rng.uniform(-179, 179, n)
    lats = rng.uniform(-85, 85, n)
    df = spark.createDataFrame(
        [(int(i), float(lons[i]), float(lats[i])) for i in range(n)],
        "id long, lon double, lat double",
    )
    queries = df.filter(F.col("id") % 10 == 0).withColumnRenamed("id", "qid")
    targets = df.withColumnRenamed("id", "tid")
    stats = {}
    out = knn_join(
        queries, targets, k=k, res=3, metric="haversine",
        exclude_self=True, stats_out=stats,
    ).collect()
    assert stats["brute_queries"] == 0  # everything certified at level res
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    assert len(by_q) == n // 10
    for qid, rows in by_q.items():
        d = _hav_np(lons, lats, lons[qid], lats[qid])
        d[qid] = np.inf
        exp = np.sort(d)[:k]
        got = np.sort([r["dist"] for r in rows])
        np.testing.assert_allclose(got, exp, rtol=1e-9)
