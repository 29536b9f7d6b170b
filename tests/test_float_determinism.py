"""Order-independence of every float-bearing gate (the user_sessions bug
class): any ROUND(float_agg) whose inputs cross a shuffle is a latent
coin-flip. Each gate below runs 3x under different shuffle partitioning and
must hash identically — if a gate's floats were summation-order-dependent,
varying the partition count flips rows at ULP-adjacent rounding boundaries.

Also pins the engine-exact LSH contract (lsh_probed_topk) against an
independent numpy mirror of the integer quantization + Rademacher mix.
"""

import math

import numpy as np
import pandas as pd
import pytest

from cefspark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

#: every gate whose output contains a rounded float or a float-derived
#: integer aggregate (ROUND(cos), ROUND(jaccard), quality_score, sum_value_e4)
FLOAT_GATES = [
    "user_sessions",
    "text_quality",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "emb_neardup_cosine",
]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_ann_ivf_recall_is_one_at_every_shipped_sf(spark, sf_dir):
    # the ivf gate's oracle is the brute-force top-5, so its contract is
    # recall = 1 on the shipped fixtures; assert it per sf so a driver run at
    # any shipped scale can't surprise the gate (sf0.1 is covered by the
    # check_correctness runs — it is too slow for the unit suite)
    from cefspark.queries import REGISTRY
    ivf = REGISTRY["ann_ivf_topk"][0](spark, sf_dir).collect()
    brute = REGISTRY["ann_cosine_topk"][0](spark, sf_dir).collect()
    assert [r["vec_id"] for r in ivf] == [r["vec_id"] for r in brute]


def _result_hash(df) -> int:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


@pytest.mark.parametrize("name", FLOAT_GATES)
def test_float_gate_is_partitioning_independent(spark, name):
    fn = REGISTRY[name][0]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = []
    try:
        for n in (3, 17, 31):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            hashes.append(_result_hash(fn(spark, SF)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert hashes[0] == hashes[1] == hashes[2], f"{name} varies with partitioning"


def _numpy_probed_topk(emb: pd.DataFrame, n_planes=6, multiprobe=2, k=5):
    """Independent mirror of similarity.lsh_probed_topk's contract."""
    from cefspark.similarity import rademacher_weight

    vecs = {int(r.vec_id): np.asarray(list(r.embedding), dtype=np.float64)
            for r in emb.itertuples()}
    planes = np.array([[rademacher_weight(j, d) for d in range(1, 65)]
                       for j in range(n_planes)], dtype=np.int64)

    def bucket(v):
        iv = np.array([math.floor(float(x) * 1e6) for x in v], dtype=np.int64)
        return sum((1 << j) for j in range(n_planes) if int(planes[j] @ iv) > 0)

    buckets = {i: bucket(v) for i, v in vecs.items()}
    qb = buckets[0]
    probed = [i for i, b in buckets.items() if bin(b ^ qb).count("1") <= multiprobe]
    q = vecs[0]
    rows = [(i, round(float(vecs[i] @ q / (np.linalg.norm(vecs[i]) * np.linalg.norm(q))), 6))
            for i in probed]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def test_lsh_probed_topk_matches_numpy_mirror(spark):
    from cefspark import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = [(r["vec_id"], r["cos"]) for r in
           similarity.lsh_probed_topk(emb, query_id=0, k=5,
                                      n_planes=6, multiprobe=2).collect()]
    want = _numpy_probed_topk(emb.toPandas())
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gc), (_, wc) in zip(got, want):
        assert abs(gc - wc) < 2e-6
    # the query itself is always in its own bucket at distance 0
    assert got[0][0] == 0 and abs(got[0][1] - 1.0) < 1e-9
