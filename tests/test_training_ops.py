"""Training-data operators without SQL oracles are validated here against
exact in-Spark baselines (LSH vs brute force, MinHash vs exact Jaccard,
SimHash on injected near-dups), plus the __spark_entry__ contract smoke."""

import pytest
from pyspark.sql import functions as F

from cefspark import dedup, similarity
from cefspark.queries import _docs_near_dups, _embeddings, _query_vec

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_finds_exact_jaccard_pairs(spark):
    docs = _docs_near_dups(spark, SF)
    exact = {(r["a"], r["b"]) for r in
             dedup.jaccard_pairs(docs, threshold=0.4).collect()}
    lsh = {(r["a"], r["b"]) for r in
           dedup.minhash_dedup(docs, threshold=0.4).collect()}
    assert exact, "fixture must contain near-duplicates"
    # LSH output is verified (subset of exact) and must recall the injected
    # high-similarity pairs (jaccard >= 0.7 here, far above the band threshold)
    assert lsh <= exact
    high = {(r["a"], r["b"]) for r in
            dedup.jaccard_pairs(docs, threshold=0.7).collect()}
    assert high <= lsh


def test_simhash_hamming_finds_injected_neardups(spark):
    docs = _docs_near_dups(spark, SF)
    sim = dedup.simhash(docs)
    pairs = {(r["a"], r["b"]) for r in dedup.hamming_pairs(sim, max_dist=8).collect()}
    injected = {r["doc_id"] - 100000 for r in
                docs.where(F.col("doc_id") >= 100000).select("doc_id").collect()}
    found_sources = {a for (a, b) in pairs if b == a + 100000}
    # appending 5 tokens to a long doc should barely move the simhash
    assert len(found_sources) >= len(injected) * 0.7


def test_lsh_ann_contains_query_and_agrees_with_brute_force(spark):
    emb = _embeddings(spark, SF)
    q = _query_vec(spark, SF)
    brute = [r["vec_id"] for r in similarity.brute_force_topk(emb, q, k=5).collect()]
    assert brute[0] == 0  # the query vector itself, cosine 1.0
    lsh = [r["vec_id"] for r in similarity.lsh_bucketed_topk(emb, q, k=5).collect()]
    assert lsh and lsh[0] == 0
    assert set(lsh) <= set([r["vec_id"] for r in
                            similarity.brute_force_topk(emb, q, k=100).collect()])


def test_ivf_topk_recall(spark):
    emb = _embeddings(spark, SF)
    q = _query_vec(spark, SF)
    cents = similarity.ivf_build_centroids(emb, n_lists=4, iters=1)
    got = [r["vec_id"] for r in similarity.ivf_topk(emb, q, cents, k=5, n_probe=2).collect()]
    assert got and got[0] == 0


def test_cosine_neardup_lsh_path_matches_exact(spark):
    emb = _embeddings(spark, SF).where(F.col("vec_id") % 10 == 0)
    dups = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                      F.transform(F.col("embedding"), lambda x: x * F.lit(2.0)).alias("embedding"))
    both = emb.select("vec_id", "embedding").unionByName(dups)
    exact = {(r["a"], r["b"]) for r in
             similarity.cosine_neardup_pairs(both, 0.99, exact=True).collect()}
    lsh = {(r["a"], r["b"]) for r in
           similarity.cosine_neardup_pairs(both, 0.99, exact=False).collect()}
    # scaled copies land in the same hyperplane bucket as their source
    assert lsh == exact and len(exact) == emb.count()


def test_entry_contract(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    q = se.queries()
    o = se.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
