"""Training-data operators without SQL oracles are validated here against
exact in-Spark baselines (LSH vs brute force, MinHash vs exact Jaccard,
SimHash on injected near-dups), plus the __spark_entry__ contract smoke."""

import re

import pytest
from pyspark.sql import functions as F

from cefspark import dedup, similarity
from cefspark.queries import (_docs_near_dups, _docs_simhash_fixture,
                              _embeddings, _query_vec)

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
    docs = _docs_simhash_fixture(spark, SF)
    sim = dedup.simhash(docs)
    pairs = {(r["a"], r["b"]) for r in dedup.hamming_pairs(sim, max_dist=6).collect()}
    injected = {r["doc_id"] - 100000 for r in
                docs.where(F.col("doc_id") >= 100000).select("doc_id").collect()}
    found_sources = {a for (a, b) in pairs if b == a + 100000}
    # appending 2 tokens to a >=25-token doc keeps Hamming within the radius
    assert found_sources == injected


def test_simhash_fixture_pairs_keep_margin_under_gate_radius(spark):
    # the dedup_simhash GATE asserts injected pairs within Hamming 6; that
    # guarantee is probabilistic in the fixture (2 appended tokens flip ~4-5
    # bit-majorities on ~25-token docs). Pin a >=1-bit safety margin here so
    # any fixture/tokenizer drift fails THIS test loudly, not the driver gate.
    docs = _docs_simhash_fixture(spark, SF)
    sim = dedup.simhash(docs)
    a = sim.where(F.col("doc_id") < 100000).select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    b = sim.where(F.col("doc_id") >= 100000).select(
        (F.col("doc_id") - 100000).alias("a"), F.col("simhash").alias("sb"))
    dists = [r["d"] for r in
             a.join(b, "a").select(
                 F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("d")).collect()]
    assert dists, "fixture must inject at least one pair"
    assert max(dists) <= 5, f"margin eroded: max injected Hamming {max(dists)} (gate radius 6)"


def _brute_hamming(spark, sim, max_dist):
    a = sim.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    b = sim.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    return {(r["a"], r["b"], r["hamming"]) for r in
            (a.crossJoin(b).where(F.col("a") < F.col("b"))
             .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
             .where(F.col("hamming") <= max_dist)
             .select("a", "b", "hamming")).collect()}


@pytest.mark.parametrize("max_dist", [3, 6])
def test_hamming_pairs_block_schemes_are_exact(spark, max_dist):
    # both blocking schemes (4x16-bit single-block, 8x8-bit block-pair) must
    # return exactly the brute-force O(n^2) pair set at their radius
    sim = dedup.simhash(_docs_simhash_fixture(spark, SF))
    got = {(r["a"], r["b"], r["hamming"]) for r in
           dedup.hamming_pairs(sim, max_dist=max_dist).collect()}
    assert got == _brute_hamming(spark, sim, max_dist)
    assert got, "fixture must produce at least one pair"


def test_hamming_pairs_rejects_low_cardinality_radii(spark):
    sim = dedup.simhash(_docs_simhash_fixture(spark, SF))
    with pytest.raises(ValueError):
        dedup.hamming_pairs(sim, max_dist=7)


def test_lsh_candidates_bucket_cap_bounds_degenerate_buckets(spark):
    # adversarial fixture: many identical docs -> every band bucket holds all
    # of them -> uncapped candidates are quadratic; the cap drops those
    # buckets entirely while distinct near-dup structure is preserved
    n = 40
    same = spark.range(n).select(F.col("id").alias("doc_id"),
                                 F.lit("all docs share this exact boilerplate text body").alias("text"))
    sigs = dedup.minhash_signatures(same)
    uncapped = dedup.lsh_candidates(sigs, max_bucket_size=None).count()
    assert uncapped == n * (n - 1) / 2
    capped = dedup.lsh_candidates(sigs, max_bucket_size=10).count()
    assert capped == 0
    # the audit channel reports what the cap hit
    stats = dedup.lsh_bucket_stats(sigs)
    assert stats.where(F.col("bucket_size") > 10).count() == 16  # all 16 bands degenerate


def test_cosine_neardup_bucketed_plan_has_no_cross_join(spark):
    emb = _embeddings(spark, SF).where(F.col("vec_id") % 10 == 0)
    plan = (similarity.cosine_neardup_pairs(emb, 0.99, exact=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


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


def test_signatures_from_sets_equals_agg_signatures(spark):
    # the shared-shuffle signature path must produce bit-identical MinHash
    # values to the independent aggregate path (same permutation hashes)
    docs = _docs_near_dups(spark, SF)
    via_agg = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(64))
               for r in dedup.minhash_signatures(docs).collect()}
    via_sets = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(64))
                for r in dedup.signatures_from_sets(dedup.shingle_sets(docs)).collect()}
    assert via_agg == via_sets


def test_components_label_propagation_on_chains_and_isolates(spark):
    # a 6-node chain (diameter 5 — needs several propagation rounds), a
    # triangle, and a 2-node component; every node must label to its
    # component's min id
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
             (10, 11), (11, 12), (12, 10),
             (20, 21)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["comp"] for r in dedup.components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_raises_when_budget_too_small(spark):
    chain = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], "a long, b long")
    with pytest.raises(RuntimeError):
        dedup.components(chain, max_iter=1)


def test_assign_split_is_deterministic_and_proportional(spark):
    from cefspark import sampling

    docs = spark.range(20000).withColumnRenamed("id", "doc_id")
    s1 = sampling.assign_split(docs, (0.9, 0.05, 0.05), salt=7)
    counts = {r["split"]: r["n"] for r in
              s1.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["train"] / 20000 - 0.9) < 0.02
    assert abs(counts["val"] / 20000 - 0.05) < 0.01
    assert abs(counts["test"] / 20000 - 0.05) < 0.01
    # pure function of the key: identical under different partitioning
    a = {(r["doc_id"], r["split"]) for r in s1.collect()}
    b = {(r["doc_id"], r["split"]) for r in
         sampling.assign_split(docs.repartition(13), (0.9, 0.05, 0.05), salt=7).collect()}
    assert a == b
    # a different salt reshuffles assignments
    c = {(r["doc_id"], r["split"]) for r in
         sampling.assign_split(docs, (0.9, 0.05, 0.05), salt=8).collect()}
    assert a != c


def test_sample_fraction_is_nested_and_exactly_repeatable(spark):
    from cefspark import sampling

    docs = spark.range(10000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in sampling.sample_fraction(docs, 0.1).collect()}
    s30 = {r["doc_id"] for r in sampling.sample_fraction(docs, 0.3).collect()}
    assert s10 and s10 < s30  # smaller cutoff nests inside the larger
    assert s10 == {r["doc_id"] for r in sampling.sample_fraction(docs, 0.1).collect()}


def test_split_bucket_full_int64_range_matches_sql_oracle(spark):
    import duckdb

    from cefspark import sampling

    # keys beyond 2^32 would overflow a naive id*M1 under ANSI mode; the
    # folded form must stay exact and SQL-identical across the full
    # NON-NEGATIVE range (engines disagree on negative integer division —
    # Spark shiftright floors, DuckDB // truncates — so negatives are
    # rejected loudly rather than silently diverging)
    ids = [0, 1, 999, 2**31 - 1, 2**31, 2**32 + 12345, 10**15, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["b"] for r in
           df.select("doc_id", sampling.split_bucket(F.col("doc_id"), salt=7)
                     .alias("b")).collect()}
    con = duckdb.connect()
    for i in ids:
        want = con.execute(
            f"SELECT {sampling.split_bucket_sql(str(i), 7)}").fetchone()[0]
        assert got[i] == want, (i, got[i], want)

    neg = spark.createDataFrame([(-1,), (-2**62,)], "doc_id long")
    with pytest.raises(Exception, match="non-negative"):
        neg.select(sampling.split_bucket(F.col("doc_id")).alias("b")).collect()


def test_assign_split_rejects_degenerate_weights(spark):
    from cefspark import sampling

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="positive"):
        sampling.assign_split(docs, (1.1, -0.05, -0.05))
    with pytest.raises(ValueError, match="empty bucket range"):
        sampling.assign_split(docs, (0.0004, 0.0006, 0.999))
    with pytest.raises(ValueError, match="sum to 1.0"):
        sampling.assign_split(docs, (0.5, 0.2, 0.2))


def test_langid_trigram_classifier(spark):
    """Real trigram lang-id: 100% on the held-out fixture under BOTH
    execution paths, bit-identical arrow-vs-join answers, 'unknown' for
    profile-miss text, and each path's plan contract."""
    import re

    from pyspark.sql import functions as F

    from cefspark import langid

    docs = langid.multilingual_docs(spark, 300)
    for impl in ("arrow", "join"):
        out = langid.lang_id(docs, impl=impl)
        joined = out.join(docs.select("doc_id", "lang_true"), "doc_id")
        assert joined.where(
            F.col("lang_pred") != F.col("lang_true")).count() == 0, impl

    nums = spark.range(5).select(F.col("id").alias("doc_id"),
                                 F.lit("123 456 789").alias("text"))
    for impl in ("arrow", "join"):
        assert all(r["lang_pred"] == "unknown"
                   for r in langid.lang_id(nums, impl=impl).collect()), impl

    # differential: the two paths agree row-for-row on mixed text incl.
    # null/empty edge rows and UNICODE whitespace (U+00A0 NBSP, U+2028 —
    # Java's \s is ASCII-only, and the arrow normalizer must pin that rule,
    # not Python's Unicode-aware split())
    edges = spark.createDataFrame(
        [(9000, None), (9001, ""), (9002, "   "),
         (9003, "le chat est sur le tapis et ne veut pas partir"),
         (9004, "the quick brown fox and the lazy dog are friends")],
        "doc_id long, text string")
    mixed = docs.select("doc_id", "text").unionByName(edges)
    a = {r["doc_id"]: r["lang_pred"]
         for r in langid.lang_id(mixed, impl="arrow").collect()}
    b = {r["doc_id"]: r["lang_pred"]
         for r in langid.lang_id(mixed, impl="join").collect()}
    assert a == b
    assert a[9000] == a[9001] == "unknown"

    with pytest.raises(ValueError, match="impl"):
        langid.lang_id(docs, impl="nope")

    # arrow path (default): narrow projection — no shuffle, no join, one
    # Arrow-batched eval
    plan = langid.lang_id(docs.repartition(4))._jdf.queryExecution(
        ).executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert plan.count("ArrowEvalPython") == 1

    # join path: the ~700-row profile table is broadcast (never shuffled),
    # the exploded trigrams partial-aggregate map-side and shuffle once on
    # doc_id, and nothing drops to Python. The single-partition test fixture
    # would satisfy the agg's distribution for free, so force a
    # multi-partition input to expose the one real shuffle.
    wide = langid.lang_id(docs.repartition(4), impl="join")
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_langid_profiles_are_deterministic_integers():
    from cefspark import langid

    p1 = langid.build_profiles()
    assert all(isinstance(w, int) for ws in p1.values() for w in ws)
    # every language contributes exactly PROFILE_SIZE ranked trigrams
    for li, lang in enumerate(langid.LANGS):
        n = sum(1 for ws in p1.values() if ws[li] > 0)
        assert n == langid.PROFILE_SIZE, (lang, n)


def test_stratified_sample_is_deterministic_and_pushable(spark):
    from pyspark.sql import functions as F

    from cefspark import sampling

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                     (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    out = sampling.stratified_sample(
        docs, {"en": 0.5, "de": 1.0}, strata_col="lang", id_col="doc_id")
    rows = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in rows}
    assert "fr" not in by_lang          # omitted stratum dropped
    assert by_lang["de"] == 667          # fraction 1.0 keeps everything
    assert 250 < by_lang["en"] < 420     # ~50% of 667
    # deterministic under different partitioning
    again = {r["lang"]: r["count"] for r in
             sampling.stratified_sample(docs.repartition(13),
                                        {"en": 0.5, "de": 1.0},
                                        strata_col="lang").groupBy("lang")
             .count().collect()}
    assert again == by_lang
    # narrow plan: no shuffle, no python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan

    import pytest as _pytest
    with _pytest.raises(ValueError):
        sampling.stratified_sample(docs, {})
    with _pytest.raises(ValueError):
        sampling.stratified_sample(docs, {"en": 1.5})


def _py_split_bucket(key, salt=0):
    """Python replica of sampling.split_bucket (engine-exact contract)."""
    half, m1, fold, m2, mod = 1 << 31, 2654435761, 40503, 69069, 1 << 32
    h1 = ((key % half) * m1 + (key >> 31) * fold + fold + salt) % mod
    return ((h1 * m2) % mod >> 16) % 1000


def test_mixture_epoch_counts_and_determinism(spark):
    from pyspark.sql import functions as F

    from cefspark import sampling

    docs = spark.range(900).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                     (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    out = sampling.mixture(docs, {"en": 0.4, "de": 2.5}, salt=5)
    pdf = out.toPandas()
    assert "fr" not in set(pdf["lang"])  # absent stratum dropped
    langs = ["en", "de", "fr"]
    for doc_id, grp in pdf.groupby("doc_id"):
        lang = langs[doc_id % 3]
        w = {"en": 0.4, "de": 2.5}[lang]
        want = int(w) + (1 if _py_split_bucket(doc_id, 5) < round(
            (w - int(w)) * 1000) else 0)
        assert sorted(grp["epoch"]) == list(range(want)), doc_id
    # docs with zero repeats are absent entirely
    present = set(pdf["doc_id"])
    for doc_id in range(0, 900, 3):  # the en rows
        want = 1 if _py_split_bucket(doc_id, 5) < 400 else 0
        assert (doc_id in present) == (want == 1)
    # deterministic under different partitioning
    again = sampling.mixture(docs.repartition(13), {"en": 0.4, "de": 2.5},
                             salt=5).toPandas()
    assert (again.sort_values(["doc_id", "epoch"]).reset_index(drop=True)
            .equals(pdf.sort_values(["doc_id", "epoch"])
                    .reset_index(drop=True)))
    # narrow plan: no shuffle, no python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_mixture_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cefspark import sampling

    docs = spark.range(10).select(F.col("id").alias("doc_id"),
                                  F.lit("en").alias("lang"))
    with _pytest.raises(ValueError):
        sampling.mixture(docs, {})
    with _pytest.raises(ValueError):
        sampling.mixture(docs, {"en": -0.1})
    with _pytest.raises(ValueError):
        sampling.mixture(docs, {"en": 101})
    with _pytest.raises(ValueError):
        sampling.mixture(docs, {"en": 0.0})  # all-zero mixture is empty


def test_mixture_weights_temperature():
    import pytest as _pytest

    from cefspark import sampling

    # alpha=1 is natural sampling: every stratum the same epoch count
    w = sampling.mixture_weights({"a": 100, "b": 10000}, alpha=1.0,
                                 target_epochs_max=2.0)
    assert w == {"a": 2.0, "b": 2.0}
    # alpha<1 flattens: the small corpus repeats more than the large one
    w = sampling.mixture_weights({"a": 100, "b": 10000}, alpha=0.5,
                                 target_epochs_max=4.0)
    assert w["a"] == 4.0 and 0 < w["b"] < w["a"]
    # upsample factor follows the temperature math: (n_b/n_a)^(1-alpha)
    assert abs(w["a"] / w["b"] - (10000 / 100) ** 0.5) < 1e-9
    with _pytest.raises(ValueError):
        sampling.mixture_weights({})
    with _pytest.raises(ValueError):
        sampling.mixture_weights({"a": 100}, alpha=0.0)


def test_tfidf_topk_values_and_selection(spark):
    """Hand-computed TF-IDF on a 3-doc corpus, incl. the integer tie-break
    (tf DESC, df ASC, term ASC) and k-truncation."""
    import math

    from cefspark import textops

    docs = spark.createDataFrame(
        [(1, "apple apple banana cherry"),
         (2, "banana cherry cherry date!"),
         (3, "apple date date date")],
        "doc_id long, text string")
    rows = textops.tfidf_topk(docs, k=2).collect()
    got = {(r["doc_id"], r["term"]): r["tfidf"] for r in rows}

    def idf(df_t):
        return math.log(4.0 / (df_t + 1.0)) + 1.0  # N=3 -> (N+1)=4

    # doc 1: apple tf=2 (df=2) ranks first; banana/cherry tie at tf=1 with
    #   df=2 each -> term ASC picks banana
    # doc 2: cherry tf=2 first; banana (df=2) vs date (df=2) -> banana
    # doc 3: date tf=3 first; apple tf=1 df=2
    assert set(got) == {(1, "apple"), (1, "banana"),
                        (2, "cherry"), (2, "banana"),
                        (3, "date"), (3, "apple")}
    assert abs(got[(1, "apple")] - 2 * idf(2)) < 1e-9
    assert abs(got[(3, "date")] - 3 * idf(2)) < 1e-9
    assert abs(got[(2, "banana")] - 1 * idf(2)) < 1e-9
    # punctuation is not a term ('date!' tokenizes to 'date')
    assert all(t.isalnum() for _, t in got)

    # score order is the real contract: a rare term (low tf, high idf) must
    # beat a corpus-wide common term with higher tf
    corpus = spark.createDataFrame(
        [(0, "common common rare")] + [(i, "common") for i in range(1, 10)],
        "doc_id long, text string")
    top1 = {r["doc_id"]: r["term"]
            for r in textops.tfidf_topk(corpus, k=1).collect()}
    # doc 0: rare = 1*(ln(11/2)+1) = 2.70 > common = 2*(ln(11/11)+1) = 2.0
    assert top1[0] == "rare"


def test_hll_sketch_accuracy_and_mergeability(spark):
    """HLL cube pattern: per-group estimates within HLL error of exact,
    and the cross-group rollup (sketch union) exactly equals the global
    sketch over the same rows — the answer-from-sketches contract."""
    from pyspark.sql import functions as F

    from cefspark import sketches

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    # widen the value domain so estimates are non-trivial
    keyed = ev.select("event_type",
                      (F.col("event_id") * 7 + F.col("user_id")).alias("v"))
    sk = sketches.hll_sketch_by(keyed, "event_type", "v").cache()

    exact = {r["event_type"]: r["n"]
             for r in keyed.groupBy("event_type")
             .agg(F.count_distinct("v").alias("n")).collect()}
    est = {r["event_type"]: r["n_distinct_est"]
           for r in sketches.hll_estimate(sk).collect()}
    assert set(est) == set(exact)
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.05, (g, est[g], n)  # ~3 RSE at lg_k=12

    # rollup-from-sketches ~= global sketch over raw rows (same lg_k):
    # register merge is lossless, but the union drops the single-stream HIP
    # estimator, so allow a small gap — and both must be within HLL error
    # of the exact count
    merged = sketches.hll_rollup(sk)
    global_direct = (keyed.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("v", F.lit(12))).cast("long").alias("n"))
        .collect()[0]["n"])
    assert abs(merged - global_direct) / global_direct < 0.01
    n_global = keyed.select("v").distinct().count()
    assert abs(merged - n_global) / n_global < 0.05
    assert abs(global_direct - n_global) / n_global < 0.05
    sk.unpersist()

    # native HLL++ scalar helper agrees with exact within rsd ballpark
    approx = sketches.approx_distinct(keyed, "v", rsd=0.02)
    assert abs(approx - n_global) / n_global < 0.06


def test_pii_redaction_masks_and_counts(spark):
    """Every PII class masks to its token, near-miss distractors pass
    through, and per-class counts match; a clean text is untouched."""
    from cefspark import redact

    df = redact.pii_redact(redact.pii_docs(spark, 5))
    for r in df.collect():
        t = r["text_redacted"]
        assert "<EMAIL>" in t and "<CARD>" in t and "<IP>" in t and "<PHONE>" in t
        assert "@example.com" not in t and "4111" not in t
        # distractors survive: version string, TLD-less @, 15-digit run
        assert "v1.2.3" in t and "a@b" in t and "123456789012345" in t
        assert "ver 10.20" in t
        assert (r["n_email"], r["n_card"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1, 1)

    clean = spark.createDataFrame([(1, "no pii here at all 1.2 x")],
                                  "doc_id long, text string")
    row = redact.pii_redact(clean).first()
    assert row["text_redacted"] == row["text"]
    assert row["n_email"] == row["n_card"] == row["n_ipv4"] == row["n_phone"] == 0
    # dashed card + unbroken 16-digit form both mask; mixed separators don't
    forms = spark.createDataFrame(
        [(1, "4111-1111-1111-1234"), (2, "4111111111111234"),
         (3, "4111-1111 1111-1234")], "doc_id long, text string")
    got = {r["doc_id"]: r["text_redacted"]
           for r in redact.pii_redact(forms).collect()}
    assert got[1] == "<CARD>" and got[2] == "<CARD>"
    assert "<CARD>" not in got[3]


def test_decontaminate_flags_shared_shingles(spark):
    """Docs sharing an n-token shingle with the benchmark are flagged with
    the distinct-leak count; clean docs are absent; hashed and exact-string
    paths agree."""
    from cefspark import dedup

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a completely different sentence with no overlap at all"),
         (3, "quick brown fox appears here and lazy dog sleeps too")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox ran"), (101, "very lazy dog sleeps")],
        "doc_id long, text string")
    for hashed in (True, False):
        got = {r["doc_id"]: r["n_hits"]
               for r in dedup.decontaminate(docs, bench, n=3,
                                            hashed=hashed).collect()}
        # doc1: 'the quick brown'+'quick brown fox'; doc3: 'quick brown fox'
        # +'lazy dog sleeps'; doc2 clean
        assert got == {1: 2, 3: 2}, (hashed, got)
    # a doc shorter than n tokens shares only its full text
    short = spark.createDataFrame([(7, "tiny doc")], "doc_id long, text string")
    bshort = spark.createDataFrame([(8, "tiny doc")], "doc_id long, text string")
    assert dedup.decontaminate(short, bshort, n=5).collect()[0]["n_hits"] == 1


def test_pii_redaction_idempotent_on_hostile_text(spark):
    """Redaction is idempotent (tokens contain nothing a later pattern can
    re-match) and total (never crashes) over adversarial text mixing every
    class, separators, and boundary digits — checked via the same Spark
    expressions the production path uses."""
    import random

    from pyspark.sql import functions as F

    from cefspark import redact

    rng = random.Random(51966)
    frags = ["a@b.co", "x@y", "1.2.3.4", "10.0.0.255.7", "+44 20 7946 0958",
             "4111 1111 1111 1111", "41111111111111112", "v2.10.3", "...",
             "@@", "+-", "user.name+tag@sub.domain.org", "999.999.999.999",
             " ", "-", "4111-1111 1111-1234", "0" * 20, "+1-555-0100"]
    rows = [(i, " ".join(rng.choice(frags)
                         for _ in range(rng.randint(1, 12))))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = redact.pii_redact(df, keep_counts=False).select(
        "doc_id", F.col("text_redacted").alias("text"))
    twice = redact.pii_redact(once, keep_counts=False)
    diff = twice.where(F.col("text") != F.col("text_redacted")).count()
    assert diff == 0


def test_sql_string_formulations_bit_identical_to_column_forms(spark):
    """Round-5 driver-side construction optimization: the minhash signature,
    LSH banding, and hyperplane-bucket expressions were rewritten as parsed
    SQL strings (one py4j call) — they must stay BIT-IDENTICAL to the
    original Column compositions, which this test keeps alive as the
    specification."""
    from pyspark.sql import functions as F

    from cefspark import dedup
    from cefspark import similarity as sim

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sets_df = dedup.shingle_sets(docs)

    def perm(i):
        return lambda x: F.xxhash64(F.lit(i), x)

    spec_sig = sets_df.select(
        F.col("doc_id"),
        *[F.array_min(F.transform(F.col("sh"), perm(i))).alias(f"h{i}")
          for i in range(64)])
    got_sig = dedup.signatures_from_sets(sets_df)
    assert spec_sig.exceptAll(got_sig).count() == 0
    assert got_sig.exceptAll(spec_sig).count() == 0

    spec_bands = (spec_sig.select(
        F.col("doc_id"),
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     F.xxhash64(*[F.col(f"h{bi * 4 + r}") for r in range(4)])
                     .alias("bh")) for bi in range(16)])).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"),
                F.col("bb.bh").alias("bh")))
    got_bands = dedup._lsh_bucketed(got_sig, "doc_id", 16, 4)
    assert spec_bands.exceptAll(got_bands).count() == 0
    assert got_bands.exceptAll(spec_bands).count() == 0

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = sim.rademacher_planes(64, 6)
    iv = F.transform(F.col("embedding"),
                     lambda x: F.floor(x.cast("double") * F.lit(1e6)).cast("long"))
    out = None
    for j, w in enumerate(planes):
        warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
        proj = F.aggregate(F.zip_with(iv, warr, lambda x, y: x * y),
                           F.lit(0).cast("long"), lambda a, x: a + x)
        bit = F.shiftleft(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))
                          .cast("long"), j)
        out = bit if out is None else out.bitwiseXOR(bit)
    spec_b = emb.select("vec_id", out.alias("b"))
    got_b = emb.select("vec_id",
                       sim.int_bucket_id("embedding", planes).alias("b"))
    assert spec_b.exceptAll(got_b).count() == 0
    assert got_b.exceptAll(spec_b).count() == 0


def test_ivf_persisted_index_prunes_partitions(spark, tmp_path):
    """The persisted IVF index returns the same top-k as the in-memory path
    AND physically prunes: the probe plan carries a list_id partition
    filter, and the files it reads live only under the probed list_id=
    directories."""
    import re

    from cefspark import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    query = emb.where(F.col("vec_id") == 0).first()["embedding"]
    idx = str(tmp_path / "ivf")
    cents = sim.build_ivf_index(emb, idx, n_lists=8)

    got = sim.ivf_index_topk(spark, idx, query, k=5, n_probe=2)
    direct = sim.ivf_topk(emb, query, cents, k=5, n_probe=2)
    assert [(r["vec_id"], r["cos"]) for r in got.collect()] == \
        [(r["vec_id"], r["cos"]) for r in direct.collect()]

    # pruning is PHYSICAL: the FileScan carries the probe lists as
    # PartitionFilters (exactly n_probe list ids), so unprobed partitions'
    # files are never read
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[list_id#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, plan[plan.find("FileScan"):plan.find("FileScan") + 400]
    assert len(m.group(1).split(",")) == 2
    # and the filter is not also a post-scan data filter (pure pruning)
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "DataFilters: []" in scan_line


def test_remove_boilerplate_threshold_order_and_normalization(spark):
    """Line-level boilerplate removal: the integer threshold
    max(min_docs, ceil(frac*n_docs)) decides removal on NORMALIZED line
    forms, survivors keep original text and order, fully-boilerplate docs
    survive with empty text_clean, and a singleton corpus removes nothing."""
    docs = spark.createDataFrame(
        [(0, "alpha 0\nCopyright  ACME\nzz"),
         (1, "alpha 1\ncopyright acme\nzz"),
         (2, "alpha 2\n  copyright   acme  \nzz"),
         (3, "copyright acme"),                        # fully boilerplate
         (4, "alpha 4\nunique tail 4")],
        "doc_id long, text string")
    # n_docs=5: frac 0.5 -> threshold max(2, ceil(2.5))=3; 'copyright acme'
    # normalized appears in 4 docs -> removed; 'zz' in 3 docs -> removed
    # (== threshold); 'alpha i' unique -> kept
    out = {r["doc_id"]: r for r in dedup.remove_boilerplate(
        docs, max_doc_frac=0.5, min_docs=2).collect()}
    assert len(out) == 5
    assert out[0]["text_clean"] == "alpha 0"
    assert out[1]["text_clean"] == "alpha 1"
    assert out[3]["text_clean"] == "" and out[3]["n_removed"] == 1
    assert out[4]["text_clean"] == "alpha 4\nunique tail 4"
    assert out[0]["n_lines"] == 3 and out[0]["n_removed"] == 2

    # order reconstruction across >10 lines (string-sorted pos would
    # interleave 10 before 2)
    many = spark.createDataFrame(
        [(0, "\n".join(f"line {i:02d} of doc" for i in range(15)))],
        "doc_id long, text string")
    got = dedup.remove_boilerplate(many, min_docs=2).collect()[0]
    assert got["text_clean"] == "\n".join(f"line {i:02d} of doc"
                                          for i in range(15))

    # singleton corpus: nothing can reach min_docs=2
    one = spark.createDataFrame([(9, "a\nb\na")], "doc_id long, text string")
    r = dedup.remove_boilerplate(one).collect()[0]
    assert r["text_clean"] == "a\nb\na" and r["n_removed"] == 0

    # repeated line WITHIN one doc counts that doc once (count_distinct):
    # 'dup' lives in docs 0 (twice) and 1 -> 2 distinct docs >= min_docs=2
    rep = spark.createDataFrame(
        [(0, "dup\nx0\ndup"), (1, "dup\nx1"), (2, "x2")],
        "doc_id long, text string")
    rr = {r["doc_id"]: r for r in dedup.remove_boilerplate(
        rep, max_doc_frac=0.6, min_docs=2).collect()}
    assert rr[0]["text_clean"] == "x0" and rr[0]["n_removed"] == 2
    assert rr[1]["text_clean"] == "x1"


def test_remove_boilerplate_plan_broadcasts_boiler_set(spark):
    """Scale contract: the boilerplate set joins back as a BROADCAST hash
    join (it is small by construction), the line-count aggregation keys on
    the 8-byte hash, and no pair-exploding join appears."""
    docs = dedup.boiler_docs(spark, 100)
    plan = dedup.remove_boilerplate(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the 1-row doc-count scalar
    # riding its broadcast crossJoin into the threshold predicate
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "_n_docs" in line, line


def test_dup_ngram_repetition_counts(spark):
    """Duplicate-trigram counts: hand-computed on repetitive vs clean text;
    sub-3-token and empty texts count 0/0 (no NULLs)."""
    from cefspark import textops

    df = spark.createDataFrame(
        [(0, "a b c a b c a b"),   # 6 trigrams: abc,bca,cab,abc,bca,cab -> 3 dup
         (1, "w x y z"),           # 2 distinct trigrams -> 0 dup
         (2, "one two"),           # < 3 tokens
         (3, ""),                  # empty
         (4, "r r r r r")],        # 3 identical trigrams -> 2 dup
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.quality_metrics(df).collect()}
    assert (out[0]["n_3grams"], out[0]["n_dup_3grams"]) == (6, 3)
    assert (out[1]["n_3grams"], out[1]["n_dup_3grams"]) == (2, 0)
    assert (out[2]["n_3grams"], out[2]["n_dup_3grams"]) == (0, 0)
    assert (out[3]["n_3grams"], out[3]["n_dup_3grams"]) == (0, 0)
    assert (out[4]["n_3grams"], out[4]["n_dup_3grams"]) == (3, 2)


def test_render_conversations_and_sft_pairs(spark):
    """Transcript formatters: turn order holds under hostile input order,
    NULL text renders as an empty body (not a dropped turn), an
    assistant-first conversation yields an empty context, and non-assistant
    turns produce no pair."""
    from cefspark import transcripts

    rows = [
        ("c1", 1, "assistant", "hi there"),
        ("c1", 0, "user", "hello"),           # out of order on purpose
        ("c1", 2, "user", None),              # null text
        ("c1", 3, "assistant", "bye"),
        ("c2", 0, "assistant", "I speak first"),
        ("c3", 0, "user", "monologue"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    ).repartition(7)  # scatter turns across partitions

    r = {x["conv_id"]: x for x in
         transcripts.render_conversations(df).collect()}
    assert r["c1"]["dialog"] == ("user: hello\nassistant: hi there\n"
                                 "user: \nassistant: bye")
    assert r["c1"]["n_turns"] == 4
    assert r["c2"]["dialog"] == "assistant: I speak first"
    assert r["c3"]["dialog"] == "user: monologue"

    p = {(x["conv_id"], x["turn_idx"]): x for x in
         transcripts.sft_pairs(df).collect()}
    assert set(p) == {("c1", 1), ("c1", 3), ("c2", 0)}
    assert p[("c1", 1)]["context"] == "user: hello"
    assert p[("c1", 1)]["response"] == "hi there"
    assert p[("c1", 3)]["context"] == ("user: hello\nassistant: hi there\n"
                                       "user: ")
    assert p[("c2", 0)]["context"] == ""       # assistant speaks first


def test_transcript_ops_single_shuffle_no_python(spark):
    from cefspark import transcripts

    df = spark.createDataFrame(
        [("c", i, "user", f"t{i}") for i in range(20)],
        "conv_id string, turn_idx int, role string, text string"
    ).repartition(4)
    for op in (transcripts.render_conversations, transcripts.sft_pairs):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, op
        assert "EvalPython" not in plan


def test_remove_boilerplate_threshold_is_float_dust_free(spark):
    """0.05 * 400 must threshold at 20, not 21 (binary float dust through
    ceil): a line in exactly ceil(frac*n) docs IS removed."""
    rows = [(i, f"u{i}\n" + ("shared line" if i < 20 else f"v{i}"))
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.remove_boilerplate(
        df, max_doc_frac=0.05).collect()}
    # 'shared line' is in exactly 20 = ceil(0.05*400) docs -> removed
    assert out[0]["text_clean"] == "u0" and out[0]["n_removed"] == 1
    assert out[399]["n_removed"] == 0


def test_cidr_ipv4_to_long_and_bounds(spark):
    """ipv4_to_long: exact arithmetic + NULL on every malformed shape;
    cidr_bounds masks host bits off the base address."""
    from cefspark import cidr

    df = spark.createDataFrame(
        [(1, "10.0.0.9"), (2, "255.255.255.255"), (3, "0.0.0.0"),
         (4, "1.2.3"), (5, "1.2.3.4.5"), (6, "256.1.1.1"),
         (7, "a.b.c.d"), (8, ""), (9, "1.2.3.04")],
        "id long, ip string")
    got = {r["id"]: r["v"] for r in df.select(
        "id", cidr.ipv4_to_long(F.col("ip")).alias("v")).collect()}
    assert got[1] == 10 * 16777216 + 9
    assert got[2] == 2**32 - 1 and got[3] == 0
    assert all(got[i] is None for i in (4, 5, 6, 7, 8))
    assert got[9] is None  # leading-zero octets rejected (ambiguous octal)

    s, e, p = cidr.cidr_bounds(F.col("c"))
    b = spark.createDataFrame(
        [(1, "10.0.3.9/8"), (2, "10.0.3.0/24"), (3, "1.2.3.4"),
         (4, "10.0.0.0/33"), (5, "bad/8")], "id long, c string"
    ).select("id", s.alias("s"), e.alias("e"), p.alias("p"))
    rows = {r["id"]: r for r in b.collect()}
    assert rows[1]["s"] == 10 * 16777216 and rows[1]["e"] == 11 * 16777216 - 1
    assert rows[2]["s"] == 10 * 16777216 + 3 * 256
    assert rows[2]["e"] == rows[2]["s"] + 255
    assert rows[3]["p"] == 32 and rows[3]["s"] == rows[3]["e"]
    assert rows[4]["p"] is None and rows[5]["s"] is None


def test_cidr_enrich_lpm_and_plan(spark):
    """enrich_cidr: longest-prefix-match resolved dim-side (nested /24
    beats the /8 fallback without any event-side aggregation), unmatched
    and malformed ips keep NULL attrs, and the physical plan is a
    BroadcastHashJoin on the bucket — never a nested-loop range join."""
    from cefspark import cidr

    dim = spark.createDataFrame(
        [("10.0.0.0/8", "core", 64000),
         ("10.0.5.0/24", "edge", 64505),
         ("10.0.5.128/25", "pop", 64999)],  # nested 3 deep
        "cidr string, zone string, asn long")
    df = spark.createDataFrame(
        [(1, "10.0.5.200"),   # in the /25 -> pop wins over edge over core
         (2, "10.0.5.9"),     # /24 wins over /8
         (3, "10.77.1.1"),    # /8 only
         (4, "11.0.0.1"),     # unmatched
         (5, "garbage")],     # malformed
        "id long, ip string")
    out = {r["id"]: r for r in
           cidr.enrich_cidr(df, dim, "ip", prefix_bits=20).collect()}
    assert (out[1]["zone"], out[1]["asn"]) == ("pop", 64999)
    assert (out[2]["zone"], out[2]["asn"]) == ("edge", 64505)
    assert out[3]["zone"] == "core"
    assert out[4]["zone"] is None and out[5]["zone"] is None
    # exactly one output row per input row: disjoint intervals by design
    assert cidr.enrich_cidr(df, dim, "ip", prefix_bits=20).count() == 5

    plan = (cidr.enrich_cidr(df, dim, "ip", prefix_bits=20)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    # pre-expanded dim reuse path + collision rejection
    exp = cidr.expand_cidr_dim(dim, prefix_bits=20)
    assert {r["zone"] for r in exp.collect()} == {"core", "edge", "pop"}
    out2 = cidr.enrich_cidr(df, exp, "ip", prefix_bits=20)
    assert out2.where(F.col("zone").isNotNull()).count() == 3
    import pytest as _pytest
    with _pytest.raises(ValueError, match="collide"):
        cidr.enrich_cidr(df.withColumn("zone", F.lit("x")), dim, "ip")


def test_cidr_expand_disjoint_mode_and_wide_block(spark):
    """lpm=False skips the sweep (disjoint dims); a block wider than the
    bucket explodes once per covered bucket, clipped to bucket bounds."""
    from cefspark import cidr

    dim = spark.createDataFrame([("10.0.0.0/8", "core")],
                                "cidr string, zone string")
    exp = cidr.expand_cidr_dim(dim, prefix_bits=16, lpm=False)
    assert exp.count() == 256  # /8 at /16 buckets
    row = exp.orderBy("_bucket").first()
    assert row["_bucket"] == 10 * 256
    assert row["_end"] - row["_start"] == 65535  # clipped to one bucket


def test_decontaminate_overlap_fraction(spark):
    """Fractional rule: position-level hits over (tokens-n+1); threshold
    excludes docs at-or-below; denominator needs no shuffle (narrow)."""
    from cefspark import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f"),        # 4 trigram positions, hits: 'a b c','b c d' -> 0.5
         (2, "x y z w"),            # no overlap
         (3, "a b c a b c a b c")], # 7 positions, 'a b c' x3 + 'b c a' 0 + 'c a b' 0 -> 3/7
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a b c d")], "doc_id long, text string")  # shingles: 'a b c','b c d'
    out = {r["doc_id"]: r for r in dedup.decontaminate_overlap(
        docs, bench, n=3).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_gram_hits"] == 2 and out[1]["n_grams"] == 4
    assert out[1]["overlap_frac"] == 0.5
    assert out[3]["n_gram_hits"] == 3 and out[3]["n_grams"] == 7
    assert abs(out[3]["overlap_frac"] - 3 / 7) < 1e-15

    kept = dedup.decontaminate_overlap(docs, bench, n=3, threshold=0.5)
    assert {r["doc_id"] for r in kept.collect()} == set()  # 0.5 is NOT > 0.5

    # hashed and exact paths agree (differential)
    exact = {(r["doc_id"], r["n_gram_hits"]) for r in
             dedup.decontaminate_overlap(docs, bench, n=3,
                                         hashed=False).collect()}
    assert exact == {(1, 2), (3, 3)}


def test_chunk_windows_edges_and_plan(spark):
    """Sliding-window chunker: tail window lands, exact-fit produces no
    phantom chunk, empty docs vanish, overlap = size - stride; the whole
    thing is one narrow codegen stage (no shuffle, no Python)."""
    from cefspark import textops

    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "solo"),
         (3, " ".join(f"t{i}" for i in range(24))),   # exact fit -> 1 chunk
         (4, " ".join(f"t{i}" for i in range(40))),   # 2 chunks, no tail
         (5, " ".join(f"t{i}" for i in range(41)))],  # 3 chunks, 9-token tail
        "doc_id long, text string")
    out = textops.chunk_windows(docs, 24, 16)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    assert {d for d, _ in rows} == {2, 3, 4, 5}          # empty docs dropped
    assert rows[(2, 0)]["chunk_len"] == 1
    assert len([k for k in rows if k[0] == 3]) == 1      # exact fit
    assert len([k for k in rows if k[0] == 4]) == 2
    assert rows[(4, 1)]["start"] == 16 and rows[(4, 1)]["chunk_len"] == 24
    assert len([k for k in rows if k[0] == 5]) == 3
    assert rows[(5, 2)]["chunk_len"] == 9
    # overlap contract: consecutive chunks share size - stride tokens
    a = rows[(5, 0)]["chunk_text"].split()
    b = rows[(5, 1)]["chunk_text"].split()
    assert a[16:] == b[:8]
    # chunk membership is a pure function of the text, not partitioning
    again = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"]
             for r in textops.chunk_windows(docs.repartition(7), 24, 16).collect()}
    assert again == {k: v["chunk_text"] for k, v in rows.items()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan

    import pytest as _pytest
    with _pytest.raises(ValueError):
        textops.chunk_windows(docs, 0, 16)
    with _pytest.raises(ValueError):
        textops.chunk_windows(docs, 24, -1)


def test_url_host_extraction_and_domain_census(spark):
    """URL extraction: scheme-anchored, lowercased, port/path/sentence-dot
    terminated; distractors never match; the census shuffles exactly once."""
    import re
    from cefspark import textops

    docs = spark.createDataFrame(
        [(1, "go to https://Sub.Example.COM:8080/a and http://example.com/b."),
         (2, "trailing dot https://a.b. end"),
         (3, "ftp://skip.me https://nodot mailto:x@y.com bare.example.org"),
         (4, "dup https://x.example.com/1 https://x.example.com/2")],
        "doc_id long, text string")
    hosts = {r["doc_id"]: r["h"] for r in docs.select(
        "doc_id", textops.extract_url_hosts(F.col("text")).alias("h")).collect()}
    assert hosts[1] == ["sub.example.com", "example.com"]
    assert hosts[2] == ["a.b"]               # lone sentence dot not consumed
    assert hosts[3] == []                    # every distractor rejected
    assert hosts[4] == ["x.example.com", "x.example.com"]

    census = {r["domain"]: (r["n_docs"], r["n_urls"])
              for r in textops.domain_doc_counts(docs).collect()}
    assert census["example.com"] == (2, 4)   # doc1 x2 + doc4 x2 (distinct docs 1,4)
    assert census["a.b"] == (1, 1)
    out = textops.domain_doc_counts(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two-phase distinct agg: (domain, doc_id) partial shuffle + final on
    # domain — Catalyst's count_distinct expansion, both map-side combined
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "EvalPython" not in plan


def test_misra_gries_heavy_hitters_guarantees(spark):
    """MG sketch contract on a skewed corpus under forced multi-partition
    execution: (a) est <= true <= est + err_bound for every reported item,
    (b) any item with true > err_bound is present, (c) the clear heavy
    hitters (gap > err_bound) rank exactly as the exact counts rank."""
    from cefspark import sketches

    # zipf-ish: item i repeated 3000 // (i + 1) times, i in [0, 200)
    base = spark.range(200).select(
        F.concat(F.lit("item"), F.lpad(F.col("id").cast("string"), 3, "0"))
        .alias("v"),
        F.explode(F.sequence(F.lit(1), (F.lit(3000) / (F.col("id") + 1))
                             .cast("int"))).alias("_i")).drop("_i")
    base = base.repartition(8)  # multiple independent partition summaries

    exact = {r["v"]: r["n"] for r in
             base.groupBy("v").agg(F.count("*").alias("n")).collect()}
    got = sketches.heavy_hitters(base, "v", k=32).collect()
    assert got, "summary must not be empty"
    err = got[0]["err_bound"]
    assert all(r["err_bound"] == err for r in got)
    n_total = sum(exact.values())
    assert 0 <= err <= n_total // 33  # classic MG bound: N/(k+1)

    reported = {r["item"]: r["est_count"] for r in got}
    for item, est in reported.items():
        assert est <= exact[item] <= est + err, item
    for item, true in exact.items():
        if true > err:
            assert item in reported, (item, true, err)
    # clear heavy hitters order preserved when gaps exceed the bound
    top_exact = sorted(exact, key=lambda i: -exact[i])[:5]
    top_est = sorted(reported, key=lambda i: -reported[i])[:5]
    assert top_exact == top_est

    # NULLs ignored; empty frame -> empty summary
    with_null = base.unionByName(
        spark.createDataFrame([(None,)], "v string"))
    got2 = sketches.heavy_hitters(with_null, "v", k=32).collect()
    assert sum(r["est_count"] for r in got2) <= n_total
    empty = sketches.heavy_hitters(
        spark.createDataFrame([], "v string"), "v", k=4).collect()
    assert empty == []

    import pytest as _pytest
    with _pytest.raises(ValueError):
        sketches.heavy_hitters(base, "v", k=0)


def test_bpe_learn_and_apply(spark):
    """BPE: learned merges match the hand-derived classic result; greedy
    lowest-rank segmentation == sequential merge-list replay (the textbook
    equivalence) on adversarial words; learning is partitioning-invariant;
    the end-of-word marker distinguishes final from internal contexts."""
    from cefspark import bpe

    docs = spark.createDataFrame(
        [(1, "ab ab ab ac")], "doc_id long, text string")
    merges = bpe.learn_bpe(docs, n_merges=2)
    assert merges == [("a", "b"), ("a", "c")]
    # partitioning-invariant
    big = spark.createDataFrame(
        [(i, "low low lower lowest newest newest") for i in range(40)],
        "doc_id long, text string")
    m1 = bpe.learn_bpe(big, n_merges=8)
    m2 = bpe.learn_bpe(big.repartition(7), n_merges=8)
    assert m1 == m2 and len(m1) == 8

    # greedy-by-rank == replay-in-order (independent reference impl)
    def replay(word, ms):
        syms = tuple(word)
        for m in ms:
            syms = bpe._merge_word(syms, m)
        return list(syms)

    ranks = {m: i for i, m in enumerate(m1)}
    for w in ["low", "lowest", "newest", "blowing", "stew", "neew",
              "www", "lolow", "x", ""]:
        assert bpe.segment_word(w, ranks) == replay(w, m1) or w == "", w

    out = {r["doc_id"]: r for r in bpe.apply_bpe(
        spark.createDataFrame([(0, "abac abab"), (1, None), (2, "")],
                              "doc_id long, text string"),
        [("a", "b"), ("a", "c")]).collect()}
    assert out[0]["bpe_tokens"] == ["ab", "ac", "ab", "ab"]
    assert out[0]["n_bpe_tokens"] == 4
    assert out[1]["bpe_tokens"] == [] and out[1]["n_bpe_tokens"] == 0
    assert out[2]["n_bpe_tokens"] == 0

    # marker variant: word-final 's</w>' merges without touching internal s
    suffix_corpus = spark.createDataFrame(
        [(0, "cats dogs pigs")], "doc_id long, text string")
    marked = bpe.learn_bpe(suffix_corpus, n_merges=1, end_of_word="</w>")
    assert marked == [("s", "</w>")]          # the plural-suffix context wins
    unmarked = bpe.learn_bpe(suffix_corpus, n_merges=1)
    assert unmarked == [("g", "s")]           # without the marker it can't

    import pytest as _pytest
    with _pytest.raises(ValueError):
        bpe.learn_bpe(docs, n_merges=-1)


def test_conversation_level_neardup_composition(spark):
    """The operators compose at conversation granularity: render turns ->
    one doc per conversation -> MinHash near-dup over the rendered dialogs
    finds the lightly-edited duplicate conversation and nothing else."""
    from cefspark import dedup, transcripts

    def conv(cid, texts):
        return [(cid, i, "user" if i % 2 == 0 else "assistant", t)
                for i, t in enumerate(texts)]

    base = ["please summarize the quarterly report for the board meeting",
            "the quarterly report shows revenue up twelve percent overall",
            "what were the main cost drivers this quarter then",
            "cloud spend and hiring were the main cost drivers this quarter"]
    edited = list(base)
    edited[2] = "what were the main cost drivers this quarter instead"
    rows = (conv("c1", base) + conv("c2", edited)
            + conv("c3", ["totally different words about gardening tips",
                          "tomatoes need full sun and regular deep watering",
                          "how often should i water them in summer heat",
                          "every two days unless the soil is still moist"]))
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")

    docs = transcripts.render_conversations(turns)
    pairs = dedup.minhash_dedup(docs, text_col="dialog", id_col="conv_id",
                                threshold=0.5).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {("c1", "c2")}
    assert pairs[0]["jaccard"] > 0.5


def test_int8_quantization_roundtrip_and_topk_agreement(spark):
    """Symmetric int8 quantization: values stay in [-127,127] with the max
    element pinned at ±127, dequantization error <= scale/2 per element,
    scales cancel in cosine (error < 0.01 on the real embeddings), and
    quantized top-k agrees with exact top-k on clear neighbors."""
    from cefspark import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = similarity.quantize_int8(emb)
    rows = {r["vec_id"]: r for r in q.collect()}
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for vid, r in list(rows.items())[:50]:
        xs, qs, s = orig[vid], r["q"], r["scale"]
        assert len(qs) == len(xs)
        assert max(abs(v) for v in qs) == 127 or s == 0
        for x, qv in zip(xs, qs):
            assert abs(qv * s - float(x)) <= s / 2 + 1e-12

    # cosine with scales cancelled stays within the rounding budget
    joined = (q.alias("a").join(q.alias("b"),
                                F.col("a.vec_id") < F.col("b.vec_id"))
              .limit(300)
              .select(F.col("a.vec_id").alias("ia"),
                      F.col("b.vec_id").alias("ib"),
                      similarity.cosine_int8(F.col("a.q"), F.col("b.q"))
                      .alias("cq")))
    exact = (emb.alias("a").join(emb.alias("b"),
                                 F.col("a.vec_id") < F.col("b.vec_id"))
             .limit(300)
             .select(F.col("a.vec_id").alias("ia"),
                     F.col("b.vec_id").alias("ib"),
                     similarity.cosine(F.col("a.embedding"),
                                       F.col("b.embedding")).alias("ce")))
    both = {(r["ia"], r["ib"]): r["cq"] for r in joined.collect()}
    for r in exact.collect():
        key = (r["ia"], r["ib"])
        if key in both:
            assert abs(both[key] - r["ce"]) < 0.01, key

    # top-k agreement on a real query vector
    query = orig[0]
    exact_top = [r["vec_id"] for r in
                 similarity.brute_force_topk(emb, query, k=5).collect()]
    quant_top = [r["vec_id"] for r in
                 similarity.quantized_topk(q, query, k=5).collect()]
    assert exact_top[0] == quant_top[0] == 0      # self-match survives
    assert len(set(exact_top) & set(quant_top)) >= 4

    # zero vector: scale 0, all-zero q
    z = similarity.quantize_int8(spark.createDataFrame(
        [(99, [0.0] * 4)], "vec_id long, embedding array<float>")).first()
    assert z["scale"] == 0.0 and list(z["q"]) == [0, 0, 0, 0]


def test_pseudonymize_referential_integrity_and_rekeying(spark):
    """Keyed pseudonymization: same id ⇒ same token (joins survive),
    different salt ⇒ unlinkable tokens, NULL stays NULL, length clamps
    enforced; pure codegen."""
    from cefspark import redact

    df = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9), (4, None)], "event_id long, user_id long")
    a = {r["event_id"]: r["user_id_pseudo"] for r in
         redact.pseudonymize(df, ["user_id"], "s1").collect()}
    assert a[1] == a[2] and a[1] != a[3]          # referential integrity
    assert a[4] is None
    assert len(a[1]) == 16 and all(c in "0123456789abcdef" for c in a[1])
    b = {r["event_id"]: r["user_id_pseudo"] for r in
         redact.pseudonymize(df, ["user_id"], "s2").collect()}
    assert b[1] != a[1]                           # re-keying unlinks

    out = redact.pseudonymize(df, ["user_id"], "s1")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan

    import pytest as _pytest
    with _pytest.raises(ValueError):
        redact.pseudonymize(df, [], "s")
    with _pytest.raises(ValueError):
        redact.pseudonymize(df, ["user_id"], "s", length=65)


def test_drop_near_dups_keeps_representatives(spark):
    """One-call near-dup removal: each near-dup cluster keeps exactly its
    min-id representative, distinct docs all survive, all columns ride
    through, and the survivor set is partitioning-invariant."""
    from cefspark import dedup

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank every single morning before the sun rises fully")
    v2 = base.replace("morning", "evening")
    v3 = base.replace("quick", "swift")
    other = ("completely unrelated text about database query planning and "
             "shuffle partitioning strategies for large clusters today")
    docs = spark.createDataFrame(
        [(10, base, "a"), (11, v2, "b"), (12, v3, "c"),
         (20, other, "d"), (21, other + " extended with more words", "e")],
        "doc_id long, text string, tag string")
    kept = dedup.drop_near_dups(docs, threshold=0.5)
    rows = {r["doc_id"]: r["tag"] for r in kept.collect()}
    assert 10 in rows and 11 not in rows and 12 not in rows
    assert 20 in rows          # cluster 20/21 keeps its min id
    assert rows[10] == "a"     # extra columns survive

    again = {r["doc_id"] for r in
             dedup.drop_near_dups(docs.repartition(7), threshold=0.5).collect()}
    assert again == set(rows)


def test_percentile_approx_swap_holds_rank_error_bound(spark):
    """The documented unbounded-group swap for value_percentiles: Spark's
    percentile_approx returns an OBSERVED value whose rank error is within
    the n/accuracy contract for every group — pinned so the swap is a
    tested path, not a docstring promise."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    acc = 100
    approx = {(r["event_type"], r["p"]): r["v"] for r in
              ev.groupBy("event_type").agg(
                  F.percentile_approx("value", 0.5, acc).alias("m"),
                  F.percentile_approx("value", 0.95, acc).alias("h"))
              .selectExpr("event_type",
                          "stack(2, cast(0.5 as double), m, "
                          "cast(0.95 as double), h) as (p, v)").collect()}
    groups = {}
    for r in ev.select("event_type", "value").collect():
        groups.setdefault(r["event_type"], []).append(r["value"])
    for (et, p), v in approx.items():
        vals = sorted(groups[et])
        n = len(vals)
        assert v in groups[et]                 # observed value, not interpolated
        rank = vals.index(v)
        assert abs(rank - p * (n - 1)) <= n / acc + 1, (et, p)


def test_bpe_segmentation_properties_hypothesis():
    """Property over merge lists LEARNED from random corpora (the only
    lists the library ever produces — a hand-ordered list like
    [("dd","d"), ("d","d")] is unlearnable since "dd" cannot pre-exist its
    own creating merge, and greedy-vs-replay genuinely diverges on such
    lists): greedy-rank segmentation (a) loses no characters and (b)
    equals sequential merge-list replay, on arbitrary unseen words."""
    from hypothesis import given, settings, strategies as st

    from cefspark import bpe

    alphabet = "abcd"
    corpora = st.dictionaries(
        st.text(alphabet=alphabet, min_size=1, max_size=8),
        st.integers(min_value=1, max_value=5), min_size=1, max_size=8)
    words = st.text(alphabet=alphabet, min_size=0, max_size=14)

    def learn(wc, k):
        vocab = {tuple(w): c for w, c in wc.items()}
        merges = []
        for _ in range(k):
            stats = bpe._pair_stats(vocab)
            if not stats:
                break
            best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            vocab = {bpe._merge_word(s, best): n for s, n in vocab.items()}
        return merges

    @settings(max_examples=200, deadline=None)
    @given(wc=corpora, k=st.integers(min_value=0, max_value=8), w=words)
    def check(wc, k, w):
        ms = learn(wc, k)
        ranks = {m: i for i, m in enumerate(ms)}
        segs = bpe.segment_word(w, ranks)
        assert "".join(segs) == w
        syms = tuple(w)
        for m in ms:
            syms = bpe._merge_word(syms, m)
        if w:
            assert segs == list(syms)

    check()


def test_hash_embed_determinism_and_retrieval(spark):
    """Feature-hashing embeddings: unit-norm dense vectors, identical
    across partitionings, a repeated-content doc embeds identically, empty
    docs embed as zero vectors, and cosine retrieval finds the on-topic
    document end-to-end."""
    import math

    from cefspark import similarity

    docs = spark.createDataFrame(
        [(1, "database shuffle partition join optimizer spark catalyst"),
         (2, "tomato garden watering sunlight soil compost seedling"),
         (3, "database shuffle partition join optimizer spark catalyst"),
         (4, "")],
        "doc_id long, text string")
    emb = {r["doc_id"]: r["embedding"]
           for r in similarity.hash_embed(docs, dim=32).collect()}
    assert len(emb) == 4 and len(emb[1]) == 32
    assert emb[1] == emb[3]                       # pure function of text
    assert emb[4] == [0.0] * 32
    assert abs(math.sqrt(sum(x * x for x in emb[1])) - 1.0) < 1e-12
    again = {r["doc_id"]: r["embedding"]
             for r in similarity.hash_embed(docs.repartition(7),
                                            dim=32).collect()}
    assert again == emb

    # retrieval: embed a query string through the same op, cosine top-1
    q = spark.createDataFrame([(0, "spark shuffle join database")],
                              "doc_id long, text string")
    qv = similarity.hash_embed(q, dim=32).first()["embedding"]
    vecs = similarity.hash_embed(docs.where("doc_id < 3"), dim=32) \
        .withColumnRenamed("doc_id", "vec_id")
    top = similarity.brute_force_topk(vecs, qv, k=1).first()
    assert top["vec_id"] == 1 and top["cos"] > 0.3

    plan = similarity.hash_embed(docs, dim=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    import pytest as _pytest
    with _pytest.raises(ValueError):
        similarity.hash_embed(docs, dim=0)


def test_compression_metrics_exact_and_discriminative(spark):
    """zlib_len matches local zlib.compress byte-for-byte; repetitive
    boilerplate shows a far higher compression ratio than high-entropy
    text; nulls stay null."""
    import random
    import zlib

    from cefspark import textops

    rnd = random.Random(7)
    noisy = "".join(chr(rnd.randint(33, 126)) for _ in range(4000))
    rep = "click here to subscribe now! " * 140
    rows = [("rep", rep), ("noisy", noisy), ("empty", ""), ("none", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in
           textops.compression_metrics(df).collect()}

    for key, text in [("rep", rep), ("noisy", noisy), ("empty", "")]:
        assert got[key]["zlib_len"] == len(zlib.compress(text.encode(), 6))
        assert got[key]["byte_len"] == len(text.encode())
    assert got["rep"]["compression_ratio"] > 20
    assert got["noisy"]["compression_ratio"] < 1.2
    assert got["none"]["zlib_len"] is None
    assert got["none"]["compression_ratio"] is None


def test_cooccurrence_pmi_counts_and_float(spark):
    from cefspark.transcripts import cooccurrence_pmi

    rows = [  # g1: a,b,c  g2: a,b  g3: a  g4: b,c  (+ dup items, one null)
        ("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "a"),
        ("g2", "a"), ("g2", "b"), ("g3", "a"), ("g4", "b"), ("g4", "c"),
        ("g4", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, tool string")
    got = {(r.item_a, r.item_b): r for r in
           cooccurrence_pmi(df).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = got[("a", "b")]
    assert (ab.n_joint, ab.n_a, ab.n_b, ab.n_groups) == (2, 3, 3, 4)
    assert got[("a", "c")].n_joint == 1 and got[("b", "c")].n_joint == 2
    import math
    for (a, b), r in got.items():
        assert r.pmi == pytest.approx(
            math.log(r.n_joint * r.n_groups / (r.n_a * r.n_b)), rel=1e-12)
    # pair generation happens inside rows: no sort-merge self-join
    plan = (cooccurrence_pmi(df)._jdf.queryExecution().executedPlan()
            .toString())
    assert "SortMergeJoin" not in plan


def test_jl_projection_properties(spark):
    import math

    from cefspark import similarity

    emb = (spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
           .where(F.col("vec_id") < 400))
    proj = similarity.project_embeddings(emb, in_dim=64, out_dim=16)
    rows = {r.vec_id: (list(r.embedding), list(r.proj))
            for r in proj.collect()}
    assert all(len(p) == 16 for _, p in rows.values())

    # determinism under re-partitioning (pure function of the vector)
    rows2 = {r.vec_id: list(r.proj) for r in
             similarity.project_embeddings(
                 emb.repartition(7), 64, 16).collect()}
    assert rows2 == {k: p for k, (_, p) in rows.items()}

    # linearity: proj(1.5 v) == 1.5 proj(v) exactly (pure float algebra)
    scaled = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x * F.lit(1.5)))
    sp = {r.vec_id: list(r.proj) for r in
          similarity.project_embeddings(scaled, 64, 16).collect()}
    some = next(iter(rows))
    assert sp[some] == [1.5 * v for v in rows[some][1]]

    # norm concentration: E||proj||^2 == ||v||^2; the MEAN ratio over 400
    # vectors concentrates hard even though k=16 is narrow
    ratios = [sum(p * p for p in proj_v) / sum(v * v for v in vec)
              for vec, proj_v in rows.values() if any(vec)]
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.85 <= mean_ratio <= 1.15, mean_ratio

    # retrieval survives the projection for SEPARATED neighbours: a
    # planted near-duplicate of the probe (tiny perturbation) stays the
    # projected top-1 — JL preserves near-zero distances; ambient random
    # vectors (all roughly equidistant) are allowed to reshuffle
    probe = sorted(rows)[0]
    base_vec = rows[probe][0]
    near = [v + (0.01 if i % 3 == 0 else -0.01)
            for i, v in enumerate(base_vec)]
    planted = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame([(999999, [float(x) for x in near])],
                              "vec_id long, embedding array<float>"))
    pspace = {r.vec_id: list(r.proj) for r in
              similarity.project_embeddings(planted, 64, 16).collect()}

    def top1(space, probe_id):
        pv = space[probe_id]
        best, best_s = None, -2.0
        for vid, v in space.items():
            if vid == probe_id:
                continue
            dp = sum(a * b for a, b in zip(pv, v))
            na = math.sqrt(sum(a * a for a in pv))
            nb = math.sqrt(sum(b * b for b in v))
            s = dp / (na * nb + 1e-12)
            if s > best_s:
                best, best_s = vid, s
        return best

    assert top1(pspace, probe) == 999999

    # plan stays codegen (no python, no shuffle)
    plan = (similarity.project_embeddings(emb, 64, 16)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "Exchange" not in plan
