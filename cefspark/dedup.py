"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All DataFrame-native (built-in functions only; the hash primitive is
xxhash64, seeded per-permutation with a literal column). Designed for the
100 TB path:

* exact dedup — one hash-aggregate shuffle on the key; map-side partial agg
  keeps the shuffle at ~unique-keys volume.
* MinHash+LSH — signatures are one explode + one groupBy(doc) (shuffle is
  bounded by docs x shingles pre-aggregated per partition); banding turns the
  quadratic all-pairs problem into equi-joins on (band, band_hash) buckets,
  so the only join is shuffle-hash on bucket keys whose fan-out is the
  candidate set, not n^2.
* n-gram Jaccard — exact verification; the self-join on shared shingles is
  the scale hazard, so callers LSH-prefilter first (verify_pairs) — the
  all-pairs variant is for small candidate sets / oracle checking.
* SimHash — 64 per-bit partial sums in a single hash-aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per duplicate group (deterministic)."""
    return (df.groupBy(*key_cols)
            .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
            .select(id_col, "n_dups"))


def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """(id, shingle) pairs: distinct n-token word shingles per document."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    shingles = F.transform(F.sequence(F.lit(1), count),
                           lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return (df.select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")))


def jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact all-pairs n-gram Jaccard >= threshold (a < b).

    Joins documents on shared shingles; use after LSH prefiltering at scale.
    Output: (a, b, jaccard) with jaccard rounded to 6dp for stable compare.
    """
    sh = word_shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (a.join(b, "shingle").where(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_inter")))
    out = (inter
           .join(sizes.select(F.col(id_col).alias("a"), F.col("set_size").alias("sa")), "a")
           .join(sizes.select(F.col(id_col).alias("b"), F.col("set_size").alias("sb")), "b")
           .withColumn("jaccard", F.round(F.col("n_inter") /
                                          (F.col("sa") + F.col("sb") - F.col("n_inter")), 6))
           .where(F.col("jaccard") >= threshold)
           .select("a", "b", "jaccard"))
    return out


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_n: int = 3) -> DataFrame:
    """MinHash signature per document: h_i = min over shingles of
    xxhash64(i, shingle). One explode + one aggregate."""
    sh = word_shingles(df, text_col, id_col, shingle_n)
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_perm)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(signatures: DataFrame, id_col: str = "doc_id",
                   bands: int = 16, rows: int = 4) -> DataFrame:
    """Band the signature (bands x rows = num_perm); docs sharing any band
    bucket are candidates. Output distinct (a, b), a < b."""
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.xxhash64(*[F.col(f"h{bi * rows + r}") for r in range(rows)]).alias("bh"))
        for bi in range(bands)
    ]
    bucketed = (signatures
                .select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb"))
                .select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")))
    a = bucketed.select(F.col(id_col).alias("a"), "band", "bh")
    b = bucketed.select(F.col(id_col).alias("b"), "band", "bh")
    return (a.join(b, ["band", "bh"]).where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def verify_pairs(candidates: DataFrame, df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 3,
                 threshold: float = 0.5) -> DataFrame:
    """Exact-Jaccard scoring of specific (a, b) candidate pairs.

    Cost is O(candidates), not O(all pairs sharing a shingle): shingle sets
    are aggregated per doc once, then each candidate pair intersects two
    arrays. This is the scale path behind LSH prefiltering.
    """
    sets_df = (word_shingles(df, text_col, id_col, n)
               .groupBy(id_col).agg(F.collect_set("shingle").alias("sh")))
    a = sets_df.select(F.col(id_col).alias("a"), F.col("sh").alias("sha"))
    b = sets_df.select(F.col(id_col).alias("b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    union = F.size(F.col("sha")) + F.size(F.col("shb")) - inter
    return (candidates.join(a, "a").join(b, "b")
            .withColumn("jaccard", F.round(inter / union, 6))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  num_perm: int = 64, shingle_n: int = 3, bands: int = 16,
                  threshold: float = 0.5) -> DataFrame:
    """MinHash -> LSH candidate pairs -> exact-Jaccard verification of the
    candidates only. Returns verified near-dup pairs (a, b, jaccard)."""
    rows = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    cand = lsh_candidates(sigs, id_col, bands, rows)
    return verify_pairs(cand, df, text_col, id_col, shingle_n, threshold)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: per-bit majority vote over token hashes.

    One explode + one aggregate producing 64 partial sums, assembled into a
    single long. Near-duplicates then cluster by small Hamming distance.
    """
    toks = (df.select(F.col(id_col),
                      F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    sums = toks.groupBy(id_col).agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ])
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return sums.select(F.col(id_col), sig.alias("simhash"))


def hamming_pairs(sim: DataFrame, id_col: str = "doc_id", max_dist: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, using 8x8-bit block LSH
    (any identical block is a candidate — pigeonhole-exact for max_dist <= 7)."""
    blocks = [((F.shiftrightunsigned(F.col("simhash"), 8 * i)).bitwiseAND(F.lit(0xFF)))
              .alias(f"blk{i}") for i in range(8)]
    with_blocks = sim.select(F.col(id_col).alias("id"), F.col("simhash"), *blocks)
    cands = None
    for i in range(8):
        a = with_blocks.select(F.col("id").alias("a"), F.col("simhash").alias("sa"),
                               F.col(f"blk{i}").alias("blk"))
        b = with_blocks.select(F.col("id").alias("b"), F.col("simhash").alias("sb"),
                               F.col(f"blk{i}").alias("blk"))
        c = a.join(b, "blk").where(F.col("a") < F.col("b")).select("a", "b", "sa", "sb")
        cands = c if cands is None else cands.unionByName(c)
    dist = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cands.distinct().withColumn("hamming", dist)
            .where(F.col("hamming") <= max_dist).select("a", "b", "hamming"))
