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

from typing import Optional

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

    The shingle explode feeds three subtrees; it is deliberately NOT cached —
    a session-lifetime cache of the exploded corpus would dwarf the input
    (and leak), while recomputing a narrow split/explode is cheap. Callers
    wanting reuse across their own actions can persist/unpersist explicitly.
    """
    sh = word_shingles(df, text_col, id_col, n)
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


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """(id, sh: array<string>) — the distinct shingle set per document, in one
    aggregate. Both the MinHash signatures and the exact-Jaccard verification
    derive from this, so a combined pipeline shuffles the shingle volume once."""
    return (word_shingles(df, text_col, id_col, n)
            .groupBy(id_col).agg(F.collect_set("shingle").alias("sh")))


def signatures_from_sets(sets_df: DataFrame, id_col: str = "doc_id",
                         num_perm: int = 64) -> DataFrame:
    """MinHash signatures computed over the per-doc shingle array with
    higher-order functions (no extra shuffle): h_i = min over shingles of
    xxhash64(i, shingle)."""
    # one parsed SQL string per perm (a py4j lambda-Column per perm cost
    # ~1 s of driver time per query construction at num_perm=64 — see the
    # same rationale in simhash()). The SQL literal `i` is INT, matching
    # the old F.lit(i) IntegerType, so xxhash64 output is bit-identical
    # (differential-pinned in pytest).
    cols = [F.expr(f"array_min(transform(sh, x -> xxhash64({i}, x))) AS h{i}")
            for i in range(num_perm)]
    return sets_df.select(F.col(id_col), *cols)


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_n: int = 3) -> DataFrame:
    """MinHash signature per document: h_i = min over shingles of
    xxhash64(i, shingle). One explode + one aggregate."""
    sh = word_shingles(df, text_col, id_col, shingle_n)
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_perm)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bucket_stats(signatures: DataFrame, id_col: str = "doc_id",
                     bands: int = 16, rows: int = 4) -> DataFrame:
    """Per-bucket occupancy for the LSH banding — the audit companion to the
    ``max_bucket_size`` cap in :func:`lsh_candidates`. Returns
    (band, bh, bucket_size) so callers can count/inspect what a cap drops."""
    return (_lsh_bucketed(signatures, id_col, bands, rows)
            .groupBy("band", "bh").agg(F.count(F.lit(1)).alias("bucket_size")))


def _lsh_bucketed(signatures: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    # single parsed array-of-structs expression (construction-cost rationale
    # in simhash()); semantics identical to the per-band Column build
    structs = ", ".join(
        "struct({b} AS band, xxhash64({hs}) AS bh)".format(
            b=bi, hs=", ".join(f"h{bi * rows + r}" for r in range(rows)))
        for bi in range(bands))
    return (signatures
            .select(F.col(id_col), F.explode(F.expr(f"array({structs})")).alias("bb"))
            .select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")))


def lsh_candidates(signatures: DataFrame, id_col: str = "doc_id",
                   bands: int = 16, rows: int = 4,
                   max_bucket_size: Optional[int] = None) -> DataFrame:
    """Band the signature (bands x rows = num_perm); docs sharing any band
    bucket are candidates. Output distinct (a, b), a < b.

    ``max_bucket_size`` bounds the quadratic blow-up of degenerate buckets
    (empty/boilerplate documents sharing a band hash make that bucket's join
    O(size^2)): buckets above the cap contribute NO candidate pairs. The cap
    is lossy, so it is opt-in (default None = exact candidates) — production
    entry points at scale should set it (the registry/bench path uses 1000)
    and audit what it drops with :func:`lsh_bucket_stats`; docs in a dropped
    bucket usually still pair through one of their other ``bands - 1`` buckets.
    """
    bucketed = _lsh_bucketed(signatures, id_col, bands, rows)
    if max_bucket_size is not None:
        over = (bucketed.groupBy("band", "bh")
                .agg(F.count(F.lit(1)).alias("bucket_size"))
                .where(F.col("bucket_size") > max_bucket_size)
                .select("band", "bh"))
        # over-cap buckets are rare by construction -> broadcast anti-join
        bucketed = bucketed.join(F.broadcast(over), ["band", "bh"], "left_anti")
    a = bucketed.select(F.col(id_col).alias("a"), "band", "bh")
    b = bucketed.select(F.col(id_col).alias("b"), "band", "bh")
    return (a.join(b, ["band", "bh"]).where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def verify_pairs(candidates: DataFrame, df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 3,
                 threshold: float = 0.5,
                 sets_df: Optional[DataFrame] = None) -> DataFrame:
    """Exact-Jaccard scoring of specific (a, b) candidate pairs.

    Cost is O(candidates), not O(all pairs sharing a shingle): shingle sets
    are aggregated per doc once, then each candidate pair intersects two
    arrays. This is the scale path behind LSH prefiltering. Pass ``sets_df``
    (from :func:`shingle_sets`) to reuse an already-built set table.
    """
    if sets_df is None:
        sets_df = shingle_sets(df, text_col, id_col, n)
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
                  threshold: float = 0.5,
                  max_bucket_size: Optional[int] = None) -> DataFrame:
    """MinHash -> LSH candidate pairs -> exact-Jaccard verification of the
    candidates only. Returns verified near-dup pairs (a, b, jaccard).

    Plan shape: ONE shuffle of the shingle volume (the per-doc set
    aggregation); signatures derive from the set arrays with higher-order
    functions and verification intersects the same arrays — signatures and
    verify no longer shuffle the corpus independently."""
    rows = num_perm // bands
    sets_df = shingle_sets(df, text_col, id_col, shingle_n)
    sigs = signatures_from_sets(sets_df, id_col, num_perm)
    cand = lsh_candidates(sigs, id_col, bands, rows, max_bucket_size)
    return verify_pairs(cand, df, text_col, id_col, shingle_n, threshold,
                        sets_df=sets_df)


def components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs (a, b): label propagation to
    the minimum reachable id — the clustering step between pair-finding and
    representative-keeping in a dedup pipeline.

    Each iteration is one equi-join + one min-aggregate (both shuffle on id);
    iterations needed = graph diameter (near-dup clusters are shallow stars,
    so typically 2-3). The per-iteration ``localCheckpoint`` truncates lineage
    — without it the plan doubles every iteration and the job dies on plan-
    compilation long before data size matters. Convergence is detected by an
    exact changed-label count (a driver-side scalar per iteration).

    Returns (id, component) for every id appearing in ``pairs``, where
    component is the minimum id of the connected component.
    """
    edges = (pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
             .unionByName(pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("x").alias("id")).distinct()
              .withColumn("comp", F.col("id"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        # each node adopts min(own comp, neighbors' comps); the changed count
        # comes from the SAME join (new_comp < comp), not a second one.
        # ONE materialization per round (r7): the joined frame itself is the
        # round's checkpoint — the convergence count then reads its cached
        # blocks and the next round's labels are a projection of it (lineage
        # stays rooted at the checkpoint), replacing the old
        # persist -> count -> second-checkpoint sequence (3 jobs -> 2, one
        # of which is a cached-block count).
        nbr = (edges.join(labels.withColumnRenamed("id", "y"), "y")
               .groupBy("x").agg(F.min("comp").alias("nbr_comp")))
        joined = (labels.join(nbr.withColumnRenamed("x", "id"), "id", "left")
                  .select("id", "comp",
                          F.least("comp", F.coalesce("nbr_comp", "comp"))
                          .alias("new_comp"))
                  .localCheckpoint(eager=True))
        changed = joined.where(F.col("new_comp") < F.col("comp")).count()
        if changed == 0:
            return labels
        # rebinding `labels`/`joined` drops the last driver reference to the
        # previous checkpoint; CPython refcounting + Spark's ContextCleaner
        # then reclaim its blocks (no public API unpersists a localCheckpoint
        # directly — verified: DataFrame.unpersist()/.rdd.unpersist() are
        # no-ops on it), so at most a couple of superseded label tables are
        # ever resident
        labels = joined.select("id", F.col("new_comp").alias("comp"))
    raise RuntimeError(f"components did not converge in {max_iter} iterations "
                       f"(graph diameter larger than expected for near-dup clusters)")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: per-bit majority vote over token hashes.

    One explode + one aggregate producing 64 partial sums, assembled into a
    single long. Near-duplicates then cluster by small Hamming distance.
    """
    toks = (df.select(F.col(id_col),
                      F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    # per-bit ONES count (branch-free shift/mask sum, ~10% faster than the
    # CASE-WHEN +/-1 form) + total token count; majority vote bit i is then
    # 2*ones_i > n — identical to sign(sum of +/-1) including the tie -> 0.
    # The 64-term expressions are built as SQL STRINGS parsed in ONE py4j
    # call each: composing them as Column objects cost ~1.7 s of driver-side
    # py4j round-trips PER QUERY CONSTRUCTION (measured — more than the
    # cluster spends executing the whole query at sf0.1).
    sums = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.expr(f"sum(shiftright(h, {i}) & 1L) AS o{i}") for i in range(64)])
    sig = F.expr(" + ".join(  # disjoint bit positions: + == OR
        f"shiftleft(cast(o{i} * 2 > _n AS BIGINT), {i})" for i in range(64)))
    return sums.select(F.col(id_col), sig.alias("simhash"))


def hamming_pairs(sim: DataFrame, id_col: str = "doc_id", max_dist: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance via multi-index block LSH.

    Join-key cardinality is the scale constraint: a single 8-bit block key has
    only 256 distinct values, so at N docs every bucket holds ~N/256 and the
    self-join degenerates to O(N^2/256). Both schemes used here keep >= 2^16
    distinct key values:

    * ``max_dist <= 3`` — 4 blocks of 16 bits; by pigeonhole a pair within
      distance 3 shares at least one block. Join key: (block_idx, 16-bit value).
    * ``4 <= max_dist <= 6`` — 8 blocks of 8 bits, candidates share an equal
      *pair* of blocks (<= 6 errors across 8 blocks leave >= 2 clean blocks).
      Join key: (pair_idx, blk_i, blk_j) — 28 combos x 2^16 values. Each doc
      emits 28 key rows; the constant fan-out buys the 256x bucket shrink.
    * ``max_dist == 7`` — exactness would need >= 8 shared-block candidates
      from 8-bit single blocks (the degenerate-cardinality scheme); rejected.

    Candidates are exact-verified with bit_count, so the output is exact for
    the supported distances.
    """
    if not 0 <= max_dist <= 6:
        raise ValueError("hamming_pairs supports max_dist in [0, 6]; wider radii "
                         "need a lower-cardinality blocking that does not scale")
    # one parsed SQL string instead of dozens of py4j Column compositions
    # (same driver-side construction-cost rationale as in simhash())
    if max_dist <= 3:
        structs = ", ".join(
            f"struct({i} AS c, shiftrightunsigned(simhash, {16 * i}) & 65535 "
            f"AS k1, 0 AS k2)" for i in range(4))
    else:
        combos = [(i, j) for i in range(8) for j in range(i + 1, 8)]
        structs = ", ".join(
            f"struct({c} AS c, shiftrightunsigned(simhash, {8 * i}) & 255 "
            f"AS k1, shiftrightunsigned(simhash, {8 * j}) & 255 AS k2)"
            for c, (i, j) in enumerate(combos))
    keyed = (sim.select(F.col(id_col).alias("id"), "simhash",
                        F.explode(F.expr(f"array({structs})")).alias("kk"))
             .select("id", "simhash", "kk.c", "kk.k1", "kk.k2"))
    a = keyed.select(F.col("id").alias("a"), F.col("simhash").alias("sa"), "c", "k1", "k2")
    b = keyed.select(F.col("id").alias("b"), F.col("simhash").alias("sb"), "c", "k1", "k2")
    cands = (a.join(b, ["c", "k1", "k2"]).where(F.col("a") < F.col("b"))
             .select("a", "b", "sa", "sb").distinct())
    dist = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cands.withColumn("hamming", dist)
            .where(F.col("hamming") <= max_dist).select("a", "b", "hamming"))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, hashed: bool = True) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    n-token word shingle with an evaluation/benchmark corpus — the standard
    guard against eval leakage before a corpus becomes training data
    (n=8..13 in published pipelines; the gate exercises n=3 where the
    synthetic corpus actually overlaps). Returns (id, n_hits): one row per
    contaminated doc with its count of distinct leaked shingles.

    Scale: the benchmark side is an eval suite — small by construction — so
    its distinct shingles BROADCAST and the training side never shuffles its
    shingle volume: explode -> broadcast hash join -> per-doc count, where
    the count aggregation only carries the (rare) matching rows.
    ``hashed=True`` joins on xxhash64(shingle) instead of the string —
    8-byte keys instead of ~50-byte strings in the broadcast and the probe
    (a false positive needs a 64-bit collision AND would only add one
    flagged doc; pass hashed=False for exact-string auditing)."""
    d = word_shingles(docs, text_col, id_col, n)
    b = word_shingles(benchmark, text_col, id_col, n).select("shingle")
    if hashed:
        d = d.select(id_col, F.xxhash64("shingle").alias("_k"))
        b = b.select(F.xxhash64("shingle").alias("_k"))
    else:
        d = d.select(id_col, F.col("shingle").alias("_k"))
        b = b.select(F.col("shingle").alias("_k"))
    return (d.join(F.broadcast(b.distinct()), "_k")
            .groupBy(id_col)
            .agg(F.count_distinct("_k").alias("n_hits")))


def positional_shingles(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) with one row per POSITION (no dedup) — the multiset
    :func:`word_shingles` collapses; needed when overlap is measured as a
    fraction of the document's n-grams rather than set membership."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    shingles = F.transform(F.sequence(F.lit(1), count),
                           lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return df.select(F.col(id_col), F.explode(shingles).alias("shingle"))


def decontaminate_overlap(docs: DataFrame, benchmark: DataFrame,
                          text_col: str = "text", id_col: str = "doc_id",
                          n: int = 13, threshold: float = 0.0,
                          hashed: bool = True,
                          broadcast_hits: bool = True) -> DataFrame:
    """Fractional benchmark decontamination — the published n-gram-overlap
    rule (13-gram in the GPT-3/PaLM data notes; the gate exercises n=3
    where the synthetic corpus overlaps): a document is contaminated when
    MORE THAN ``threshold`` of its n-gram POSITIONS also occur in the
    benchmark. Returns ``(id, n_gram_hits, n_grams, overlap_frac)`` for
    flagged docs; :func:`decontaminate` stays the any-hit boolean form.

    Scale shape: the denominator (n-gram count) is NARROW arithmetic on
    the token count — no shuffle; the numerator inner-joins the exploded
    positions against the BROADCAST benchmark shingle set, so only
    matching positions reach the per-doc count shuffle. The hit relation
    is then joined back to the denominators broadcast (contaminated docs
    are rare by construction in production — pass
    ``broadcast_hits=False`` under heavy contamination and AQE picks the
    join side). ``hashed`` as in :func:`decontaminate`."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    totals = docs.select(
        F.col(id_col),
        F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)).alias("n_grams"))
    d = positional_shingles(docs, text_col, id_col, n)
    b = word_shingles(benchmark, text_col, id_col, n).select("shingle")
    if hashed:
        d = d.select(id_col, F.xxhash64("shingle").alias("_k"))
        b = b.select(F.xxhash64("shingle").alias("_k"))
    else:
        d = d.select(id_col, F.col("shingle").alias("_k"))
        b = b.select(F.col("shingle").alias("_k"))
    hits = (d.join(F.broadcast(b.distinct()), "_k")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_gram_hits")))
    hits = F.broadcast(hits) if broadcast_hits else hits
    return (totals.join(hits, id_col)
            .withColumn("overlap_frac",
                        F.col("n_gram_hits") / F.col("n_grams"))
            .where(F.col("overlap_frac") > threshold)
            .select(id_col, "n_gram_hits", "n_grams", "overlap_frac"))


def remove_boilerplate(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_doc_frac: float = 0.05,
                       min_docs: int = 2) -> DataFrame:
    """Corpus-wide boilerplate LINE removal — the CCNet/RefinedWeb-style
    cleanup step that strips lines recurring across many documents
    (copyright footers, cookie banners, nav chrome) while leaving
    document-specific content intact. A line is boilerplate when its
    normalized form (lowercased, whitespace-collapsed, trimmed) appears in
    at least ``max(min_docs, ceil(max_doc_frac * n_docs))`` distinct
    documents — an exact integer predicate. Returns
    ``(id_col, text_clean, n_lines, n_removed)`` with every input document
    present (a fully-boilerplate document keeps an empty ``text_clean``)
    and surviving lines in their original form and order.

    Scale shape: posexplode -> ONE count-distinct shuffle keyed on the
    8-byte xxhash64 of the normalized line (never the string), then the
    boilerplate set joins back BROADCAST — it is small by construction
    (each member absorbs >= threshold distinct docs, so its cardinality is
    bounded by total_lines / threshold) — then one regroup shuffle on the
    doc id rebuilds texts via array_sort(collect_list(struct(pos, line))).
    No driver collect; the doc-count scalar rides a 1-row broadcast
    crossJoin. A 64-bit hash collision can only over-remove one line form;
    pair with a ``hashed=False``-style audit offline if that matters."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    norm = F.lower(F.regexp_replace(F.trim(F.col("line")), r"\s+", " "))
    lines = lines.withColumn("_h", F.xxhash64(norm))
    total = df.agg(F.count_distinct(id_col).alias("_n_docs"))
    # round to 6dp before ceil: binary float dust would otherwise push an
    # exact product over the next integer (0.05 * 400 = 20.000000000000004
    # -> ceil 21, silently sparing lines at exactly the documented threshold)
    thresh = F.greatest(
        F.lit(int(min_docs)),
        F.ceil(F.round(F.lit(float(max_doc_frac)) * F.col("_n_docs"), 6)))
    boiler = (lines.groupBy("_h")
              .agg(F.count_distinct(id_col).alias("_nd"))
              .crossJoin(F.broadcast(total))
              .where(F.col("_nd") >= thresh)
              .select("_h", F.lit(True).alias("_bp")))
    flagged = lines.join(F.broadcast(boiler), "_h", "left")
    kept_struct = F.when(F.col("_bp").isNull(),
                         F.struct(F.col("pos"), F.col("line")))
    return (flagged.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(F.array_sort(F.collect_list(kept_struct)),
                                 lambda s: s["line"]), "\n")
                 .alias("text_clean"),
                 F.count(F.lit(1)).alias("n_lines"),
                 F.count("_bp").alias("n_removed")))


def boiler_docs(spark, n: int) -> DataFrame:
    """Deterministic boilerplate fixture: doc i carries two unique content
    lines, one semi-shared heading (n/40 docs each — below any sane
    threshold, must SURVIVE), one universal copyright line whose case and
    spacing vary by parity (normalization must unify the variants), and —
    on every third doc — a newsletter plea wrapped in stray whitespace.
    The expected cleaned text is a closed form the oracle restates."""
    i = F.col("id")
    copyright_line = F.when(i % 2 == 0, F.lit("Copyright  ACME Corp")) \
                      .otherwise(F.lit("copyright acme corp"))
    lines = [
        F.concat(F.lit("intro "), i.cast("string"), F.lit(" alpha "),
                 (i * 7 % 997).cast("string")),
        copyright_line,
        F.concat(F.lit("section "), (i % 40).cast("string"),
                 F.lit(" heading")),
        F.concat(F.lit("body "), i.cast("string"), F.lit(" gamma "),
                 (i * 13 % 991).cast("string")),
    ]
    text = F.concat_ws(
        "\n", *lines,
        F.when(i % 3 == 0, F.lit("  Subscribe to our newsletter!  ")))
    return (spark.range(0, n, 1, min(16, max(1, n // 25)))
            .select(i.alias("doc_id"), text.alias("text")))


def drop_near_dups(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", num_perm: int = 64,
                   shingle_n: int = 3, bands: int = 16,
                   threshold: float = 0.5,
                   max_bucket_size: Optional[int] = None) -> DataFrame:
    """End-to-end near-duplicate REMOVAL — the one-call form of the
    standard pipeline: MinHash+LSH candidate pairs → exact-Jaccard verify →
    connected components → keep each cluster's MINIMUM-id representative,
    pass every unclustered document through untouched.

    Returns the surviving rows of ``df`` (all columns). Deterministic: the
    representative choice is the component label itself (min reachable id),
    a pure function of the pair graph — never of partitioning.

    Scale shape: inherits minhash_dedup's single shingle-volume shuffle and
    components' per-iteration edge-sized joins; the final filter is a LEFT
    ANTI join against the loser set — O(clustered docs), which near-dup
    practice makes a small fraction of the corpus. AQE broadcasts it while
    it fits."""
    pairs = minhash_dedup(df, text_col, id_col, num_perm, shingle_n,
                          bands, threshold, max_bucket_size)
    comp = components(pairs.select("a", "b"))
    losers = comp.where(F.col("id") != F.col("comp")) \
        .select(F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")
