"""spark-submit entry point: logs/documents -> clean training corpus.

The engine's product story as ONE batch job — every stage is a gated library
operator; this file is the composition surface, not new logic:

    1. REDACT    PII masking (email/card/IPv4/phone; JVM regexp chain)
    1b. BOILER   opt-in corpus-wide boilerplate-line removal
                 (--boilerplate-frac > 0; lines recurring across that doc
                 fraction vanish — run it on line-structured corpora, skip
                 it for single-line records where it can only empty docs)
    2. FILTER    quality floor (composite score + token-count band)
    3. DEDUP     exact duplicate collapse (min-id representative)
    4. DECONTAM  drop docs sharing n-gram shingles with a benchmark corpus
    4b. PPL      opt-in (--ppl-threshold > 0) CCNet-style LM filter: train
                 a bigram LM on a trusted corpus (--ppl-trusted, default:
                 the cleaned corpus itself — a self-outlier filter) and
                 drop docs whose add-k perplexity exceeds the threshold
    5. SPLIT     deterministic train/val/test (engine-exact integer hash)
    6. WRITE     per-split parquet + a JSON line of per-stage survivor counts
    7. PACK      opt-in (--pack-capacity > 0): greedy-pack the training
                 split into context windows (hash-sharded, key-order
                 deterministic); writes <out>/packs

Usage (local example):

    python jobs/package.py                           # builds dist/cefspark.zip
    spark-submit --master local[32] \
        --py-files dist/cefspark.zip \
        jobs/prepare_training_data.py \
        --input /data/documents --benchmark /data/eval_suite \
        --out /data/training_corpus --ngram 8

Scale notes (100-TB shape): stages 1-2 are narrow projections fused into one
scan; stage 3 is the one doc-level shuffle (hash-agg on text, map-side
partial); stage 4 broadcasts the benchmark shingles (an eval suite is small
by construction) so the corpus never shuffles its shingle volume; stage 5 is
a pushable integer-hash predicate (no shuffle, AQE-stable, reproducible
across engines); the split writes partition by split so a trainer's scan
prunes to its split. Per-stage counts ride one .count() per materialized
relation — no collect of data rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="documents parquet path (doc_id, text)")
    p.add_argument("--benchmark",
                   help="benchmark/eval parquet path (doc_id, text); default: "
                        "a held-out slice of the input (doc_id %% 97 == 0)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="fallback: read <sf-dir>/documents.parquet")
    p.add_argument("--out", help="output base path (default: temp dir)")
    p.add_argument("--ngram", type=int, default=8,
                   help="decontamination shingle width (tokens)")
    p.add_argument("--boilerplate-frac", type=float, default=0.0,
                   help="remove lines recurring in > this fraction of docs "
                        "(0 = stage disabled, the default)")
    p.add_argument("--min-quality", type=float, default=0.05)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--ppl-threshold", type=float, default=0.0,
                   help="4b. opt-in: drop docs whose bigram-LM add-k "
                        "perplexity exceeds this (0 = stage disabled)")
    p.add_argument("--ppl-trusted",
                   help="trusted-corpus parquet the LM trains on (doc_id, "
                        "text); default: the cleaned corpus itself")
    p.add_argument("--ppl-k", type=float, default=1.0,
                   help="add-k smoothing constant for the LM filter")
    p.add_argument("--splits", default="train:0.98,val:0.01,test:0.01")
    p.add_argument("--pack-capacity", type=int, default=0,
                   help="7. opt-in: greedy-pack the FIRST split's documents "
                        "into context windows of this many tokens "
                        "(0 = stage disabled); writes <out>/packs")
    p.add_argument("--pack-shards", type=int, default=64,
                   help="hash shards for packing (determinism unit; each "
                        "shard packs independently in doc-key order)")
    p.add_argument("--cpus", type=int, default=0)
    args = p.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from cefspark import dedup, redact, sampling, textops
    from cefspark.session import get_spark

    cores = args.cpus or (os.cpu_count() or 8)
    spark = get_spark(app_name="cefspark-prepare-training-data", cores=cores,
                      shuffle_partitions=cores)
    src = args.input or os.path.join(args.sf_dir, "documents.parquet")
    out = args.out or tempfile.mkdtemp(prefix="cefspark_training_")
    docs = spark.read.parquet(src)
    t0 = time.time()
    n_input = docs.count()

    # 1+2. redact then quality-filter in ONE fused narrow pass (the quality
    # metrics are computed over the REDACTED text — the text that ships).
    # The survivor count rides an Observation on the SAME pass that
    # materializes the dedup output — no second run of the regexp chain.
    from pyspark.sql import Observation

    red = redact.pii_redact(docs, keep_counts=False).select(
        "doc_id", F.col("text_redacted").alias("text"))

    # 1b. opt-in boilerplate-line removal (after redaction so recurring
    # masked lines — '<EMAIL> unsubscribe footer' — unify; before quality
    # so the score reflects the text that ships). The removed-line total
    # rides an Observation on the same pass that materializes dedup.
    obs_boiler = Observation("boiler") if args.boilerplate_frac > 0 else None
    if args.boilerplate_frac > 0:
        bp = dedup.remove_boilerplate(red, text_col="text",
                                      max_doc_frac=args.boilerplate_frac)
        red = (bp.observe(obs_boiler,
                          F.sum("n_removed").alias("n_lines_removed"))
               .select("doc_id", F.col("text_clean").alias("text")))
    t = F.col("text")
    scored = red.select(
        "doc_id", "text",
        F.length(t).cast("long").alias("n_chars"),
        textops.token_count(t),
        textops.punct_count(t),
        textops.stopword_hits(t),
    ).withColumn("quality_score", textops.composite_quality_score())
    obs_kept = Observation("kept")
    kept = scored.where(
        (F.col("quality_score") >= args.min_quality)
        & F.col("n_tokens").between(args.min_tokens, args.max_tokens)
    ).observe(obs_kept, F.count(F.lit(1)).alias("n"))

    # 3. exact dedup: min-id representative per distinct text, as a WINDOW
    # over text (one shuffle, single-path plan) rather than agg + self-join:
    # leaner, and the kept subtree appears exactly ONCE so the Observation
    # count is unambiguous by construction
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy("text").orderBy("doc_id"))
    deduped = (kept.withColumn("_rn", rn).where(F.col("_rn") == 1)
               .drop("_rn"))
    dedup_path = os.path.join(out, "_deduped")
    deduped.write.mode("overwrite").parquet(dedup_path)
    n_after_quality = obs_kept.get["n"]
    deduped = spark.read.parquet(dedup_path)  # cut lineage; stages 4-6 rescan
    n_deduped = deduped.count()

    # 4. decontaminate against the benchmark corpus. The benchmark text is
    # run through the SAME redaction as the training side: shingles only
    # match when both sides saw the same transform (an unredacted benchmark
    # would let a held-out doc whose shingles cross a PII span slip through)
    if args.benchmark:
        bench_raw = spark.read.parquet(args.benchmark)
    else:
        bench_raw = docs.where(F.col("doc_id") % 97 == 0)
    bench = redact.pii_redact(bench_raw, keep_counts=False).select(
        "doc_id", F.col("text_redacted").alias("text"))
    contaminated = dedup.decontaminate(deduped, bench, n=args.ngram)
    clean = deduped.join(contaminated.select("doc_id"), "doc_id", "left_anti")

    # 4b. opt-in LM perplexity filter (cefspark.lm — the CCNet signal).
    # The LM trains on the trusted corpus (default: the cleaned corpus
    # itself, making this a self-outlier filter); scoring joins the
    # LM relations back — broadcast when the LM is small, which a
    # trusted-slice LM is by construction. Docs too short to have a
    # bigram (possible when --min-tokens < 2) carry no score and are KEPT.
    n_clean = n_ppl_dropped = None
    if args.ppl_threshold > 0:
        from cefspark import lm

        n_clean = clean.count()
        trusted = (spark.read.parquet(args.ppl_trusted).select("doc_id", "text")
                   if args.ppl_trusted else clean.select("doc_id", "text"))
        pairs, ctx = lm.train_bigram_lm(trusted)
        vocab_size = (trusted
                      .select(F.explode(F.split(F.trim(F.col("text")),
                                                r"\s+")).alias("tok"))
                      .agg(F.count_distinct("tok")).first()[0]) or 1
        scores = lm.with_perplexity(clean.select("doc_id", "text"), pairs,
                                    ctx, vocab_size=vocab_size, k=args.ppl_k,
                                    broadcast_lm=bool(args.ppl_trusted))
        clean = (clean.join(scores.select("doc_id", "perplexity"),
                            "doc_id", "left")
                 .where(F.col("perplexity").isNull()
                        | (F.col("perplexity") <= args.ppl_threshold))
                 .drop("perplexity"))

    # 5. deterministic split + 6. partitioned write
    names, weights = [], []
    for part in args.splits.split(","):
        name, frac = part.split(":")
        names.append(name.strip())
        weights.append(float(frac))
    split = sampling.assign_split(clean, weights, names, id_col="doc_id")
    split.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(out, "corpus"))

    final = spark.read.parquet(os.path.join(out, "corpus"))
    split_counts = {r["split"]: r["n"] for r in
                    final.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
                    .collect()}
    # 7. opt-in sequence packing of the training split: token counts ->
    # hash shards -> greedy first-fit in key order (cefspark.packing).
    # The pack assignment is a pure function of doc keys, so a resumed or
    # re-sharded run re-derives the identical packs.
    n_packs = None
    if args.pack_capacity > 0:
        from cefspark import packing

        train = final.where(F.col("split") == names[0])
        toks = packing.with_shard(
            train.select("doc_id", textops.token_count(F.col("text"))),
            args.pack_shards)
        packed = packing.pack_greedy(toks, args.pack_capacity,
                                     shards=args.pack_shards)
        packed.write.mode("overwrite").parquet(os.path.join(out, "packs"))
        n_packs = (spark.read.parquet(os.path.join(out, "packs"))
                   .select("shard", "pack_id").distinct().count())

    # n_final = n_deduped - n_contaminated by construction (one row per
    # contaminated doc), so the drop count derives without re-running the
    # decontamination join
    # with the ppl stage on, the decontam drop is measured against its own
    # count; otherwise it derives from the split totals as before
    if n_clean is not None:
        n_contaminated = n_deduped - n_clean
        n_ppl_dropped = n_clean - sum(split_counts.values())
    else:
        n_contaminated = n_deduped - sum(split_counts.values())
    print(json.dumps({
        "n_input": n_input,
        **({"n_boilerplate_lines_removed": int(obs_boiler.get["n_lines_removed"] or 0)}
           if obs_boiler is not None else {}),
        "n_after_quality": n_after_quality,
        "n_after_dedup": n_deduped,
        "n_contaminated_dropped": n_contaminated,
        **({"n_ppl_dropped": n_ppl_dropped}
           if n_ppl_dropped is not None else {}),
        "n_final": sum(split_counts.values()),
        "splits": split_counts,
        **({"n_packs": n_packs} if n_packs is not None else {}),
        "out": os.path.join(out, "corpus"),
        "wall_sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
