"""spark-submit entry point for corpus statistics over a documents table —
the training-data-curation sweep packaged as one batch job.

Usage (local example):

    python jobs/package.py                           # builds dist/cefspark.zip
    spark-submit --master local[32] \
        --py-files dist/cefspark.zip \
        jobs/corpus_stats.py \
        --input /data/documents --out /data/corpus_stats --topk 3

Reads a documents parquet table (doc_id, text, ...), computes per-document
language (Arrow-batched trigram classifier), quality score, token count and
fingerprints, per-document top-k TF-IDF terms, exact-duplicate groups, and
corpus-level rollups (vocabulary size exact + HLL estimate, doc counts per
language) — writes each relation under --out/<name> and prints ONE JSON
line of top-line metrics.

Every stage is the library operator the gates already verify; this job is
the composition surface, not new logic. Per-document stats are narrow
projections sharing one scan; the corpus rollups each pay their own
documented shuffle (see the operators' docstrings for the 100-TB notes).
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
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="fallback: read <sf-dir>/documents.parquet")
    p.add_argument("--out", help="output base path (default: temp dir)")
    p.add_argument("--topk", type=int, default=3, help="TF-IDF terms per doc")
    p.add_argument("--cpus", type=int, default=0)
    args = p.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from cefspark import dedup, langid, textops
    from cefspark.session import get_spark

    cores = args.cpus or (os.cpu_count() or 8)
    spark = get_spark(app_name="cefspark-corpus-stats", cores=cores,
                      shuffle_partitions=cores)
    src = args.input or os.path.join(args.sf_dir, "documents.parquet")
    out = args.out or tempfile.mkdtemp(prefix="cefspark_corpus_")
    docs = spark.read.parquet(src)
    t0 = time.time()

    # per-document columns: ONE narrow select over one scan — quality
    # metrics, both fingerprints, and the Arrow lang-id column composed
    # together (no joins, no shuffle; a 3-way self-join here would scan the
    # table three times and pay two doc_id exchanges for row-wise columns)
    t = F.col("text")
    norm = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    per_doc = docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        textops.token_count(t),
        textops.punct_count(t),
        textops.stopword_hits(t),
        F.md5(t).alias("fp_md5"),
        F.md5(norm).alias("fp_norm_md5"),
        langid.lang_pred_column(t).alias("lang_pred"),
    ).withColumn("quality_score", textops.composite_quality_score())
    per_doc.write.mode("overwrite").parquet(os.path.join(out, "per_doc"))

    tfidf = textops.tfidf_topk(docs, k=args.topk)
    tfidf.write.mode("overwrite").parquet(os.path.join(out, "tfidf_topk"))

    # one representative per exact-duplicate text group; n_dups > 1 = dup group
    reps = dedup.exact_dedup(docs, ["text"])
    dups = reps.where(F.col("n_dups") > 1)
    dups.write.mode("overwrite").parquet(os.path.join(out, "exact_dups"))

    lang_counts = (spark.read.parquet(os.path.join(out, "per_doc"))
                   .groupBy("lang_pred").count())
    lang_counts.write.mode("overwrite").parquet(os.path.join(out, "lang_counts"))

    n_docs = docs.count()
    # count the just-written relation instead of re-running the groupBy
    # shuffle over the raw table (same read-back pattern as lang_counts)
    n_dup_groups = spark.read.parquet(os.path.join(out, "exact_dups")).count()
    # blank documents tokenize to [''] under a bare split — drop the phantom
    # empty token (token_count guards this case the same way); both vocab
    # numbers come from ONE tokenize+aggregate pass
    toks = docs.select(F.explode(
        F.split(F.trim(t), r"\s+")).alias("tok")).where(F.col("tok") != "")
    vrow = toks.agg(
        F.count_distinct("tok").alias("exact"),
        F.approx_count_distinct("tok", 0.02).alias("hll")).collect()[0]
    vocab_exact, vocab_hll = vrow["exact"], vrow["hll"]

    print(json.dumps({
        "n_docs": n_docs,
        "n_exact_dup_groups": n_dup_groups,
        "vocab_exact": vocab_exact,
        "vocab_hll": vocab_hll,
        "langs": {r["lang_pred"]: r["count"] for r in lang_counts.collect()},
        "out": out,
        "wall_sec": round(time.time() - t0, 2),
    }))


if __name__ == "__main__":
    main()
