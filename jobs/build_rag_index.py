"""spark-submit entry point: documents -> chunked, embedded, partitioned
ANN index -> (optional) query.

The retrieval-side composition of the engine's gated operators — every
stage is library code, this file only wires them:

    1. CHUNK   textops.chunk_windows — overlapping token windows (RAG chunks)
    2. EMBED   similarity.hash_embed — deterministic feature-hashing
               embeddings (no model; a query string embeds identically at
               search time, so index and query can never skew)
    3. INDEX   similarity.build_ivf_index — k-means lists, assignments
               written PARTITIONED BY list_id (probing == partition
               pruning), plus a chunks sidecar for hit hydration
    4. QUERY   (--query "...") embed the string, probe n lists, exact
               cosine on the scanned rows, hydrate chunk text

Usage (local example):

    python jobs/package.py                           # builds dist/cefspark.zip
    spark-submit --master local[32] \
        --py-files dist/cefspark.zip \
        jobs/build_rag_index.py \
        --input /data/documents --out /data/rag_index \
        --chunk-size 64 --chunk-stride 48 --dim 128 --n-lists 16 \
        --query "shuffle partition skew"

Prints ONE JSON line of metrics (+ hits when --query given).

Scale notes: chunking is a narrow explode (no shuffle); embedding is one
(chunk, bucket) shuffle + a per-chunk regroup, all codegen; the index
build adds the centroid refinement scans and ONE partitioned write; a
query scans only the probed list partitions (plan-pinned partition
pruning in test_training_ops).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: chunk_id = doc_id * CHUNK_KEY_SPAN + chunk_idx — reversible, collision-
#: free while documents stay under CHUNK_KEY_SPAN chunks (a 100k-token doc
#: at stride 48 has ~2k).
CHUNK_KEY_SPAN = 100_000


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="documents parquet path (doc_id, text)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="fallback: read <sf-dir>/documents.parquet")
    p.add_argument("--out", required=True, help="index output dir")
    p.add_argument("--chunk-size", type=int, default=64)
    p.add_argument("--chunk-stride", type=int, default=48)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--n-lists", type=int, default=16)
    p.add_argument("--n-probe", type=int, default=3)
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--query", help="optional query string to run post-build")
    p.add_argument("--cpus", type=int, default=0)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from cefspark import similarity, textops
    from cefspark.session import get_spark

    cores = args.cpus or (os.cpu_count() or 8)
    spark = get_spark(app_name="cefspark-rag-index", cores=cores,
                      shuffle_partitions=cores)
    src = args.input or os.path.join(args.sf_dir, "documents.parquet")
    docs = spark.read.parquet(src)
    t0 = time.time()
    n_docs = docs.count()

    chunks = textops.chunk_windows(docs, args.chunk_size, args.chunk_stride) \
        .withColumn("chunk_id",
                    F.col("doc_id") * CHUNK_KEY_SPAN + F.col("chunk_idx"))
    chunks_path = os.path.join(args.out, "chunks")
    chunks.write.mode("overwrite").parquet(chunks_path)
    chunks = spark.read.parquet(chunks_path)  # one materialization feeds both
    n_chunks = chunks.count()

    emb = similarity.hash_embed(chunks, dim=args.dim, text_col="chunk_text",
                                id_col="chunk_id") \
        .withColumnRenamed("chunk_id", "vec_id")
    similarity.build_ivf_index(emb, args.out, n_lists=args.n_lists)

    metrics = {
        "n_docs": n_docs,
        "n_chunks": n_chunks,
        "n_lists": args.n_lists,
        "dim": args.dim,
        "out": args.out,
    }
    if args.query:
        qdf = spark.createDataFrame([(0, args.query)], "doc_id long, text string")
        qv = similarity.hash_embed(qdf, dim=args.dim).first()["embedding"]
        hits = similarity.ivf_index_topk(
            spark, args.out, qv, k=args.top_k, n_probe=args.n_probe)
        hydrated = (hits.withColumnRenamed("vec_id", "chunk_id")
                    .join(chunks.select("chunk_id", "doc_id", "chunk_idx",
                                        "chunk_text"), "chunk_id")
                    .orderBy(F.desc("cos")))
        metrics["hits"] = [
            {"doc_id": r["doc_id"], "chunk_idx": r["chunk_idx"],
             "cos": r["cos"], "text": r["chunk_text"][:80]}
            for r in hydrated.collect()]
    metrics["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
