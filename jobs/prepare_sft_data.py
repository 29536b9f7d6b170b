"""spark-submit entry point: multi-turn transcripts -> SFT corpus.

The conversation-shaped sibling of prepare_training_data.py (which is
document-shaped): every stage is a gated library operator, this file is
only the composition surface:

    1. REDACT   per-turn PII masking (JVM regexp chain)
    2. CROP     opt-in context-window truncation (--context-budget > 0):
                keep each conversation's trailing turns under the token
                budget, final turn always kept
    3. RENDER   one document per conversation ("role: text" lines)
    4. DEDUP    conversation-level duplicate collapse — exact on the
                rendered dialog by default; --near-dup-threshold > 0
                switches to MinHash+LSH near-dup removal
    5. SFT      (context, response) pair per assistant turn of every
                surviving conversation
    6. SPLIT    deterministic train/val/test BY CONVERSATION (pairs of
                one conversation never straddle splits — that would leak
                val context into train)
    7. WRITE    per-split parquet (partitioned by split) + one JSON line
                of per-stage survivor counts

Usage (local example):

    python jobs/package.py                           # builds dist/cefspark.zip
    spark-submit --master local[32] \
        --py-files dist/cefspark.zip \
        jobs/prepare_sft_data.py \
        --input /data/transcripts --out /data/sft_corpus \
        --context-budget 4096

Scale notes (100-TB shape): stage 1 is a narrow projection in the scan;
stages 2, 3 and 5 all hang off the SAME hash exchange on conv_id (window
cumsum, group-agg, window collect_list — one shuffle of the turn volume,
reused); stage 4's dedup runs over the RENDERED conversations (one row
per conversation — orders of magnitude smaller than turns), and its
survivors rejoin the turns via a conv_id semi-join that lands on the
already-partitioned key; stage 6 is a pushable integer-hash predicate on
conv_id. No stage collects data rows to the driver.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcript parquet path "
                                   "(conv_id, turn_idx, role, text, ...)")
    p.add_argument("--synthesize", type=int, default=0,
                   help="generate N synthetic transcript turns instead")
    p.add_argument("--out", help="output base path (default: temp dir)")
    p.add_argument("--context-budget", type=int, default=0,
                   help="2. opt-in: crop each conversation to its trailing "
                        "turns under this whitespace-token budget "
                        "(0 = stage disabled)")
    p.add_argument("--near-dup-threshold", type=float, default=0.0,
                   help="4. 0 = exact dedup on the rendered dialog; > 0 = "
                        "MinHash+LSH near-dup removal at this Jaccard "
                        "threshold")
    p.add_argument("--assistant-role", default="assistant")
    p.add_argument("--splits", default="train:0.98,val:0.01,test:0.01")
    p.add_argument("--cpus", type=int, default=0)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from cefspark import dedup, fixtures, redact, sampling, transcripts
    from cefspark.session import get_spark

    cores = args.cpus or (os.cpu_count() or 8)
    spark = get_spark(app_name="cefspark-prepare-sft-data", cores=cores,
                      shuffle_partitions=cores)
    if args.synthesize:
        turns = fixtures.transcripts_df(spark, args.synthesize)
    elif args.input:
        turns = spark.read.parquet(args.input)
    else:
        raise SystemExit("need --input or --synthesize")
    out = args.out or tempfile.mkdtemp(prefix="cefspark_sft_")
    t0 = time.time()
    n_turns_in = turns.count()

    # 1. redact per-turn (narrow, fused into the scan)
    red = turns.withColumn("text", redact.redact_text(F.col("text")))

    # 2. opt-in context crop (window cumsum on the conv exchange)
    if args.context_budget > 0:
        red = transcripts.truncate_context(red, args.context_budget)
    n_turns_kept = red.count()

    # 3. render one doc per conversation (same conv exchange)
    rendered = transcripts.render_conversations(red)
    n_convs = rendered.count()

    # 4. conversation-level dedup over the rendered docs
    if args.near_dup_threshold > 0:
        survivors = dedup.drop_near_dups(
            rendered, text_col="dialog", id_col="conv_id",
            threshold=args.near_dup_threshold)
    else:
        survivors = dedup.exact_dedup(rendered, ["dialog"],
                                      id_col="conv_id")
    n_convs_kept = survivors.count()

    # 5. SFT pairs from the surviving conversations' turns (semi-join on
    # the conv key the turn relation is already exchanged on)
    kept_turns = red.join(survivors.select("conv_id"), "conv_id",
                          "left_semi")
    pairs = transcripts.sft_pairs(kept_turns,
                                  assistant_role=args.assistant_role)
    n_pairs = pairs.count()

    # 6. deterministic split BY CONVERSATION
    names, weights = [], []
    for part in args.splits.split(","):
        name, w = part.split(":")
        names.append(name)
        weights.append(float(w))
    split_pairs = sampling.assign_split(pairs, weights, names,
                                        id_col="conv_id",
                                        hash_string_ids=True)

    # 7. write + accounting (per-split counts aggregate O(splits) rows)
    split_pairs.write.mode("overwrite").partitionBy("split").parquet(out)
    split_counts = {r["split"]: r["n"] for r in
                    split_pairs.groupBy("split")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
    print(json.dumps({
        "out": out,
        "n_turns_input": n_turns_in,
        "n_turns_after_crop": n_turns_kept,
        "n_conversations": n_convs,
        "n_conversations_after_dedup": n_convs_kept,
        "n_pairs": n_pairs,
        "splits": split_counts,
        "elapsed_s": round(time.time() - t0, 2),
    }))


if __name__ == "__main__":
    main()
