#!/usr/bin/env python
"""spark-submit entry point: the full record-linkage benchmark run.

Cluster usage (north rule: "spark-submit --py-files on a multi-executor
cluster"):

    cd /root/repo && zip -r /tmp/rleg.zip rlerrorgenerator_spark
    spark-submit --py-files /tmp/rleg.zip \
        jobs/run_linkage_job.py \
        --input /path/to/pages_parquet   # or --n-rows 100000 to synthesize
        --ckpt-dir /path/to/checkpoints  # resumable stages
        --output /path/to/results

Local sandbox:

    python jobs/run_linkage_job.py --n-rows 5000 --ckpt-dir /tmp/ck --output /tmp/out

Every stage writes through the CheckpointManager; re-running with the same
--ckpt-dir resumes from the last completed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir/file with pages schema "
                                    "(url, warc_ts, html, text, lang)")
    ap.add_argument("--documents", help="parquet with documents schema "
                                        "(doc_id, text, lang, source, ...)")
    ap.add_argument("--n-rows", type=int, default=0,
                    help="synthesize this many pages instead of reading input")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--error-rate", type=float, default=None,
                    help="calibrate injected error rate to this id coverage")
    ap.add_argument("--increment-input", default=None,
                    help="parquet of a NEW dirty batch (rid, url, text, "
                         "lang, warc_ts): block+score it against the clean "
                         "table only and fold the accepted edges into "
                         "--prior-clusters (exact equivalent of a full "
                         "relink, O(batch) scoring instead of O(corpus))")
    ap.add_argument("--prior-clusters", default=None,
                    help="parquet (id, cluster_id) written by a previous "
                         "run; omit for a first increment from empty")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        # spark-submit path: respect the submitted session's conf
        spark = SparkSession.builder.appName("rleg-linkage").getOrCreate()
    else:
        # plain `python jobs/run_linkage_job.py`: build the tuned session
        # (AQE, Arrow, UTC, no console progress bars on stderr — the bars
        # otherwise flood any harness that tails this job's output)
        from rlerrorgenerator_spark.session import get_spark

        spark = get_spark("rleg-linkage")
    spark.sparkContext.setLogLevel("WARN")

    from rlerrorgenerator_spark.pipeline import run_linkage
    from rlerrorgenerator_spark.sources.pages import pages_from_documents, synth_pages

    pages = None
    if args.input:
        pages = spark.read.parquet(args.input)
    elif args.documents:
        pages = pages_from_documents(spark.read.parquet(args.documents))
    elif args.n_rows:
        pages = synth_pages(spark, args.n_rows, seed=args.seed)
    else:
        ap.error("one of --input / --documents / --n-rows required")

    if args.increment_input:
        from pyspark.sql import functions as F

        from rlerrorgenerator_spark.linkage.incremental import link_increment
        from rlerrorgenerator_spark.sources.pages import prep_pages

        clean = prep_pages(pages).drop("html").localCheckpoint(eager=True)
        new_dirty = spark.read.parquet(args.increment_input)
        if args.prior_clusters:
            prior = spark.read.parquet(args.prior_clusters)
        else:
            prior = spark.createDataFrame([], "id string, cluster_id string")
        t0 = time.time()
        updated = link_increment(clean, new_dirty, prior)
        n_ids = updated.count()
        n_clusters = updated.select("cluster_id").distinct().count()
        print(json.dumps({
            "mode": "increment",
            "batch_rows": new_dirty.count(),
            "ids": n_ids,
            "clusters": n_clusters,
            "elapsed_sec": time.time() - t0,
        }))
        if args.output:
            updated.write.mode("overwrite").parquet(
                os.path.join(args.output, "clusters"))
        return

    amount_mult = 1.0
    if args.error_rate is not None:
        # Calibrate the program's amount multiplier so the realized
        # distinct-errored-id fraction reaches the target (reference
        # `generate_error`, benchmarking/utils.R:712-768), then run the
        # full pipeline with that multiplier (NOT a pre-scaled config —
        # scaling a fractional amount past 1.0 in the config would flip it
        # into the absolute-count branch of the driver).
        from rlerrorgenerator_spark.operators import calibrate_error_rate
        from rlerrorgenerator_spark.pipeline import default_error_config
        from rlerrorgenerator_spark.sources.pages import prep_pages

        clean = prep_pages(pages).localCheckpoint(eager=True)
        _, _, amount_mult = calibrate_error_rate(
            clean, default_error_config(), args.error_rate, seed=args.seed
        )
        pages = clean.drop("file", "rid", "orig_url")

    t0 = time.time()
    res = run_linkage(spark, pages=pages, seed=args.seed, ckpt_dir=args.ckpt_dir,
                      amount_mult=amount_mult)
    m = res.metrics.collect()[0]
    n_cand = res.candidates.count()
    elapsed = time.time() - t0
    summary = {
        "f1": m.f1, "precision": m.precision, "recall": m.recall,
        "tp": m.tp, "fp": m.fp, "fn": m.fn,
        "candidate_pairs": n_cand,
        "pairs_per_sec": n_cand / elapsed,
        "elapsed_sec": elapsed,
    }
    print(json.dumps(summary))
    if args.output:
        res.metrics.write.mode("overwrite").parquet(os.path.join(args.output, "metrics"))
        res.clusters.write.mode("overwrite").parquet(os.path.join(args.output, "clusters"))
        res.lineage.write.mode("overwrite").parquet(os.path.join(args.output, "lineage"))
        res.extras["partition_metrics"].write.mode("overwrite").parquet(
            os.path.join(args.output, "partition_metrics")
        )


if __name__ == "__main__":
    main()
