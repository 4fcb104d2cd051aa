#!/usr/bin/env python
"""Per-stage timing of the scaling workload at a given core count.

Usage: python tools/profile_scaling.py CORES N_ROWS [PAGES_PARQUET]
PAGES_PARQUET switches the input from in-measure synthesis to the
bench's pre-materialized parquet scan (input_mode=parquet_scan).
Prints PROFILE:{json} with per-stage seconds.
"""
import json
import os
import sys
import time

cores = int(sys.argv[1])
n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
pages_path = sys.argv[3] if len(sys.argv) > 3 else None
sp = int(sys.argv[4]) if len(sys.argv) > 4 else None
os.environ["SPARK_GRAFT_CPUS"] = str(cores)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlerrorgenerator_spark.session import get_spark

spark = get_spark(app_name=f"profile-{cores}", cores=cores,
                  shuffle_partitions=sp)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from rlerrorgenerator_spark.checkpoint import CheckpointManager
from rlerrorgenerator_spark.linkage.blocking import build_candidates
from rlerrorgenerator_spark.linkage.features import score_pairs
from rlerrorgenerator_spark.linkage.metrics import label_pairs, pairwise_metrics
from rlerrorgenerator_spark.linkage.resolve import clusters_from_links
from rlerrorgenerator_spark.operators import mess_data
from rlerrorgenerator_spark.pipeline import default_error_config
from rlerrorgenerator_spark.sources.pages import prep_pages, synth_pages

# identical warmup to bench.py's timed protocol: JVM/codegen/Arrow/Python
# worker spin-up is a fixed per-cluster cost, not steady-state throughput —
# without this it lands in the first stage and skews the 4c:1c attribution
from bench import _warmup, _warmup_linkage

_warmup(spark)
_warmup_linkage(spark)

t = {}
t0 = time.time()


def mark(name):
    global t0
    now = time.time()
    t[name] = round(now - t0, 3)
    # live stage boundary for external samplers (CPU-utilization probes)
    print(f"MARK:{name}:{now:.3f}", file=sys.stderr, flush=True)
    t0 = now


ckpt = CheckpointManager(spark, None)
if pages_path:
    pages = spark.read.parquet(pages_path)
    clean = ckpt.stage(prep_pages(pages).drop("html"), "clean")
    mark("scan+prep")
else:
    pages = synth_pages(spark, n_rows, seed=42, body_tokens=(200, 600))
    clean = ckpt.stage(prep_pages(pages), "clean")
    mark("synth+prep")
cfg = default_error_config()
dirty, lineage = mess_data(clean, cfg, seed=42, ckpt=ckpt, exact=False,
                           checkpoint_every=4)
mark("inject")
candidates = ckpt.stage(build_candidates(clean, dirty), "candidates")
n_cand = candidates.count()
mark("block")
scored = ckpt.stage(score_pairs(candidates, clean, dirty), "scored")
mark("score")
labeled = ckpt.stage(label_pairs(scored, dirty), "labeled")
m = pairwise_metrics(labeled).collect()[0]
mark("metrics")
all_ids = clean.select(F.col("url").alias("id")).unionByName(
    dirty.select(F.col("rid").alias("id"))
)
accepted = scored.where(F.col("prediction")).select("rid_a", "rid_b", "match_prob")
clusters_from_links(accepted, all_ids).count()
mark("clusters")
total = sum(t.values())
print("PROFILE:" + json.dumps({
    "cores": cores, "n_rows": n_rows, "stages": t,
    "total": round(total, 3), "n_candidates": n_cand,
    "pairs_per_sec": round(n_cand / total, 1), "f1": m.f1,
}))
