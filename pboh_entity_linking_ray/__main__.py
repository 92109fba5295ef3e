"""Job entrypoint: the flagship linkage pipeline as a submittable Ray job.

    ray job submit --working-dir . -- \
        python -m pboh_entity_linking_ray \
            --input  /data/turns_parquet_dir \
            --output /data/clusters_out \
            --checkpoint-root /data/ckpt \
            [--labels /data/labels.parquet] [--match-threshold 0.6]

Reads the turns table (``conv_id, turn_idx, role, text, tool, ts`` —
BASELINE.json input_hint), runs canonicalize → featurize → stats →
block → score → cluster with per-stage Parquet checkpoints + lineage
manifests (resume-after-failure: re-submit the same command and finished
stages are skipped — state/checkpoint.py), writes the clusters table as
partitioned Parquet, and prints one JSON line of run metrics.  With
``--labels`` it also reports micro/macro pairwise P/R/F1 against the
labeled pair table (stages/evaluate.py).

Reference analog: the ``testPBOHOnAllDatasets`` / ClueWeb batch drivers
(src/main/scala/el/EL_LBP_Spark.scala, eval/cweb/
RunLoopyAgainstAllGoogleClweb.scala) — their spark-submit surface,
recast as a Ray job.  Ray is initialised here ONLY when no session
exists (the job runner provides one on a cluster; local runs fall back
to ``address="local"``).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pboh_entity_linking_ray")
    ap.add_argument("--input", required=True,
                    help="turns parquet file or directory")
    ap.add_argument("--format", default="parquet",
                    help="input reader from sources.READERS "
                         "(parquet | tsv | a registered plugin)")
    ap.add_argument("--output", required=True,
                    help="output directory for the clusters parquet")
    ap.add_argument("--checkpoint-root", default=None,
                    help="per-stage Parquet checkpoint + manifest root "
                         "(enables resume-after-failure)")
    ap.add_argument("--labels", default=None,
                    help="optional labeled-pairs parquet for P/R/F1")
    ap.add_argument("--match-threshold", type=float, default=None,
                    help="override the scorer match threshold")
    args = ap.parse_args(argv)

    import ray
    import ray.data

    if not ray.is_initialized():
        # under `ray job submit` the entrypoint process starts
        # UNinitialized and must attach to the running cluster —
        # address=None auto-detects RAY_ADDRESS / a local cluster;
        # forcing address="local" here would silently run head-node-only
        import os

        ray.init(address=os.environ.get("RAY_ADDRESS"),
                 include_dashboard=False, logging_level="ERROR")

    from dataclasses import replace

    from .config import PipelineConfig
    from .pipelines.linkage import run_linkage

    cfg = PipelineConfig()
    if args.match_threshold is not None:
        cfg = replace(cfg, weights=replace(cfg.weights,
                                           match_threshold=args.match_threshold))

    from .sources import read_turns

    turns = read_turns(args.input, args.format)
    res = run_linkage(turns, cfg, checkpoint_root=args.checkpoint_root)
    res.clusters.write_parquet(args.output)

    metrics: dict = {
        "n_convs": int(res.n_convs),
        "pairs_scored": int(res.scored.count()),
        "n_clusters": int(res.clusters.count()),
        "output": args.output,
    }
    if args.labels:
        from .stages.evaluate import pairwise_metrics

        import pyarrow.parquet as pq

        metrics["eval"] = pairwise_metrics(res.scored,
                                           pq.read_table(args.labels))
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
