"""Job entrypoint: the flagship linkage pipeline as a submittable Ray job.

    ray job submit --working-dir . -- \
        python -m pboh_entity_linking_ray \
            --input  /data/turns_parquet_dir \
            --output /data/clusters_out \
            --checkpoint-root /data/ckpt \
            [--labels /data/labels.parquet] [--match-threshold 0.6]

Two modes.  ``--query NAME --input SF_DIR [--output DIR]`` runs any
registered operator query (``--list-queries`` enumerates them) over a
testdata-shaped table directory and writes Parquet or prints a bounded
head.  Without ``--query`` it runs the flagship linkage job:

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


def _json_default(o):
    """numpy scalars must serialize as JSON numbers/booleans, not
    strings like "True"/"8123" (tests/test_job_entry.py)."""
    import numpy as _np

    if isinstance(o, _np.generic):
        return o.item()
    return str(o)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pboh_entity_linking_ray")
    ap.add_argument("--query", default=None,
                    help="run one registered operator query (registry.py) "
                         "over the table directory given by --input instead "
                         "of the flagship pipeline")
    ap.add_argument("--list-queries", action="store_true",
                    help="print every registered query name and exit")
    ap.add_argument("--input", default=None,
                    help="turns parquet file or directory (flagship), or "
                         "the table directory for --query")
    ap.add_argument("--format", default="parquet",
                    help="input reader from sources.READERS "
                         "(parquet | tsv | a registered plugin)")
    ap.add_argument("--output", default=None,
                    help="output directory for the result parquet "
                         "(required for the flagship run; for --query the "
                         "result prints as JSON rows when omitted)")
    ap.add_argument("--checkpoint-root", default=None,
                    help="per-stage Parquet checkpoint + manifest root "
                         "(enables resume-after-failure)")
    ap.add_argument("--labels", default=None,
                    help="optional labeled-pairs parquet for P/R/F1")
    ap.add_argument("--match-threshold", type=float, default=None,
                    help="override the scorer match threshold")
    ap.add_argument("--scorer", default=None,
                    help="pair scorer from stages.scoring.SCORERS: "
                         "full (max-product closed form, default) | "
                         "lbp (sum-product loopy BP) | stringsim — the "
                         "reference CLI's max-product|sum-product "
                         "argument (el/EL_LBP_Spark.scala:102-127)")
    ap.add_argument("--link-one", default=None, metavar="TRANSCRIPT",
                    help="parquet file holding ONE conversation's turns: "
                         "link it against the flagship base run built from "
                         "--input (pass the base run's --checkpoint-root to "
                         "load finished stages instead of recomputing) and "
                         "print its cluster assignment as JSON — the "
                         "console EntityLinkingAPI analog "
                         "(pipelines/console.py:link_one)")
    args = ap.parse_args(argv)

    if args.list_queries:
        from .registry import all_queries

        for name, (_fn, sql) in sorted(all_queries().items()):
            print(f"{name}\t{'oracle' if sql else 'rows-only'}")
        return 0
    if args.input is None:
        ap.error("--input is required")
    if args.query is None and args.link_one is None and args.output is None:
        ap.error("--output is required for the flagship run")

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

    if args.query is not None:
        from .registry import all_queries

        reg = all_queries()
        if args.query not in reg:
            ap.error(f"unknown query {args.query!r} "
                     f"(see --list-queries; {len(reg)} registered)")
        out = reg[args.query][0](args.input)
        if args.output is not None:
            if not isinstance(out, ray.data.Dataset):
                from .oracle import to_pandas

                out = ray.data.from_pandas(to_pandas(out))
            # materialize once: a lazy Dataset would re-execute the whole
            # query pipeline for the count() after write_parquet()
            out = out.materialize()
            out.write_parquet(args.output)
            print(json.dumps({"query": args.query, "rows": int(out.count()),
                              "output": args.output}))
        else:
            # no sink given: print a bounded head only — a query result can
            # be arbitrarily large and stdout is not a 100 TB sink
            if isinstance(out, ray.data.Dataset):
                out = out.materialize()  # one execution for count + head
                n = int(out.count())
                head = out.limit(50).to_pandas()
            else:
                from .oracle import to_pandas

                df = to_pandas(out)
                n, head = int(len(df)), df.head(50)
            print(head.to_json(orient="records", lines=True))
            print(json.dumps({"query": args.query, "rows": n,
                              "printed": int(len(head))}), file=sys.stderr)
        return 0

    from dataclasses import replace

    from .config import PipelineConfig
    from .pipelines.linkage import run_linkage

    cfg = PipelineConfig()
    if args.match_threshold is not None:
        cfg = replace(cfg, weights=replace(cfg.weights,
                                           match_threshold=args.match_threshold))
    if args.scorer is not None:
        from .stages.scoring import SCORERS

        if args.scorer not in SCORERS:
            print(json.dumps({"error": f"unknown scorer {args.scorer!r}",
                              "available": sorted(SCORERS)}),
                  file=sys.stderr)
            return 2
        cfg = replace(cfg, scorer=args.scorer)

    from .sources import read_turns

    turns = read_turns(args.input, args.format)
    res = run_linkage(turns, cfg, checkpoint_root=args.checkpoint_root)

    if args.link_one is not None:
        import pyarrow.parquet as pq

        from .pipelines.console import link_one

        out = link_one(pq.read_table(args.link_one), res, cfg)
        pairs = out.pop("pairs")
        out["top_pairs"] = pairs.sort_values(
            "score", ascending=False).head(10)[
            ["conv_a", "conv_b", "score", "is_match"]].to_dict("records")
        print(json.dumps(out, default=_json_default))
        return 0

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
