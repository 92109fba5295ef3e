"""Evaluation: predicted pair decisions vs gold labels → P/R/F1.

Analog of the reference's verifier + global stats
(reference: src/main/scala/eval/Verifier.scala:24-43 computes
correct/wrong/notFound via set intersections;
eval/GlobalStats.scala:150-248 micro/macro P/R/F1 with per-doc-size
buckets at :116-134).  Here the gold side is the ``labels`` pair table
(FIXTURES.md §2); it is the small side, so it is broadcast via ``ray.put``
and the scored-pair stream is filtered/judged inside ``map_batches`` —
a broadcast semi-join, no shuffle.  A labeled pair the engine never scored
(not co-blocked) counts as predicted-negative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# reference doc-size bucket scheme (GlobalStats.scala:116-134)
SIZE_BUCKETS = [(1, 1), (2, 2), (3, 10), (10, 20), (20, 40), (40, 100),
                (100, 200), (200, 400), (400, 1000)]


def pairwise_metrics(
    scored: ray.data.Dataset, labels: pa.Table
) -> dict[str, float]:
    """Micro pairwise P/R/F1 on labeled pairs (metric domain: labeled pairs
    sharing a blocking key — BASELINE.md)."""
    from ray.data.aggregate import Sum

    lbl = {
        a + "\x1f" + b: m
        for a, b, m in zip(
            labels["conv_a"].to_pylist(),
            labels["conv_b"].to_pylist(),
            labels["is_match"].to_pylist(),
        )
    }
    total_pos = sum(1 for v in lbl.values() if v)
    lbl_ref = ray.put(lbl)

    class Judge:
        def __init__(self, ref):
            self.lbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["pair_key"].to_pylist()
            pred = np.asarray(t["is_match"])
            gold = np.array([self.lbl.get(k, -1) for k in keys], dtype=np.int8)
            labeled = gold >= 0
            tp = int(np.sum(labeled & pred & (gold == 1)))
            fp = int(np.sum(labeled & pred & (gold == 0)))
            fn_present = int(np.sum(labeled & ~pred & (gold == 1)))
            pos_present = int(np.sum(labeled & (gold == 1)))
            return pa.table({
                "tp": pa.array([tp], type=pa.int64()),
                "fp": pa.array([fp], type=pa.int64()),
                "fn_present": pa.array([fn_present], type=pa.int64()),
                "pos_present": pa.array([pos_present], type=pa.int64()),
            })

    counts = scored.map_batches(
        Judge, fn_constructor_kwargs={"ref": lbl_ref},
        batch_format="pyarrow", batch_size=8192, concurrency=(1, 4),
    ).aggregate(
        Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
        Sum("fn_present", alias_name="fn_present"),
        Sum("pos_present", alias_name="pos_present"),
    )
    tp = int(counts.get("tp") or 0)
    fp = int(counts.get("fp") or 0)
    fn = int(counts.get("fn_present") or 0) + (total_pos - int(counts.get("pos_present") or 0))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "precision": precision, "recall": recall, "f1": f1,
        "total_labeled_pos": total_pos,
    }


def cluster_size_histogram(clusters: ray.data.Dataset) -> pd.DataFrame:
    """cluster size → count, bucketed per the reference's scheme."""
    sizes = clusters.groupby("cluster_id").count().to_pandas()

    def bucket(n: int) -> str:
        for lo, hi in SIZE_BUCKETS:
            if lo <= n <= hi:
                return f"{lo}" if lo == hi else f"{lo}-{hi}"
        return f">{SIZE_BUCKETS[-1][1]}"

    sizes["bucket"] = sizes["count()"].map(bucket)
    out = sizes.groupby("bucket", as_index=False).agg(
        n_clusters=("cluster_id", "count"), n_convs=("count()", "sum")
    )
    return out.sort_values("bucket").reset_index(drop=True)
