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


def _label_table(labels: pa.Table) -> pa.Table:
    """(conv_a, conv_b, is_match) → broadcastable (pair_key, gold) Arrow
    table — the small join side of every judge below."""
    import pyarrow.compute as pc

    return pa.table({
        "pair_key": pc.binary_join_element_wise(
            pc.cast(labels["conv_a"], pa.string()),
            pc.cast(labels["conv_b"], pa.string()), "\x1f"),
        "gold": pc.cast(labels["is_match"], pa.bool_()),
    })


def pairwise_metrics(
    scored: ray.data.Dataset, labels: pa.Table
) -> dict[str, float]:
    """Micro pairwise P/R/F1 on labeled pairs (metric domain: labeled pairs
    sharing a blocking key — BASELINE.md)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    lbl = _label_table(labels)
    total_pos = int(pc.sum(lbl["gold"]).as_py() or 0)
    lbl_ref = ray.put(lbl)

    class Judge:
        """Judges each scored batch via a vectorized polars inner join
        against the broadcast label table — a true broadcast semi-join
        (the reference's bulk set intersections, eval/Verifier.scala:24-43),
        never a Python probe per scored row."""

        def __init__(self, ref):
            import polars as pl

            t = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.lbl = pl.from_arrow(t)

        def __call__(self, t: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.DataFrame({
                "pair_key": pl.from_arrow(t["pair_key"].combine_chunks()),
                "pred": pl.from_arrow(t["is_match"].combine_chunks()),
            }).join(self.lbl, on="pair_key", how="inner")
            pred = df["pred"].to_numpy()
            gold = df["gold"].to_numpy()
            tp = int(np.sum(pred & gold))
            fp = int(np.sum(pred & ~gold))
            fn_present = int(np.sum(~pred & gold))
            pos_present = int(np.sum(gold))
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


def _judged_pairs(scored: ray.data.Dataset, labels: pa.Table) -> pd.DataFrame:
    """All LABELED pairs with predictions: scored ones judged in a
    broadcast semi-join map (distributed), unscored labeled pairs counted
    predicted-negative.  Result is O(|labels|) — the gold table is the
    small side by construction."""
    lbl = _label_table(labels)
    lbl_ref = ray.put(lbl)

    def judge(t: pa.Table) -> pa.Table:
        # vectorized broadcast semi-join per batch (polars inner join; the
        # label table ray.get is a zero-copy object-store view)
        import polars as pl

        l = pl.from_arrow(ray.get(lbl_ref))
        df = pl.DataFrame({
            "pair_key": pl.from_arrow(t["pair_key"].combine_chunks()),
            "pred": pl.from_arrow(t["is_match"].combine_chunks()),
        }).join(l, on="pair_key", how="inner")
        return df.select(["pair_key", "pred", "gold"]).to_arrow()

    got = scored.map_batches(judge, batch_format="pyarrow",
                             batch_size=8192).to_pandas()
    lbl_df = lbl.to_pandas()
    miss = lbl_df[~lbl_df["pair_key"].isin(got["pair_key"])]
    miss_df = pd.DataFrame({
        "pair_key": miss["pair_key"].to_numpy(),
        "pred": False,
        "gold": miss["gold"].astype(bool).to_numpy(),
    }).sort_values("pair_key", ignore_index=True)
    return pd.concat([got, miss_df], ignore_index=True)


def _prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


def eval_report(scored: ray.data.Dataset, labels: pa.Table,
                golden_clusters: pa.Table | None = None) -> pa.Table:
    """Micro AND macro P/R/F1, overall and per gold-cluster-size bucket —
    the full recast of the reference's GlobalStats report
    (eval/GlobalStats.scala:150-248; bucket scheme :116-134; macro = mean
    of per-document metrics, here per-conversation with the convention
    that an empty denominator scores 1.0).

    Returns one row per bucket plus an ``__all__`` row with columns
    (bucket, n_pairs, tp, fp, fn, micro_p, micro_r, micro_f1,
    macro_p, macro_r, macro_f1)."""
    jp = _judged_pairs(scored, labels)
    ab = jp["pair_key"].str.split("\x1f", expand=True)
    jp = jp.assign(conv_a=ab[0], conv_b=ab[1])

    # bucket = gold-cluster size of conv_a (== conv_b's for positives)
    if golden_clusters is not None:
        g = golden_clusters.to_pandas()
        csize = g.groupby("cluster_id")["conv_id"].transform("size")
        size_of = dict(zip(g["conv_id"], csize))
        pair_size = jp["conv_a"].map(size_of).fillna(1).astype(int)
    else:
        pair_size = pd.Series(1, index=jp.index)

    def bucket_name(n: int) -> str:
        for lo, hi in SIZE_BUCKETS:
            if lo <= n <= hi:
                return f"{lo}" if lo == hi else f"{lo}-{hi}"
        return f">{SIZE_BUCKETS[-1][1]}"

    jp = jp.assign(bucket=pair_size.map(bucket_name))

    def one_report(df: pd.DataFrame, name: str) -> dict:
        tp = int((df.pred & df.gold).sum())
        fp = int((df.pred & ~df.gold).sum())
        fn = int((~df.pred & df.gold).sum())
        micro_p, micro_r, micro_f1 = _prf(tp, fp, fn)
        # macro: per-conversation metrics averaged (each pair charged to
        # both of its conversations, the per-doc view of the reference)
        both = pd.concat([
            df[["pred", "gold"]].assign(conv=df["conv_a"]),
            df[["pred", "gold"]].assign(conv=df["conv_b"]),
        ])
        per = both.groupby("conv").apply(
            lambda x: _prf(int((x.pred & x.gold).sum()),
                           int((x.pred & ~x.gold).sum()),
                           int((~x.pred & x.gold).sum())),
            include_groups=False,
        )
        arr = np.array(per.tolist()) if len(per) else np.ones((1, 3))
        return {
            "bucket": name, "n_pairs": len(df), "tp": tp, "fp": fp, "fn": fn,
            "micro_p": micro_p, "micro_r": micro_r, "micro_f1": micro_f1,
            "macro_p": float(arr[:, 0].mean()),
            "macro_r": float(arr[:, 1].mean()),
            "macro_f1": float(arr[:, 2].mean()),
        }

    rows = [one_report(jp, "__all__")]
    for name, df in jp.groupby("bucket"):
        rows.append(one_report(df, str(name)))
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


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
