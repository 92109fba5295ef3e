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


def _labeled_margin(scored: ray.data.Dataset, labels: pa.Table) -> float:
    """Separation margin on labeled pairs: min positive score − max
    negative score (distributed min/max over a broadcast judge join).
    A labeled pair the engine never scored counts as score 0 on BOTH
    sides (never-blocked = treated as non-match), so the sentinels the
    batch minima/maxima start from can never leak into the result."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    lbl = _label_table(labels)
    total_pos = int(pc.sum(lbl["gold"]).as_py() or 0)
    total_neg = lbl.num_rows - total_pos
    ref = ray.put(lbl)

    def j(t: pa.Table) -> pa.Table:
        import polars as pl

        l = pl.from_arrow(ray.get(ref))
        df = pl.DataFrame({
            "pair_key": pl.from_arrow(t["pair_key"].combine_chunks()),
            "score": pl.from_arrow(t["score"].combine_chunks()),
        }).join(l, on="pair_key", how="inner")
        pos = df.filter(pl.col("gold"))["score"]
        neg = df.filter(~pl.col("gold"))["score"]
        return pa.table({
            "min_pos": pa.array([float(pos.min()) if len(pos) else 1e9]),
            "max_neg": pa.array([float(neg.max()) if len(neg) else -1e9]),
            "n_pos": pa.array([len(pos)], type=pa.int64()),
            "n_neg": pa.array([len(neg)], type=pa.int64()),
        })

    agg = scored.map_batches(j, batch_format="pyarrow").aggregate(
        Min("min_pos", alias_name="min_pos"),
        Max("max_neg", alias_name="max_neg"),
        Sum("n_pos", alias_name="n_pos"),
        Sum("n_neg", alias_name="n_neg"))
    min_pos = float(agg.get("min_pos") if agg.get("min_pos") is not None else 1e9)
    if int(agg.get("n_pos") or 0) < total_pos or total_pos == 0:
        min_pos = min(min_pos, 0.0) if total_pos else 0.0
    max_neg = float(agg.get("max_neg") if agg.get("max_neg") is not None else -1e9)
    if int(agg.get("n_neg") or 0) < total_neg or total_neg == 0:
        max_neg = max(max_neg, 0.0) if total_neg else 0.0
    return min_pos - max_neg


def scorer_differential(pairs: ray.data.Dataset, features: ray.data.Dataset,
                        stats_ref, labels: pa.Table,
                        cfg=None, baseline: str = "stringsim") -> pa.Table:
    """Differential scorer baseline (SURVEY §5.2; the reference ships the
    same comparison as LBP vs ARGMAX, eval/EvalOnDatasets.scala:192-195):
    score the SAME attached pair set with the configured scorer and with
    the ``baseline`` scorer (default: string-similarity only), report
    both micro P/R/F1 plus the decision overlap between them.

    One row: (n_pairs, match_full, match_base, match_both, agree_pct,
    p/r/f1 of both, delta_f1, margin_full, margin_base) — the margins
    (min labeled-positive score − max labeled-negative score) quantify
    what the corpus statistics buy even when both F1s saturate on a
    clean fixture."""
    from dataclasses import replace as dc_replace

    from ray.data.aggregate import Sum

    from ..config import PipelineConfig
    from ..functions.grouping import hash_join
    from .scoring import attach_features, score_pairs

    cfg = cfg or PipelineConfig()
    attached = attach_features(pairs, features).materialize()
    full = score_pairs(attached, stats_ref, cfg).materialize()
    base = score_pairs(attached, stats_ref,
                       dc_replace(cfg, scorer=baseline)).materialize()
    m_full = pairwise_metrics(full, labels)
    m_base = pairwise_metrics(base, labels)
    margin_full = _labeled_margin(full, labels)
    margin_base = _labeled_margin(base, labels)

    fs = full.select_columns(["pair_key", "is_match"]) \
        .rename_columns({"is_match": "m_full"})
    bs = base.select_columns(["pair_key", "is_match"]) \
        .rename_columns({"is_match": "m_base"})

    def counts(t: pa.Table) -> pa.Table:
        mf = np.asarray(t["m_full"])
        mb = np.asarray(t["m_base"])
        return pa.table({
            "n": pa.array([t.num_rows], type=pa.int64()),
            "match_full": pa.array([int(mf.sum())], type=pa.int64()),
            "match_base": pa.array([int(mb.sum())], type=pa.int64()),
            "match_both": pa.array([int((mf & mb).sum())], type=pa.int64()),
            "agree": pa.array([int((mf == mb).sum())], type=pa.int64()),
        })

    agg = hash_join(fs, bs, "pair_key", num_buckets=16).map_batches(
        counts, batch_format="pyarrow"
    ).aggregate(Sum("n", alias_name="n"),
                Sum("match_full", alias_name="match_full"),
                Sum("match_base", alias_name="match_base"),
                Sum("match_both", alias_name="match_both"),
                Sum("agree", alias_name="agree"))
    n = int(agg.get("n") or 0)
    out = pa.table({
        "n_pairs": pa.array([n], type=pa.int64()),
        "match_full": pa.array([int(agg.get("match_full") or 0)],
                               type=pa.int64()),
        "match_base": pa.array([int(agg.get("match_base") or 0)],
                               type=pa.int64()),
        "match_both": pa.array([int(agg.get("match_both") or 0)],
                               type=pa.int64()),
        "agree_pct": pa.array([(agg.get("agree") or 0) / n if n else 1.0]),
        "precision_full": pa.array([m_full["precision"]]),
        "recall_full": pa.array([m_full["recall"]]),
        "f1_full": pa.array([m_full["f1"]]),
        "precision_base": pa.array([m_base["precision"]]),
        "recall_base": pa.array([m_base["recall"]]),
        "f1_base": pa.array([m_base["f1"]]),
        "delta_f1": pa.array([m_full["f1"] - m_base["f1"]]),
        "margin_full": pa.array([margin_full]),
        "margin_base": pa.array([margin_base]),
    })
    # LBP convergence telemetry (reference LBPTimeConvergence.scala:7 /
    # GlobalStats.scala:200-209): when the baseline scorer surfaced
    # per-pair sweep counts, fold them into the one-row report — a
    # distributed Sum, never a pair collect
    base_cols = base.schema().names
    if "lbp_converged" in base_cols:
        def conv_partial(t: pa.Table) -> pa.Table:
            cv = np.asarray(t["lbp_converged"], dtype=bool)
            return pa.table({
                "cn": pa.array([t.num_rows], type=pa.int64()),
                "cc": pa.array([int(cv.sum())], type=pa.int64()),
                "ci": pa.array([int(np.asarray(t["lbp_iters"]).sum())],
                               type=pa.int64()),
                "cl": pa.array([int(np.asarray(
                    t["lbp_live_tokens"]).sum())], type=pa.int64()),
            })

        cagg = base.map_batches(conv_partial, batch_format="pyarrow") \
            .aggregate(Sum("cn", alias_name="cn"),
                       Sum("cc", alias_name="cc"),
                       Sum("ci", alias_name="ci"),
                       Sum("cl", alias_name="cl"))
        cn = int(cagg.get("cn") or 0)
        out = out.append_column(
            "lbp_converged_pct",
            pa.array([(cagg.get("cc") or 0) / cn if cn else 1.0]))
        out = out.append_column(
            "lbp_avg_iters",
            pa.array([(cagg.get("ci") or 0) / cn if cn else 0.0]))
        out = out.append_column(
            "lbp_avg_live_tokens",
            pa.array([(cagg.get("cl") or 0) / cn if cn else 0.0]))
    return out


def lbp_convergence_report(scored: ray.data.Dataset) -> pd.DataFrame:
    """Per-pair-size LBP convergence report — the recast of the
    reference's per-doc-size-bucket convergence % / avg-iteration table
    (LBPTimeConvergence.scala:7, eval/GlobalStats.scala:200-209, bucket
    scheme GlobalStats.scala:116-134).  Input: an ``SCORERS['lbp']``
    scored pair set (carries lbp_iters / lbp_converged /
    lbp_live_tokens).  Distributed bucketed aggregate: per-batch
    ≤|buckets|-row partials, ONE small sum — nothing O(pairs) reaches
    the driver."""
    from ray.data.aggregate import Sum

    names = [f"{lo}" if lo == hi else f"{lo}-{hi}"
             for lo, hi in SIZE_BUCKETS] + [f">{SIZE_BUCKETS[-1][1]}"]

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], type=pa.string()),
                          "n_pairs": pa.array([], type=pa.int64()),
                          "n_converged": pa.array([], type=pa.int64()),
                          "sum_iters": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "lbp_live_tokens" not in t.column_names:
            return empty
        n = np.asarray(t["lbp_live_tokens"], dtype=np.int64)
        cv = np.asarray(t["lbp_converged"], dtype=bool).astype(np.int64)
        it = np.asarray(t["lbp_iters"], dtype=np.int64)
        bidx = np.full(len(n), len(SIZE_BUCKETS), dtype=np.int64)
        for i in range(len(SIZE_BUCKETS) - 1, -1, -1):
            lo, hi = SIZE_BUCKETS[i]
            bidx[(n >= lo) & (n <= hi)] = i
        bidx[n < 1] = 0                     # 0 live tokens → the "1" bin
        npair = np.bincount(bidx, minlength=len(names)).astype(np.int64)
        ncv = np.bincount(bidx, weights=cv, minlength=len(names)) \
            .astype(np.int64)
        nit = np.bincount(bidx, weights=it, minlength=len(names)) \
            .astype(np.int64)
        live = npair > 0
        return pa.table({
            "bucket": pa.array(np.array(names, dtype=object)[live]),
            "n_pairs": pa.array(npair[live]),
            "n_converged": pa.array(ncv[live]),
            "sum_iters": pa.array(nit[live]),
        })

    out = scored.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket") \
        .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                   Sum("n_converged", alias_name="n_converged"),
                   Sum("sum_iters", alias_name="sum_iters")) \
        .to_pandas()                         # ≤|buckets| rows
    out["converged_pct"] = out["n_converged"] / out["n_pairs"]
    out["avg_iters"] = out["sum_iters"] / out["n_pairs"]
    return out.sort_values("bucket").reset_index(drop=True)


def cluster_size_histogram(clusters: ray.data.Dataset) -> pd.DataFrame:
    """cluster size → count, bucketed per the reference's scheme
    (GlobalStats.scala:116-134) as a DISTRIBUTED bucketed aggregate
    (SURVEY §2 G6): per-batch ≤|buckets|-row partials over the groupby
    output, then ONE small sum — nothing O(clusters) ever reaches the
    driver."""
    names = [f"{lo}" if lo == hi else f"{lo}-{hi}"
             for lo, hi in SIZE_BUCKETS] + [f">{SIZE_BUCKETS[-1][1]}"]

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], type=pa.string()),
                          "n_clusters": pa.array([], type=pa.int64()),
                          "n_convs": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "count()" not in t.column_names:
            return empty
        n = np.asarray(t["count()"], dtype=np.int64)
        # first-matching-interval semantics, vectorized over the batch:
        # loop is over the ≤10 buckets, never over rows
        bidx = np.full(len(n), len(SIZE_BUCKETS), dtype=np.int64)
        for i in range(len(SIZE_BUCKETS) - 1, -1, -1):
            lo, hi = SIZE_BUCKETS[i]
            bidx[(n >= lo) & (n <= hi)] = i
        ncl = np.bincount(bidx, minlength=len(names)).astype(np.int64)
        ncv = np.bincount(bidx, weights=n, minlength=len(names)) \
            .astype(np.int64)
        live = ncl > 0
        return pa.table({
            "bucket": pa.array(np.array(names, dtype=object)[live]),
            "n_clusters": pa.array(ncl[live]),
            "n_convs": pa.array(ncv[live]),
        })

    from ray.data.aggregate import Sum

    out = clusters.groupby("cluster_id").count() \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("n_clusters", alias_name="n_clusters"),
                                     Sum("n_convs", alias_name="n_convs")) \
        .to_pandas()                       # ≤|buckets| rows
    return out.sort_values("bucket").reset_index(drop=True)
