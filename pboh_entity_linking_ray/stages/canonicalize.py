"""Canonicalize: turns → per-conversation mention documents.

Analog of the reference's document assembly — grouping annotation lines by
document key and rebuilding each document on the executor (reference:
src/main/scala/eval/cweb/RunLoopyAgainstAllGoogleClweb.scala:246-257
``groupByKey(256).map(solveOneSmallFile)``) — expressed as
``Dataset.groupby("conv_id").map_groups``.

Per-turn ordering invariant (input_hint): rows may arrive in any order;
the group UDF sorts by ``turn_idx`` before concatenating, so joining
``mention_doc`` back on ``\\n`` reproduces every turn's text byte-for-byte
(Ray Data does not guarantee intra-group row order — SURVEY.md §2.9).

The tool/role signature (``sig``) is the cheap deterministic blocking key:
the ordered sequence of ``role:tool`` per turn (analog in spirit of the
reference's per-doc mention-set identity).
"""

from __future__ import annotations

import pandas as pd
import ray.data

TURN_SEP = "\n"


def _one_conv(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("turn_idx", kind="mergesort")
    sig = "|".join(r + ":" + t for r, t in zip(g["role"], g["tool"]))
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": pd.array([len(g)], dtype="int32"),
            "mention_doc": [TURN_SEP.join(g["text"].tolist())],
            "sig": [sig],
        }
    )


def canonicalize(turns: ray.data.Dataset) -> ray.data.Dataset:
    """turns(conv_id, turn_idx, role, text, tool, ts) → conv_docs.

    Column-prunes before the shuffle: ``ts`` never leaves the read.
    """
    return (
        turns.select_columns(["conv_id", "turn_idx", "role", "text", "tool"])
        .groupby("conv_id")
        .map_groups(_one_conv, batch_format="pandas")
    )
