"""Distributed scorer-weight learning — the G8 recast (SURVEY §2).

The reference learns its handful of scorer scalars by partition-local
SGD with parameter averaging (learning/FewParamsLearning.scala:694-703:
``mapPartitions`` → local SGD from the broadcast weights →
``reduce(add)`` → multiply by 1/numWorkers; delta-merge variant
learning/Learning.scala:318-334,913-951).  That is the published
parallelized-SGD scheme of Zinkevich et al., NIPS 2010 — and it maps
onto Ray Data without a parameter server:

- one ``map_batches`` pass per epoch with ``batch_size=None``, so each
  BLOCK (the partition analog) runs deterministic in-order logistic
  SGD from the epoch's broadcast weight vector and emits ONE skinny
  row (final local weights, rows seen, pre-update loss sum);
- the per-block result table is O(num_blocks) rows of ~6 columns, so
  the epoch average is a trivial driver-side mean — the reference's
  memcached parameter server (SURVEY §2 A6) degenerates to a
  ``ray.put`` broadcast once the model is a 4-float vector;
- nothing else materializes: the feature dataset streams through each
  epoch exactly once, and at 100 TB the only growth is one skinny row
  per input block.

Determinism: block-local SGD visits rows in block order with a fixed
learning rate, and the cross-block MEAN is order-independent up to
float addition order over O(num_blocks) terms.  Callers that need
bit-stable results across environments fix the block layout first
(``ds.repartition(k)``); at production scale the layout is whatever
the input has and the average is statistically insensitive to it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

__all__ = [
    "logistic_grad",
    "local_sgd",
    "logistic_grad_step",
    "parallel_sgd",
]


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30.0, 30.0)))


def logistic_grad(X: np.ndarray, y: np.ndarray,
                  w: np.ndarray) -> tuple[np.ndarray, float]:
    """Mean logistic-loss gradient and summed loss at ``w``.

    ``X`` already carries the bias column (all-ones first column).
    Returns ``(grad, loss_sum)`` where grad = Xᵀ(σ(Xw) − y)/n and
    loss_sum is the UNnormalized negative log-likelihood (callers
    combine partial sums across blocks before dividing).
    """
    p = _sigmoid(X @ w)
    grad = X.T @ (p - y) / max(1, len(y))
    eps = 1e-12
    loss_sum = float(-np.sum(y * np.log(p + eps)
                             + (1.0 - y) * np.log(1.0 - p + eps)))
    return grad, loss_sum


def local_sgd(X: np.ndarray, y: np.ndarray, w0: np.ndarray, lr: float,
              passes: int = 1, minibatch: int = 256) -> np.ndarray:
    """Deterministic in-order minibatch SGD over one block's rows."""
    w = w0.astype(np.float64).copy()
    for _ in range(passes):
        for s in range(0, len(y), minibatch):
            g, _ = logistic_grad(X[s: s + minibatch], y[s: s + minibatch], w)
            w -= lr * g
    return w


def _design(t: pa.Table, feature_cols: list[str],
            label_col: str) -> tuple[np.ndarray, np.ndarray]:
    cols = [np.ones(t.num_rows)]
    for c in feature_cols:
        cols.append(t[c].to_numpy(zero_copy_only=False).astype(np.float64))
    y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
    return np.column_stack(cols), y


def _part_schema(k: int) -> pa.Schema:
    return pa.schema([
        pa.field("w", pa.list_(pa.float64(), k)),
        pa.field("g", pa.list_(pa.float64(), k)),
        pa.field("n", pa.int64()),
        pa.field("loss_sum", pa.float64()),
    ])


def _block_fn(w_ref, feature_cols: list[str], label_col: str, lr: float,
              passes: int, minibatch: int, mode: str):
    """Per-block worker: emits one partial row per non-empty block.

    ``mode="sgd"`` runs local SGD and emits the block's final weights;
    ``mode="grad"`` emits the block's gradient SUM (``g``·n) so the
    driver can form the exact full-batch mean.  Empty (including
    zero-column) blocks emit zero rows of the same schema — the
    exchange/empty-block contract of CLAUDE.md.
    """
    k_holder = {}

    def fn(t: pa.Table) -> pa.Table:
        w0 = np.asarray(
            ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref,
            dtype=np.float64)
        k = len(w0)
        sch = k_holder.setdefault(k, _part_schema(k))
        if t.num_rows == 0 or label_col not in t.column_names:
            return sch.empty_table()
        X, y = _design(t, feature_cols, label_col)
        if mode == "sgd":
            w = local_sgd(X, y, w0, lr, passes, minibatch)
            _, loss_sum = logistic_grad(X, y, w0)   # pre-update epoch loss
            gvals = np.zeros(k)
        else:
            g, loss_sum = logistic_grad(X, y, w0)
            gvals = g * len(y)                      # partial gradient SUM
            w = w0
        return pa.table({
            "w": pa.FixedSizeListArray.from_arrays(
                pa.array(w, type=pa.float64()), k),
            "g": pa.FixedSizeListArray.from_arrays(
                pa.array(gvals, type=pa.float64()), k),
            "n": pa.array([len(y)], type=pa.int64()),
            "loss_sum": pa.array([loss_sum], type=pa.float64()),
        }, schema=sch)

    return fn


def _collect_parts(ds: ray.data.Dataset, fn) -> list[dict]:
    parts = ds.map_batches(fn, batch_format="pyarrow",
                           batch_size=None).take_all()
    return [p for p in parts if p["n"] > 0]


def logistic_grad_step(ds: ray.data.Dataset, feature_cols: list[str],
                       label_col: str, w0, lr: float
                       ) -> tuple[np.ndarray, float]:
    """ONE exact full-batch gradient-descent step, distributed.

    Per-block partial gradient sums stream back as one skinny row per
    block; the driver combines them into the exact global mean gradient
    (order-independent up to float addition over O(blocks) terms) and
    returns ``(w0 − lr·∇, mean_loss)``.  This is the SQL-expressible
    core the oracle twin checks; ``parallel_sgd`` is the iterative
    production variant built from the same kernel.
    """
    w0 = np.asarray(w0, dtype=np.float64)
    parts = _collect_parts(
        ds, _block_fn(w0, feature_cols, label_col, lr, 0, 0, "grad"))
    n = sum(p["n"] for p in parts)
    if n == 0:
        return w0.copy(), 0.0
    gsum = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
    loss = sum(p["loss_sum"] for p in parts) / n
    return w0 - lr * gsum / n, loss


def parallel_sgd(ds: ray.data.Dataset, feature_cols: list[str],
                 label_col: str, epochs: int = 5, lr: float = 0.5,
                 passes: int = 1, minibatch: int = 256,
                 w_init=None) -> tuple[np.ndarray, list[dict]]:
    """Parameter-averaged parallel SGD (the reference's G8 scheme).

    Each epoch: broadcast w → every block runs local SGD → plain mean
    of the per-block weight vectors (the reference's ``reduce(add)`` ×
    1/numWorkers, FewParamsLearning.scala:694-703) → next epoch.
    Returns the final weights and a per-epoch history of
    ``{"epoch", "loss", "w"}`` where loss is the PRE-update epoch mean
    loss (so history[0]["loss"] is the loss at ``w_init``).
    """
    k = len(feature_cols) + 1
    w = (np.zeros(k) if w_init is None
         else np.asarray(w_init, dtype=np.float64).copy())
    history: list[dict] = []
    for ep in range(epochs):
        ref = ray.put(w)
        parts = _collect_parts(
            ds, _block_fn(ref, feature_cols, label_col, lr,
                          passes, minibatch, "sgd"))
        if not parts:
            break
        n = sum(p["n"] for p in parts)
        loss = sum(p["loss_sum"] for p in parts) / max(1, n)
        w = np.mean([np.asarray(p["w"]) for p in parts], axis=0)
        history.append({"epoch": ep, "loss": loss, "w": w.copy()})
    return w, history
