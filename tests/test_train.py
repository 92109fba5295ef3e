"""G8 trainer: gradient-kernel exactness, parallel-SGD convergence,
and the flagship learned-blend quality gate."""

import numpy as np
import pyarrow as pa
import ray.data

from pboh_entity_linking_ray.stages.train import (
    local_sgd,
    logistic_grad,
    logistic_grad_step,
    parallel_sgd,
)


def _synth(n=4000, seed=7):
    """Deterministic separable set: y = 1 iff 2*x1 - x2 > 0.3."""
    rng = np.random.default_rng(seed)
    x1 = rng.random(n)
    x2 = rng.random(n)
    y = (2.0 * x1 - x2 > 0.3).astype(np.float64)
    return pa.table({"x1": x1, "x2": x2, "y": y})


def test_grad_step_matches_numpy(ray_session):
    t = _synth()
    ds = ray.data.from_arrow(t).repartition(5)
    w0 = np.array([0.1, -0.3, 0.2])
    lr = 0.7
    w1, loss = logistic_grad_step(ds, ["x1", "x2"], "y", w0, lr)

    X = np.column_stack([np.ones(t.num_rows),
                         t["x1"].to_numpy(), t["x2"].to_numpy()])
    yv = t["y"].to_numpy()
    g, loss_sum = logistic_grad(X, yv, w0)
    np.testing.assert_allclose(w1, w0 - lr * g, rtol=1e-10)
    assert abs(loss - loss_sum / t.num_rows) < 1e-9


def test_parallel_sgd_converges_separable(ray_session):
    t = _synth()
    ds = ray.data.from_arrow(t).repartition(8)
    w, hist = parallel_sgd(ds, ["x1", "x2"], "y", epochs=8, lr=1.0,
                           passes=2, minibatch=64)
    assert len(hist) == 8
    # pre-update loss strictly improves over training
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.7
    X = np.column_stack([np.ones(t.num_rows),
                         t["x1"].to_numpy(), t["x2"].to_numpy()])
    acc = np.mean(((X @ w) >= 0) == (t["y"].to_numpy() > 0.5))
    assert acc >= 0.93
    # learned direction matches the generating rule 2*x1 - x2 > 0.3
    assert w[1] > 0 and w[2] < 0


def test_local_sgd_deterministic():
    t = _synth(n=512)
    X = np.column_stack([np.ones(t.num_rows),
                         t["x1"].to_numpy(), t["x2"].to_numpy()])
    yv = t["y"].to_numpy()
    w0 = np.zeros(3)
    wa = local_sgd(X, yv, w0, lr=0.5, passes=2, minibatch=64)
    wb = local_sgd(X, yv, w0, lr=0.5, passes=2, minibatch=64)
    np.testing.assert_array_equal(wa, wb)


def test_grad_step_empty_dataset(ray_session):
    t = _synth(n=1).slice(0, 0)
    ds = ray.data.from_arrow(t)
    w0 = np.array([0.1, 0.2, 0.3])
    w1, loss = logistic_grad_step(ds, ["x1", "x2"], "y", w0, 1.0)
    np.testing.assert_array_equal(w1, w0)
    assert loss == 0.0


def test_link_train_weights_quality(ray_session):
    """The learned blend must not lose to the string-sim-only baseline
    and must stay close to the hand-tuned scorer on the golden corpus
    (the reference's learn-then-plug contract)."""
    from pboh_entity_linking_ray.pipelines.training import link_train_weights

    out = link_train_weights("/root/testdata/sf0.001").to_pylist()
    by = {r["variant"]: r for r in out}
    assert set(by) == {"hand", "learned"}
    hand_f1 = by["hand"]["f1_e4"]
    learned_f1 = by["learned"]["f1_e4"]
    assert hand_f1 >= 9800          # golden-corpus gate (BASELINE.md)
    assert learned_f1 >= 9000       # learned blend stays near the hand one
    assert learned_f1 >= hand_f1 - 800


def test_als_loss_descends_and_is_deterministic(ray_session):
    import numpy as np

    from pboh_entity_linking_ray.pipelines.training import (
        _als_run, als_tool_factors)

    SF = "/root/testdata/sf0.001"
    tools, v_mat, losses = _als_run(SF)
    assert len(tools) > 3 and v_mat.shape == (len(tools), 4)
    # alternating minimization: squared loss decreases every iteration
    assert all(b < a for a, b in zip(losses, losses[1:]))
    # and the factorization explains most of the count mass: final loss
    # far below the rank-0 (all-zero prediction) baseline Σc²
    import duckdb

    from pboh_entity_linking_ray.pipelines.linkage_queries import (
        CORPUS_CACHE,
    )
    from pboh_entity_linking_ray.sources.synthetic import (
        corpus_dir, sf_to_n_convs)
    d = corpus_dir(CORPUS_CACHE, sf_to_n_convs(SF))
    zero = duckdb.sql(
        "SELECT sum(c*c) FROM (SELECT count(*) AS c FROM "
        f"read_parquet('{d}/turns.parquet/*.parquet') "
        "WHERE tool <> '' GROUP BY conv_id, tool)").fetchone()[0]
    assert losses[-1] < 0.05 * zero

    a = als_tool_factors(SF).to_pandas()
    b = als_tool_factors(SF).to_pandas()
    assert a.equals(b)
    assert np.isfinite(a[[f"f{i}" for i in range(4)]].to_numpy()).all()


def test_als_conv_factors_reconstruct(ray_session):
    import numpy as np

    from pboh_entity_linking_ray.pipelines.training import (
        ALS_RANK, _als_run, als_conv_factors)

    SF = "/root/testdata/sf0.001"
    u = (als_conv_factors(SF).to_pandas()
         .sort_values("conv_id").reset_index(drop=True))
    assert u["conv_id"].is_unique and len(u) > 50
    fcols = [f"f{i}" for i in range(ALS_RANK)]
    assert np.isfinite(u[fcols].to_numpy()).all()
    # reconstruction: u·v approximates each conv's tool counts far
    # better than the zero baseline
    tools, V, _ = _als_run(SF)
    import os

    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.linkage_queries import (
        CORPUS_CACHE)
    from pboh_entity_linking_ray.sources.synthetic import (
        corpus_dir, sf_to_n_convs)
    d = corpus_dir(CORPUS_CACHE, sf_to_n_convs(SF))
    t = pq.read_table(os.path.join(d, "turns.parquet"),
                      columns=["conv_id", "tool"]).to_pandas()
    t = t[t.tool != ""]
    counts = t.groupby(["conv_id", "tool"]).size()
    ti = {x: i for i, x in enumerate(tools)}
    um = u.set_index("conv_id")[fcols]
    sq = zero = 0.0
    for (cid, tool), c in counts.items():
        pred = float(um.loc[cid].to_numpy() @ V[ti[tool]])
        sq += (c - pred) ** 2
        zero += c * c
    assert sq < 0.05 * zero
    again = (als_conv_factors(SF).to_pandas()
             .sort_values("conv_id").reset_index(drop=True))
    assert u.equals(again)
