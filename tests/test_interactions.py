"""Reference-semantics regression tests (FIXTURES.md F3): clicked
sets, exclusion-masked per-user top-k, Recall/NDCG/MRR/Precision@K —
each checked against a small pandas/numpy oracle replicating
/root/reference/src/Inference.py behavior."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd
from pisa_ray.pipelines.interactions import clicked_sets, topk_excluding, topn_accuracy

N_USERS, N_ITEMS = 50, 200


@pytest.fixture(scope="module")
def interactions():
    rng = np.random.default_rng(21)
    n = 2000
    users = rng.integers(0, N_USERS, size=n)
    items = (rng.zipf(1.3, size=n) - 1) % N_ITEMS
    ts = np.cumsum(rng.integers(1, 50, size=n))  # strictly increasing
    return pd.DataFrame({"user_id": users, "item_id": items, "time": ts})


def _make_score_fn():
    """Deterministic stand-in for the model's user x item scores.

    Built as a closure so cloudpickle ships it by value (a module-level
    function in a test file isn't importable inside Ray workers)."""

    def fn(user_batch: np.ndarray) -> np.ndarray:
        u = np.asarray(user_batch, dtype=np.int64)[:, None]
        i = np.arange(N_ITEMS, dtype=np.int64)[None, :]
        return (np.sin(u * 13.7 + i * 0.913) * 1000).astype(np.float32)

    return fn


_score_fn = _make_score_fn()


def test_clicked_sets_matches_pandas(interactions):
    ds = rd.from_pandas(interactions)
    got = clicked_sets(ds, order_col="time").to_pandas()
    want = interactions.groupby("user_id")["item_id"].unique().to_dict()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        # Arrow list columns surface as np.ndarray in pandas; compare content
        assert list(row["items"]) == want[row["user_id"]].tolist()


def test_topk_excluding_matches_oracle(interactions):
    clicked = {
        int(u): np.asarray(v)
        for u, v in interactions.groupby("user_id")["item_id"].unique().items()
    }
    users = sorted(clicked)
    got = (
        topk_excluding(users, N_ITEMS, _score_fn, clicked, k=20)
        .to_pandas()
        .set_index("user_id")
    )
    scores = _score_fn(np.asarray(users))
    for idx, u in enumerate(users):
        s = scores[idx].copy()
        s[clicked[u]] = -np.inf
        order = np.lexsort((np.arange(N_ITEMS), -s))[:20]
        assert got.loc[u, "items"] == order.tolist()
        # no clicked item may appear (exclusion mask)
        assert not set(got.loc[u, "items"]) & set(clicked[u].tolist())


def test_topn_accuracy_matches_reference_formulas():
    # tiny hand-checkable case
    topk = pd.DataFrame(
        {"user_id": [0, 1], "items": [[5, 1, 9, 3], [2, 4, 6, 8]]}
    )
    positives = {0: {1, 3}, 1: {7}}
    m = topn_accuracy(topk, positives, ks=(2, 4))
    # user0@2: hits=[0,1] -> recall 1/2, precision 1/2, mrr 1/2,
    #   dcg=1/log2(3), idcg=1/log2(2)+1/log2(3)
    # user1@2: all zero
    assert m["Recall@2"] == round((0.5 + 0.0) / 2, 6)
    assert m["Precision@2"] == round((0.5 + 0.0) / 2, 6)
    assert m["MRR@2"] == round((0.5 + 0.0) / 2, 6)
    dcg = 1 / np.log2(3)
    idcg = 1 / np.log2(2) + 1 / np.log2(3)
    assert m["NDCG@2"] == round((dcg / idcg) / 2, 6)
    # user0@4: hits at ranks 2 and 4 -> recall 1, precision 1/2
    assert m["Recall@4"] == round((1.0 + 0.0) / 2, 6)


def test_end_to_end_snapshot_eval(interactions):
    """The reference lifecycle in miniature: snapshot split -> clicked
    sets on train -> masked top-k -> metrics on the test block."""
    from pisa_ray.pipelines.relational import snapshot_blocks

    ds = rd.from_pandas(interactions)
    blocks = snapshot_blocks(ds, ["time", "item_id"], train_ratio=0.8, n_snapshots=1)
    train = blocks[0].to_pandas()
    test = blocks[1].to_pandas()
    clicked = {
        int(u): np.asarray(v)
        for u, v in train.groupby("user_id")["item_id"].unique().items()
    }
    positives = {
        int(u): set(v) for u, v in test.groupby("user_id")["item_id"].unique().items()
    }
    users = sorted(clicked)
    topk = topk_excluding(users, N_ITEMS, _score_fn, clicked, k=50).to_pandas()
    metrics = topn_accuracy(topk, positives, ks=(10, 50))
    assert 0.0 <= metrics["Recall@10"] <= metrics["Recall@50"] <= 1.0
    assert set(metrics) == {
        f"{m}@{k}" for m in ("Recall", "NDCG", "MRR", "Precision") for k in (10, 50)
    }


def test_topk_excluding_boundary_tie_determinism():
    """Equal scores straddling rank k must select the LOWER item
    indices (torch.topk order) — argpartition used to pick boundary
    ties arbitrarily, caught by the topn_accuracy DuckDB replay."""
    n_items = 30
    # all items share one score -> the whole boundary is one tie class
    flat = lambda u: np.zeros((len(u), n_items), dtype=np.float32)
    got = (
        topk_excluding([0], n_items, flat, {0: np.asarray([2, 5])}, k=10)
        .to_pandas()
        .iloc[0]
    )
    want = [i for i in range(n_items) if i not in (2, 5)][:10]
    assert got["items"] == want
