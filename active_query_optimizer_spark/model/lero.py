"""Plan-ranker training: pointwise, pairwise, and rank-score labels.

Rebuilds ``Lero/model.py:128-319`` and ``Lero/lero_train.py:26-73``:

- ``LeroModel`` — pointwise MSE on normalized latency;
- ``LeroModelPairWise`` — the reference's main mode: for each query's
  candidate set, all ordered pairs (i, j), label ``1.0 if t_i >= t_j``,
  loss = BCE(sigmoid(s_i − s_j), label) (``model.py:267-299``); a single
  shared net scores both sides, so the pair gradient is
  ``(p − y)`` into side 1 and ``−(p − y)`` into side 2;
- rank-score label variants (rank², rank⁴, eʳᵃⁿᵏ — ``lero_train.py:43-73``)
  via ``compute_rank_scores``.

Training is driver-local numpy (corpora are ≤ a few thousand plans — the
reference trains 2511 pairs in ~3 CPU-minutes; this net is the same size).
Pair *construction* at scale is a Spark self-join on qid
(``pipelines/stable.py``); scoring at scale is a pandas UDF
(``model/infer.py``).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..plans.featurize import FeatureGenerator, PlanNode, VecNode, prepare_trees
from .tcnn import Adam, LeroNet


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class LeroModel:
    """Pointwise trainer (``Lero/model.py:128-213``): MSE on normalized
    latency labels."""

    def __init__(self, feature_generator: FeatureGenerator | None = None,
                 seed: int = 0) -> None:
        self.fg = feature_generator
        self.net: LeroNet | None = None
        self._seed = seed

    def _ensure_net(self) -> LeroNet:
        if self.net is None:
            assert self.fg is not None
            self.net = LeroNet(self.fg.input_feature_dim, seed=self._seed)
        return self.net

    def fit(self, trees: list[VecNode], labels: list[float],
            epochs: int = 100, batch_size: int = 64, lr: float = 1e-3,
            seed: int = 0) -> list[float]:
        """Returns per-epoch mean losses. Defaults mirror the reference
        (batch 64, 100 epochs, Adam — ``model.py:133,168``)."""
        net = self._ensure_net()
        opt = Adam(net.params(), lr=lr)
        y = np.asarray(labels, dtype=float)
        rng = np.random.default_rng(seed)
        losses = []
        for _ in range(epochs):
            order = rng.permutation(len(trees))
            total, nb = 0.0, 0
            for s in range(0, len(order), batch_size):
                sel = order[s:s + batch_size]
                feats, idx, nn = prepare_trees([trees[i] for i in sel])
                net.zero_grad()
                scores, _ = net.forward(feats, idx, nn)
                diff = scores - y[sel]
                total += float((diff ** 2).mean())
                nb += 1
                net.backward(2.0 * diff / len(sel))
                opt.step()
            losses.append(total / max(nb, 1))
        return losses

    def predict(self, trees: list[VecNode]) -> np.ndarray:
        net = self._ensure_net()
        # one batch per shared pad-size bucket would be faster; corpora are
        # small enough to pad globally
        feats, idx, nn = prepare_trees(trees)
        scores, _ = net.forward(feats, idx, nn)
        return scores

    def embeddings(self, trees: list[VecNode]) -> np.ndarray:
        """64-d pooled plan embeddings (``lero_train.py:224-241`` —
        ``get_feaure`` (sic)); feeds coreset selection."""
        net = self._ensure_net()
        feats, idx, nn = prepare_trees(trees)
        _, emb = net.forward(feats, idx, nn)
        return emb

    # ---- persistence (reference: torch state dict + joblib'd generator,
    #      ``model.py:100-126``; here: npz + json)
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        assert self.fg is not None
        net = self._ensure_net()
        np.savez(os.path.join(path, "weights.npz"), **net.state_arrays())
        with open(os.path.join(path, "feature_generator.json"), "w") as f:
            json.dump(self.fg.state_dict(), f)
        with open(os.path.join(path, "input_feature_dim"), "w") as f:
            f.write(str(self.fg.input_feature_dim))

    @classmethod
    def load(cls, path: str) -> "LeroModel":
        with open(os.path.join(path, "feature_generator.json")) as f:
            fg = FeatureGenerator.from_state(json.load(f))
        model = cls(fg)
        net = model._ensure_net()
        with np.load(os.path.join(path, "weights.npz")) as z:
            net.load_state_arrays(dict(z))
        return model


class LeroModelPairWise(LeroModel):
    """Pairwise trainer (``Lero/model.py:216-319``)."""

    def fit_pairs(self, x1: list[VecNode], x2: list[VecNode],
                  y1: list[float], y2: list[float],
                  epochs: int = 100, batch_size: int = 64, lr: float = 1e-3,
                  seed: int = 0,
                  weights: list[float] | None = None) -> list[float]:
        """(x1[i], x2[i]) are two candidate plans of the same query with
        true latencies (y1[i], y2[i]); label = 1.0 if y1 >= y2
        (``model.py:238-241``). ``weights`` (optional, mean-1-normalized
        by the caller) scale each pair's cross-entropy and gradient —
        the consequence-weighted objective (round-11 q64-class
        experiment): a pair whose mis-ordering costs 4x latency should
        pull harder than a near-tie."""
        net = self._ensure_net()
        opt = Adam(net.params(), lr=lr)
        labels = (np.asarray(y1) >= np.asarray(y2)).astype(float)
        w_all = (np.ones(len(x1)) if weights is None
                 else np.asarray(weights, dtype=float))
        rng = np.random.default_rng(seed)
        losses = []
        for _ in range(epochs):
            order = rng.permutation(len(x1))
            total, nb = 0.0, 0
            for s in range(0, len(order), batch_size):
                sel = order[s:s + batch_size]
                f1, i1, n1 = prepare_trees([x1[i] for i in sel])
                f2, i2, n2 = prepare_trees([x2[i] for i in sel])
                net.zero_grad()
                s1, _ = net.forward(f1, i1, n1)
                # forward side 1 caches are overwritten by side 2's forward,
                # so backprop side 1 first, then side 2
                p_tmp = s1.copy()
                s2, _ = net.forward(f2, i2, n2)
                p = _sigmoid(p_tmp - s2)
                yb = labels[sel]
                wb = w_all[sel]
                eps = 1e-12
                total += float(-(wb * (yb * np.log(p + eps)
                                       + (1 - yb) * np.log(1 - p + eps))
                                 ).mean())
                nb += 1
                g = wb * (p - yb) / len(sel)
                net.backward(-g)        # side 2 (cached last)
                _, _ = net.forward(f1, i1, n1)
                net.backward(g)         # side 1 (re-forward to rebuild caches)
                opt.step()
            losses.append(total / max(nb, 1))
        return losses


def all_pairs(items: list) -> list[tuple]:
    """All ordered candidate pairs of one query's bundle
    (``lero_train.py:26-40``: n(n−1)/2 with both sides used)."""
    out = []
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            out.append((items[i], items[j]))
    return out


def compute_rank_scores(times: list[float], mode: str = "rank") -> list[float]:
    """Alternative label transforms over a query's candidate latencies
    (``lero_train.py:43-73``): rank, rank², rank⁴, eʳᵃⁿᵏ."""
    order = np.argsort(np.argsort(times)) + 1  # 1-based ranks
    if mode == "rank":
        return order.astype(float).tolist()
    if mode == "rank2":
        return (order.astype(float) ** 2).tolist()
    if mode == "rank4":
        return (order.astype(float) ** 4).tolist()
    if mode == "exp_rank":
        return np.exp(order.astype(float)).tolist()
    raise ValueError(f"unknown rank mode {mode}")


def pretrain_on_cost(bundles: list[tuple[str, list[PlanNode]]],
                     epochs: int = 50, seed: int = 0) -> LeroModel:
    """Pretraining mode: pointwise fit on the *optimizer's cost estimate*
    instead of measured runtime (``lero_train.py:49-52,91-94`` — useful
    before any labels exist; the Spark analog labels with CBO cost /
    estimated cardinality). Plans must carry ``total_cost`` (PG bundles
    do; Spark plans can use the root cardinality estimate)."""
    plans = [p for _, cands in bundles for p in cands]
    costs = [p.total_cost if p.total_cost is not None else 0.0 for p in plans]
    fg = FeatureGenerator().fit(plans, costs)
    model = LeroModel(fg, seed=seed)
    trees, labels = fg.transform(plans, costs)
    model.fit(trees, labels, epochs=epochs, seed=seed)
    return model


def train_pairwise_from_bundles(
        bundles: list[tuple[str, list[tuple[PlanNode, float]]]],
        epochs: int = 100, seed: int = 0,
        pretrain_epochs: int = 0,
        pretrain_mode: str = "latency",
        pretrain_censor_ms: float | None = None,
        feature_generator: FeatureGenerator | None = None,
        pair_weighting: str = "none",
        ) -> LeroModelPairWise:
    """End-to-end: labeled bundles → fit FeatureGenerator → all-pairs →
    pairwise model (the ``training_pairwise`` orchestration,
    ``lero_train.py:76-161``).

    With ``pretrain_epochs > 0`` the net is first fit POINTWISE and the
    pairwise pass fine-tunes from those weights — the reference's
    pretraining idea (``lero_train.py:43-73,91-94``) applied as
    initialization. The pairwise cross-entropy only sees plan ORDER
    within a bundle; a heavy-tailed workload (one 19.7 s mis-pick
    dominating a fold's regret — round-9 verdict item #6) benefits from
    the net also carrying latency MAGNITUDE. ``pretrain_mode``:
    ``latency`` fits normalized measured latency; ``rank``/``rank2``/
    ``rank4``/``exp_rank`` fit :func:`compute_rank_scores` transforms of
    each bundle's latencies (scale-free across bundles — the reference's
    rank-score label family).

    ``pretrain_censor_ms`` excludes candidates at/above that label from
    the PRETRAIN SET ONLY: a timeout-penalty label is a censored
    observation (a lower bound), not a latency measurement — on a
    penalty-dense corpus (the sf1 rehearsal) fitting magnitudes to the
    penalty constant distorts every score. The pairwise pass still sees
    those candidates: their ordering information is valid.

    ``feature_generator`` substitutes the featurizer (e.g.
    ``plans.enrich.EnrichedFeatureGenerator`` over realized-strategy
    refined trees — round-10 verdict #4); default is the reference's
    base ``FeatureGenerator``.

    ``pair_weighting="latency_delta"`` weights each training pair by the
    absolute difference of its two NORMALIZED latency labels
    (mean-1-normalized across the pair set): a pair whose mis-ordering
    costs 4x pulls harder than a near-tie, concentrating capacity on the
    picks that dominate regret (the q64-class experiment). ``"none"``
    replicates the reference's equal-weight objective."""
    plans = [p for _, cands in bundles for p, _ in cands]
    times = [t for _, cands in bundles for _, t in cands]
    fg = (feature_generator if feature_generator is not None
          else FeatureGenerator()).fit(plans, times)
    model = LeroModelPairWise(fg, seed=seed)
    if pretrain_epochs > 0 and plans:
        keep = [[(p, t) for p, t in cands
                 if pretrain_censor_ms is None or t < pretrain_censor_ms]
                for _, cands in bundles]
        p_plans = [p for cands in keep for p, _ in cands]
        p_times = [t for cands in keep for _, t in cands]
        if pretrain_mode == "latency":
            labels = [fg.label_norm.norm(t) for t in p_times]
        else:
            labels = [s for cands in keep if cands
                      for s in compute_rank_scores(
                          [t for _, t in cands], mode=pretrain_mode)]
            # rank scores are per-bundle magnitudes (1..n, squared, …);
            # squash to the same unit scale the pointwise MSE expects
            mx = max(labels, default=0.0) or 1.0
            labels = [v / mx for v in labels]
        if p_plans:
            trees = [fg.transform_tree(p) for p in p_plans]
            model.fit(trees, labels, epochs=pretrain_epochs, seed=seed)
    x1, x2, y1, y2 = [], [], [], []
    for _, cands in bundles:
        for (pa, ta), (pb, tb) in all_pairs(cands):
            x1.append(fg.transform_tree(pa))
            x2.append(fg.transform_tree(pb))
            y1.append(fg.label_norm.norm(ta))
            y2.append(fg.label_norm.norm(tb))
    weights = None
    if pair_weighting == "latency_delta" and x1:
        w = np.abs(np.asarray(y1) - np.asarray(y2))
        mean = float(w.mean())
        # an all-tied pair set degenerates to equal weights rather than
        # zeroing the gradient
        weights = list(w / mean) if mean > 0 else None
    elif pair_weighting != "none":
        raise ValueError(f"unknown pair_weighting {pair_weighting!r}")
    if x1:
        model.fit_pairs(x1, x2, y1, y2, epochs=epochs, seed=seed,
                        weights=weights)
    return model
