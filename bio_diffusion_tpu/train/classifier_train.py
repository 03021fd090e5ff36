"""Property-classifier training: the JAX counterpart of the reference's
``train_with_property_classifier`` loop (/root/reference/src/__init__.py:145-205).

The reference ships a *pretrained* torch classifier (Zenodo) and a training
function its entry points never call; in a zero-egress environment that
makes conditional-evaluation MAE permanently unverifiable.  This module
closes the loop: train an ``EGNNClassifier`` on any DenseDataset property
column (L1 loss on the mean/MAD-normalized label — reference :186 — AdamW,
dense masked batches), so the conditional protocol is self-contained.

Checkpoint format: ``classifier.npz`` (flat param arrays) +
``classifier.json`` (architecture + property normalizer), loadable by
``models.classifier.load_jax_classifier`` and accepted by the conditional
eval CLI's ``classifier_model_dir``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bio_diffusion_tpu.models.classifier import EGNNClassifier
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def save_jax_classifier(
    out_dir: str, classifier: EGNNClassifier, params: Any, norms: Dict[str, float],
    prop: str, extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write classifier.npz + classifier.json into ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat
    }
    np.savez(os.path.join(out_dir, "classifier.npz"), **arrays)
    meta = {
        "in_node_nf": classifier.in_node_nf,
        "hidden_nf": classifier.hidden_nf,
        "n_layers": classifier.n_layers,
        "attention": classifier.attention,
        "node_attr": classifier.node_attr,
        "property": prop,
        "mean": float(norms["mean"]),
        "mad": float(norms["mad"]),
    }
    if extra:
        meta.update(extra)
    with open(os.path.join(out_dir, "classifier.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def load_jax_classifier(model_dir: str) -> Tuple[EGNNClassifier, Any, Dict[str, Any]]:
    """Load a classifier saved by ``save_jax_classifier``.

    Returns (classifier, params, meta) where meta carries the property name
    and its mean/MAD normalizer from training time."""
    with open(os.path.join(model_dir, "classifier.json")) as f:
        meta = json.load(f)
    classifier = EGNNClassifier(
        in_node_nf=int(meta["in_node_nf"]),
        hidden_nf=int(meta["hidden_nf"]),
        n_layers=int(meta["n_layers"]),
        attention=bool(meta["attention"]),
        node_attr=int(meta["node_attr"]),
    )
    template = classifier.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, classifier.in_node_nf)), jnp.zeros((1, 4, 3)), jnp.ones((1, 4)),
    )
    arrays = np.load(os.path.join(model_dir, "classifier.npz"))
    flat = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat[0]:
        arr = arrays[jax.tree_util.keystr(path)]
        if arr.shape != leaf.shape:
            raise ValueError(f"classifier param {jax.tree_util.keystr(path)}: "
                             f"saved {arr.shape} != template {leaf.shape}")
        leaves.append(jnp.asarray(arr))
    params = jax.tree_util.tree_unflatten(flat[1], leaves)
    return classifier, params, meta


def is_jax_classifier_dir(model_dir: str) -> bool:
    return os.path.isfile(os.path.join(model_dir, "classifier.json")) and os.path.isfile(
        os.path.join(model_dir, "classifier.npz")
    )


def train_property_classifier(
    datasets: Dict[str, Any],
    prop: str,
    num_atom_types: int,
    hidden_nf: int = 128,
    n_layers: int = 7,
    attention: bool = True,
    epochs: int = 100,
    batch_size: int = 96,
    lr: float = 1e-3,
    weight_decay: float = 1e-16,
    pad_to: Optional[int] = None,
    seed: int = 0,
    log_every: int = 20,
) -> Tuple[EGNNClassifier, Any, Dict[str, float], Dict[str, float]]:
    """Train an EGNNClassifier on a DenseDataset property column.

    Reference semantics (/root/reference/src/__init__.py:145-205): L1 loss
    on the (label - mean)/mad normalized target during training; validation
    MAE on the unnormalized scale ``|mad*pred + mean - label|``; cosine LR
    decay over the epoch horizon.  Dense masked batches replace the
    reference's flattened cormorant collation (the classifier itself is
    already dense/edge-mask based in both).

    Returns (classifier, best_params, norms, history).
    """
    from bio_diffusion_tpu.data.batch import iterate_dense_batches
    from bio_diffusion_tpu.models.distributions import compute_mean_mad

    train_ds, valid_ds = datasets["train"], datasets.get("valid")
    norms = compute_mean_mad(train_ds.property_values(prop))
    mean, mad = norms["mean"], norms["mad"]
    if pad_to is None:
        pad_to = int(train_ds.data["positions"].shape[1])

    classifier = EGNNClassifier(
        in_node_nf=num_atom_types, hidden_nf=hidden_nf, n_layers=n_layers,
        attention=attention,
    )
    key = jax.random.PRNGKey(seed)
    params = classifier.init(
        key, jnp.zeros((1, pad_to, num_atom_types)), jnp.zeros((1, pad_to, 3)),
        jnp.ones((1, pad_to)),
    )

    steps_per_epoch = max(1, len(train_ds) // batch_size)
    schedule = optax.cosine_decay_schedule(lr, max(1, epochs * steps_per_epoch))
    opt = optax.adamw(schedule, weight_decay=weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, one_hot, x, mask, label):
        def loss_fn(p):
            pred = classifier.apply(p, one_hot, x, mask)
            return jnp.mean(jnp.abs(pred - (label - mean) / mad))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_mae(params, one_hot, x, mask, label):
        pred = classifier.apply(params, one_hot, x, mask)
        return jnp.sum(jnp.abs(mad * pred + mean - label))

    def _property_batches(ds, prop, batch_size, pad_to, shuffle, rng=None,
                          drop_last=True):
        # iterate_dense_batches + the aligned property column (conditioning=
        # would normalize it into context; the classifier wants raw labels)
        order = np.arange(len(ds))
        if shuffle:
            rng.shuffle(order)
        values = ds.property_values(prop)
        for start in range(0, len(ds), batch_size):
            sel = order[start: start + batch_size]
            if len(sel) < batch_size and drop_last:
                break
            sub = {k: np.asarray(v)[sel] for k, v in ds.data.items()}
            from bio_diffusion_tpu.data.batch import DenseDataset

            sub_ds = DenseDataset(sub, ds.included_species)
            batch = next(iterate_dense_batches(
                sub_ds, batch_size, shuffle=False, drop_last=False, pad_to=pad_to
            ))
            yield batch, jnp.asarray(values[sel].astype(np.float32))

    def run_eval(params, ds):
        total, count = 0.0, 0
        for b, label in _property_batches(ds, prop, batch_size, pad_to, shuffle=False,
                                          drop_last=False):
            total += float(eval_mae(
                params, jnp.asarray(b.one_hot), jnp.asarray(b.x),
                jnp.asarray(b.node_mask), label,
            ))
            count += int(label.shape[0])
        return total / max(count, 1)

    rng = np.random.default_rng(seed)
    best_mae, best_params = np.inf, params
    history: Dict[str, Any] = {"train_loss": [], "valid_mae": []}
    step = 0
    for epoch in range(epochs):
        epoch_losses = []
        for b, label in _property_batches(train_ds, prop, batch_size, pad_to, True, rng):
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(b.one_hot), jnp.asarray(b.x),
                jnp.asarray(b.node_mask), label,
            )
            # keep losses as device arrays in-loop: float(loss) every step is
            # a device->host sync, and over the remote-TPU tunnel one round
            # trip per step dominates (train/loop.py learned the same lesson)
            epoch_losses.append(loss)
            if step % log_every == 0:
                log.info(f"classifier epoch {epoch} step {step}: L1={float(loss):.4f}")
            step += 1
        history["train_loss"].append(float(np.mean([np.asarray(l) for l in epoch_losses])))
        if valid_ds is not None:
            mae = run_eval(params, valid_ds)
            history["valid_mae"].append(mae)
            if mae < best_mae:
                best_mae, best_params = mae, params
            log.info(f"classifier epoch {epoch}: valid MAE={mae:.4f} (best {best_mae:.4f})")
        else:
            best_params = params
    history["best_valid_mae"] = float(best_mae) if np.isfinite(best_mae) else None
    return classifier, best_params, norms, history
