"""Training driver — the Manager equivalent (Manager.py:32-170).

optax Adam (lr from TrainConfig, Config.py:8), orbax checkpointing of
the top-k models on the monitored sign-invariant loss
(Manager.py:56-61), early stopping with patience (Manager.py:63), and a
data-parallel training step jitted over a device mesh — the layer the
reference leaves single-GPU (Config.py:43-44).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import ModelConfig, TrainConfig
from ..models.patch2normal import Patch2NormalModel
from . import losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, variables, tx, rng):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(variables["params"]),
            rng=rng,
        )


def init_model(
    model_cfg: ModelConfig, train_cfg: TrainConfig, rng: jax.Array
) -> tuple[Patch2NormalModel, TrainState, optax.GradientTransformation]:
    model = Patch2NormalModel(model_cfg)
    p, k = model_cfg.patch_size, model_cfg.patch_k
    dummy = (
        jnp.zeros((2, p, model_cfg.input_size)),
        jnp.zeros((2, p, k), jnp.int32),
        jnp.ones((2, p, k), bool),
        jnp.ones((2, p), bool),
    )
    variables = model.init(rng, *dummy, train=False)
    tx = optax.adam(train_cfg.learning_rate)  # Model.py:225-226
    state = TrainState.create(variables, tx, rng)
    return model, state, tx


@jax.jit
def _acc_metrics(acc, metrics):
    """Running on-device sum of a metrics dict — one async dispatch per
    step instead of one blocking host transfer per metric."""
    return jax.tree_util.tree_map(jnp.add, acc, metrics)


def make_train_step(
    model: Patch2NormalModel,
    tx: optax.GradientTransformation,
    loss_key: str = "custom_val_loss",
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """One optimization step; the loss minimized is the sign-invariant
    custom_val_loss (the reference's training_step returns it as 'loss',
    Model.py:169)."""

    def step(state: TrainState, batch: dict):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"],
                batch["nbr_idx"],
                batch["nbr_mask"],
                batch["node_mask"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            metrics = losses.all_losses(out, batch["y"])
            return metrics[loss_key], (metrics, updates["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            rng=rng,
        )
        return new_state, metrics

    return step


def make_eval_step(model: Patch2NormalModel):
    def step(state: TrainState, batch: dict):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["x"],
            batch["nbr_idx"],
            batch["nbr_mask"],
            batch["node_mask"],
            train=False,
        )
        return losses.all_losses(out, batch["y"])

    return step


def make_predict_step(model: Patch2NormalModel):
    """L2-normalized predictions (Model.py:217-223)."""

    def step(state: TrainState, batch: dict):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["x"],
            batch["nbr_idx"],
            batch["nbr_mask"],
            batch["node_mask"],
            train=False,
        )
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)

    return step


@dataclasses.dataclass
class EarlyStopping:
    """EarlyStopping(patience) on the monitored loss (Manager.py:63)."""

    patience: int = 10
    best: float = float("inf")
    bad_epochs: int = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        if value < self.best:
            self.best = value
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs > self.patience


class MetricLogger:
    """JSONL metric log — the TensorBoardLogger/log_dict replacement
    (Manager.py:36, Model.py:153-203) without a TB dependency."""

    def __init__(self, log_dir: str | Path, name: str = "metrics"):
        self.path = Path(log_dir)
        self.path.mkdir(parents=True, exist_ok=True)
        self.file = self.path / f"{name}.jsonl"

    def log(self, step: int, split: str, metrics: dict):
        rec = {"step": int(step), "split": split, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.file, "a") as f:
            f.write(json.dumps(rec) + "\n")


def _patch_batch_sharding(mesh):
    """dp-sharded placement for the Patch2Normal batch dict."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = {
        "x": P("dp", None, None),
        "nbr_idx": P("dp", None, None),
        "nbr_mask": P("dp", None, None),
        "node_mask": P("dp", None),
        "y": P("dp", None),
    }
    return {k: NamedSharding(mesh, s) for k, s in spec.items()}


def fit(
    model: Patch2NormalModel,
    state: TrainState,
    tx: optax.GradientTransformation,
    train_batches: Callable[[], Iterator[dict]],
    val_batches: Callable[[], Iterator[dict]],
    train_cfg: TrainConfig = TrainConfig(),
    log_dir: str | Path = "logs",
    checkpoint_dir: Optional[str | Path] = None,
    mesh=None,
) -> TrainState:
    """Epoch loop with validation, early stopping, checkpointing — the
    Manager.train/validate flow (Manager.py:73-143).

    With ``mesh`` (a jax.sharding.Mesh with a "dp" axis) the state is
    replicated once and every host batch is placed with a dp-sharded
    NamedSharding before the jitted step — GSPMD inserts the gradient
    all-reduce. This is the data-parallel layer the reference leaves
    single-GPU (Config.py:43-44)."""
    from .checkpoints import CheckpointManager

    train_step = jax.jit(make_train_step(model, tx))
    eval_step = jax.jit(make_eval_step(model))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = jax.device_put(state, NamedSharding(mesh, P()))
        bshard = _patch_batch_sharding(mesh)

        def _put(batch):
            return {k: jax.device_put(v, bshard[k]) for k, v in batch.items()}

    else:

        def _put(batch):
            return batch
    logger = MetricLogger(log_dir)
    stopper = EarlyStopping(train_cfg.early_stopping_patience)
    ckpt = (
        CheckpointManager(checkpoint_dir, top_k=train_cfg.checkpoint_top_k)
        if checkpoint_dir
        else None
    )

    for epoch in range(train_cfg.num_epochs):
        # Metrics accumulate ON DEVICE; pulling each scalar to the host
        # per step is a blocking round-trip that can dominate the step
        # itself on remote devices.
        acc, n_b = None, 0
        last_beat = time.time()
        for batch in train_batches():
            state, metrics = train_step(state, _put(batch))
            acc = metrics if acc is None else _acc_metrics(acc, metrics)
            n_b += 1
            if time.time() - last_beat > 120:
                print(f"epoch {epoch}: step {n_b}...", flush=True)
                last_beat = time.time()
        train_metrics = (
            {k: float(v) / n_b for k, v in acc.items()} if acc else {}
        )
        logger.log(epoch, "train", train_metrics)

        acc, n_b = None, 0
        for batch in val_batches():
            metrics = eval_step(state, _put(batch))
            acc = metrics if acc is None else _acc_metrics(acc, metrics)
            n_b += 1
        val_metrics = (
            {k: float(v) / n_b for k, v in acc.items()} if acc else {}
        )
        if not val_metrics:
            # Tiny datasets can yield zero full validation batches; fall
            # back to monitoring the training loss.
            val_metrics = dict(train_metrics)
        logger.log(epoch, "val", val_metrics)
        monitored = val_metrics.get(
            train_cfg.monitor.replace("val_", ""), val_metrics["custom_val_loss"]
        )
        print(
            f"epoch {epoch}: train {train_metrics.get('custom_val_loss'):.5f} "
            f"val {monitored:.5f}"
        )
        if ckpt is not None:
            ckpt.save(epoch, state, monitored)
        if epoch + 1 >= train_cfg.min_epochs and stopper.update(monitored):
            print(f"early stop at epoch {epoch} (best {stopper.best:.5f})")
            break
    return state
