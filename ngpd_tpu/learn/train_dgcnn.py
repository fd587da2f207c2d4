"""Legacy-track trainer: the DGCNN patch->normal regression.

The reference trains this network twice over — DenoisingGCN/train.py
(Adam lr=1e-4, loss = alpha*cosine_embedding + beta*mse with alpha=0,
beta=1, train.py:92-124) and NetworkController.NetworkTrainer
(PatchGeneration/Modules/Network/NetworkController.py:54-185) — always
on one CUDA GPU. Here the train step is jitted over a
``jax.sharding.Mesh`` and the batch is placed with a ``dp``-sharded
NamedSharding, so the same code runs 1-chip or N-chip (GSPMD inserts
the gradient all-reduce); without a mesh it is a plain ``jax.jit``.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dgcnn import DGCNN
from .dataset import _tree_take
from .train import EarlyStopping, MetricLogger, TrainState


def init_dgcnn(
    rng: jax.Array,
    emb_dims: int = 1024,
    learning_rate: float = 1e-4,
    num_nodes: int = 64,
    decay_steps: Optional[int] = None,
):
    """Model + state + optimizer (DGCNN(8, 17, 1024, 0.5), Adam 1e-4 —
    train.py:85-92 / parsers.py:8). ``decay_steps`` switches the
    constant rate to a cosine decay over that many steps (the
    reference's StepLR×0.5/50ep analog for short budgets)."""
    model = DGCNN(emb_dims=emb_dims)
    dummy = jnp.zeros((2, 20, num_nodes), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    if decay_steps:
        sched = optax.cosine_decay_schedule(
            learning_rate, decay_steps, alpha=0.05
        )
        tx = optax.adam(sched)
    else:
        tx = optax.adam(learning_rate)
    state = TrainState.create(variables, tx, rng)
    return model, state, tx


def dgcnn_losses(pred: jnp.ndarray, target: jnp.ndarray) -> dict:
    """The legacy loss pair (train.py:96-97,124): cosine-embedding with
    target 1 (mean of 1 - cos) and plain MSE."""
    pn = pred / jnp.maximum(
        jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12
    )
    tn = target / jnp.maximum(
        jnp.linalg.norm(target, axis=-1, keepdims=True), 1e-12
    )
    cos = jnp.mean(1.0 - jnp.sum(pn * tn, axis=-1))
    mse = jnp.mean((pred - target) ** 2)
    # Mean angular error in degrees — the evaluation the C++ app prints
    # (MeshDenoisingBase.cpp:145-165), handy to monitor directly.
    ang = jnp.rad2deg(
        jnp.mean(jnp.arccos(jnp.clip(jnp.sum(pn * tn, axis=-1), -1, 1)))
    )
    return {"cos_loss": cos, "mse_loss": mse, "angular_deg": ang}


def make_dgcnn_train_step(
    model: DGCNN,
    tx: optax.GradientTransformation,
    alpha: float = 0.0,
    beta: float = 1.0,
):
    def step(state: TrainState, batch: dict):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            metrics = dgcnn_losses(out, batch["y"])
            loss = alpha * metrics["cos_loss"] + beta * metrics["mse_loss"]
            return loss, (metrics, updates["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
                rng=rng,
            ),
            {**metrics, "loss": loss},
        )

    return step


def make_dgcnn_eval_step(model: DGCNN):
    def step(state: TrainState, batch: dict):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["x"],
            train=False,
        )
        return dgcnn_losses(out, batch["y"])

    return step


def make_dgcnn_scan_steps(model, tx, alpha=0.0, beta=1.0):
    """(train, eval) supersteps scanning many minibatches per dispatch.

    Per-step Python dispatch through a remote-device tunnel costs
    ~100-300 ms of round-trip latency — at ~3k steps/epoch that is the
    whole epoch. With the split staged on device (``data``: x (N,20,P),
    y (N,3)) and passed as an explicit argument (NOT a closure — a
    captured dict would be embedded as a compiled-program constant), a
    jitted ``lax.scan`` over an (S, B) index block runs S optimizer
    steps per dispatch; the gathers happen on device. Wired into
    :func:`fit_dgcnn` via ``scan_steps``; per-step parity is pinned by
    tests/test_train_dgcnn.py.
    """
    step = make_dgcnn_train_step(model, tx, alpha, beta)
    estep = make_dgcnn_eval_step(model)

    def train_block(state: TrainState, data: dict, sel_block: jnp.ndarray):
        def body(st, sel):
            batch = {k: jnp.take(v, sel, axis=0) for k, v in data.items()}
            return step(st, batch)

        state, ms = jax.lax.scan(body, state, sel_block)
        return state, {k: jnp.mean(v) for k, v in ms.items()}

    def eval_block(state: TrainState, data: dict, sel_block: jnp.ndarray):
        def body(carry, sel):
            batch = {k: jnp.take(v, sel, axis=0) for k, v in data.items()}
            return carry, estep(state, batch)

        _, ms = jax.lax.scan(body, None, sel_block)
        return {k: jnp.mean(v) for k, v in ms.items()}

    return (
        jax.jit(train_block, donate_argnums=0),
        jax.jit(eval_block),
    )


class ShardStore:
    """In-memory patch store streaming shuffled batches from the npz
    shards written by meshproc.collector — the MatrixDataset/DataLoader
    replacement (datautils.py:16-91) without worker processes: batches
    are device-resident slices, not host-side collation."""

    def __init__(self, shard_paths: Sequence[str], val_fraction: float = 0.1,
                 seed: int = 0, max_patches: Optional[int] = None):
        xs, ys = [], []
        for p in shard_paths:
            d = np.load(p)
            xs.append(np.asarray(d["x"], np.float32))
            ys.append(np.asarray(d["y"], np.float32))
        x = np.concatenate(xs, axis=0)
        y = np.concatenate(ys, axis=0)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(x))
        x, y = x[perm], y[perm]
        if max_patches is not None and len(x) > max_patches:
            # Uniform subsample (post-shuffle prefix): budget-bound
            # fine-tunes don't need the full corpus per epoch.
            x, y = x[:max_patches], y[:max_patches]
        n_val = int(len(x) * val_fraction)
        self.val = {"x": x[:n_val], "y": y[:n_val]}
        self.train = {"x": x[n_val:], "y": y[n_val:]}
        self._rng = rng
        self._dev: dict = {}

    # See PatchDataset.DEVICE_STAGE_BYTES: staging the split on device
    # once turns ~30 ms-per-batch tunnel transfers into ~1 ms on-device
    # gathers.
    DEVICE_STAGE_BYTES = int(os.environ.get("NGPD_STAGE_BYTES", 2 << 30))

    def _staged(self, split: str):
        if split not in self._dev:
            data = getattr(self, split)
            total = data["x"].nbytes + data["y"].nbytes
            self._dev[split] = (
                {k: jnp.asarray(v) for k, v in data.items()}
                if total <= self.DEVICE_STAGE_BYTES
                else False
            )
        return self._dev[split]

    def batches(
        self, split: str, batch_size: int, shuffle: bool = True
    ) -> Iterator[dict]:
        data = getattr(self, split)
        n = len(data["x"])
        order = self._rng.permutation(n) if shuffle else np.arange(n)
        dev = self._staged(split)
        for s in range(0, n - batch_size + 1, batch_size):
            sel = order[s : s + batch_size]
            if dev:
                yield _tree_take(dev, jnp.asarray(sel))
            else:
                yield {"x": data["x"][sel], "y": data["y"][sel]}

    def staged(self, split: str) -> dict:
        """Device-resident split for the scan-superstep path (the whole
        split must live on device for on-device gathers)."""
        dev = self._staged(split)
        if dev is False:
            raise ValueError(
                f"{split} split exceeds NGPD_STAGE_BYTES "
                f"({self.DEVICE_STAGE_BYTES}); the scan path needs the "
                "split staged on device — raise the budget or use the "
                "per-step path"
            )
        return dev

    def sel_blocks(
        self, split: str, batch_size: int, scan_steps: int,
        shuffle: bool = True,
    ) -> Iterator[np.ndarray]:
        """(S, B) index blocks covering the split's full batches: the
        first blocks carry ``scan_steps`` batches each; a shorter tail
        block (one extra compile shape) keeps coverage identical to
        :meth:`batches`."""
        n = len(getattr(self, split)["x"])
        order = self._rng.permutation(n) if shuffle else np.arange(n)
        n_full = n // batch_size
        flat = order[: n_full * batch_size].reshape(n_full, batch_size)
        for s in range(0, n_full, scan_steps):
            yield flat[s : s + scan_steps]


def _batch_sharding(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return {
        "x": NamedSharding(mesh, P("dp", None, None)),
        "y": NamedSharding(mesh, P("dp", None)),
    }


def fit_dgcnn(
    model: DGCNN,
    state: TrainState,
    tx: optax.GradientTransformation,
    store: ShardStore,
    batch_size: int = 256,
    num_epochs: int = 24,
    alpha: float = 0.0,
    beta: float = 1.0,
    patience: int = 10,
    log_dir: str | Path = "logs/dgcnn",
    checkpoint_dir: Optional[str | Path] = None,
    mesh: Optional[Mesh] = None,
    train_step=None,
    eval_step=None,
    scan_steps: int = 0,
) -> TrainState:
    """Epoch loop (train.py:94-168): per-epoch validation, top-k
    checkpoints, early stopping. With ``mesh``, state is replicated and
    every batch is dp-sharded across the mesh before the jitted step.
    Pass prebuilt jitted ``train_step``/``eval_step`` to reuse their
    compile cache across several fits in one process.

    ``scan_steps > 0`` switches to the lax.scan superstep path (S
    optimizer steps per dispatch, splits staged on device) — the remote
    -tunnel latency amortization of :func:`make_dgcnn_scan_steps`;
    single-device only (per-batch parity: tests/test_train_dgcnn.py)."""
    from .checkpoints import CheckpointManager

    if scan_steps:
        if mesh is not None:
            raise ValueError(
                "scan_steps amortizes per-step dispatch on ONE device; "
                "with a mesh, use the dp-sharded per-step path"
            )
        train_block, eval_block = make_dgcnn_scan_steps(
            model, tx, alpha, beta
        )
        staged = {s: store.staged(s) for s in ("train", "val")}
    if train_step is None:
        train_step = jax.jit(make_dgcnn_train_step(model, tx, alpha, beta))
    if eval_step is None:
        eval_step = jax.jit(make_dgcnn_eval_step(model))
    logger = MetricLogger(log_dir)
    stopper = EarlyStopping(patience)
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None

    bshard = _batch_sharding(mesh)
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)

    def put(batch):
        if bshard is None:
            return batch
        return {k: jax.device_put(v, bshard[k]) for k, v in batch.items()}

    from .train import _acc_metrics

    best = state
    for epoch in range(num_epochs):
        t0 = time.time()
        # On-device metric accumulation: per-step float() pulls are
        # blocking round-trips that dominate on remote devices.
        acc, n_b, last_beat = None, 0, time.time()
        if scan_steps:
            for blk in store.sel_blocks("train", batch_size, scan_steps):
                state, metrics = train_block(
                    state, staged["train"], jnp.asarray(blk)
                )
                # Block metrics are means over len(blk) steps — weight
                # so uneven tail blocks do not skew the epoch mean.
                metrics = {k: v * len(blk) for k, v in metrics.items()}
                acc = metrics if acc is None else _acc_metrics(acc, metrics)
                n_b += len(blk)
        else:
            for batch in store.batches("train", batch_size):
                state, metrics = train_step(state, put(batch))
                acc = metrics if acc is None else _acc_metrics(acc, metrics)
                n_b += 1
                if time.time() - last_beat > 120:
                    print(f"epoch {epoch}: step {n_b}...", flush=True)
                    last_beat = time.time()
        if acc is None:
            raise ValueError(
                f"no full train batches: split has {len(store.train['x'])} "
                f"patches < batch_size {batch_size} — shrink the batch or "
                "add data"
            )
        train_metrics = {k: float(v) / n_b for k, v in acc.items()}
        logger.log(epoch, "train", train_metrics)

        acc, n_b = None, 0
        if scan_steps:
            for blk in store.sel_blocks(
                "val", batch_size, scan_steps, shuffle=False
            ):
                metrics = eval_block(state, staged["val"], jnp.asarray(blk))
                metrics = {k: v * len(blk) for k, v in metrics.items()}
                acc = metrics if acc is None else _acc_metrics(acc, metrics)
                n_b += len(blk)
        else:
            for batch in store.batches("val", batch_size, shuffle=False):
                metrics = eval_step(state, put(batch))
                acc = metrics if acc is None else _acc_metrics(acc, metrics)
                n_b += 1
        val_metrics = (
            {k: float(v) / n_b for k, v in acc.items()} if acc else {}
        )
        if not val_metrics:
            val_metrics = dict(train_metrics)
        logger.log(epoch, "val", val_metrics)
        monitored = val_metrics["mse_loss"]
        print(
            f"epoch {epoch}: train mse {train_metrics['mse_loss']:.5f} "
            f"val mse {monitored:.5f} val ang {val_metrics['angular_deg']:.2f}deg "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
        if ckpt is not None:
            ckpt.save(epoch, state, monitored)
        if monitored <= stopper.best:
            best = state
        if stopper.update(monitored):
            print(f"early stop at epoch {epoch} (best {stopper.best:.5f})")
            break
    return best


def dgcnn_variables(state: TrainState) -> dict:
    return {"params": state.params, "batch_stats": state.batch_stats}
