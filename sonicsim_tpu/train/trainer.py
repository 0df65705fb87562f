"""Data-parallel trainer: the reference's Lightning+DDP stack, TPU-native.

Replaces AudioLightningModule + pl.Trainer(DDPStrategy)
(separation/look2hear/system/audio_litmodule.py:36-211, train.py:28-109):
a jitted train step compiled once over a device mesh; batches are sharded
on the 'data' axis, params replicated, and XLA inserts the gradient psum —
no NCCL, no process groups. Host-side epoch loop handles LR plateau control,
early stopping, top-k checkpointing and CSV logging.
"""

from __future__ import annotations

import itertools
import json
import logging
import math
import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.base import BaseModel, save_model
from ..parallel.mesh import batch_sharding, make_mesh, replicate, replicated_sharding
from .schedulers import EarlyStopping, ReduceLROnPlateau

logger = logging.getLogger(__name__)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    clip_norm: float | None = 5.0,
    name: str = "adam",
    **kwargs,
) -> optax.GradientTransformation:
    """Named-optimizer factory behind a dynamic (injected) LR.

    Mirrors the reference's optimizer zoo re-exports + make_optimizer
    factory (look2hear/system/optimizers.py:8-113) on optax: adam, adamw,
    sgd, rmsprop, adagrad, adadelta, lamb, lars, radam, adafactor, novograd,
    yogi, adabelief, lion. Gradient clipping matches trainer
    gradient_clip_val (configs/convtasnet.yaml)."""
    table = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
        "adagrad": optax.adagrad,
        "adadelta": optax.adadelta,
        "lamb": optax.lamb,
        "lars": optax.lars,
        "radam": optax.radam,
        "adafactor": optax.adafactor,
        "novograd": optax.novograd,
        "yogi": optax.yogi,
        "adabelief": optax.adabelief,
        "lion": optax.lion,
    }
    key = name.lower()
    if key not in table:
        raise KeyError(f"unknown optimizer {name!r}; known: {sorted(table)}")
    if weight_decay and key in ("adam",):
        key = "adamw"
    fn = table[key]
    if weight_decay and "weight_decay" in fn.__code__.co_varnames:
        kwargs["weight_decay"] = weight_decay
    steps = []
    if clip_norm is not None:
        steps.append(optax.clip_by_global_norm(clip_norm))
    steps.append(optax.inject_hyperparams(fn)(learning_rate=lr, **kwargs))
    return optax.chain(*steps)


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Update the injected learning_rate hyperparam inside a chain state."""

    def _set(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return s

    return jax.tree.map(
        _set, opt_state, is_leaf=lambda s: hasattr(s, "hyperparams")
    )


def make_train_step(model: BaseModel, loss_fn: Callable, optimizer,
                    precision: str = "f32") -> Callable:
    """Build the jitted (state, mix, targets) → (state, loss) step.

    ``precision='bf16'`` runs the forward/backward compute in bfloat16
    (MXU-native) with fp32 master weights: params are cast inside the
    traced function (XLA folds the casts — no double storage), the loss
    and its gradient come back as bf16 compute, and the optimizer update
    accumulates in fp32. The reference trains fp32
    (audio_litmodule.py + set_float32_matmul_precision('highest')); this
    is the TPU-native mixed-precision option on top of that contract.
    """
    if precision not in ("f32", "bf16"):
        raise ValueError(f"unsupported precision {precision!r}")

    def step(params, opt_state, mix, targets):
        def loss_of(p):
            if precision == "bf16":
                from ..infer.precision import cast_floating

                p = cast_floating(p)
                ests = model.apply(p, jnp.asarray(mix, jnp.bfloat16))
                return loss_fn(
                    jnp.asarray(ests, jnp.float32), targets
                )
            ests = model.apply(p, mix)
            return loss_fn(ests, targets)

        # grads come back fp32 either way: the VJP of the in-trace bf16
        # cast casts cotangents back to the fp32 param dtype.
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_eval_step(model: BaseModel, metric_fn: Callable) -> Callable:
    def step(params, mix, targets):
        return metric_fn(model.apply(params, mix), targets)

    return step


def _val_shards(mix, targets, divisor: int):
    """Split a ragged val batch into DP-shardable pieces with exact weights.

    Yields ``(mix, targets, n_real)`` pieces whose per-piece metric means,
    weighted by ``n_real`` and summed, reproduce the real batch's mean
    exactly. The divisor-multiple prefix passes through untouched; only the
    remainder ``r = B % divisor`` is tiled, to ``lcm(r, divisor)`` items
    where every real item appears the SAME number of times (an unweighted
    mean over the tile is then exact). Tiling the remainder instead of the
    whole batch bounds the padding at ``< divisor**2`` items regardless of
    B — tiling the full batch to ``lcm(B, divisor)`` is a B*divisor blowup
    when they are coprime (val batch 31 on 8 devices -> 248 items), enough
    to OOM on val batches sized near the training batch. Dropping ragged
    batches (the original behavior) is worst of all: with a small fixed
    val set and many devices EVERY batch can be ragged and val_loss
    silently degrades to train_loss."""
    b = len(mix)
    k = (b // divisor) * divisor
    if k:
        yield mix[:k], targets[:k], k
    r = b - k
    if r:
        reps = math.lcm(r, divisor) // r
        yield (
            np.concatenate([mix[k:]] * reps, axis=0),
            np.concatenate([targets[k:]] * reps, axis=0),
            r,
        )


def _replicate_tree(tree: Any, rep) -> Any:
    """Place every array leaf of ``tree`` on the replicated sharding
    (non-array leaves — step counts, schedules — pass through)."""
    return jax.tree.map(
        lambda a: jax.device_put(a, rep) if hasattr(a, "shape") else a, tree
    )


@dataclass
class Trainer:
    """Epoch-driven fit loop with plateau LR, early stop, top-k checkpoints."""

    model: BaseModel
    loss_fn: Callable
    metric_fn: Callable | None = None
    lr: float = 1e-3
    weight_decay: float = 0.0
    clip_norm: float | None = 5.0
    max_epochs: int = 500
    patience_lr: int = 10
    lr_factor: float = 0.5
    patience_stop: int = 20
    save_top_k: int = 5
    exp_dir: str | Path = "Exps/run"
    n_devices: int | None = None
    log_every: int = 50
    optimizer_name: str = "adam"
    precision: str = "f32"  # 'bf16': MXU compute with fp32 master weights
    wandb_project: str | None = None  # optional W&B mirror of the JSONL log
    history: list = field(default_factory=list)

    def _init_wandb(self):
        if not self.wandb_project:
            return None
        try:
            import wandb

            return wandb.init(
                project=self.wandb_project, name=Path(self.exp_dir).name
            )
        except ImportError:
            return None

    def _val_loss(self, eval_step, params, batches) -> float | None:
        """Weighted mean of the val metric over ``batches``, exact under
        ragged batches: each batch is split by ``_val_shards`` and the
        per-shard means are recombined weighted by real item count."""
        total, n = 0.0, 0
        for m, t in batches:
            for ms, ts, w in _val_shards(
                np.asarray(m), np.asarray(t), self._batch_divisor
            ):
                v = eval_step(params, jnp.asarray(ms), jnp.asarray(ts))
                total += float(v) * w
                n += w
        return (total / n) if n else None

    # ---- full-state checkpointing (orbax): params + optimizer + loop ----
    def _save_last(self, exp_dir: Path, state, epoch: int, plateau, stopper,
                   best_k) -> None:
        """Crash-safe resume point: the FULL TrainState (params AND optimizer
        state via orbax, sharded-array aware) + loop state (schedulers,
        early-stop counters, top-k table, history) — the Lightning
        `last.ckpt` role the portable pickle export does not cover."""
        import orbax.checkpoint as ocp

        last = exp_dir / "checkpoints" / "last"
        last.mkdir(parents=True, exist_ok=True)
        ocp.PyTreeCheckpointer().save(
            str((last / "state").resolve()),
            {"params": state.params, "opt_state": state.opt_state},
            force=True,
        )
        def scalars(obj):
            return {k: v for k, v in obj.__dict__.items()
                    if isinstance(v, (int, float, str, bool))}

        # meta.json is the resume commit marker: written LAST (after the
        # orbax state) and atomically (tmp + os.replace), so a crash at
        # any point leaves either the previous complete resume point or
        # the new one — never a truncated/desynchronized marker.
        tmp = last / "meta.json.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "epoch": epoch,
                    "step": state.step,
                    "plateau": scalars(plateau),
                    "stopper": scalars(stopper),
                    "best_k": best_k,
                    "history": self.history,
                },
                f,
            )
        os.replace(tmp, last / "meta.json")

    def _restore_last(self, exp_dir: Path, template_params, template_opt,
                      plateau, stopper):
        """→ (params, opt_state, next_epoch, step, best_k) or None."""
        import orbax.checkpoint as ocp

        last = exp_dir / "checkpoints" / "last"
        if not (last / "meta.json").exists():
            return None
        restored = ocp.PyTreeCheckpointer().restore(
            str((last / "state").resolve()),
            item={"params": template_params, "opt_state": template_opt},
        )
        with open(last / "meta.json") as f:
            meta = json.load(f)
        plateau.__dict__.update(meta["plateau"])
        stopper.__dict__.update(meta["stopper"])
        self.history = meta["history"]
        best_k = [(float(v), p) for v, p in meta["best_k"]]
        logger.info("resuming from epoch %d", meta["epoch"] + 1)
        return (restored["params"], restored["opt_state"],
                int(meta["epoch"]) + 1, int(meta["step"]), best_k)

    def fit(
        self,
        train_batches: Callable[[int], Iterable],
        val_batches: Callable[[], Iterable] | None = None,
        rng: jax.Array | None = None,
        example_len: int = 32000,
        resume: bool = False,
    ) -> TrainState:
        """``resume=True`` continues from <exp_dir>/checkpoints/last
        (params, optimizer state, LR-plateau/early-stop counters, top-k
        table) when present; silently starts fresh otherwise."""
        exp_dir = Path(self.exp_dir)
        (exp_dir / "checkpoints").mkdir(parents=True, exist_ok=True)

        # Mesh size must divide the batch; peek the first batch to choose the
        # largest compatible device count (ragged trailing batches are
        # dropped below, standard drop_last semantics). The peeked batch is
        # chained back into epoch 0 below so single-iterator loaders are not
        # short one batch and factory loaders don't render it twice.
        first_iter = iter(train_batches(0))
        first = next(first_iter, None)
        batch_dim = len(first[0]) if first is not None else 1
        avail = len(jax.devices())
        limit = min(self.n_devices, avail) if self.n_devices else avail
        if self.n_devices and self.n_devices > avail:
            logger.warning(
                "n_devices=%d exceeds available devices (%d); clamping",
                self.n_devices, avail,
            )
        n_dev = max(d for d in range(1, limit + 1) if batch_dim % d == 0)
        mesh = make_mesh(n_dev)
        self._batch_divisor = n_dev
        data_shard = batch_sharding(mesh)
        rep = replicated_sharding(mesh)

        wb = self._init_wandb()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = self.model.init_params(rng, example_len)
        optimizer = make_optimizer(
            self.lr, self.weight_decay, self.clip_norm, name=self.optimizer_name
        )
        opt_state = optimizer.init(params)
        params = replicate(params, mesh)
        opt_state = _replicate_tree(opt_state, rep)

        raw_step = make_train_step(
            self.model, self.loss_fn, optimizer, precision=self.precision
        )
        train_step = jax.jit(
            raw_step,
            in_shardings=(rep, None, data_shard, data_shard),
            out_shardings=(rep, None, rep),
            donate_argnums=(0, 1),
        )
        # Validation metric defaults to the training loss when no dedicated
        # metric_fn is provided (the reference's val_loss behavior).
        eval_step = jax.jit(
            make_eval_step(self.model, self.metric_fn or self.loss_fn),
            in_shardings=(rep, data_shard, data_shard),
            out_shardings=rep,
        )

        plateau = ReduceLROnPlateau(self.lr, self.lr_factor, self.patience_lr)
        stopper = EarlyStopping(self.patience_stop)
        best_k: list[tuple[float, str]] = []
        state = TrainState(params, opt_state)
        start_epoch = 0
        if resume:
            hit = self._restore_last(
                exp_dir, jax.device_get(params), jax.device_get(opt_state),
                plateau, stopper,
            )
            if hit is not None:
                r_params, r_opt, start_epoch, step, best_k = hit
                state = TrainState(
                    replicate(r_params, mesh),
                    _replicate_tree(r_opt, rep),
                )
                state.step = step

        dropped_train = 0
        if val_batches is not None and start_epoch == 0:
            # Pre-training validation (epoch -1): the untrained baseline
            # every later epoch is compared against. Epoch 0's val runs
            # AFTER a full epoch of updates — on fast-learning fixtures
            # most of the improvement happens inside epoch 0, so without
            # this record "val[0] - best" wildly understates learning
            # (the artifact gate and the CPU learning-gate test both
            # measure from random init).
            t0 = time.time()
            base_loss = self._val_loss(eval_step, state.params, val_batches())
            if base_loss is not None:
                rec = {
                    "epoch": -1,
                    "val_loss": base_loss,
                    "lr": self.lr,
                    "seconds": time.time() - t0,
                }
                self.history.append(rec)
                with open(exp_dir / "metrics.jsonl", "a") as f:
                    f.write(json.dumps(rec) + "\n")
                if wb is not None:
                    wb.log(rec)
        for epoch in range(start_epoch, self.max_epochs):
            t0 = time.time()
            losses = []
            if epoch == 0 and first_iter is not None:
                # Re-attach the peeked batch: single-iterator loaders keep
                # their first batch, factory loaders don't produce it twice.
                batches = (itertools.chain([first], first_iter)
                           if first is not None else iter(()))
            else:
                batches = train_batches(epoch)
            first_iter = None
            for i, (mix, targets) in enumerate(batches):
                if len(mix) % self._batch_divisor:
                    # drop_last semantics, but never silently: with a small
                    # fixed eval set whole batches can vanish otherwise.
                    dropped_train += 1
                    if dropped_train <= 3 or epoch == 0:
                        logger.warning(
                            "dropping ragged train batch of %d (not divisible "
                            "by %d devices), epoch %d",
                            len(mix), self._batch_divisor, epoch,
                        )
                    continue
                state.params, state.opt_state, loss = train_step(
                    state.params, state.opt_state, jnp.asarray(mix), jnp.asarray(targets)
                )
                state.step += 1
                losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

            val_loss = train_loss
            if val_batches is not None:
                vl = self._val_loss(eval_step, state.params, val_batches())
                val_loss = vl if vl is not None else train_loss

            new_lr = plateau.step(val_loss)
            state.opt_state = set_learning_rate(state.opt_state, new_lr)
            rec = {
                "epoch": epoch,
                "train_loss": train_loss,
                "val_loss": val_loss,
                "lr": new_lr,
                "seconds": time.time() - t0,
            }
            self.history.append(rec)
            with open(exp_dir / "metrics.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
            if wb is not None:
                wb.log(rec)

            ckpt = exp_dir / "checkpoints" / f"epoch={epoch}-val_loss={val_loss:.4f}.pkl"
            # NaN/inf epochs never enter top-k: a NaN entry defeats the
            # sort (every comparison is False) and could sit at best_k[0]
            # forever, exporting a diverged best_model.pkl.
            if math.isfinite(val_loss) and (
                len(best_k) < self.save_top_k or val_loss < best_k[-1][0]
            ):
                save_model(self.model, state.params, ckpt)
                best_k.append((val_loss, str(ckpt)))
                best_k.sort(key=lambda kv: kv[0])
                for _, stale in best_k[self.save_top_k :]:
                    Path(stale).unlink(missing_ok=True)
                best_k = best_k[: self.save_top_k]
                with open(exp_dir / "best_k_models.json", "w") as f:
                    json.dump({p: v for v, p in best_k}, f, indent=2)

            should_stop = stopper.step(val_loss)
            self._save_last(exp_dir, state, epoch, plateau, stopper, best_k)
            if should_stop:
                break

        # Export portable best model (train.py:100-105 equivalent).
        if best_k:
            import pickle

            with open(best_k[0][1], "rb") as f:
                pack = pickle.load(f)
            with open(exp_dir / "best_model.pkl", "wb") as f:
                pickle.dump(pack, f)
        else:
            save_model(self.model, state.params, exp_dir / "best_model.pkl")
        return state
