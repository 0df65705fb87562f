"""Tests: data-parallel train step over the 8-device CPU mesh; trainer loop."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from sonicsim_tpu.losses import PairwiseNegSDR, PITLossWrapper
from sonicsim_tpu.models import ConvTasNet
from sonicsim_tpu.parallel import batch_sharding, make_mesh, replicate, replicated_sharding
from sonicsim_tpu.train import (
    Trainer,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

SMALL = dict(N=16, L=16, B=8, H=16, P=3, X=1, R=1, num_spks=2)


def _data(rng, n=8, t=1600):
    mix = rng.standard_normal((n, t)).astype(np.float32)
    tgt = rng.standard_normal((n, 2, t)).astype(np.float32)
    return mix, tgt


def test_dp_train_step_runs_on_mesh(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    model = ConvTasNet(**SMALL)
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)
    params = model.init_params(jax.random.PRNGKey(0), example_len=1600)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)

    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    params = replicate(params, mesh)

    step = jax.jit(
        make_train_step(model, pit, opt),
        in_shardings=(rep, None, data, data),
        out_shardings=(rep, None, rep),
    )
    mix, tgt = _data(rng)
    p1, opt_state, loss1 = step(params, opt_state, jnp.asarray(mix), jnp.asarray(tgt))
    p2, opt_state, loss2 = step(p1, opt_state, jnp.asarray(mix), jnp.asarray(tgt))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # optimizing the same batch improves it


def test_dp_matches_single_device(rng):
    """Gradients averaged over the mesh == single-device full-batch gradients.

    (Compare gradients, not post-Adam params: one Adam step moves every
    param by ±lr·sign(g), so numerically-zero grads would flip randomly.)
    """
    model = ConvTasNet(**SMALL)
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)
    params0 = model.init_params(jax.random.PRNGKey(0), example_len=1600)
    mix, tgt = _data(rng)

    def grad_fn(p, m, t):
        return jax.grad(lambda pp: pit(model.apply(pp, m), t))(p)

    g_single = jax.jit(grad_fn)(params0, jnp.asarray(mix), jnp.asarray(tgt))

    mesh = make_mesh()
    rep, data = replicated_sharding(mesh), batch_sharding(mesh)
    g_dp = jax.jit(
        grad_fn, in_shardings=(rep, data, data), out_shardings=rep
    )(replicate(params0, mesh), jnp.asarray(mix), jnp.asarray(tgt))

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_set_learning_rate():
    model = ConvTasNet(**SMALL)
    params = model.init_params(jax.random.PRNGKey(0), example_len=800)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    new_state = set_learning_rate(opt_state, 5e-4)
    lrs = []

    def collect(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            lrs.append(float(s.hyperparams["learning_rate"]))
        return s

    jax.tree.map(collect, new_state, is_leaf=lambda s: hasattr(s, "hyperparams"))
    assert len(lrs) == 1 and abs(lrs[0] - 5e-4) < 1e-9


def test_trainer_fit_smoke(tmp_path, rng):
    model = ConvTasNet(**SMALL)
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)
    mix, tgt = _data(rng, n=8, t=1600)

    def train_batches(epoch):
        yield mix, tgt

    def val_batches():
        yield mix, tgt

    trainer = Trainer(
        model=model,
        loss_fn=pit,
        metric_fn=pit,
        lr=1e-3,
        max_epochs=2,
        save_top_k=1,
        exp_dir=tmp_path,
    )
    trainer.fit(train_batches, val_batches, example_len=1600)
    assert (tmp_path / "best_model.pkl").exists()
    assert (tmp_path / "best_k_models.json").exists()
    # epoch -1 (pre-training baseline) + 2 training epochs
    assert len(trainer.history) == 3
    assert [r["epoch"] for r in trainer.history] == [-1, 0, 1]
    assert trainer.history[2]["val_loss"] <= trainer.history[0]["val_loss"] + 1.0


def test_trainer_full_state_resume(tmp_path, rng):
    """fit → crash → fit(resume=True) continues at the next epoch with the
    saved optimizer/scheduler state (the Lightning last.ckpt role)."""
    from sonicsim_tpu.losses import PairwiseNegSDR, PITLossWrapper
    from sonicsim_tpu.models import ConvTasNet
    from sonicsim_tpu.train import Trainer

    t = 800
    mix = rng.standard_normal((4, t)).astype(np.float32)
    tgt = rng.standard_normal((4, 2, t)).astype(np.float32)

    def batches(epoch=0):
        return [(mix, tgt)]

    def make(max_epochs):
        return Trainer(
            model=ConvTasNet(N=16, L=16, B=8, H=16, P=3, X=1, R=1,
                             num_spks=2),
            loss_fn=PITLossWrapper(PairwiseNegSDR("snr"),
                                   threshold_byloss=False),
            lr=1e-3, max_epochs=max_epochs, save_top_k=1,
            exp_dir=tmp_path / "exp", n_devices=2,
        )

    state1 = make(2).fit(batches, batches, example_len=t)
    meta = json.loads(
        (tmp_path / "exp" / "checkpoints" / "last" / "meta.json").read_text()
    )
    assert meta["epoch"] == 1 and meta["step"] == 2

    tr2 = make(4)
    state2 = tr2.fit(batches, batches, example_len=t, resume=True)
    # Continued: epochs 2 and 3 ran on top of the restored state.
    assert [r["epoch"] for r in tr2.history] == [-1, 0, 1, 2, 3]
    assert state2.step == 4
    # Resumed params kept training (differ from the epoch-1 snapshot).
    flat1 = jax.tree.leaves(jax.device_get(state1.params))
    flat2 = jax.tree.leaves(jax.device_get(state2.params))
    assert any(
        not np.allclose(a, b) for a, b in zip(flat1, flat2)
    )
    # resume=True with no checkpoint silently starts fresh.
    tr3 = Trainer(
        model=ConvTasNet(N=16, L=16, B=8, H=16, P=3, X=1, R=1, num_spks=2),
        loss_fn=PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False),
        lr=1e-3, max_epochs=1, save_top_k=1,
        exp_dir=tmp_path / "fresh", n_devices=2,
    )
    tr3.fit(batches, None, example_len=t, resume=True)
    assert [r["epoch"] for r in tr3.history] == [0]


def test_bf16_train_step_tracks_f32(rng):
    """Mixed-precision training: bf16 compute with fp32 master weights
    makes optimization progress comparable to the fp32 step."""
    import optax

    model = ConvTasNet(**SMALL)
    loss_fn = PITLossWrapper(PairwiseNegSDR("sisdr"), pit_from="pw_mtx")
    mix, tgt = _data(rng, n=4)
    mix, tgt = jnp.asarray(mix), jnp.asarray(tgt)
    params0 = model.init_params(jax.random.PRNGKey(0), example_len=mix.shape[-1])
    opt = optax.adam(1e-3)

    losses = {}
    for precision in ("f32", "bf16"):
        step = jax.jit(make_train_step(model, loss_fn, opt, precision=precision))
        params, opt_state = params0, opt.init(params0)
        trace = []
        for _ in range(6):
            params, opt_state, loss = step(params, opt_state, mix, tgt)
            trace.append(float(loss))
        losses[precision] = trace
        # master weights stay fp32
        leaf = jax.tree.leaves(params)[0]
        assert leaf.dtype == jnp.float32

    for tr in losses.values():
        assert np.isfinite(tr).all()
        assert tr[-1] < tr[0]  # both precisions make progress
    # Same starting point, similar first-step loss (bf16 rounding only).
    assert abs(losses["bf16"][0] - losses["f32"][0]) < 0.1 * abs(losses["f32"][0]) + 0.5


def test_custom_exponential_lr_torch_parity():
    """CustomExponentialLR must match torch's schedule exactly, including
    the upstream quirks: the drop fires on user call step_size-1, lands at
    base*gamma (non-compounding), and never returns to base
    (reference system/schedulers.py:115-125)."""
    import pytest

    torch = pytest.importorskip("torch")
    from sonicsim_tpu.train.schedulers import CustomExponentialLR

    class _Ref(torch.optim.lr_scheduler._LRScheduler):
        def __init__(self, optimizer, gamma, step_size, last_epoch=-1):
            self.gamma = gamma
            self.step_size = step_size
            self.base_lrs_ = [g["lr"] for g in optimizer.param_groups]
            super().__init__(optimizer, last_epoch)

        def get_lr(self):
            if self.last_epoch == 0 or (
                self.last_epoch + 1
            ) % self.step_size != 0:
                return [g["lr"] for g in self.optimizer.param_groups]
            return [lr * self.gamma for lr in self.base_lrs_]

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.5)
    ref = _Ref(opt, gamma=0.1, step_size=5)
    ours = CustomExponentialLR(lr=0.5, gamma=0.1, step_size=5)
    for step in range(20):
        ref.step()
        torch_lr = opt.param_groups[0]["lr"]
        assert ours.step() == pytest.approx(torch_lr), f"step {step}"


def test_nan_val_epoch_never_enters_top_k(tmp_path, rng):
    """A diverged (NaN) validation epoch must not claim a top-k slot: a NaN
    entry defeats the sort (all comparisons False) and could be exported as
    best_model.pkl."""
    model = ConvTasNet(**SMALL)
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)
    mix, tgt = _data(np.random.default_rng(0), n=8, t=1600)
    calls = {"n": 0}

    def train_batches(epoch):
        yield mix, tgt

    def val_batches():
        calls["n"] += 1
        # calls 1 and 2 are the pre-training (epoch -1) baseline and
        # epoch 0 — both diverge; epoch 1 is finite.
        if calls["n"] <= 2:
            yield np.full_like(mix, np.nan), tgt
        else:
            yield mix, tgt

    trainer = Trainer(
        model=model, loss_fn=pit, metric_fn=pit, lr=1e-3,
        max_epochs=2, save_top_k=2, exp_dir=tmp_path,
    )
    trainer.fit(train_batches, val_batches, example_len=1600)
    # history[0] is the epoch -1 baseline, history[1] is epoch 0
    assert not np.isfinite(trainer.history[1]["val_loss"])
    bk = json.load(open(tmp_path / "best_k_models.json"))
    assert len(bk) == 1  # only the finite epoch made it
    assert all(np.isfinite(v) for v in bk.values())


def test_single_iterator_loader_trains_all_batches(tmp_path, rng):
    """The mesh-sizing peek must not eat the first batch of a loader that
    returns one shared iterator object."""
    model = ConvTasNet(**SMALL)
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)
    mix, tgt = _data(np.random.default_rng(1), n=8, t=1600)
    stream = iter([(mix, tgt), (mix, tgt)])

    trainer = Trainer(
        model=model, loss_fn=pit, lr=1e-3, max_epochs=1, exp_dir=tmp_path,
    )
    state = trainer.fit(lambda epoch: stream, example_len=1600)
    assert state.step == 2  # both batches trained, none double-trained


def test_n_devices_clamped_to_available(tmp_path, rng):
    """n_devices beyond the real device count must clamp, not build a mesh
    smaller than the batch divisor and crash the first step."""
    model = ConvTasNet(**SMALL)
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)
    mix, tgt = _data(np.random.default_rng(2), n=16, t=1600)

    trainer = Trainer(
        model=model, loss_fn=pit, lr=1e-3, max_epochs=1,
        n_devices=16, exp_dir=tmp_path,
    )
    trainer.fit(lambda epoch: iter([(mix, tgt)]), example_len=1600)
    assert trainer._batch_divisor <= len(jax.devices())


def test_plateau_threshold_rel_torch_parity():
    """torch ReduceLROnPlateau parity: float-noise creep (< rel threshold
    1e-4) is NOT improvement, so the LR decays on a slow plateau."""
    import pytest
    import torch

    from sonicsim_tpu.train.schedulers import ReduceLROnPlateau

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.5)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=3)
    ours = ReduceLROnPlateau(0.5, factor=0.5, patience=3)
    metric = 1.0
    for step in range(15):
        metric *= 1.0 - 1e-7  # creeping, sub-threshold improvement
        ref.step(metric)
        lr = ours.step(metric)
        assert lr == pytest.approx(opt.param_groups[0]["lr"]), f"step {step}"
    assert lr < 0.5  # decayed despite the creep


def test_val_shards_exact_and_bounded():
    """Ragged val batches: _val_shards' weighted recombination must equal
    the plain per-item mean exactly, every shard must be divisor-shardable,
    and the padding must stay bounded (< divisor**2 extra items) even when
    B and the divisor are coprime — tiling the WHOLE batch to lcm(B, d)
    was a B*d blowup (B=31, d=8 -> 248 items)."""
    from sonicsim_tpu.train.trainer import _val_shards

    rng = np.random.default_rng(0)
    for b, d in [(31, 8), (7, 8), (8, 8), (9, 8), (16, 8), (1, 8), (13, 4)]:
        mix = rng.standard_normal((b, 32)).astype(np.float32)
        tgt = rng.standard_normal((b, 2, 32)).astype(np.float32)

        def item_metric(m):  # deterministic per-item scalar
            return float(np.square(m).mean())

        total, n, padded = 0.0, 0, 0
        for ms, ts, w in _val_shards(mix, tgt, d):
            assert len(ms) % d == 0 and len(ms) == len(ts)
            padded += len(ms)
            # unweighted shard mean, as eval_step computes it
            total += float(np.mean([item_metric(m) for m in ms])) * w
            n += w
        assert n == b
        direct = float(np.mean([item_metric(m) for m in mix]))
        assert abs(total / n - direct) < 1e-6
        assert padded - b < d * d  # bounded padding, NOT lcm(B, d)


def test_trainer_val_loss_weighted_mean():
    """Trainer._val_loss must reproduce the exact all-item mean across
    ragged batches of different sizes (weighted by real item count)."""
    from types import SimpleNamespace

    rng = np.random.default_rng(1)
    batches = []
    for b in (5, 3):  # both ragged on an 8-way divisor
        m = rng.standard_normal((b, 16)).astype(np.float32)
        t = rng.standard_normal((b, 2, 16)).astype(np.float32)
        batches.append((m, t))

    def eval_step(params, m, t):  # batch-mean metric, like make_eval_step
        return jnp.mean(jnp.square(m), axis=tuple(range(1, m.ndim))).mean()

    stub = SimpleNamespace(_batch_divisor=8)
    got = Trainer._val_loss(stub, eval_step, None, iter(batches))
    every = np.concatenate([m for m, _ in batches], axis=0)
    want = float(np.mean([np.square(m).mean() for m in every]))
    assert abs(got - want) < 1e-6
    assert Trainer._val_loss(stub, eval_step, None, iter(())) is None
