"""Learning-quality gate: training must actually LEARN, not just run.

A finite loss is not evidence the optimizer/PIT/gradient path works — an
LR of 0, a sign flip in the loss, or a broken PIT assignment all produce
finite numbers. This gate trains the tiny ConvTasNet on a fixed synthetic
2-speaker set and requires the validation neg-SI-SDR to IMPROVE by a
margin, reproducing the README's 3-epoch separation claim (reference
behavior: separation/train.py:94 + audio_litmodule.py:67-82).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sonicsim_tpu.losses import PairwiseNegSDR, PITLossWrapper
from sonicsim_tpu.models import ConvTasNet
from sonicsim_tpu.train import Trainer

SR = 8000
T = SR  # 1 s crops


def _two_speaker_batches(seed, n_batches=6, batch=4):
    """Deterministic AM-toned 'speakers' in disjoint frequency ranges —
    separable by a small model within a few epochs."""
    rng = np.random.default_rng(seed)
    t_ax = np.arange(T, dtype=np.float32) / SR
    out = []
    for _ in range(n_batches):
        mixes, tgts = [], []
        for _ in range(batch):
            f1 = rng.uniform(180, 320)
            f2 = rng.uniform(800, 1200)
            am1 = 1 + 0.5 * np.sin(2 * np.pi * rng.uniform(1, 4) * t_ax)
            am2 = 1 + 0.5 * np.sin(2 * np.pi * rng.uniform(1, 4) * t_ax)
            s1 = (0.3 * np.sin(2 * np.pi * f1 * t_ax) * am1).astype(np.float32)
            s2 = (0.3 * np.sin(2 * np.pi * f2 * t_ax) * am2).astype(np.float32)
            mixes.append(s1 + s2)
            tgts.append(np.stack([s1, s2]))
        out.append(
            (jnp.asarray(np.stack(mixes)), jnp.asarray(np.stack(tgts)))
        )
    return out


@pytest.mark.slow
def test_training_improves_si_sdr(tmp_path):
    train = _two_speaker_batches(0)
    val = _two_speaker_batches(1, n_batches=2)

    model = ConvTasNet(N=64, L=16, B=32, H=64, P=3, X=4, R=1, num_spks=2)
    pit = PITLossWrapper(PairwiseNegSDR("sisdr"), threshold_byloss=False)
    trainer = Trainer(
        model=model, loss_fn=pit, metric_fn=pit, lr=1e-3, max_epochs=4,
        save_top_k=1, exp_dir=tmp_path / "exp",
    )

    # Epoch-0 (untrained) validation neg-SI-SDR as the baseline.
    import jax

    params0 = model.init_params(jax.random.PRNGKey(0), example_len=T)
    base = float(
        np.mean([float(pit(model.apply(params0, m), t)) for m, t in val])
    )

    trainer.fit(lambda epoch: iter(train), lambda: iter(val), example_len=T)
    final = trainer.history[-1]["val_loss"]

    # README claims ~13 dB in 3 epochs on this kind of toy set; gate at
    # >= 8 dB so PIT/optimizer/scheduler/gradient regressions fail loudly
    # while leaving headroom for backend numeric drift.
    assert base - final >= 8.0, (
        f"neg-SI-SDR only improved {base - final:.2f} dB "
        f"({base:.2f} -> {final:.2f}); training is not learning"
    )
