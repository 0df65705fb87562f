"""Extended benchmark battery — the five BASELINE.json configs.

Prints one JSON line per config (bench.py remains the single-line headline
driver entry). Run on the real TPU.

1. Static 2-source mono mix (fftconvolve + SNR mix)
2. Moving single source (trajectory-segmented crossfade conv)  [headline]
3. Multi-channel render (binaural + ambisonics + 4-mic array)
4. Mixture pipeline step (3 moving + noise + music + LUFS)
5. Harness inference (ConvTasNet forward over 4 s batches)
"""

from __future__ import annotations

import json
import time

import numpy as np

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: ~8x faster cold starts


def _timeit(fn, *args, iters=5):
    """block_until_ready does not reliably flush the remote (tunneled) TPU
    backend and identical repeat dispatches can be deduped upstream, so each
    iteration's input carries a data dependence on the previous output and
    the loop closes with one scalar device->host transfer."""
    import jax
    import jax.numpy as jnp

    flat, tree = jax.tree.flatten(args)
    k = next(
        i for i, a in enumerate(flat)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
    )

    def call(acc):
        fl = list(flat)
        fl[k] = fl[k] + acc * 1e-20
        out = fn(*jax.tree.unflatten(tree, fl))
        leaf = next(a for a in jax.tree.leaves(out) if hasattr(a, "dtype"))
        return jnp.ravel(leaf)[0]

    float(call(jnp.float32(0.0)))  # compile + warmup
    float(call(jnp.float32(0.0)))  # second flush: residual async
    # compile/autotune work otherwise drains into the timed loop
    # (measured ~150 ms of pollution on the first post-compile call)
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = call(acc)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sonicsim_tpu.models import ConvTasNet
    from sonicsim_tpu.ops import (
        convolve_fixed_receiver,
        convolve_moving_segmented,
        dynamic_interp_plan,
        lufs_norm,
        scale_noise_snr,
        segment_plan,
    )

    sr = 16000
    rng = np.random.default_rng(0)
    results = []

    # --- 1. static 2-source mix -------------------------------------------
    t = 60 * sr
    audio = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32) * 0.1)
    rirs = jnp.asarray(rng.standard_normal((2, 2, sr)).astype(np.float32) * 0.02)

    @jax.jit
    def static_mix(a, r):
        wet = jax.vmap(convolve_fixed_receiver)(a, r)  # (2, C, T)
        return wet[0] + scale_noise_snr(wet[0], wet[1], 15.0)

    dt = _timeit(static_mix, audio, rirs)
    results.append(("static 2-src mix", 2 * 60 / dt,
                    {"n_src": 2, "channels": 2, "duration_s": 60}))

    # --- 2. moving single source (headline geometry) ----------------------
    p, c = 40, 2
    positions = np.cumsum(rng.uniform(0.2, 0.6, size=(p, 3)), axis=0)
    idx, w = dynamic_interp_plan(positions, t, rng=rng)
    off, lens, mx = segment_plan(idx)
    w_j, off_j, len_j = jnp.asarray(w), jnp.asarray(off), jnp.asarray(lens)
    a1 = jnp.asarray(rng.standard_normal((t,)).astype(np.float32) * 0.1)
    r1 = jnp.asarray(rng.standard_normal((p, c, sr)).astype(np.float32) * 0.02)
    moving = jax.jit(
        lambda a, r: convolve_moving_segmented(
            a, r, w_j, off_j, len_j, mx, use_pallas=True
        )
    )
    dt = _timeit(moving, a1, r1)
    results.append(("moving source (binaural)", 60 / dt,
                    {"n_src": 1, "p": p, "channels": c, "duration_s": 60}))

    # --- 3. multi-channel moving render (2 + 4 + 4 channels) --------------
    for name, ch in (("ambisonics-1", 4), ("4-mic array", 4)):
        r_mc = jnp.asarray(
            rng.standard_normal((p, ch, sr)).astype(np.float32) * 0.02
        )
        f = jax.jit(
            lambda a, r: convolve_moving_segmented(
                a, r, w_j, off_j, len_j, mx, use_pallas=True
            )
        )
        dt = _timeit(f, a1, r_mc)
        results.append((f"moving source ({name})", 60 / dt,
                        {"n_src": 1, "p": p, "channels": ch, "duration_s": 60}))

    # --- 3b. batched multi-mixture render (generation at scale) -----------
    a12 = jnp.asarray(rng.standard_normal((12, t)).astype(np.float32) * 0.1)
    r12 = jnp.asarray(
        rng.standard_normal((12, p, c, sr)).astype(np.float32) * 0.02
    )
    batched = jax.jit(
        jax.vmap(
            lambda a, r: convolve_moving_segmented(
                a, r, w_j, off_j, len_j, mx, use_pallas=True
            )
        )
    )
    dt = _timeit(batched, a12, r12, iters=3)
    results.append(("moving render, batched 12 sources", 12 * 60 / dt,
                    {"n_src": 12, "p": p, "channels": c, "duration_s": 60}))

    # --- 4. mixture pipeline step: 3 moving + 2 static + LUFS -------------
    a3 = jnp.asarray(rng.standard_normal((3, t)).astype(np.float32) * 0.1)
    r3 = jnp.asarray(rng.standard_normal((3, p, c, sr)).astype(np.float32) * 0.02)
    bg = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32) * 0.05)
    rbg = jnp.asarray(rng.standard_normal((2, c, sr)).astype(np.float32) * 0.02)

    @jax.jit
    def mixture_step(a3, r3, bg, rbg):
        moving3 = jax.vmap(
            lambda a, r: convolve_moving_segmented(
                a, r, w_j, off_j, len_j, mx, use_pallas=True
            )
        )(a3, r3)
        static2 = jax.vmap(convolve_fixed_receiver)(bg, rbg)
        speech = [lufs_norm(moving3[i], sr, -17.0)[0] for i in range(3)]
        noise = lufs_norm(static2[0], sr, -24.0)[0]
        music = lufs_norm(static2[1], sr, -29.0)[0]
        return speech[0] + speech[1] + speech[2] + noise + music

    dt = _timeit(mixture_step, a3, r3, bg, rbg)
    results.append(("full mixture step (5 tracks)", 5 * 60 / dt,
                    {"n_src": 5, "p": p, "channels": c, "duration_s": 60}))

    # --- 4b. RIR bank rendering (3 speakers x 40 waypoints, binaural) -----
    # Replaces the reference's mp.Pool-of-habitat-sims design point
    # (SonicSim_rir.py:751-791). Host+device wall-clock, audio-seconds of
    # rendered IR per second.
    from sonicsim_tpu.sim.bank_render import render_rir_banks
    from sonicsim_tpu.sim.channels import ChannelModel
    from sonicsim_tpu.sim.image_source import ShoeboxRoom
    from sonicsim_tpu.sim.oracle import SyntheticRirOracle

    room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
    oracle = SyntheticRirOracle(room, n_bands=32, max_order=4)
    bank_ch = ChannelModel("Binaural")
    mic = [np.array([4.0, 1.5, 3.0])]

    def speaker_ways(k):
        r = np.random.default_rng(1000 + k)  # fresh positions per call:
        return [r.uniform([1, 1, 1], [7, 2.5, 5]) for _ in range(40)]

    # warmup/compile on the SAME item count: the renderer is one jitted
    # dispatch specialized on the padded item axis. Banks stay DEVICE-
    # resident (the production consumer is the on-device moving-source
    # conv); each timed call uses fresh geometry so nothing upstream can
    # cache. The remote backend defers execution until a value is actually
    # read (block_until_ready does NOT flush it), so EVERY bank — warmup
    # included — is closed with a scalar readback.
    warm = render_rir_banks(
        oracle, [speaker_ways(90 + i) for i in range(3)], mic, bank_ch,
        out_device=True,
    )
    for b in warm:
        float(b.ravel()[0])
    t0 = time.perf_counter()
    ir_sec = 0.0
    for it in range(3):
        banks = render_rir_banks(
            oracle, [speaker_ways(3 * it + i) for i in range(3)], mic,
            bank_ch, out_device=True,
        )
        ir_sec += sum(
            b.shape[0] * b.shape[1] * b.shape[2] * b.shape[3] / sr
            for b in banks
        )
        for b in banks:
            float(b.ravel()[0])
    dt_bank = time.perf_counter() - t0
    results.append(("RIR bank render (3x40 pairs, binaural)", ir_sec / dt_bank,
                    {"n_src": 3, "p": 40, "channels": 2, "rir_len": sr}))

    # --- 5. harness inference: ConvTasNet on 4 s batches ------------------
    model = ConvTasNet()
    params = model.init_params(jax.random.PRNGKey(0), example_len=4 * sr)
    batch = jnp.asarray(rng.standard_normal((4, 4 * sr)).astype(np.float32))
    fwd = jax.jit(lambda p_, x: model.apply(p_, x))
    dt = _timeit(fwd, params, batch)
    results.append(("ConvTasNet inference", 4 * 4 / dt,
                    {"batch": 4, "duration_s": 4}))

    from sonicsim_tpu.infer import bf16_forward

    fwd16 = jax.jit(bf16_forward(model))
    dt = _timeit(fwd16, params, batch)
    results.append(("ConvTasNet inference (bf16)", 4 * 4 / dt,
                    {"batch": 4, "duration_s": 4}))

    # Serving configuration: larger batch amortizes dispatch latency.
    batch16 = jnp.asarray(rng.standard_normal((16, 4 * sr)).astype(np.float32))
    dt = _timeit(fwd16, params, batch16)
    results.append(("ConvTasNet serving (B=16, bf16)", 16 * 4 / dt,
                    {"batch": 16, "duration_s": 4}))

    # --- 6. training step: ConvTasNet + PIT SI-SDR, B=8 x 4 s -------------
    import optax

    from sonicsim_tpu.losses import PITLossWrapper, PairwiseNegSDR
    from sonicsim_tpu.train import make_train_step

    loss_fn = PITLossWrapper(PairwiseNegSDR("sisdr"), pit_from="pw_mtx")
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    tr_mix = jnp.asarray(rng.standard_normal((8, 4 * sr)).astype(np.float32))
    tr_tgt = jnp.asarray(
        rng.standard_normal((8, 2, 4 * sr)).astype(np.float32)
    )
    step = jax.jit(make_train_step(model, loss_fn, opt))

    def train_once(params, opt_state, mix, tgt):
        params, opt_state, loss = step(params, opt_state, mix, tgt)
        return loss + jnp.ravel(params["params"]["bottleneck"]["bias"])[0]

    dt = _timeit(train_once, params, opt_state, tr_mix, tr_tgt)
    results.append(("ConvTasNet training step (B=8)", 8 * 4 / dt,
                    {"batch": 8, "duration_s": 4}))

    step16 = jax.jit(make_train_step(model, loss_fn, opt, precision="bf16"))

    def train_once16(params, opt_state, mix, tgt):
        params, opt_state, loss = step16(params, opt_state, mix, tgt)
        return loss + jnp.ravel(params["params"]["bottleneck"]["bias"])[0]

    dt = _timeit(train_once16, params, opt_state, tr_mix, tr_tgt)
    results.append(("ConvTasNet training step (B=8, bf16)", 8 * 4 / dt,
                    {"batch": 8, "duration_s": 4}))

    for name, value, workload in results:
        print(
            json.dumps(
                {
                    "metric": name,
                    "value": round(float(value), 2),
                    "unit": "audio-seconds/sec/chip",
                    "vs_baseline": round(float(value) / 50.0, 3),
                    "workload": workload,
                }
            )
        )


if __name__ == "__main__":
    main()
