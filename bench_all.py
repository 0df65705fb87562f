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


def _classify_link(rtt_ms: float, down_mbps: float) -> dict:
    """Pure classification of a link probe (thresholds live here, tested
    in tests/test_bench_outage.py).

    Download threshold from observed data, not wishful thinking: healthy
    duplex is ~23-30 MB/s; at 8.8 MB/s (2026-08-19 window) throughput
    lines that stream audio back measured 4-5x low — meaningless as chip
    numbers. 15 MB/s splits the observed healthy/collapsed clusters.
    """
    reasons = []
    if rtt_ms > 100:
        reasons.append("rtt")
    if down_mbps < 15:
        reasons.append("download")
    return {
        "degraded": bool(reasons),
        "degraded_reason": reasons,
        "rtt_above_r2_baseline": bool(rtt_ms > 20),
    }


def _link_health(verbose: bool = True):
    """Preflight the tunneled link: scalar RTT + a 2 MB random transfer.

    The shared tunnel degrades transiently by 10-100x (observed: 5 ms
    scalar round trips stretching to tens of seconds). Numbers recorded
    while degraded are meaningless, so the battery measures the link
    first and stamps every result line with it; run again later if
    ``degraded`` is true.
    """
    import jax
    import jax.numpy as jnp

    s = jnp.float32(1.0)
    float(s + 13.0)  # connect + compile (a constant the loop never reuses)
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        # distinct operand each round: identical eager dispatches are
        # result-cached upstream and would read back in ~0 ms, stamping
        # a degraded link healthy
        float(s + (17.0 + i))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = min(rtts) * 1e3
    payload = np.random.default_rng(0).integers(
        -1000, 1000, (1 << 20,), dtype=np.int16
    )
    # Warm the transfer-path kernels (gather + same-shape int16 add) so
    # the timed round measures the link, not first-compile residuals
    # (~150 ms, enough to stamp a healthy link degraded).
    dev0 = jnp.asarray(payload)
    int(jnp.ravel(dev0)[0])
    np.asarray(dev0 + 1)
    payload2 = payload ^ 1  # different bytes: no upload/result reuse
    t0 = time.perf_counter()
    dev = jnp.asarray(payload2)
    int(jnp.ravel(dev)[0])
    up_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(dev + 2)
    down_s = time.perf_counter() - t0
    down_mbps = payload.nbytes / down_s / 1e6
    # Which dimension tripped the stamp matters for interpreting a line:
    # high RTT inflates per-dispatch/per-fence costs (latency-shaped
    # configs), low bandwidth inflates artifact-downloading configs
    # (generation e2e).
    #
    # ``degraded`` keeps its documented meaning — "numbers recorded now
    # are meaningless, run again later" — so its RTT trigger is the
    # TRANSIENT 10-100x collapse (scalar round trips in the hundreds of
    # ms to tens of seconds), not the tunnel's own floor. The floor
    # moved from ~5 ms (r2 era) to ~25-32 ms (r4, persistent across
    # every observed window; docs/PERFORMANCE.md): against a 20 ms
    # threshold EVERY r4 line stamped degraded, which both defeats
    # retry-until-healthy and buries real transients. The floor shift
    # is still disclosed per line via ``rtt_above_r2_baseline`` +
    # the raw ``rtt_ms`` — latency-shaped configs (streaming, per-call
    # fences) remain underestimates of a locally-attached chip.
    health = {
        "rtt_ms": round(rtt_ms, 2),
        "upload_MBps": round(payload.nbytes / up_s / 1e6, 1),
        "download_MBps": round(down_mbps, 1),
        **_classify_link(rtt_ms, down_mbps),
    }
    if verbose:
        print(json.dumps({"link_health": health}), flush=True)
    return health


def _wait_for_healthy_link(max_wait_s: float, poll_s: float = 90.0):
    """Poll the link until it reports healthy or ``max_wait_s`` elapses.

    r3 recorded ZERO non-degraded measurements (VERDICT weak #2) because
    the battery ran once into a degraded window and never retried. Returns
    the last health probe either way; the caller stamps results with it.
    """
    import sys

    t0 = time.monotonic()
    while True:
        health = _link_health(verbose=False)
        if not health["degraded"]:
            return health
        elapsed = time.monotonic() - t0
        print(
            json.dumps({"waiting_for_healthy_link": health,
                        "elapsed_s": round(elapsed)}),
            file=sys.stderr, flush=True,
        )
        if elapsed >= max_wait_s:
            return health
        time.sleep(min(poll_s, max(max_wait_s - elapsed, 0.0)))


def main(wait_healthy_min: float = 0.0) -> None:
    from bench import _device_reachable

    if not _device_reachable():
        from bench import emit_unreachable

        print(json.dumps({
            "error": "TPU tunnel unreachable at measurement time "
                     "(device probes exhausted the retry deadline); "
                     "battery not run",
            "stale_headline": emit_unreachable(),
        }))
        return

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
    if wait_healthy_min > 0:
        health = _wait_for_healthy_link(wait_healthy_min * 60.0)
        print(json.dumps({"link_health": health}), flush=True)
    else:
        health = _link_health()
    class _StampedResults(list):
        """Each append captures the CURRENT health probe (3-tuple in,
        4-tuple stored): one top-of-battery stamp mislabels every line
        measured after the tunnel's state drifts mid-run."""

        def append(self, item):
            super().append((*item, dict(health)))

    results = _StampedResults()

    def reprobe():
        """Refresh the health stamp between sections: the shared tunnel's
        state drifts over a multi-minute battery, and one stale stamp at
        the top mislabels every line measured after a transition."""
        nonlocal health
        health = _link_health(verbose=False)

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
            a, r, w_j, off_j, len_j, mx, use_pallas=False
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
                a, r, w_j, off_j, len_j, mx, use_pallas=False
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
                a, r, w_j, off_j, len_j, mx, use_pallas=False
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
                a, r, w_j, off_j, len_j, mx, use_pallas=False
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

    reprobe()
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
    # Pipelined consumption, the production pattern: generate_split keeps
    # banks ON DEVICE feeding the moving conv — production reads back no
    # bank bytes at all. The measurement therefore dispatches every call
    # (fresh geometry each, host flatten+upload included and overlapped
    # with chip compute) and fences ONCE at the end: device→host copies
    # on this runtime are stream-ordered behind ALL queued programs, so a
    # per-call scalar fence would serialize a full tunnel RTT into every
    # call and measure the link, not the renderer (r3's 601.7 number).
    n_iters = 8
    outs = []
    t0 = time.perf_counter()
    ir_sec = 0.0
    for it in range(n_iters):
        banks = render_rir_banks(
            oracle, [speaker_ways(3 * it + i) for i in range(3)], mic,
            bank_ch, out_device=True,
        )
        ir_sec += sum(
            b.shape[0] * b.shape[1] * b.shape[2] * b.shape[3] / sr
            for b in banks
        )
        outs.append(banks)
    float(outs[-1][0].ravel()[0])  # in-order queue: forces ALL calls
    dt_bank = time.perf_counter() - t0
    del outs
    results.append(("RIR bank render (3x40 pairs, binaural)", ir_sec / dt_bank,
                    {"n_src": 3, "p": 40, "channels": 2, "iters": n_iters,
                     "fence": "single-trailing",
                     "rir_len": int(banks[0].shape[-1])}))

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

    reprobe()
    # --- 7. SkiM streaming: per-segment step vs real time ------------------
    # forward_stream contract (separation/look2hear/models/skim.py:603):
    # the per-segment step must beat the segment duration for live use.
    from sonicsim_tpu.models.skim import SkiMNet, SkiMStreamer

    # segment_size 500 = 62 ms chunks: the tunneled link adds a fixed
    # ~15-25 ms dispatch+readback floor per step, which swamps the
    # reference's 31 ms segments (RTF 0.88 measured) but leaves 62 ms
    # ones comfortably real-time (RTF ~1.9; ~3.5 at 125 ms). A local
    # (non-tunneled) chip has no such floor.
    skim = SkiMNet(
        input_dim=64, kernel_size=4, num_spk=2, unit=128, layer=3,
        segment_size=500, causal=True, seg_overlap=False, mem_type="hc",
    )
    skim_params = skim.init_params(jax.random.PRNGKey(0), example_len=sr)
    streamer = SkiMStreamer(skim, skim_params)
    step_samples = streamer.chunk_samples  # one segment per step
    # Distinct pre-staged chunks per step: repeating one identical chunk
    # from a reset state replays warmup's exact dispatches, which the
    # backend result-caches — the timed loop would then measure readbacks,
    # not the chip, and overstate the live RTF.
    rng_s = np.random.default_rng(3)
    n_steps = 40
    # 3 timed runs below (rtf0, rtf3, chip_step) + 3 warmup steps: each
    # gets its OWN disjoint chunk slice. Re-running the SAME chunks from
    # identical reset state replays the exact dispatch sequence, which
    # the dedup described above would serve from caches — inflating the
    # later runs (and the recorded pipelining win) relative to the first.
    stream_chunks = [
        jnp.asarray(
            0.05 * rng_s.standard_normal((1, step_samples)).astype(np.float32)
        )
        for _ in range(3 * n_steps + 3)
    ]
    for k in range(3):  # warm both segment phases + flush residuals
        out = streamer.step(stream_chunks[3 * n_steps + k])
        if out.size:
            float(jnp.ravel(out)[0])

    def live_rtf(chunks, depth):
        """Wall-clock RTF of the pipelined consumer (stream(depth=0) is
        the strict read-after-step pattern)."""
        streamer.reset()
        streamed = 0
        t0 = time.perf_counter()
        for out in streamer.stream(chunks, depth=depth):
            streamed += out.shape[-1]  # np.ndarray: already on host
        return (streamed / sr) / (time.perf_counter() - t0)

    rtf0 = live_rtf(stream_chunks[:n_steps], depth=0)
    rtf3 = live_rtf(stream_chunks[n_steps : 2 * n_steps], depth=3)
    # Chip-side step time, amortized: dispatch every segment, read back
    # ONE final scalar — per-step host round trips drop out, leaving
    # compute + the one-way dispatch floor (the tunnel hides chip-only
    # isolation; this is the tightest upper bound it allows).
    streamer.reset()
    t0 = time.perf_counter()
    last = None
    for i in range(n_steps):
        out = streamer.step(stream_chunks[2 * n_steps + i])
        if out.size:
            last = out
    float(jnp.ravel(last)[0])
    chip_step_ms = (time.perf_counter() - t0) / n_steps * 1e3
    results.append((
        "SkiM streaming (per-segment, live)", rtf3,
        {"segment_samples": step_samples, "steps": n_steps,
         "real_time_factor": round(rtf3, 2), "pipeline_depth": 3,
         "rtf_unpipelined": round(rtf0, 2),
         # chip_step_ms: per-segment step time with per-step host round
         # trips amortized out (K dispatches, one trailing readback) —
         # the tightest chip-side latency bound the tunnel allows. The
         # residual one-way dispatch floor still rides it, so a locally
         # attached chip is faster than this number.
         "chip_step_ms": round(chip_step_ms, 2),
         "chip_step_ms_amortized": round(chip_step_ms, 2),
         "segment_ms": round(step_samples / sr * 1e3, 1)},
    ))
    if rtf3 <= 1.0:
        # Record it (with the link stamp) rather than aborting the whole
        # battery: a transient tunnel degradation should not discard the
        # other sections' already-measured numbers.
        print(json.dumps({"warning": f"streaming below real time: RTF {rtf3:.2f}"}),
              flush=True)

    # Micro-batched non-interactive streaming: 4 independent streams per
    # dispatch (the throughput configuration; per-stream latency
    # unchanged, per-chip audio-seconds 4x).
    streamer4 = SkiMStreamer(skim, skim_params)
    streamer4.reset(batch=4)
    chunks4 = [
        jnp.asarray(
            0.05 * rng_s.standard_normal((4, step_samples)).astype(np.float32)
        )
        for _ in range(n_steps + 2)
    ]
    for k in range(2):
        out = streamer4.step(chunks4[n_steps + k])
        if out.size:
            float(jnp.ravel(out)[0])
    streamer4.reset(batch=4)
    streamed = 0
    t0 = time.perf_counter()
    for out in streamer4.stream(chunks4[:n_steps], depth=3):
        streamed += out.shape[0] * out.shape[-1]
    rtf_b4 = (streamed / sr) / (time.perf_counter() - t0)
    results.append((
        "SkiM streaming (micro-batched B=4)", rtf_b4,
        {"segment_samples": step_samples, "steps": n_steps, "batch": 4,
         "pipeline_depth": 3, "real_time_factor": round(rtf_b4, 2)},
    ))

    reprobe()
    # --- 8. generation end-to-end (SonicSet_train.py:25-138 replacement) --
    # Steady-state seconds per 60 s mixture through the WHOLE pipeline:
    # plan -> fused RIR-bank render -> blocked moving conv + statics +
    # LUFS -> pcm16 download -> WAVs. One unclocked mixture first absorbs
    # compile and the backend's one-time gather-kernel build.
    import shutil as _shutil
    import tempfile
    from pathlib import Path

    from sonicsim_tpu.dataset.generate import generate_split
    from sonicsim_tpu.dataset.plan import scan_audio_lengths
    from sonicsim_tpu.sim import Scene
    from sonicsim_tpu.utils import write_wav

    root = Path(tempfile.mkdtemp(prefix="genbench_"))
    try:
        def corpus(p, n, secs, prefix):
            p.mkdir(parents=True, exist_ok=True)
            t_ax = np.arange(int(secs * sr)) / sr
            for i in range(n):
                x = (0.3 * np.sin(2 * np.pi * (200 + 20 * i) * t_ax)).astype(
                    np.float32
                )
                write_wav(p / f"{prefix}{i}.wav", x, sr)
            return p

        n_spk = 21  # 1 warmup + 6 timed mixtures of 3 speakers
        for i in range(n_spk):
            corpus(root / "speech" / f"spk{i}", 6, 8.0, f"s{i}_")
        corpus(root / "noise", 4, 12.0, "n_")
        corpus(root / "music", 4, 12.0, "m_")
        noise_m = scan_audio_lengths(root / "noise")
        music_m = scan_audio_lengths(root / "music")
        dirs = [str(root / "speech" / f"spk{i}") for i in range(n_spk)]

        def factory(name):
            return Scene.synthetic(
                dims=(10.0, 3.0, 8.0), channel_type="Binaural", seed=11,
                max_order=4, n_bands=32,
            )

        def artifact_mb(out_dir: Path, n: int) -> float:
            """Actual bytes written per mixture == the tunneled downlink
            payload (pcm16 tracks + f16 RIR bank + trace/json)."""
            total = sum(
                f.stat().st_size for f in out_dir.rglob("*") if f.is_file()
            )
            return total / n / 1e6

        # One device-resident utterance cache across warmup + timed runs
        # (production shape: one cache per corpus; the dry-audio rows are
        # mono and channel-type independent). The timed runs span TWO
        # scenes over the same 9 speaker dirs — the speaker pool resets
        # per scene (SonicSet_train.py:180-218 semantics), so mixtures
        # 4-6 re-use every utterance: the bench covers both the cold and
        # the steady-state warm uplink regimes.
        from sonicsim_tpu.dataset.device_assembly import UtteranceCache

        ucache = UtteranceCache()
        generate_split(  # warmup mixture (compile + kernel builds)
            factory, ["warm"], dirs[:3], noise_m, music_m, root / "warm",
            duration=60.0, base_seed=1, max_mixtures=1,
            utterance_cache=ucache,
        )
        # Median of >=3 repeats with a PER-REPEAT link restamp: the
        # artifact download rides the shared tunnel, whose bandwidth
        # drifts mid-battery (r4 recorded 63.3 and 35.8 audio-s/s for
        # this exact config in different windows). One sample per round
        # conflates the chip with that day's tunnel; the median over
        # restamped repeats separates them, and a repeat whose own stamp
        # collapsed mid-run earns one replacement run.
        e2e_runs, extra_budget = [], 2
        rep = 0
        while rep < 3 + (2 - extra_budget):
            rep += 1
            pre = _link_health(verbose=False)
            out_k = root / f"out_rep{rep}"
            t0 = time.perf_counter()
            produced = generate_split(
                factory, ["room0", "room1"], dirs[3:12], noise_m, music_m,
                out_k, duration=60.0, base_seed=5, max_mixtures=6,
                utterance_cache=ucache, pipeline_depth=3,
            )
            dt_gen = time.perf_counter() - t0
            post = _link_health(verbose=False)
            e2e_runs.append({
                "audio_s_per_s": round(60.0 * len(produced) / dt_gen, 2),
                "s_per_mixture": round(dt_gen / len(produced), 2),
                "link_pre": {k: pre[k] for k in
                             ("rtt_ms", "download_MBps", "degraded")},
                "link_post": {k: post[k] for k in
                              ("rtt_ms", "download_MBps", "degraded")},
            })
            if pre["degraded"] or post["degraded"]:
                e2e_runs[-1]["degraded_window"] = True
                if extra_budget > 0:
                    extra_budget -= 1
        vals = sorted(r["audio_s_per_s"] for r in e2e_runs
                      if not r.get("degraded_window"))
        if not vals:  # every repeat hit a degraded window: report anyway
            vals = sorted(r["audio_s_per_s"] for r in e2e_runs)
        median = vals[len(vals) // 2] if len(vals) % 2 else (
            0.5 * (vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
        )
        results.append((
            "generation end-to-end (60 s mixtures)",
            median,
            {"n_src": 3, "duration_s": 60, "channels": 2, "scenes": 2,
             "aggregate": f"median of {len(vals)} healthy-stamped repeats",
             "spread_min_max": [vals[0], vals[-1]],
             "repeats": e2e_runs,
             "artifact_MB_per_mixture": round(
                 artifact_mb(root / "out_rep1", len(produced)), 1),
             "utterance_cache_hit_rate": round(
                 ucache.hits / max(ucache.hits + ucache.misses, 1), 2)},
        ))

        # Mono variant — the reference's demo-split generator geometry
        # (SonicSet.py:155 channel_type='Mono'). Half the downlink bytes
        # of binaural, so it isolates compute throughput from the
        # tunnel-bound artifact download.
        def factory_mono(name):
            return Scene.synthetic(
                dims=(10.0, 3.0, 8.0), channel_type="Mono", seed=11,
                max_order=4, n_bands=32,
            )

        # Device-resident configuration: identical pipeline, outputs
        # consumed on device (sink="device" — one scalar readback per
        # FOUR mixtures, generate.py's _note_fence cadence, and no
        # artifact downloads/writes). This is the chip's own
        # e2e number, separated from the tunnel's ~27 MB/mixture artifact
        # downlink (VERDICT r3 missing #1); it shares the binaural jit
        # cache, so no fresh warmup is needed.
        t0 = time.perf_counter()
        produced_d = generate_split(
            factory, ["room0_d", "room1_d"], dirs[3:12], noise_m, music_m,
            root / "out_d", duration=60.0, base_seed=5, max_mixtures=6,
            utterance_cache=ucache, sink="device",
        )
        dt_d = time.perf_counter() - t0
        results.append((
            "generation end-to-end (device-resident)",
            60.0 * len(produced_d) / dt_d,
            {"n_src": 3, "duration_s": 60, "channels": 2, "scenes": 2,
             "sink": "device",
             "s_per_mixture": round(dt_d / len(produced_d), 2)},
        ))

        generate_split(  # mono warmup (fresh channel-count compile)
            factory_mono, ["warm_m"], dirs[:3], noise_m, music_m,
            root / "warm_m", duration=60.0, base_seed=2, max_mixtures=1,
            utterance_cache=ucache,
        )
        t0 = time.perf_counter()
        produced_m = generate_split(
            factory_mono, ["room0_m", "room1_m"], dirs[12:21], noise_m,
            music_m, root / "out_m", duration=60.0, base_seed=7,
            max_mixtures=6, utterance_cache=ucache,
        )
        dt_m = time.perf_counter() - t0
        results.append((
            "generation end-to-end (60 s mixtures, mono)",
            60.0 * len(produced_m) / dt_m,
            {"n_src": 3, "duration_s": 60, "channels": 1, "scenes": 2,
             "s_per_mixture": round(dt_m / len(produced_m), 2),
             "artifact_MB_per_mixture": round(
                 artifact_mb(root / "out_m", len(produced_m)), 1)},
        ))
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    for name, value, workload, stamp in results:
        print(
            json.dumps(
                {
                    "metric": name,
                    "value": round(float(value), 2),
                    "unit": "audio-seconds/sec/chip",
                    "vs_baseline": round(float(value) / 50.0, 3),
                    "workload": workload,
                    "link": stamp,
                }
            )
        )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--wait-healthy-min", type=float, default=0.0,
        help="poll the link for up to N minutes before measuring, so a "
             "degraded window does not forfeit the round's only clean run "
             "(r3 had zero non-degraded stamps)",
    )
    main(wait_healthy_min=ap.parse_args().wait_healthy_min)
