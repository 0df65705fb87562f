"""Speed-of-light (roofline) analysis for the hot generation kernels.

For each battery workload this lowers the EXACT jitted computation the
bench drives, asks XLA for its compiled cost analysis (flops + bytes
accessed), and derives the hardware floors:

  compute floor   = flops / peak_flops
  bandwidth floor = bytes accessed / peak HBM bandwidth
  speed of light  = max(compute, bandwidth)   (what a perfect kernel costs)

Against a measured wall-clock per call (taken from a BENCH_*.json battery
file) that yields a %-of-SoL utilization per stage — the honest statement
of how much headroom each kernel still has on the chip, independent of
tunnel effects.

Peaks default to TPU v5e (the bench chip): 197 TFLOP/s bf16 MXU,
819 GB/s HBM. The DSP stages are float32 FFT/elementwise pipelines — they
sit far left on the roofline (intensity << v5e's ~240 flops/byte knee),
so their SoL is the bandwidth floor and the f32-vs-bf16 MXU rate split
does not matter for them; for the bf16 ConvTasNet serving line the
compute floor uses the bf16 peak.

Usage:
  python scripts/roofline.py                 # on the tunneled TPU
  python scripts/roofline.py --bench BENCH_CLEAN_r04.json
  python scripts/roofline.py --platform cpu  # CPU smoke (analysis only)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9
# VPU transcendental throughput estimate for v5e: one 8x128 vector
# lane-set retiring roughly one polynomial-expanded transcendental per
# ~4 cycles at 940 MHz => ~0.25e12/s. Order-of-magnitude on purpose —
# it exists so VPU-bound stages (sin/cos-heavy tap placement) get a
# non-absurd floor instead of a pure flops+bytes model that calls 30x
# transcendental work "97% headroom".
V5E_PEAK_TRANSC_PS = 0.25e12


def _cost(fn, *args) -> dict:
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    # Newer jax returns a dict; some versions a 1-list of dicts.
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
    }


def _floors(flops: float, bytes_: float, peak_flops: float,
            transc: float = 0.0) -> dict:
    comp_ms = flops / peak_flops * 1e3
    bw_ms = bytes_ / V5E_PEAK_HBM_BPS * 1e3
    tr_ms = transc / V5E_PEAK_TRANSC_PS * 1e3
    floors = {"compute": comp_ms, "bandwidth": bw_ms, "transcendental": tr_ms}
    bound = max(floors, key=floors.get)
    return {
        "compute_floor_ms": round(comp_ms, 3),
        "bandwidth_floor_ms": round(bw_ms, 3),
        "transcendental_floor_ms": round(tr_ms, 3),
        "sol_ms": round(floors[bound], 3),
        "intensity_flops_per_byte": round(flops / max(bytes_, 1.0), 2),
        "bound": bound,
    }


def _measured_ms(bench_path: Path) -> dict[str, float]:
    """metric name -> measured seconds-per-call from a battery file,
    via each line's audio-seconds-per-second value and workload stamp."""
    out: dict[str, float] = {}
    if not bench_path.exists():
        return out
    for line in bench_path.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        m, v = rec.get("metric"), rec.get("value")
        if not m or not v:
            continue
        audio_s = {
            "moving render, batched 12 sources": 12 * 60,
            "full mixture step (5 tracks)": 5 * 60,
            "moving source (binaural)": 60,
            "ConvTasNet serving (B=16, bf16)": 16 * 4,
            "RIR bank render (3x40 pairs, binaural)": 3 * 60,
            "ConvTasNet training step (B=8, bf16)": 8 * 4,
        }.get(m)
        if audio_s:
            out[m] = audio_s / v * 1e3  # ms per call
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=str(REPO / "BENCH_CLEAN_r04.json"))
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu for a smoke run; "
                    "default: whatever the runtime exposes — the TPU)")
    ap.add_argument("--stages", default=None,
                    help="comma-separated substrings: only stages whose "
                    "name contains one of them are built and measured "
                    "(quick targeted re-measures after a kernel change)")
    ap.add_argument("--measure", action="store_true",
                    help="time each lowered stage directly on this device "
                    "(bench_all._timeit semantics: per-iteration data "
                    "dependence + one trailing scalar fence) instead of "
                    "deriving measured_ms from --bench lines; the honest "
                    "mode on the TPU — bench lines can lag the code")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from sonicsim_tpu.ops import (
        convolve_fixed_receiver,
        convolve_moving_segmented,
        dynamic_interp_plan,
        segment_plan,
    )
    from sonicsim_tpu.ops.fftconv import _on_tpu
    from sonicsim_tpu.ops.loudness import lufs_norm

    sr, t, p, c = 16000, 60 * 16000, 40, 2
    rng = np.random.default_rng(0)
    positions = np.cumsum(rng.uniform(0.2, 0.6, size=(p, 3)), axis=0)
    idx, w = dynamic_interp_plan(positions, t, rng=rng)
    off, lens, mx = segment_plan(idx)
    w_j, off_j, len_j = jnp.asarray(w), jnp.asarray(off), jnp.asarray(lens)

    platform = jax.devices()[0].platform
    measured = _measured_ms(Path(args.bench))
    rows = []

    if args.measure:
        from bench_all import _timeit

    stage_filter = (
        [s.strip() for s in args.stages.split(",")] if args.stages else None
    )

    def add(name, fn, *call_args, peak=V5E_PEAK_BF16_FLOPS):
        if stage_filter and not any(s in name for s in stage_filter):
            return
        cost = _cost(fn, *call_args)
        row = {"stage": name, **cost,
               **_floors(cost["flops"], cost["bytes"], peak,
                         cost.get("transcendentals", 0.0))}
        if args.measure:
            # Host numpy operands would re-upload per timed call and
            # charge tunnel time to the kernel — commit them once.
            dev_args = tuple(
                jnp.asarray(a) if isinstance(a, np.ndarray) else a
                for a in call_args
            )
            # Time the JITTED computation (the exact one whose cost
            # analysis set the floors above) — the raw fn may be an
            # unjitted composition, which on the tunneled backend runs
            # eager op-by-op and measures the link, not the kernel.
            ms = _timeit(jax.jit(fn), *dev_args) * 1e3
            row["measured_ms"] = round(ms, 2)
            row["measured_via"] = "direct"
            if ms < 20.0:
                # Sub-dispatch-floor stages (the tunneled one-way dispatch
                # measures ~8-15 ms): per-call timing reads the LINK, not
                # the kernel. Re-measure as a K-step device-chained loop
                # (one dispatch, each iteration data-dependent on the
                # last) and report the per-step time as the honest
                # chip-side number.
                k_chain = 16
                jfn = jax.jit(fn)
                kf = next(
                    (i for i, a in enumerate(dev_args)
                     if hasattr(a, "dtype")
                     and jnp.issubdtype(a.dtype, jnp.floating)),
                    None,
                )

                def chained(*a):
                    import jax.lax as lax

                    def body(_, carry):
                        out = jfn(*carry)
                        leaf = next(
                            x for x in jax.tree.leaves(out)
                            if hasattr(x, "dtype")
                        )
                        bump = (
                            jnp.real(leaf).ravel()[0].astype(jnp.float32)
                            * 1e-20
                        )
                        lst = list(carry)
                        lst[kf] = lst[kf] + bump
                        return tuple(lst)

                    return lax.fori_loop(0, k_chain, body, tuple(a))[kf]

                if kf is not None:
                    try:
                        chained_ms = (
                            _timeit(jax.jit(chained), *dev_args) * 1e3
                        )
                        row["chip_step_ms"] = round(chained_ms / k_chain, 3)
                        row["chip_step_via"] = f"chained-{k_chain}"
                        ms = chained_ms / k_chain
                    except Exception as e:  # non-chainable arg structure
                        row["chip_step_error"] = str(e)[:120]
            row["pct_of_sol"] = round(100 * row["sol_ms"] / ms, 1)
        elif name in measured:
            row["measured_ms"] = round(measured[name], 2)
            row["measured_via"] = "bench-file"
            row["pct_of_sol"] = round(100 * row["sol_ms"] / measured[name], 1)
        rows.append(row)

    # --- moving render, batched 12 sources (the headline geometry) -------
    a12 = jnp.asarray(rng.standard_normal((12, t)).astype(np.float32) * 0.1)
    r12 = jnp.asarray(rng.standard_normal((12, p, c, sr)).astype(np.float32) * 0.02)
    add(
        "moving render, batched 12 sources",
        jax.vmap(lambda a, r: convolve_moving_segmented(
            a, r, w_j, off_j, len_j, mx, use_pallas=False)),
        a12, r12,
    )

    # --- full mixture step (3 moving + 2 static + LUFS) -------------------
    a3 = jnp.asarray(rng.standard_normal((3, t)).astype(np.float32) * 0.1)
    r3 = jnp.asarray(rng.standard_normal((3, p, c, sr)).astype(np.float32) * 0.02)
    bg = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32) * 0.05)
    rbg = jnp.asarray(rng.standard_normal((2, c, sr)).astype(np.float32) * 0.02)

    def mixture_step(a3, r3, bg, rbg):
        moving3 = jax.vmap(lambda a, r: convolve_moving_segmented(
            a, r, w_j, off_j, len_j, mx, use_pallas=False))(a3, r3)
        static2 = jax.vmap(convolve_fixed_receiver)(bg, rbg)
        speech = [lufs_norm(moving3[i], sr, -17.0)[0] for i in range(3)]
        noise = lufs_norm(static2[0], sr, -24.0)[0]
        music = lufs_norm(static2[1], sr, -29.0)[0]
        return speech[0] + speech[1] + speech[2] + noise + music

    add("full mixture step (5 tracks)", mixture_step, a3, r3, bg, rbg)

    # --- RIR bank render (3 speakers x 40 waypoints = 120 pairs) ----------
    from sonicsim_tpu.sim.bank_render import render_bank_batched
    from sonicsim_tpu.sim.channels import ChannelModel
    from sonicsim_tpu.sim.image_source import ShoeboxRoom
    from sonicsim_tpu.sim.oracle import SyntheticRirOracle

    room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
    oracle = SyntheticRirOracle(room, n_bands=32, max_order=4)
    ways = [
        np.random.default_rng(1000 + k).uniform([1, 1, 1], [7, 2.5, 5])
        for k in range(120)  # 3 trajectories x 40 waypoints, flattened
    ]
    jit_fn, jit_args = render_bank_batched(
        oracle, ways, [np.array([4.0, 1.5, 3.0])], ChannelModel("Binaural"),
        lower_only=True,
    )
    add("RIR bank render (3x40 pairs, binaural)", jit_fn, *jit_args)

    # --- ConvTasNet serving (B=16, bf16) -----------------------------------
    from sonicsim_tpu.infer import bf16_forward
    from sonicsim_tpu.models import ConvTasNet

    model = ConvTasNet()
    params = model.init_params(jax.random.PRNGKey(0), example_len=4 * sr)
    fwd = bf16_forward(model)
    mix16 = jnp.asarray(rng.standard_normal((16, 4 * sr)).astype(np.float32))
    add("ConvTasNet serving (B=16, bf16)", lambda prm, x: fwd(prm, x),
        params, mix16)

    # --- ConvTasNet training step (B=8, bf16) — fwd+bwd+adam ---------------
    # The battery's training line (reference fit loop separation/train.py:94)
    # previously had no speed-of-light accounting at all.
    import optax

    from sonicsim_tpu.losses import PairwiseNegSDR, PITLossWrapper
    from sonicsim_tpu.train import make_train_step

    loss_fn = PITLossWrapper(PairwiseNegSDR("sisdr"), pit_from="pw_mtx")
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    tr_mix = jnp.asarray(rng.standard_normal((8, 4 * sr)).astype(np.float32))
    tr_tgt = jnp.asarray(
        rng.standard_normal((8, 2, 4 * sr)).astype(np.float32))
    step16 = make_train_step(model, loss_fn, opt, precision="bf16")
    add("ConvTasNet training step (B=8, bf16)",
        lambda prm, st, x, y: step16(prm, st, x, y),
        params, opt_state, tr_mix, tr_tgt)

    # --- device assembly (timeline scatter, 5 tracks x 60 s) ---------------
    # assemble_plans_on_device's jitted core at a production shape: 40
    # utterance placements scattered into 5 60 s output rows.
    from sonicsim_tpu.dataset.device_assembly import _assemble_jit

    assemble = _assemble_jit()
    lmax = 1 << 17
    n_place = 40
    rows_a = jnp.asarray(
        rng.standard_normal((n_place, lmax)).astype(np.float32) * 0.1)
    src_a = jnp.zeros((n_place,), jnp.int32)
    len_a = jnp.full((n_place,), lmax, jnp.int32)
    dest_a = jnp.asarray(
        rng.integers(0, t - lmax, size=n_place).astype(np.int32))
    row_of = jnp.asarray((np.arange(n_place) % 5).astype(np.int32))
    add("device assembly (40 placements, 5x60 s)",
        lambda r_, s_, l_, d_, o_: assemble(r_, s_, l_, d_, o_,
                                            t=t, n_out=5),
        rows_a, src_a, len_a, dest_a, row_of)

    # --- LUFS measure+normalize (BS.1770, 60 s stereo) ---------------------
    lufs_in = jnp.asarray(
        rng.standard_normal((2, t)).astype(np.float32) * 0.1)
    add("LUFS normalize (60 s stereo)",
        lambda x: lufs_norm(x, sr, -17.0)[0], lufs_in)

    print(json.dumps({"platform": platform,
                      "peaks": {"bf16_flops": V5E_PEAK_BF16_FLOPS,
                                "hbm_Bps": V5E_PEAK_HBM_BPS}}))
    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
