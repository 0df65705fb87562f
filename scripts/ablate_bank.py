"""Stage-level ablation of the bank renderer on the attached device.

Times jitted sub-pipelines of _render_core on the bench geometry
(240 items, order 4, 32 bands) to locate the hot stage. Throwaway
diagnostics — not part of the battery.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from sonicsim_tpu.sim import bank_render as br
from sonicsim_tpu.sim.channels import ChannelModel
from sonicsim_tpu.sim.image_source import ShoeboxRoom, tail_noise_key
from sonicsim_tpu.sim.oracle import SyntheticRirOracle

room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
oracle = SyntheticRirOracle(room, n_bands=32, max_order=4)
ch = ChannelModel("Binaural")
mic = [np.array([4.0, 1.5, 3.0])]

rng = np.random.default_rng(1)
ways = [rng.uniform([1, 1, 1], [7, 2.5, 5]) for _ in range(120)]
ir_params = br._bank_params(oracle)
(_, rt60_bands, ir_seconds, ir_len, nfft, beta_walls, amp_u, amp_v,
 tail_u, tail_v, consts) = ir_params
print("ir_len", ir_len, "nfft", nfft, "amp_u", amp_u.shape, "amp_v", amp_v.shape)

srcs, recvs, normals, chan_idx, seeds = br._flatten_items(
    oracle, ways, mic, ch, [90.0])
n_items = len(srcs)
print("items", n_items)

sr = oracle.sample_rate
max_order = oracle.max_order
n_bands = oracle.n_bands
dims = jnp.asarray(room.dims, jnp.float32)
srcs_j = jnp.asarray(srcs)
recvs_j = jnp.asarray(recvs)
normals_j = jnp.asarray(normals)
masks = br._cached_masks(n_bands, nfft, sr)
rt60_j = jnp.asarray(rt60_bands, jnp.float32)


def geom_and_gain(srcs, recvs, normals):
    delays_s, _h, (ux, uy, uz), valid = br._device_geometry(
        dims, srcs, recvs, max_order, float(ir_seconds))
    gain = 0.6 + 0.4 * (
        ux * normals[:, 0:1] + uy * normals[:, 1:2] + uz * normals[:, 2:3])
    g = jnp.where(
        valid, gain / (4.0 * jnp.pi * delays_s * br.SPEED_OF_SOUND + 1e-30),
        0.0).astype(jnp.float32)
    return delays_s, g, valid


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    # force full execution on the deferred remote backend
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return out


g1 = jax.jit(geom_and_gain)
delays_s, g, valid = timeit("geometry+gain", g1, srcs_j, recvs_j, normals_j)

amp_nb = br._amplitude_profile(jnp.asarray(beta_walls, jnp.float32), max_order)

# --- placement map only ---------------------------------------------------
pad = ir_len + 2 * br.SINC_HALF + 2
win = br._BLOCK + 128
n_blocks = -(-pad // br._BLOCK)
r_amp = amp_u.shape[1]


def place_only(delays_s, g):
    def place_one(args):
        delays_si, g_i = args
        d = delays_si * sr
        base = jnp.floor(d)
        frac = d - base
        blk = (base.astype(jnp.int32) + br.SINC_HALF) // br._BLOCK
        j = jnp.arange(win, dtype=jnp.float32)
        s1 = float(br.SINC_HALF + 1)
        ioff_i = base.astype(jnp.int32) + 2 * br.SINC_HALF - blk * br._BLOCK
        ioff = ioff_i.astype(jnp.float32)
        jm = j[None, :] - ioff[:, None]
        t = jm - frac[:, None]
        sin_off = jnp.where(ioff_i % 2 == 0, 1.0, -1.0) * jnp.sin(jnp.pi * frac)
        sign_j = jnp.where(j % 2.0 == 0, 1.0, -1.0)
        sinc_t = jnp.where(
            jnp.abs(t) < 1e-6, 1.0,
            (-sign_j[None, :] * sin_off[:, None]) / (jnp.pi * t))
        a = jnp.pi * (j % (2.0 * s1)) / s1
        b = jnp.pi * ((ioff_i % int(2 * s1)).astype(jnp.float32) + frac) / s1
        window = 0.5 + 0.5 * (
            jnp.cos(a)[None, :] * jnp.cos(b)[:, None]
            + jnp.sin(a)[None, :] * jnp.sin(b)[:, None])
        mask = jnp.abs(jm) <= br.SINC_HALF
        vals = jnp.where(mask, sinc_t * window, 0.0) * g_i[:, None]
        onehot = jax.nn.one_hot(blk, n_blocks, dtype=jnp.float32)
        w_nb = (amp_u[:, :, None] * onehot[:, None, :]).reshape(
            amp_u.shape[0], r_amp * n_blocks)
        accw = jnp.einsum(
            "nr,nw->rw", w_nb, vals, precision=jax.lax.Precision.HIGH
        ).reshape(r_amp, n_blocks, win)
        spill = win - br._BLOCK
        head = accw[:, :, :br._BLOCK].reshape(r_amp, n_blocks * br._BLOCK)
        tail = jnp.pad(
            accw[:, :, br._BLOCK:], ((0, 0), (0, 0), (0, br._BLOCK - spill))
        ).reshape(r_amp, n_blocks * br._BLOCK)
        acc_pad = jnp.zeros((r_amp, n_blocks * br._BLOCK + win), jnp.float32)
        acc_pad = acc_pad.at[:, : n_blocks * br._BLOCK].add(head)
        acc_pad = acc_pad.at[:, br._BLOCK: br._BLOCK + n_blocks * br._BLOCK].add(tail)
        return acc_pad[:, 2 * br.SINC_HALF: 2 * br.SINC_HALF + ir_len]

    return jax.lax.map(place_one, (delays_s, g), batch_size=br._PLACE_BATCH)


accs = timeit("placement map (taps+einsum+OLA)", jax.jit(place_only), delays_s, g)


# variant: tap eval only (no einsum / OLA), same map structure
def taps_only(delays_s, g):
    def one(args):
        delays_si, g_i = args
        d = delays_si * sr
        base = jnp.floor(d)
        frac = d - base
        blk = (base.astype(jnp.int32) + br.SINC_HALF) // br._BLOCK
        j = jnp.arange(win, dtype=jnp.float32)
        s1 = float(br.SINC_HALF + 1)
        ioff_i = base.astype(jnp.int32) + 2 * br.SINC_HALF - blk * br._BLOCK
        ioff = ioff_i.astype(jnp.float32)
        jm = j[None, :] - ioff[:, None]
        t = jm - frac[:, None]
        sin_off = jnp.where(ioff_i % 2 == 0, 1.0, -1.0) * jnp.sin(jnp.pi * frac)
        sign_j = jnp.where(j % 2.0 == 0, 1.0, -1.0)
        sinc_t = jnp.where(
            jnp.abs(t) < 1e-6, 1.0,
            (-sign_j[None, :] * sin_off[:, None]) / (jnp.pi * t))
        a = jnp.pi * (j % (2.0 * s1)) / s1
        b = jnp.pi * ((ioff_i % int(2 * s1)).astype(jnp.float32) + frac) / s1
        window = 0.5 + 0.5 * (
            jnp.cos(a)[None, :] * jnp.cos(b)[:, None]
            + jnp.sin(a)[None, :] * jnp.sin(b)[:, None])
        mask = jnp.abs(jm) <= br.SINC_HALF
        vals = jnp.where(mask, sinc_t * window, 0.0) * g_i[:, None]
        return jnp.sum(vals, axis=0)  # cheap reduce to keep it live

    return jax.lax.map(one, (delays_s, g), batch_size=br._PLACE_BATCH)


timeit("tap eval only (+reduce)", jax.jit(taps_only), delays_s, g)


# variant: einsum with r=1 (exact rank for uniform room)
def place_r1(delays_s, g):
    au1 = amp_u[:, :1]

    def place_one(args):
        delays_si, g_i = args
        d = delays_si * sr
        base = jnp.floor(d)
        frac = d - base
        blk = (base.astype(jnp.int32) + br.SINC_HALF) // br._BLOCK
        j = jnp.arange(win, dtype=jnp.float32)
        s1 = float(br.SINC_HALF + 1)
        ioff_i = base.astype(jnp.int32) + 2 * br.SINC_HALF - blk * br._BLOCK
        ioff = ioff_i.astype(jnp.float32)
        jm = j[None, :] - ioff[:, None]
        t = jm - frac[:, None]
        sin_off = jnp.where(ioff_i % 2 == 0, 1.0, -1.0) * jnp.sin(jnp.pi * frac)
        sign_j = jnp.where(j % 2.0 == 0, 1.0, -1.0)
        sinc_t = jnp.where(
            jnp.abs(t) < 1e-6, 1.0,
            (-sign_j[None, :] * sin_off[:, None]) / (jnp.pi * t))
        a = jnp.pi * (j % (2.0 * s1)) / s1
        b = jnp.pi * ((ioff_i % int(2 * s1)).astype(jnp.float32) + frac) / s1
        window = 0.5 + 0.5 * (
            jnp.cos(a)[None, :] * jnp.cos(b)[:, None]
            + jnp.sin(a)[None, :] * jnp.sin(b)[:, None])
        mask = jnp.abs(jm) <= br.SINC_HALF
        vals = jnp.where(mask, sinc_t * window, 0.0) * (
            g_i * au1[:, 0])[:, None]
        onehot = jax.nn.one_hot(blk, n_blocks, dtype=jnp.float32)
        accw = jnp.einsum(
            "nb,nw->bw", onehot, vals, precision=jax.lax.Precision.HIGH
        ).reshape(1, n_blocks, win)
        spill = win - br._BLOCK
        head = accw[:, :, :br._BLOCK].reshape(1, n_blocks * br._BLOCK)
        tail = jnp.pad(
            accw[:, :, br._BLOCK:], ((0, 0), (0, 0), (0, br._BLOCK - spill))
        ).reshape(1, n_blocks * br._BLOCK)
        acc_pad = jnp.zeros((1, n_blocks * br._BLOCK + win), jnp.float32)
        acc_pad = acc_pad.at[:, : n_blocks * br._BLOCK].add(head)
        acc_pad = acc_pad.at[:, br._BLOCK: br._BLOCK + n_blocks * br._BLOCK].add(tail)
        return acc_pad[:, 2 * br.SINC_HALF: 2 * br.SINC_HALF + ir_len]

    return jax.lax.map(place_one, (delays_s, g), batch_size=br._PLACE_BATCH)


timeit("placement map r=1", jax.jit(place_r1), delays_s, g)

# --- tail stages ------------------------------------------------------------
noise_keys = jax.vmap(tail_noise_key)(
    jnp.asarray(seeds.astype(np.uint32)), jnp.asarray(chan_idx))


def tail_only(delays_s, g, valid, accs):
    big = jnp.float32(1e30)
    t_direct = jnp.min(jnp.where(valid, delays_s, big), axis=1)
    t_direct = jnp.where(jnp.any(valid, axis=1), t_direct, 0.0)
    mix_sel = (valid & (delays_s > t_direct[:, None] + 0.03)
               & (delays_s < t_direct[:, None] + 0.08))
    sel_sum = jnp.einsum("pn,nb->pb", jnp.where(mix_sel, g * g, 0.0),
                         amp_nb * amp_nb)
    k = jnp.sum(mix_sel, axis=1)
    level_sel = jnp.sqrt(sel_sum / jnp.maximum(k, 1)[:, None])
    level_fb = 0.05 * jax.lax.map(
        lambda a: jnp.max(
            jnp.where(a[1][:, None], jnp.abs(a[0])[:, None] * amp_nb, 0.0),
            axis=0),
        (g, valid), batch_size=br._PLACE_BATCH)
    level = jnp.where((k > 0)[:, None], level_sel, level_fb)
    noise = jax.vmap(
        lambda key: jax.random.normal(key, (n_bands, ir_len), jnp.float32)
    )(noise_keys)
    t_axis = jnp.arange(ir_len, dtype=jnp.float32) / sr
    decay = jnp.exp(-6.908 * jnp.maximum(
        t_axis[None, None, :] - t_direct[:, None, None], 0.0)
        / rt60_j[None, :, None])
    ramp = jnp.clip((t_axis[None, :] - t_direct[:, None]) / 0.02, 0.0, 1.0) ** 2
    shaped = noise * (level[:, :, None] * decay * ramp[:, None, :])
    tail_spec = (jnp.fft.rfft(shaped, nfft, axis=-1) * masks[None]).sum(axis=1)
    spec = jnp.fft.rfft(accs, nfft, axis=-1)
    vmask = jnp.einsum("qb,bf->qf", amp_v, masks)
    early_spec = jnp.einsum("pqf,qf->pf", spec, vmask)
    return jnp.fft.irfft(early_spec + tail_spec, nfft, axis=-1)[:, :ir_len]


timeit("tail+levels+ffts", jax.jit(tail_only), delays_s, g, valid, accs)


def levels_only(delays_s, g, valid):
    big = jnp.float32(1e30)
    t_direct = jnp.min(jnp.where(valid, delays_s, big), axis=1)
    t_direct = jnp.where(jnp.any(valid, axis=1), t_direct, 0.0)
    mix_sel = (valid & (delays_s > t_direct[:, None] + 0.03)
               & (delays_s < t_direct[:, None] + 0.08))
    sel_sum = jnp.einsum("pn,nb->pb", jnp.where(mix_sel, g * g, 0.0),
                         amp_nb * amp_nb)
    k = jnp.sum(mix_sel, axis=1)
    level_sel = jnp.sqrt(sel_sum / jnp.maximum(k, 1)[:, None])
    level_fb = 0.05 * jax.lax.map(
        lambda a: jnp.max(
            jnp.where(a[1][:, None], jnp.abs(a[0])[:, None] * amp_nb, 0.0),
            axis=0),
        (g, valid), batch_size=br._PLACE_BATCH)
    return jnp.where((k > 0)[:, None], level_sel, level_fb)


timeit("levels only (sel+fallback map)", jax.jit(levels_only), delays_s, g, valid)


def noise_fft_only(delays_s, valid, level):
    big = jnp.float32(1e30)
    t_direct = jnp.min(jnp.where(valid, delays_s, big), axis=1)
    t_direct = jnp.where(jnp.any(valid, axis=1), t_direct, 0.0)
    noise = jax.vmap(
        lambda key: jax.random.normal(key, (n_bands, ir_len), jnp.float32)
    )(noise_keys)
    t_axis = jnp.arange(ir_len, dtype=jnp.float32) / sr
    decay = jnp.exp(-6.908 * jnp.maximum(
        t_axis[None, None, :] - t_direct[:, None, None], 0.0)
        / rt60_j[None, :, None])
    ramp = jnp.clip((t_axis[None, :] - t_direct[:, None]) / 0.02, 0.0, 1.0) ** 2
    shaped = noise * (level[:, :, None] * decay * ramp[:, None, :])
    tail_spec = (jnp.fft.rfft(shaped, nfft, axis=-1) * masks[None]).sum(axis=1)
    return jnp.fft.irfft(tail_spec, nfft, axis=-1)[:, :ir_len]


lv = jnp.ones((n_items, n_bands), jnp.float32) * 1e-3
timeit("noise+shape+fft tail", jax.jit(noise_fft_only), delays_s, valid, lv)


# --- tail micro-components --------------------------------------------------
def rng_only(keys):
    return jax.vmap(
        lambda key: jax.random.normal(key, (n_bands, ir_len), jnp.float32)
    )(keys)


timeit("tail RNG only (P,B,L) normals", jax.jit(rng_only), noise_keys)


def exp_decay_only(delays_s, valid):
    big = jnp.float32(1e30)
    t_direct = jnp.min(jnp.where(valid, delays_s, big), axis=1)
    t_direct = jnp.where(jnp.any(valid, axis=1), t_direct, 0.0)
    t_axis = jnp.arange(ir_len, dtype=jnp.float32) / sr
    decay = jnp.exp(-6.908 * jnp.maximum(
        t_axis[None, None, :] - t_direct[:, None, None], 0.0)
        / rt60_j[None, :, None])
    return decay.sum(axis=(1, 2))


timeit("exp decay (P,B,L) dense", jax.jit(exp_decay_only), delays_s, valid)


def exp_decay_factored(delays_s, valid):
    big = jnp.float32(1e30)
    t_direct = jnp.min(jnp.where(valid, delays_s, big), axis=1)
    t_direct = jnp.where(jnp.any(valid, axis=1), t_direct, 0.0)
    t_axis = jnp.arange(ir_len, dtype=jnp.float32) / sr
    k_b = 6.908 / rt60_j  # (B,)
    base = jnp.exp(-k_b[:, None] * t_axis[None, :])        # (B, L)
    lift = jnp.exp(k_b[None, :] * t_direct[:, None])       # (P, B)
    decay = lift[:, :, None] * base[None, :, :]
    return decay.sum(axis=(1, 2))


timeit("exp decay factored", jax.jit(exp_decay_factored), delays_s, valid)


def fft_only(x):
    return (jnp.fft.rfft(x, nfft, axis=-1) * masks[None]).sum(axis=1)


big_noise = jax.jit(rng_only)(noise_keys)
jax.block_until_ready(big_noise)
timeit("rfft (P,B,nfft) + mask-sum", jax.jit(fft_only), big_noise)


def irfft_only(x):
    return jnp.fft.irfft(x, nfft, axis=-1)[:, :ir_len]


spec1 = jax.jit(fft_only)(big_noise)
jax.block_until_ready(spec1)
timeit("irfft (P,nfft)", jax.jit(irfft_only), spec1)
