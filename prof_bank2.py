"""Prototype: trig-identity tap evaluation + geometry breakdown."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()

from sonicsim_tpu.sim.bank_render import (
    _bank_params, _flatten_items, _device_geometry, _CHUNK, _BLOCK, _PLACE_BATCH,
)
from sonicsim_tpu.sim.channels import ChannelModel
from sonicsim_tpu.sim.image_source import ShoeboxRoom, SINC_HALF, SPEED_OF_SOUND
from sonicsim_tpu.sim.oracle import SyntheticRirOracle

room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
oracle = SyntheticRirOracle(room, n_bands=32, max_order=4)
ch = ChannelModel("Binaural")
mic = [np.array([4.0, 1.5, 3.0])]
def speaker_ways(k):
    r = np.random.default_rng(1000 + k)
    return [r.uniform([1, 1, 1], [7, 2.5, 5]) for _ in range(40)]
ir_params = _bank_params(oracle)
(_, rt60_bands, ir_seconds, ir_len, nfft, beta, n_classes) = ir_params
parts = [_flatten_items(oracle, speaker_ways(i), mic, ch, [90.0]) for i in range(3)]
cat = [np.concatenate([p[i] for p in parts]) for i in range(5)]
srcs_flat, recvs_flat, normals, chan_idx, seeds = cat
n_items = len(srcs_flat)
padn = (-n_items) % _CHUNK
def padded(a):
    if padn:
        a = np.concatenate([a, np.repeat(a[:1], padn, axis=0)])
    return jnp.asarray(a)
dims = jnp.asarray(np.asarray(room.dims, np.float32))
srcs_j, recvs_j, chan_j, norm_j = padded(srcs_flat), padded(recvs_flat), padded(chan_idx), padded(normals)
max_order, max_delay, sr = oracle.max_order, float(ir_seconds), oracle.sample_rate

def timeit(fn, *args, iters=3, tag=""):
    out = fn(*args)
    jax.tree.map(lambda a: float(jnp.ravel(a)[0].astype(jnp.float32)), out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: float(jnp.ravel(a)[0].astype(jnp.float32)), out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:38s} {best*1e3:9.2f} ms")
    return out

# --- geometry breakdown ---
@jax.jit
def geom_only(dims, srcs, recvs):
    return _device_geometry(dims, srcs, recvs, max_order, max_delay)
delays_s, hits, dirs, valid = timeit(geom_only, dims, srcs_j, recvs_j, tag="geometry only")

@jax.jit
def gains_only(dirs, delays_s, valid, normals):
    gain = 0.6 + 0.4 * jnp.einsum("pnd,pd->pn", dirs, normals)
    return jnp.where(valid, gain / (4.0 * jnp.pi * delays_s * SPEED_OF_SOUND + 1e-30), 0.0).astype(jnp.float32)
g = timeit(gains_only, dirs, delays_s, valid, norm_j, tag="gains only")

# --- new placement with trig identities ---
pad = ir_len + 2 * SINC_HALF + 2
win = _BLOCK + 128
n_blocks = -(-pad // _BLOCK)

def place_one_new(args):
    delays_si, hits_i, g_i = args
    d = delays_si * sr
    base = jnp.floor(d)
    frac = d - base                       # in [0,1)
    row = base.astype(jnp.int32) + SINC_HALF
    blk = row // _BLOCK
    j = jnp.arange(win, dtype=jnp.float32)
    off = d + 2 * SINC_HALF - (blk * _BLOCK).astype(jnp.float32)
    # t = j - off; sin(pi t) = -(-1)^j sin(pi off); off = int + frac where
    # int = base+2S-blk*B so (-1)^off int part folds into per-image sign.
    # sin(pi*off) = sin(pi*(int_off + frac)) = (-1)^int_off * sin(pi*frac)
    int_off = (base + 2 * SINC_HALF - (blk * _BLOCK).astype(jnp.float32))  # integer part is base-derived
    # off - frac = integer
    ioff = off - frac
    sin_off = jnp.where((ioff % 2.0) == 0, 1.0, -1.0) * jnp.sin(jnp.pi * frac)
    sign_j = jnp.where((j % 2.0) == 0, 1.0, -1.0)
    t = j[None, :] - off[:, None]
    sinpt = -sign_j[None, :] * sin_off[:, None]
    sinc = jnp.where(jnp.abs(t) < 1e-6, 1.0, sinpt / (jnp.pi * t))
    # hann: 0.5 + 0.5 cos(pi t / (S+1)) = 0.5 + 0.5(cos_a cos_b + sin_a sin_b)
    S1 = SINC_HALF + 1
    a = jnp.pi * j / S1
    b = jnp.pi * off / S1
    window = 0.5 + 0.5 * (jnp.cos(a)[None, :] * jnp.cos(b)[:, None]
                          + jnp.sin(a)[None, :] * jnp.sin(b)[:, None])
    lb = base + 2 * SINC_HALF - (blk * _BLOCK).astype(jnp.float32)
    mask = (j[None, :] >= lb[:, None] - SINC_HALF) & (j[None, :] <= lb[:, None] + SINC_HALF)
    vals = jnp.where(mask, sinc * window, 0.0) * g_i[:, None]
    q = jnp.clip(hits_i, 0, n_classes - 1) * n_blocks + blk
    onehot = jax.nn.one_hot(q, n_classes * n_blocks, dtype=jnp.float32)
    accw = jnp.einsum("nr,nw->rw", onehot, vals, precision=jax.lax.Precision.HIGH).reshape(n_classes, n_blocks, win)
    acc_pad = jnp.zeros((n_classes, n_blocks * _BLOCK + win), jnp.float32)
    for bb in range(n_blocks):
        acc_pad = acc_pad.at[:, bb * _BLOCK : bb * _BLOCK + win].add(accw[:, bb])
    return acc_pad[:, 2 * SINC_HALF : 2 * SINC_HALF + ir_len]

for bs in (8, 16, 32):
    @jax.jit
    def place_new(delays_s, hits, g, bs=bs):
        return jax.lax.map(place_one_new, (delays_s, hits, g), batch_size=bs)
    accs_new = timeit(place_new, delays_s, hits, g, tag=f"placement NEW bs={bs}")

# compare vs old for numerics
from sonicsim_tpu.sim import bank_render as br
def place_one_old(args):
    delays_si, hits_i, g_i = args
    d = delays_si * sr
    base = jnp.floor(d)
    row = base.astype(jnp.int32) + SINC_HALF
    blk = row // _BLOCK
    j = jnp.arange(win, dtype=jnp.float32)
    off = d + 2 * SINC_HALF - (blk * _BLOCK).astype(jnp.float32)
    t = j[None, :] - off[:, None]
    window = 0.5 + 0.5 * jnp.cos(jnp.pi * t / (SINC_HALF + 1))
    lb = base + 2 * SINC_HALF - (blk * _BLOCK).astype(jnp.float32)
    mask = (j[None, :] >= lb[:, None] - SINC_HALF) & (j[None, :] <= lb[:, None] + SINC_HALF)
    vals = jnp.where(mask, jnp.sinc(t) * window, 0.0) * g_i[:, None]
    q = jnp.clip(hits_i, 0, n_classes - 1) * n_blocks + blk
    onehot = jax.nn.one_hot(q, n_classes * n_blocks, dtype=jnp.float32)
    accw = jnp.einsum("nr,nw->rw", onehot, vals, precision=jax.lax.Precision.HIGH).reshape(n_classes, n_blocks, win)
    acc_pad = jnp.zeros((n_classes, n_blocks * _BLOCK + win), jnp.float32)
    for bb in range(n_blocks):
        acc_pad = acc_pad.at[:, bb * _BLOCK : bb * _BLOCK + win].add(accw[:, bb])
    return acc_pad[:, 2 * SINC_HALF : 2 * SINC_HALF + ir_len]

@jax.jit
def place_old(delays_s, hits, g):
    return jax.lax.map(place_one_old, (delays_s, hits, g), batch_size=_PLACE_BATCH)
accs_old = timeit(place_old, delays_s, hits, g, tag="placement OLD bs=8")

d = jnp.max(jnp.abs(accs_new - accs_old))
m = jnp.max(jnp.abs(accs_old))
print("max abs diff new-vs-old:", float(d), "max mag:", float(m), "rel:", float(d/m))
