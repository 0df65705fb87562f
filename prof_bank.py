"""Profile the bank-render dispatch stage by stage on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()

from sonicsim_tpu.sim.bank_render import (
    _bank_params, _cached_masks, _device_geometry, _flatten_items,
    _real_sh, _CHUNK, _BLOCK, _PLACE_BATCH,
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
print("ir_len", ir_len, "nfft", nfft, "n_classes", n_classes)

parts = [_flatten_items(oracle, speaker_ways(i), mic, ch, [90.0]) for i in range(3)]
cat = [np.concatenate([p[i] for p in parts]) for i in range(5)]
srcs_flat, recvs_flat, normals, chan_idx, seeds = cat
n_items = len(srcs_flat)
print("items", n_items)
padn = (-n_items) % _CHUNK
def padded(a):
    if padn:
        a = np.concatenate([a, np.repeat(a[:1], padn, axis=0)])
    return jnp.asarray(a)

dims = jnp.asarray(np.asarray(room.dims, np.float32))
srcs_j, recvs_j, chan_j, norm_j, seeds_j = (
    padded(srcs_flat), padded(recvs_flat), padded(chan_idx), padded(normals),
    padded(seeds.astype(np.uint32)))
beta_j = jnp.asarray(beta, jnp.float32)
masks_j = _cached_masks(oracle.n_bands, nfft, oracle.sample_rate)
rt60_j = jnp.asarray(rt60_bands, jnp.float32)
P = srcs_j.shape[0]

max_order, max_delay, sr = oracle.max_order, float(ir_seconds), oracle.sample_rate

def timeit(fn, *args, iters=3, tag=""):
    out = fn(*args)
    # force
    jax.tree.map(lambda a: float(jnp.ravel(a)[0].astype(jnp.float32)), out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: float(jnp.ravel(a)[0].astype(jnp.float32)), out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:35s} {best*1e3:9.2f} ms")
    return out

# 1. geometry + gains
@jax.jit
def geom(dims, srcs, recvs, normals):
    delays_s, hits, dirs, valid = _device_geometry(dims, srcs, recvs, max_order, max_delay)
    gain = 0.6 + 0.4 * jnp.einsum("pnd,pd->pn", dirs, normals)
    g = jnp.where(valid, gain / (4.0 * jnp.pi * delays_s * SPEED_OF_SOUND + 1e-30), 0.0).astype(jnp.float32)
    return delays_s, hits, g, valid

delays_s, hits, g, valid = timeit(geom, dims, srcs_j, recvs_j, norm_j, tag="geometry+gains")

pad = ir_len + 2 * SINC_HALF + 2
win = _BLOCK + 128
n_blocks = -(-pad // _BLOCK)

def place_one(args):
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
    for b in range(n_blocks):
        acc_pad = acc_pad.at[:, b * _BLOCK : b * _BLOCK + win].add(accw[:, b])
    return acc_pad[:, 2 * SINC_HALF : 2 * SINC_HALF + ir_len]

@jax.jit
def place_all(delays_s, hits, g):
    return jax.lax.map(place_one, (delays_s, hits, g), batch_size=_PLACE_BATCH)

accs = timeit(place_all, delays_s, hits, g, tag=f"placement map bs={_PLACE_BATCH}")

# vals-only cost (no einsum)
def vals_one(args):
    delays_si, hits_i, g_i = args
    d = delays_si * sr
    base = jnp.floor(d)
    blk = (base.astype(jnp.int32) + SINC_HALF) // _BLOCK
    j = jnp.arange(win, dtype=jnp.float32)
    off = d + 2 * SINC_HALF - (blk * _BLOCK).astype(jnp.float32)
    t = j[None, :] - off[:, None]
    window = 0.5 + 0.5 * jnp.cos(jnp.pi * t / (SINC_HALF + 1))
    lb = base + 2 * SINC_HALF - (blk * _BLOCK).astype(jnp.float32)
    mask = (j[None, :] >= lb[:, None] - SINC_HALF) & (j[None, :] <= lb[:, None] + SINC_HALF)
    vals = jnp.where(mask, jnp.sinc(t) * window, 0.0) * g_i[:, None]
    return vals.sum(axis=0)

@jax.jit
def vals_all(delays_s, hits, g):
    return jax.lax.map(vals_one, (delays_s, hits, g), batch_size=_PLACE_BATCH)

timeit(vals_all, delays_s, hits, g, tag="vals elementwise only")

# onehot-only cost
def oh_one(args):
    delays_si, hits_i, g_i = args
    d = delays_si * sr
    base = jnp.floor(d)
    blk = (base.astype(jnp.int32) + SINC_HALF) // _BLOCK
    q = jnp.clip(hits_i, 0, n_classes - 1) * n_blocks + blk
    onehot = jax.nn.one_hot(q, n_classes * n_blocks, dtype=jnp.float32)
    return onehot.sum(axis=0)

@jax.jit
def oh_all(delays_s, hits, g):
    return jax.lax.map(oh_one, (delays_s, hits, g), batch_size=_PLACE_BATCH)

timeit(oh_all, delays_s, hits, g, tag="onehot elementwise only")

# FFT/band expansion + tail (everything after placement)
from sonicsim_tpu.sim.bank_render import _assemble_core
from sonicsim_tpu.sim.image_source import tail_noise_key

@jax.jit
def post(accs, delays_s, hits, g, valid, seeds, chan_idx):
    band_profile = beta_j[:, None] ** jnp.arange(n_classes, dtype=jnp.float32)[None, :]
    class_filt = jnp.einsum("bc,bf->cf", band_profile, masks_j)
    spec = jnp.fft.rfft(accs, nfft, axis=-1)
    early = jnp.fft.irfft((spec * class_filt[None]).sum(axis=1), nfft, axis=-1)[:, :ir_len]
    return early

timeit(post, accs, delays_s, hits, g, valid, seeds_j, chan_j, tag="early FFT/band expansion")

# full assemble for comparison
noise_keys = jax.jit(jax.vmap(tail_noise_key))(seeds_j, chan_j)
@jax.jit
def full(delays_s, hits, g, valid, noise_keys):
    return _assemble_core(delays_s, hits, g, valid, noise_keys, beta_j, masks_j,
                          rt60_j, sr, ir_len, nfft, n_classes)
timeit(full, delays_s, hits, g, valid, noise_keys, tag="full assemble_core")
