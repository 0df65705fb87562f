import time
import numpy as np, jax, jax.numpy as jnp
from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
from sonicsim_tpu.sim.image_source import SPEED_OF_SOUND

P, m = 272, 4
K = 2*(2*m+1)
rng = np.random.default_rng(0)
dims = jnp.asarray(np.array([8.,3.,6.], np.float32))
srcs = jnp.asarray(rng.uniform(1, 3, (P,3)).astype(np.float32))
recvs = jnp.asarray(rng.uniform(1, 3, (P,3)).astype(np.float32))
max_delay = 0.4

def timeit(fn, *args, iters=5, tag=""):
    out = fn(*args)
    jax.tree.map(lambda a: float(jnp.ravel(a)[0].astype(jnp.float32)), out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: float(jnp.ravel(a)[0].astype(jnp.float32)), out)
        best = min(best, time.perf_counter()-t0)
    print(f"{tag:34s} {best*1e3:8.2f} ms")
    return out

@jax.jit
def coords(dims, srcs, recvs):
    n = jnp.arange(-m, m+1, dtype=jnp.float32)
    p = jnp.arange(2, dtype=jnp.float32)
    coeff = (1.0-2.0*p)[None,:]
    per_axis, hits_axis = [], []
    for ax in range(3):
        coord = coeff[None]*srcs[:,ax,None,None] + (2.0*n[:,None]*dims[ax])[None]
        hits = jnp.abs(n[:,None]-p[None,:]) + jnp.abs(n[:,None])
        per_axis.append(coord.reshape(P,-1))
        hits_axis.append(hits.reshape(-1))
    return per_axis, hits_axis

pa, ha = timeit(coords, dims, srcs, recvs, tag="per-axis coords")

@jax.jit
def full_lattice(dims, srcs, recvs):
    n = jnp.arange(-m, m+1, dtype=jnp.float32)
    p = jnp.arange(2, dtype=jnp.float32)
    coeff = (1.0-2.0*p)[None,:]
    per_axis, hits_axis = [], []
    for ax in range(3):
        coord = coeff[None]*srcs[:,ax,None,None] + (2.0*n[:,None]*dims[ax])[None]
        hits = jnp.abs(n[:,None]-p[None,:]) + jnp.abs(n[:,None])
        per_axis.append(coord.reshape(P,-1))
        hits_axis.append(hits.reshape(-1))
    ix = per_axis[0][:,:,None,None]; iy = per_axis[1][:,None,:,None]; iz = per_axis[2][:,None,None,:]
    imgs = jnp.stack([jnp.broadcast_to(ix,(P,K,K,K)), jnp.broadcast_to(iy,(P,K,K,K)), jnp.broadcast_to(iz,(P,K,K,K))], axis=-1).reshape(P, K*K*K, 3)
    diff = imgs - recvs[:,None,:]
    dist = jnp.sqrt(jnp.sum(diff*diff, axis=-1))
    return dist

dist = timeit(full_lattice, dims, srcs, recvs, tag="lattice imgs+dist (stack/3)")

@jax.jit
def separable(dims, srcs, recvs):
    n = jnp.arange(-m, m+1, dtype=jnp.float32)
    p = jnp.arange(2, dtype=jnp.float32)
    coeff = (1.0-2.0*p)[None,:]
    dcomp = []
    for ax in range(3):
        coord = coeff[None]*srcs[:,ax,None,None] + (2.0*n[:,None]*dims[ax])[None]
        dcomp.append(coord.reshape(P,-1) - recvs[:,ax,None])  # (P,K)
    dx, dy, dz = dcomp
    d2 = (dx*dx)[:,:,None,None] + (dy*dy)[:,None,:,None] + (dz*dz)[:,None,None,:]
    dist = jnp.sqrt(d2).reshape(P, K*K*K)
    return dist

dist2 = timeit(separable, dims, srcs, recvs, tag="separable dist")
print("sep == stacked:", float(jnp.max(jnp.abs(dist2-dist))))

@jax.jit
def dirs_full(dims, srcs, recvs):
    d = separable(dims, srcs, recvs)
    n = jnp.arange(-m, m+1, dtype=jnp.float32)
    p = jnp.arange(2, dtype=jnp.float32)
    coeff = (1.0-2.0*p)[None,:]
    dcomp = []
    for ax in range(3):
        coord = coeff[None]*srcs[:,ax,None,None] + (2.0*n[:,None]*dims[ax])[None]
        dcomp.append(coord.reshape(P,-1) - recvs[:,ax,None])
    dx, dy, dz = dcomp
    inv = 1.0/jnp.maximum(d, 1e-9)
    # binaural gain via separable dot: (diff . normal)/dist
    nrm = jnp.ones((P,3), jnp.float32)*0.577
    dot = (dx*nrm[:,0:1])[:,:,None,None] + (dy*nrm[:,1:2])[:,None,:,None] + (dz*nrm[:,2:3])[:,None,None,:]
    gain = 0.6 + 0.4*dot.reshape(P,-1)*inv
    return gain
timeit(dirs_full, dims, srcs, recvs, tag="separable dist+binaural gain")
