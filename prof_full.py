import time
import numpy as np, jax, jax.numpy as jnp
from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
from sonicsim_tpu.sim.bank_render import render_rir_banks
from sonicsim_tpu.sim.channels import ChannelModel
from sonicsim_tpu.sim.image_source import ShoeboxRoom
from sonicsim_tpu.sim.oracle import SyntheticRirOracle

room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
oracle = SyntheticRirOracle(room, n_bands=32, max_order=4)
ch = ChannelModel("Binaural")
mic = [np.array([4.0, 1.5, 3.0])]
def ways(k):
    r = np.random.default_rng(1000 + k)
    return [r.uniform([1,1,1],[7,2.5,5]) for _ in range(40)]

warm = render_rir_banks(oracle, [ways(90+i) for i in range(3)], mic, ch, out_device=True)
for b in warm: float(b.ravel()[0])
sr = 16000
best = 1e9
for rep in range(4):
    t0 = time.perf_counter()
    ir_sec = 0.0
    for it in range(3):
        banks = render_rir_banks(oracle, [ways(100*rep+3*it+i) for i in range(3)], mic, ch, out_device=True)
        ir_sec += sum(b.shape[0]*b.shape[1]*b.shape[2]*b.shape[3]/sr for b in banks)
        for b in banks: float(b.ravel()[0])
    best = min(best, (time.perf_counter()-t0))
print(f"bank render: {ir_sec/best:9.1f} audio-s/s  ({best*1e3/3:.1f} ms per 3-bank render)")
