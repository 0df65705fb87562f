"""SonicSim-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the SonicSim platform.

Three decoupled stacks, mirroring the reference's capabilities
(JusperLee/SonicSim; see SURVEY.md):

1. ``sonicsim_tpu.sim`` + ``sonicsim_tpu.ops`` — acoustic simulation platform:
   RIR oracles (precomputed banks / synthetic image-source), moving-source
   time-varying convolution, audio assembly/mixing, loudness normalization,
   trajectory sampling. The hot DSP is batched JAX/XLA (Pallas for fused
   epilogues) instead of scipy loops.
2. ``sonicsim_tpu.dataset`` — SonicSet generation pipeline: seeded host-side
   *planners* emit static mixture plans; jitted device-side *executors*
   render mixtures sharded over a device mesh.
3. ``sonicsim_tpu.models/losses/metrics/train/infer`` — benchmark harness:
   separation + enhancement model zoos, PIT/SI-SDR losses, eval battery and
   a pjit data-parallel trainer.
"""

__version__ = "0.1.0"
