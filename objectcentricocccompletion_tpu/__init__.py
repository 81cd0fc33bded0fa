"""objectcentricocccompletion_tpu: a TPU-native (JAX/XLA/Pallas) framework for
object-centric occupancy completion and 3D detection on LiDAR tracklets.

This is a from-scratch, TPU-first rebuild of the capabilities of the
ObjectCentricOccCompletion reference (NeurIPS 2024, arXiv 2412.05154): the
OcOccNet tracklet refinement + occupancy completion stack, the upstream
detectors (CenterPoint / SST / FSD), offline occupancy GT annotation, and the
Waymo evaluation tooling.

Design stance (vs. the reference's mmdet3d/CUDA architecture):
  * everything is a pure function over pytrees; models are flax modules,
  * all dynamic structures (variable point counts, tracklet lengths, voxel
    counts) become *dense static-shape arrays with validity masks* so that a
    single XLA compilation serves every batch,
  * scatter/gather CUDA kernels become masked segment reductions / dense
    reductions that XLA fuses onto the VPU/MXU,
  * distribution is SPMD over a `jax.sharding.Mesh` (data-parallel tracklets,
    `psum` gradients/avg-factors) instead of DDP/NCCL.
"""

__version__ = "0.1.0"
