"""priordepth_gaussiansplatting_tpu — a TPU-native differentiable 3D Gaussian
Splatting framework in JAX/Pallas.

Re-implements (from scratch, TPU-first) the capabilities of the reference
Martisum/PriorDepth-GaussianSplatting: the Inria-3DGS training stack with depth
regularization, exposure compensation, antialiasing, sparse Adam, monocular
depth-prior scale alignment, and depth-prior-guided floating-object pruning.

Layer map (see SURVEY.md §7):
  core/      pure math: SH, quaternions, camera matrices, LR schedules
  ops/       compute kernels: oracle jnp rasterizer, Pallas tile rasterizer,
             KNN, SSIM, losses
  models/    Gaussian parameter pytree with fixed-capacity densify/prune
  train/     jitted train step, trainer loop, depth-prior prune module
  data/      COLMAP / Blender / PLY / depth-params IO (byte-compatible formats)
  parallel/  device mesh + shard_map tile/camera sharding
  eval/      PSNR / SSIM / LPIPS metrics and render harness
  viewer/    network-GUI socket protocol (byte-compatible with SIBR remote)
"""

__version__ = "0.1.0"
