"""rtvb_tpu — Real-Time Voxel Blocks, TPU-native.

A brand-new real-time path-traced voxel game engine built TPU-first on
JAX/XLA/Pallas.  Capability reference: wangkepfe/Real-time-path-tracing-voxel-blocks
(C++/CUDA/OptiX); architecture here is wavefront rendering over SoA ray buffers
with voxel-grid DDA traversal (no BVH), fused framebuffer kernels for the
denoiser/post stack, and all persistent state resident in HBM as JAX pytrees.
"""

__version__ = "0.1.0"
