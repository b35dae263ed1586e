"""dspslam_tpu — a TPU-native object-aware SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of DSP-SLAM
("Object Oriented SLAM with Deep Shape Priors", reference at
/root/reference): feature-based SLAM (mono / stereo / stereo+LiDAR) with
per-object 7-DoF Sim(3) pose + DeepSDF shape-code reconstruction via a
second-order Gauss-Newton optimizer, joint camera-object-point bundle
adjustment, loop closing, and mesh export.

Design stance (vs. the reference's C++17 + embedded CPython + CUDA stack):

* **Python-first, device-pure.** All numerics — the DeepSDF decoder,
  surface/render/rotation losses, Gauss-Newton and Levenberg-Marquardt
  solvers, ORB feature kernels, descriptor matching, bundle adjustment —
  are jitted JAX with fixed shapes and validity masks so XLA can tile
  them onto the MXU. The SLAM data model (maps, keyframes, covisibility)
  is plain host Python with a single-writer discipline; no mutexes, no
  GIL hand-off, no g2o, no pybind11.
* **Fixed shapes everywhere.** The reference already caps everything
  (<=250 LiDAR points, <=200 background rays, 50 depth samples, 2000/4000
  ORB features); we promote those caps to static shapes + masks.
* **Batch over objects.** Per-keyframe object reconstructions are vmapped
  into one device program instead of sequential per-object CUDA calls.
* **Scale via jax.sharding.** Multi-chip execution (detector inference,
  DeepSDF training, multi-object GN) shards over a `jax.sharding.Mesh`
  with XLA collectives riding ICI.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry is precision-critical: TPU default matmul precision executes
# f32 contractions as bf16 passes, which injects ~0.4% relative error —
# centimeters at SLAM scene scale — into point transforms, projections
# and normal equations, and tracking drift then compounds exponentially
# through the velocity model (observed on v5e). Full-f32 everywhere; the
# DeepSDF decoder opts back down per-call where profiling justifies it.
_jax.config.update("jax_default_matmul_precision", "highest")
