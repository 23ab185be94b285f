"""SemiUHPE-TPU: TPU-native semi-supervised unconstrained head pose estimation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of hnuzhy/SemiUHPE
(arXiv 2404.02544): matrix-Fisher / Rotation-Laplace probabilistic rotation
regression, FixMatch-style EMA-teacher SSL with entropy-based dynamic
pseudo-label thresholding, a flax backbone zoo, sharded pjit training over a
`jax.sharding.Mesh`, and the full inference stack (detection, rendering).

Everything that touches the accelerator is functional and jit-compiled; the
runtime around it (data loading, rasterization) is host-side C++/numpy.
"""

__version__ = "0.1.0"
