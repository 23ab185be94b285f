from semiuhpe_tpu.ops import quaternion, so3, fisher, laplace  # noqa: F401
