"""Test configuration: run on a virtual 8-device CPU mesh.

The container preloads jax against the remote 'axon' TPU backend via a
sitecustomize hook, but backends initialize lazily — so switching the
platform to CPU in-process here (before any jax computation has run) gives
us a hermetic 8-virtual-device CPU mesh for all tests, including the
multi-chip sharding tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeat test runs skip XLA recompilation.
# Keyed by host CPU flags so foreign AOT artifacts are never loaded.
import hashlib

def _cpu_fp():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "generic"

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser(f"~/.cache/jax_cache_cpu_{_cpu_fp()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_rotations(rng, n):
    """Haar-ish random rotations via QR of gaussian matrices."""
    m = rng.normal(size=(n, 3, 3))
    q, r = np.linalg.qr(m)
    d = np.sign(np.einsum("nii->ni", r))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 2] *= -1
    return q.astype(np.float32)
