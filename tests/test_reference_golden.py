"""Golden-parity tests: our jax loss math vs the reference's OWN runnable
torch code (torch 2.x-cpu is in this image).

Everything else in tests/test_fisher.py checks against re-derived oracles
(scipy quadratures, Monte-Carlo, finite differences); this module instead
imports ``/root/reference/src/fisher/*`` and ``src/laplace/rotation_laplace``
directly and asserts value AND gradient agreement with the actual
implementation being matched:

* ``ops.fisher.log_fisher_normalizer_from_s``  vs ``torch_norm_factor.logC_F``
  (/root/reference/src/fisher/torch_norm_factor.py:66-92)
* ``ops.fisher.fisher_nll``                    vs ``fisher_utils.vmf_loss``
  (fisher_utils.py:14-36)
* ``ops.fisher.fisher_log_pdf``                vs ``fisher_utils.fisher_log_pdf``
  (fisher_utils.py:51-67)
* ``ops.fisher.fisher_entropy``                vs ``fisher_utils.fisher_entropy``
  (fisher_utils.py:70-81)
* ``ops.fisher.fisher_cross_entropy``          vs ``fisher_utils.fisher_CE``
  (fisher_utils.py:84-99, bingham_utils.py:5-32)
* ``ops.laplace.laplace_nll``                  vs ``rotation_laplace.NLL_loss``
  (rotation_laplace.py:24-36) on the same generated SO(3) grid
* the fused SSL fast paths (``fisher_teacher_stats`` /
  ``fisher_nll_and_cross_entropy``) against the same reference calls.

Import shims (test-only, documented):
* ``pytorch3d.transforms`` is not installed; the reference only uses
  ``quaternion_to_matrix`` / ``matrix_to_quaternion`` (real-first
  convention), supplied here as plain torch functions.  Quaternion SIGN is
  free — every Bingham consumer is antipodally symmetric (V enters CE via
  squared terms only).
* ``torch.Tensor.cuda`` is patched to a no-op: the reference hard-codes
  ``.cuda()`` on its loss path (fisher_utils.py:35,48) and this image has
  cpu-only torch.

Tolerances: both sides are float32 512-point trapezoid quadratures of the
same integrand family, so values agree to ~1e-5 relative; gradients that
flow through two different SVD implementations (torch autodiff vs our
custom VJP) agree to ~1e-3.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src", "fisher")),
    reason="reference checkout not mounted")


# ---------------------------------------------------------------------------
# pytorch3d shim (quaternion<->matrix, real-first) + .cuda() no-op
# ---------------------------------------------------------------------------

def _quaternion_to_matrix(q):
    q = q / q.norm(dim=-1, keepdim=True)
    w, x, y, z = q.unbind(-1)
    two = 2.0
    m = torch.stack(
        [
            1 - two * (y * y + z * z), two * (x * y - w * z), two * (x * z + w * y),
            two * (x * y + w * z), 1 - two * (x * x + z * z), two * (y * z - w * x),
            two * (x * z - w * y), two * (y * z + w * x), 1 - two * (x * x + y * y),
        ],
        dim=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def _matrix_to_quaternion(m):
    """Shepperd's method, batched; returns (..., 4) real-first, unit norm,
    sign arbitrary (Bingham consumers are antipodally symmetric)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    w2 = 1 + m00 + m11 + m22
    x2 = 1 + m00 - m11 - m22
    y2 = 1 - m00 + m11 - m22
    z2 = 1 - m00 - m11 + m22
    cand = torch.stack(
        [
            torch.stack([w2, m21 - m12, m02 - m20, m10 - m01], -1),
            torch.stack([m21 - m12, x2, m10 + m01, m02 + m20], -1),
            torch.stack([m02 - m20, m10 + m01, y2, m21 + m12], -1),
            torch.stack([m10 - m01, m02 + m20, m21 + m12, z2], -1),
        ],
        dim=-2,
    )  # (..., 4 candidates, 4)
    best = torch.stack([w2, x2, y2, z2], -1).argmax(-1)
    idx = best[..., None, None].expand(best.shape + (1, 4))
    q = torch.gather(cand, -2, idx).squeeze(-2)
    return q / q.norm(dim=-1, keepdim=True)


_p3d = types.ModuleType("pytorch3d")
_p3d_trans = types.ModuleType("pytorch3d.transforms")
_p3d_trans.quaternion_to_matrix = _quaternion_to_matrix
_p3d_trans.matrix_to_quaternion = _matrix_to_quaternion
_p3d.transforms = _p3d_trans
sys.modules.setdefault("pytorch3d", _p3d)
sys.modules.setdefault("pytorch3d.transforms", _p3d_trans)

torch.Tensor.cuda = lambda self, *a, **k: self  # cpu-only image

os.environ.setdefault("MPLBACKEND", "Agg")
for _p in (os.path.join(REF, "src", "fisher"), REF):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import torch_norm_factor  # noqa: E402  (reference module)
import fisher_utils  # noqa: E402
import between_bingham_fisher as bbf  # noqa: E402  (imported for sanity use)
from src.laplace import rotation_laplace  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from semiuhpe_tpu.ops import fisher, laplace, so3  # noqa: E402


# ---------------------------------------------------------------------------
# fixtures / helpers
# ---------------------------------------------------------------------------

SCALES = (0.3, 1.0, 3.0, 10.0, 30.0)


def _random_a(rng, n, scale):
    """Mix of raw-noise A and concentrated near-rotation A at this scale."""
    noise = rng.normal(size=(n, 3, 3)).astype(np.float32)
    rots = np.stack([_rand_rot(rng) for _ in range(n)])
    a = np.where(np.arange(n)[:, None, None] % 2 == 0, noise, rots + 0.3 * noise)
    return (a * scale).astype(np.float32)


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )


def _signed_s(a):
    u, s, vt = np.linalg.svd(a)
    sign = np.sign(np.linalg.det(u @ vt))
    s = s.copy()
    s[..., 2] *= sign
    return s.astype(np.float32)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260819)


# ---------------------------------------------------------------------------
# log C_F
# ---------------------------------------------------------------------------

class TestLogNormalizer:
    @pytest.mark.parametrize("scale", SCALES)
    def test_values(self, rng, scale):
        s = _signed_s(_random_a(rng, 16, scale))
        ours = np.asarray(fisher.log_fisher_normalizer_from_s(jnp.asarray(s)))
        theirs = torch_norm_factor.logC_F(torch.from_numpy(s)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("scale", SCALES)
    def test_gradients(self, rng, scale):
        s = _signed_s(_random_a(rng, 16, scale))
        g_ours = np.asarray(
            jax.grad(lambda x: jnp.sum(fisher.log_fisher_normalizer_from_s(x)))(
                jnp.asarray(s)))
        st = torch.from_numpy(s).requires_grad_(True)
        torch_norm_factor.logC_F(st).sum().backward()
        np.testing.assert_allclose(g_ours, st.grad.numpy(), rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Fisher NLL (vmf_loss) / log-pdf
# ---------------------------------------------------------------------------

class TestFisherNLL:
    @pytest.mark.parametrize("overreg", (1.025, 1.05))
    def test_values_and_mode(self, rng, overreg):
        a = _random_a(rng, 16, 4.0)
        r = np.stack([_rand_rot(rng) for _ in range(16)])
        nll_ours, mode_ours = fisher.fisher_nll(
            jnp.asarray(a), jnp.asarray(r), overreg=overreg)
        nll_ref, mode_ref = fisher_utils.vmf_loss(
            torch.from_numpy(a.reshape(16, 9)), torch.from_numpy(r),
            overreg=overreg)
        np.testing.assert_allclose(np.asarray(nll_ours), nll_ref.numpy(),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(mode_ours), mode_ref.numpy(),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("scale", SCALES)
    def test_gradients_wrt_a(self, rng, scale):
        a = _random_a(rng, 12, scale)
        r = np.stack([_rand_rot(rng) for _ in range(12)])
        g_ours = np.asarray(jax.grad(
            lambda x: jnp.mean(fisher.fisher_nll(x, jnp.asarray(r),
                                                 overreg=1.025)[0]))(jnp.asarray(a)))
        at = torch.from_numpy(a).requires_grad_(True)
        loss, _ = fisher_utils.vmf_loss(at.reshape(12, 9),
                                        torch.from_numpy(r), overreg=1.025)
        loss.mean().backward()
        np.testing.assert_allclose(g_ours, at.grad.numpy(), rtol=1e-3, atol=2e-4)

    def test_log_pdf(self, rng):
        a = _random_a(rng, 16, 5.0)
        r = np.stack([_rand_rot(rng) for _ in range(16)])
        ours = np.asarray(fisher.fisher_log_pdf(jnp.asarray(a), jnp.asarray(r)))
        theirs = fisher_utils.fisher_log_pdf(
            torch.from_numpy(a), torch.from_numpy(r)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Fisher entropy (the SSL confidence score)
# ---------------------------------------------------------------------------

class TestFisherEntropy:
    @pytest.mark.parametrize("scale", SCALES)
    def test_values(self, rng, scale):
        a = _random_a(rng, 16, scale)
        with torch.no_grad():
            theirs = fisher_utils.fisher_entropy(
                torch.from_numpy(a.reshape(16, 9))).numpy()
        ours = np.asarray(fisher.fisher_entropy(jnp.asarray(a)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_fused_teacher_stats_entropy(self, rng):
        a = _random_a(rng, 16, 5.0)
        entropy, pseudo_rot, _ = fisher.fisher_teacher_stats(jnp.asarray(a))
        with torch.no_grad():
            ent_ref = fisher_utils.fisher_entropy(
                torch.from_numpy(a.reshape(16, 9))).numpy()
            rot_ref = fisher_utils.batch_torch_A_to_R(
                torch.from_numpy(a)).numpy()
        np.testing.assert_allclose(np.asarray(entropy), ent_ref,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pseudo_rot), rot_ref,
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Fisher cross-entropy (the SSL consistency loss)
# ---------------------------------------------------------------------------

class TestFisherCE:
    @pytest.mark.parametrize("scale", (1.0, 3.0, 10.0))
    def test_values(self, rng, scale):
        a1 = _random_a(rng, 12, scale)
        a2 = _random_a(rng, 12, scale)
        with torch.no_grad():
            theirs = fisher_utils.fisher_CE(
                torch.from_numpy(a1), torch.from_numpy(a2)).numpy()
        ours = np.asarray(fisher.fisher_cross_entropy(
            jnp.asarray(a1), jnp.asarray(a2)))
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    def test_gradients_wrt_student(self, rng):
        a1 = _random_a(rng, 8, 4.0)
        a2 = _random_a(rng, 8, 4.0)
        g_ours = np.asarray(jax.grad(
            lambda x: jnp.mean(fisher.fisher_cross_entropy(jnp.asarray(a1), x)))(
                jnp.asarray(a2)))
        a2t = torch.from_numpy(a2).requires_grad_(True)
        fisher_utils.fisher_CE(torch.from_numpy(a1), a2t).mean().backward()
        np.testing.assert_allclose(g_ours, a2t.grad.numpy(), rtol=2e-3, atol=5e-4)

    def test_fused_nll_and_ce(self, rng):
        """The fused shared-SVD/shared-quadrature SSL path reproduces the
        reference's separate vmf_loss + fisher_CE results."""
        a_lab = _random_a(rng, 8, 4.0)
        r_lab = np.stack([_rand_rot(rng) for _ in range(8)])
        a_teacher = _random_a(rng, 8, 4.0)
        a_strong = _random_a(rng, 8, 4.0)
        _, _, target = fisher.fisher_teacher_stats(jnp.asarray(a_teacher))
        nll, ce, _ = fisher.fisher_nll_and_cross_entropy(
            jnp.asarray(a_lab), jnp.asarray(r_lab), jnp.asarray(a_strong),
            target, overreg=1.025)
        with torch.no_grad():
            nll_ref, _ = fisher_utils.vmf_loss(
                torch.from_numpy(a_lab.reshape(8, 9)), torch.from_numpy(r_lab),
                overreg=1.025)
            ce_ref = fisher_utils.fisher_CE(
                torch.from_numpy(a_teacher), torch.from_numpy(a_strong))
        np.testing.assert_allclose(np.asarray(nll), nll_ref.numpy(),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ce), ce_ref.numpy(),
                                   rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Rotation Laplace NLL on the same grid
# ---------------------------------------------------------------------------

class TestRotationLaplace:
    @pytest.fixture(scope="class")
    def grids(self):
        g = laplace.so3_healpix_grid(level=2).astype(np.float32)  # (4608,3,3)
        return g

    def test_values_and_mode(self, rng, grids):
        a = _random_a(rng, 8, 3.0)
        r = np.stack([_rand_rot(rng) for _ in range(8)])
        ours, mode_ours = laplace.laplace_nll(
            jnp.asarray(a), jnp.asarray(r), jnp.asarray(grids.reshape(-1, 9)))
        with torch.no_grad():
            theirs, mode_ref = rotation_laplace.NLL_loss(
                "RLaplace", torch.from_numpy(a), torch.from_numpy(r),
                torch.from_numpy(grids))
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(mode_ours), mode_ref.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_wrt_a(self, rng, grids):
        a = _random_a(rng, 6, 3.0)
        r = np.stack([_rand_rot(rng) for _ in range(6)])
        g_ours = np.asarray(jax.grad(
            lambda x: jnp.mean(laplace.laplace_nll(
                x, jnp.asarray(r), jnp.asarray(grids.reshape(-1, 9)))[0]))(
                    jnp.asarray(a)))
        at = torch.from_numpy(a).requires_grad_(True)
        losses, _ = rotation_laplace.NLL_loss(
            "RLaplace", at, torch.from_numpy(r), torch.from_numpy(grids))
        losses.mean().backward()
        np.testing.assert_allclose(g_ours, at.grad.numpy(), rtol=2e-3, atol=5e-4)

    def test_discrete_fisher_cross_check(self, rng, grids):
        """The reference keeps power_fn_fisher to validate the grid
        normalizer against the analytic Fisher log-pdf
        (rotation_laplace.py:119-121); assert our grid reproduces the
        reference's discrete Fisher pdf too."""
        a = _random_a(rng, 6, 3.0)
        r = np.stack([_rand_rot(rng) for _ in range(6)])
        ours = np.asarray(laplace.fisher_log_pdf_discrete(
            jnp.asarray(a), jnp.asarray(r), jnp.asarray(grids.reshape(-1, 9))))
        with torch.no_grad():
            theirs = rotation_laplace.log_pdf(
                "RFisher", torch.from_numpy(a), torch.from_numpy(r),
                torch.from_numpy(grids)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
