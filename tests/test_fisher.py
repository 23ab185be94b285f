"""Math-core tests: Fisher normalizer, NLL, entropy, CE, Bingham bridge.

Verification strategy (mirrors the reference's cross-validation patterns,
SURVEY.md §4): golden values vs scipy Bessel, finite-difference gradcheck of
the custom VJPs, discrete-grid vs analytic normalizer cross-check, entropy
monotonicity in concentration.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.special
import scipy.integrate

from semiuhpe_tpu.ops import fisher, so3, quaternion, laplace
from tests.conftest import random_rotations


class TestBessel:
    def test_matches_scipy_ive(self):
        x = np.linspace(-50, 50, 201).astype(np.float32)
        ours = np.asarray(fisher.bessel_i0_scaled(jnp.asarray(x)))
        ref = scipy.special.ive(0, x.astype(np.float64))
        np.testing.assert_allclose(ours, ref, rtol=3e-6, atol=3e-7)


class TestProperSVD:
    def test_decomposition_and_signs(self, rng):
        a = rng.normal(size=(16, 3, 3)).astype(np.float32) * 3
        u, s, v = so3.proper_svd(jnp.asarray(a))
        u, s, v = np.asarray(u), np.asarray(s), np.asarray(v)
        recon = u @ (s[..., None] * np.swapaxes(v, -1, -2))
        np.testing.assert_allclose(recon, a, atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(u), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(v), 1.0, atol=1e-5)
        assert np.all(s[:, 0] >= s[:, 1]) and np.all(s[:, 1] >= np.abs(s[:, 2]))

    def test_procrustes_is_rotation(self, rng):
        a = rng.normal(size=(8, 3, 3)).astype(np.float32)
        r = np.asarray(so3.special_procrustes(jnp.asarray(a)))
        np.testing.assert_allclose(
            r @ np.swapaxes(r, -1, -2), np.eye(3)[None].repeat(8, 0), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def _log_cf_bruteforce(s):
    """Independent high-accuracy normalizer: C_F = int I0(...)I0(...)e^{..x}/2.

    Uses scipy fixed_quad on the *unsuppressed* true integrand in float64 —
    valid for moderate |s| only.
    """
    s1, s2, s3 = s

    def integrand(x):
        f1 = (s2 - s3) / 2 * (1 - x)
        f2 = (s2 + s3) / 2 * (1 + x)
        return scipy.special.i0(f1) * scipy.special.i0(f2) * np.exp(s1 * (x - 1))

    val, _ = scipy.integrate.quad(integrand, -1, 1, limit=200)
    return np.log(0.5 * val) + s1


class TestLogNormalizer:
    @pytest.mark.parametrize(
        "s",
        [
            (0.0, 0.0, 0.0),
            (1.0, 0.5, -0.2),
            (5.0, 3.0, 1.0),
            (10.0, 8.0, -4.0),
            (25.0, 20.0, 10.0),
        ],
    )
    def test_matches_bruteforce_quadrature(self, s):
        ours = float(fisher.log_fisher_normalizer_from_s(jnp.asarray([s], jnp.float32))[0])
        ref = _log_cf_bruteforce(np.asarray(s, np.float64))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_zero_concentration_is_zero(self):
        # C_F(0) = 1 under the normalized Haar measure.
        out = float(fisher.log_fisher_normalizer_from_s(jnp.zeros((1, 3)))[0])
        assert abs(out) < 1e-5

    def test_gradcheck_from_s(self):
        s0 = jnp.asarray([[4.0, 2.5, -1.0], [1.0, 0.7, 0.3]], jnp.float32)
        g = jax.grad(lambda s: jnp.sum(fisher.log_fisher_normalizer_from_s(s)))(s0)
        eps = 1e-2
        for b in range(2):
            for i in range(3):
                sp = s0.at[b, i].add(eps)
                sm = s0.at[b, i].add(-eps)
                fd = (
                    float(fisher.log_fisher_normalizer_from_s(sp)[b])
                    - float(fisher.log_fisher_normalizer_from_s(sm)[b])
                ) / (2 * eps)
                np.testing.assert_allclose(float(g[b, i]), fd, rtol=2e-2, atol=2e-3)

    def test_gradcheck_from_a(self, rng):
        a0 = jnp.asarray(rng.normal(size=(2, 3, 3)).astype(np.float32) * 2)
        g = jax.grad(lambda a: jnp.sum(fisher.log_fisher_normalizer(a)))(a0)
        eps = 1e-2
        fn = lambda a: np.asarray(fisher.log_fisher_normalizer(a))
        for i in range(3):
            for j in range(3):
                fd = (fn(a0.at[:, i, j].add(eps)) - fn(a0.at[:, i, j].add(-eps))) / (2 * eps)
                np.testing.assert_allclose(np.asarray(g[:, i, j]), fd, rtol=3e-2, atol=3e-3)

    def test_matches_discrete_grid_normalizer(self, rng):
        """The reference's own cross-validation pattern: the analytic
        quadrature normalizer must agree with a dense equivolumetric SO(3)
        grid sum (rotation_laplace.py:119-121)."""
        a = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32) * 2)
        r = jnp.asarray(random_rotations(rng, 4))
        grids9 = laplace.grids_as_device_matrix(level=3)
        lp_discrete = np.asarray(laplace.fisher_log_pdf_discrete(a, r, grids9))
        lp_analytic = np.asarray(fisher.fisher_log_pdf(a, r))
        np.testing.assert_allclose(lp_discrete, lp_analytic, rtol=2e-2, atol=5e-2)


class TestQuaternion:
    def test_roundtrip(self, rng):
        r = random_rotations(rng, 64)
        q = quaternion.matrix_to_quaternion(jnp.asarray(r))
        r2 = np.asarray(quaternion.quaternion_to_matrix(q))
        np.testing.assert_allclose(r2, r, atol=1e-5)

    def test_handles_180deg_rotations(self):
        rs = np.stack([
            np.diag([1.0, -1.0, -1.0]),
            np.diag([-1.0, 1.0, -1.0]),
            np.diag([-1.0, -1.0, 1.0]),
            np.eye(3),
        ]).astype(np.float32)
        q = quaternion.matrix_to_quaternion(jnp.asarray(rs))
        r2 = np.asarray(quaternion.quaternion_to_matrix(q))
        np.testing.assert_allclose(r2, rs, atol=1e-5)


class TestNLL:
    def test_nll_minimized_at_gt(self, rng):
        """NLL(A, R_gt) should be smaller when the mode of A aligns with R."""
        r = random_rotations(rng, 8)
        a_good = jnp.asarray(r) * 5.0
        a_bad = jnp.asarray(np.roll(r, 1, axis=0)) * 5.0
        nll_good, _ = fisher.fisher_nll(a_good, jnp.asarray(r))
        nll_bad, _ = fisher.fisher_nll(a_bad, jnp.asarray(r))
        assert float(jnp.mean(nll_good)) < float(jnp.mean(nll_bad))

    def test_mode_recovery(self, rng):
        r = random_rotations(rng, 8)
        noise = rng.normal(size=(8, 3, 3)).astype(np.float32) * 0.05
        a = jnp.asarray(r * 4.0 + noise)
        _, mode = fisher.fisher_nll(a, jnp.asarray(r))
        ang = np.asarray(so3.relative_angle(mode, jnp.asarray(r)))
        assert np.all(np.degrees(ang) < 5.0)

    def test_grad_flows(self, rng):
        r = jnp.asarray(random_rotations(rng, 4))
        a = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32))
        g = jax.grad(lambda a_: jnp.mean(fisher.fisher_nll(a_, r)[0]))(a)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestEntropy:
    def test_monotone_in_concentration(self, rng):
        """Higher concentration -> lower (more negative) entropy."""
        r = jnp.asarray(random_rotations(rng, 6))
        ents = []
        for scale in (0.5, 2.0, 8.0, 20.0):
            ents.append(float(jnp.mean(fisher.fisher_entropy(r * scale))))
        assert all(ents[i] > ents[i + 1] for i in range(len(ents) - 1))

    def test_uniform_limit(self):
        """As A -> 0 the distribution -> uniform on SO(3); differential
        entropy -> log(volume) = 0 under the normalized Haar measure."""
        a = jnp.full((1, 3, 3), 1e-4)
        h = float(fisher.fisher_entropy(a)[0])
        assert abs(h) < 1e-2

    def test_entropy_vs_montecarlo(self, rng):
        """H = -E[log p]; check against a grid-based expectation."""
        a = jnp.asarray(random_rotations(rng, 2)) * 3.0
        grids9 = laplace.grids_as_device_matrix(level=3)
        grids = grids9.reshape(-1, 3, 3)
        # E over the equivolumetric grid of -p log p  (normalized Haar).
        n = grids.shape[0]
        logps = []
        for b in range(2):
            ab = jnp.broadcast_to(a[b], (n, 3, 3))
            logps.append(np.asarray(fisher.fisher_log_pdf(ab, grids)))
        h_mc = [-np.mean(np.exp(lp) * lp) for lp in logps]
        h_ours = np.asarray(fisher.fisher_entropy(a))
        np.testing.assert_allclose(h_ours, h_mc, rtol=5e-2, atol=5e-2)


class TestCrossEntropy:
    def test_ce_equals_entropy_when_equal(self, rng):
        a = jnp.asarray(random_rotations(rng, 6)) * 4.0
        ce = np.asarray(fisher.fisher_cross_entropy(a, a))
        h = np.asarray(fisher.fisher_entropy(a))
        np.testing.assert_allclose(ce, h, rtol=1e-3, atol=1e-3)

    def test_ce_geq_entropy(self, rng):
        """Gibbs inequality: H(p, q) >= H(p)."""
        a1 = jnp.asarray(random_rotations(rng, 8)) * 4.0
        a2 = jnp.asarray(random_rotations(rng, 8)) * 3.0
        ce = np.asarray(fisher.fisher_cross_entropy(a1, a2))
        h = np.asarray(fisher.fisher_entropy(a1))
        assert np.all(ce >= h - 1e-3)

    def test_ce_vs_grid_expectation(self, rng):
        """H(p1, p2) = -E_{p1}[log p2], checked on a dense grid."""
        a1 = jnp.asarray(random_rotations(rng, 2)) * 4.0
        a2 = jnp.asarray(random_rotations(rng, 2) + 0.3 * rng.normal(size=(2, 3, 3))).astype(jnp.float32) * 3.0
        grids9 = laplace.grids_as_device_matrix(level=3)
        grids = grids9.reshape(-1, 3, 3)
        n = grids.shape[0]
        ce_mc = []
        for b in range(2):
            lp1 = np.asarray(fisher.fisher_log_pdf(jnp.broadcast_to(a1[b], (n, 3, 3)), grids))
            lp2 = np.asarray(fisher.fisher_log_pdf(jnp.broadcast_to(a2[b], (n, 3, 3)), grids))
            ce_mc.append(-np.mean(np.exp(lp1) * lp2))
        ce = np.asarray(fisher.fisher_cross_entropy(a1, a2))
        np.testing.assert_allclose(ce, ce_mc, rtol=8e-2, atol=8e-2)

    def test_grad_flows_to_student_only(self, rng):
        a1 = jnp.asarray(random_rotations(rng, 4)) * 4.0
        a2 = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32) * 2)
        g2 = jax.grad(lambda a: jnp.mean(fisher.fisher_cross_entropy(a1, a)))(a2)
        assert np.all(np.isfinite(np.asarray(g2)))
        assert float(jnp.max(jnp.abs(g2))) > 0
        g1 = jax.grad(lambda a: jnp.mean(fisher.fisher_cross_entropy(a, a2)))(a1)
        np.testing.assert_allclose(np.asarray(g1), 0.0, atol=1e-7)


class TestLaplace:
    def test_grid_is_rotations(self):
        g = laplace.so3_healpix_grid(level=2)
        assert g.shape == (4608, 3, 3)
        np.testing.assert_allclose(g @ np.swapaxes(g, -1, -2), np.eye(3)[None].repeat(len(g), 0), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(g), 1.0, atol=1e-5)

    def test_grid_covers_so3(self):
        """Every random rotation should have a grid neighbor within the
        nominal cell radius (~2 * (pi^2/N)^(1/3))."""
        rng = np.random.default_rng(1)
        targets = random_rotations(rng, 16)
        g = laplace.so3_healpix_grid(level=2).reshape(-1, 9)
        tr = targets.reshape(-1, 9) @ g.T  # cos-angle-ish similarity
        max_tr = tr.max(axis=1)
        ang = np.degrees(np.arccos(np.clip((max_tr - 1) / 2, -1, 1)))
        assert np.all(ang < 15.0)

    def test_level3_filter_fractions(self):
        """Range-filtered level-3 subsets match the reference's published
        fractions (agent.py:47-56: front 6656/36864 ~18%, large 8872 ~24%,
        half 18432 = 50%)."""
        g = laplace.so3_healpix_grid(level=3)
        n = len(g)
        assert n == 36864
        front = len(laplace.filter_grids(g, "front")) / n
        large = len(laplace.filter_grids(g, "large")) / n
        half = len(laplace.filter_grids(g, "half")) / n
        assert abs(front - 6656 / 36864) < 0.02
        assert abs(large - 8872 / 36864) < 0.02
        assert abs(half - 0.5) < 1e-3
        assert laplace.grids_as_device_matrix(3, "front").shape[1] == 9

    def test_laplace_pdf_normalizes(self, rng):
        """Integral of exp(log_pdf) over the grid (Haar weight 1/N) = 1."""
        a = jnp.asarray(random_rotations(rng, 2)) * 3.0
        grids9 = laplace.grids_as_device_matrix(level=2)
        grids = grids9.reshape(-1, 3, 3)
        n = grids.shape[0]
        for b in range(2):
            lp = np.asarray(
                laplace.laplace_log_pdf(jnp.broadcast_to(a[b], (n, 3, 3)), grids, grids9)
            )
            total = np.mean(np.exp(lp))
            np.testing.assert_allclose(total, 1.0, rtol=5e-2)

    def test_nll_decreases_toward_gt(self, rng):
        r = random_rotations(rng, 8)
        grids9 = laplace.grids_as_device_matrix(level=2)
        nll_good, _ = laplace.laplace_nll(jnp.asarray(r) * 5.0, jnp.asarray(r), grids9)
        nll_bad, _ = laplace.laplace_nll(jnp.asarray(np.roll(r, 1, 0)) * 5.0, jnp.asarray(r), grids9)
        assert float(jnp.mean(nll_good)) < float(jnp.mean(nll_bad))

    def test_grad_flows(self, rng):
        r = jnp.asarray(random_rotations(rng, 4))
        grids9 = laplace.grids_as_device_matrix(level=2)
        a = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32) * 2)
        g = jax.grad(lambda a_: jnp.mean(laplace.laplace_nll(a_, r, grids9)[0]))(a)
        assert np.all(np.isfinite(np.asarray(g)))


class TestEuler:
    def test_roundtrip_front_range(self, rng):
        pitch = rng.uniform(-1.2, 1.2, 32).astype(np.float32)
        yaw = rng.uniform(-1.4, 1.4, 32).astype(np.float32)
        roll = rng.uniform(-1.2, 1.2, 32).astype(np.float32)
        r = so3.euler_to_matrix(jnp.asarray(pitch), jnp.asarray(yaw), jnp.asarray(roll))
        out = np.asarray(so3.matrix_to_euler(r))
        np.testing.assert_allclose(out[:, 0], pitch, atol=1e-4)
        np.testing.assert_allclose(out[:, 1], yaw, atol=1e-4)
        np.testing.assert_allclose(out[:, 2], roll, atol=1e-4)

    def test_full_range_yaw(self):
        """Yaw beyond +/-90 deg is recovered with full_range=True."""
        yaw = jnp.asarray([2.5], jnp.float32)  # ~143 deg
        r = so3.euler_to_matrix(jnp.asarray([0.1]), yaw, jnp.asarray([-0.2]))
        out = np.asarray(so3.matrix_to_euler(r, full_range=True))
        np.testing.assert_allclose(out[0, 1], 2.5, atol=1e-4)

    def test_relative_angle(self, rng):
        r = random_rotations(rng, 8)
        ang = np.asarray(so3.relative_angle(jnp.asarray(r), jnp.asarray(r)))
        np.testing.assert_allclose(ang, 0.0, atol=2e-3)
        fro = np.asarray(so3.frobenius_rot_distance(jnp.asarray(r), jnp.asarray(r)))
        np.testing.assert_allclose(fro, 0.0, atol=1e-3)


class TestSafeSVD:
    def test_matches_plain_svd_gradients_when_well_separated(self, rng):
        """The regularized JVP equals the true SVD differential away from
        degeneracies.  Checked against central finite differences of the
        same primal (f is not column-sign invariant, so comparing against
        another SVD backend's gradients would only test sign conventions).
        eps must sit above fp32 evaluation noise (~1e-5 abs / 2*eps) and
        below the curvature scale: 1e-2 gives ~1e-3 agreement (verified by
        an eps sweep; 1e-4 is noise-dominated and off by ~10%)."""
        a64 = (rng.normal(size=(4, 3, 3)) * 2).astype(np.float64)

        def f_safe(a):
            u, s, vt = so3.safe_svd(a)
            return jnp.sum(u * 0.3 + vt * 0.7) + jnp.sum(s)

        g_safe = np.asarray(jax.grad(f_safe)(jnp.asarray(a64, jnp.float32)),
                            np.float64)
        eps = 1e-2
        for _ in range(4):
            d = rng.normal(size=a64.shape)
            d /= np.linalg.norm(d)
            fp = float(f_safe(jnp.asarray(a64 + eps * d, jnp.float32)))
            fm = float(f_safe(jnp.asarray(a64 - eps * d, jnp.float32)))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(np.sum(g_safe * d), fd, rtol=2e-2,
                                       atol=2e-3)

    def test_finite_at_repeated_singular_values(self):
        """Plain SVD grads blow up here; safe_svd must stay finite."""
        a = jnp.broadcast_to(jnp.eye(3) * 2.0, (2, 3, 3))  # s = (2, 2, 2)

        def f(a):
            u, s, vt = so3.safe_svd(a)
            return jnp.sum(u) + jnp.sum(vt) + jnp.sum(s)

        g = np.asarray(jax.grad(f)(a))
        assert np.all(np.isfinite(g))

    def test_ce_grad_finite_for_isotropic_student(self, rng):
        """The motivating case: an early-training near-isotropic student
        output must give finite Fisher-CE gradients."""
        a1 = jnp.asarray(random_rotations(rng, 4)) * 4.0
        a2 = jnp.broadcast_to(jnp.eye(3) * 1e-3, (4, 3, 3))

        g = jax.grad(lambda a: jnp.mean(fisher.fisher_cross_entropy(a1, a)))(a2)
        assert np.all(np.isfinite(np.asarray(g)))


class TestFusedSSLPaths:
    """The fused teacher/student fast paths must be numerically identical
    (values AND gradients) to the separate reference-parity functions they
    replace in the SSL step."""

    def _random_a(self, rng, n, scale=3.0):
        return jnp.asarray(rng.normal(size=(n, 3, 3)).astype(np.float32) * scale)

    def test_teacher_stats_match_separate_paths(self, rng):
        a1 = self._random_a(rng, 12)
        entropy, pseudo_rot, (vb1, lamb1, dlogf1) = fisher.fisher_teacher_stats(a1)

        np.testing.assert_allclose(np.asarray(entropy),
                                   np.asarray(fisher.fisher_entropy(a1)),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pseudo_rot),
                                   np.asarray(so3.special_procrustes(a1)),
                                   rtol=1e-5, atol=1e-5)
        # Cached (vb1, lamb1, dlogf1) must reproduce fisher_cross_entropy.
        a2 = self._random_a(rng, 12, scale=1.5)
        v2, lam2 = fisher.a_to_v_lam(a2)
        vb2, lamb2 = fisher.to_bingham_convention(v2, lam2)
        ce_cached = fisher.bingham_cross_entropy(
            vb1, lamb1, vb2, lamb2, dlogf1=dlogf1) - fisher.LOG_2PI2
        ce_ref = fisher.fisher_cross_entropy(a1, a2)
        np.testing.assert_allclose(np.asarray(ce_cached), np.asarray(ce_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_lam_roundtrip_invariance(self, rng):
        """The fused log_f2 shortcut relies on lam_bingham_to_s recovering
        the proper-SVD singular values after the Bingham shift+sort."""
        a = self._random_a(rng, 32)
        _, s, _ = so3.proper_svd(a)
        _, lamb = fisher.to_bingham_convention(None, fisher.s_to_lam(s))
        s_back = fisher.lam_bingham_to_s(lamb)
        np.testing.assert_allclose(np.asarray(s_back), np.asarray(s),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_nll_and_ce_values_and_grads(self, rng):
        a1 = self._random_a(rng, 8)  # teacher (stop-grad)
        r_lab = jnp.asarray(random_rotations(rng, 6))
        _, _, target = fisher.fisher_teacher_stats(a1)

        def fused(a_lab, a_strong):
            nll, ce, _ = fisher.fisher_nll_and_cross_entropy(
                a_lab, r_lab, a_strong, target, overreg=1.025)
            return jnp.mean(nll) + 0.37 * jnp.mean(ce)

        def separate(a_lab, a_strong):
            nll, _ = fisher.fisher_nll(a_lab, r_lab, overreg=1.025)
            ce = fisher.fisher_cross_entropy(a1, a_strong)
            return jnp.mean(nll) + 0.37 * jnp.mean(ce)

        a_lab = self._random_a(rng, 6, scale=2.0)
        a_strong = self._random_a(rng, 8, scale=1.5)

        v_f = float(fused(a_lab, a_strong))
        v_s = float(separate(a_lab, a_strong))
        np.testing.assert_allclose(v_f, v_s, rtol=1e-5, atol=1e-5)

        g_f = jax.grad(fused, argnums=(0, 1))(a_lab, a_strong)
        g_s = jax.grad(separate, argnums=(0, 1))(a_lab, a_strong)
        for gf, gs in zip(g_f, g_s):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                                       rtol=2e-4, atol=2e-4)

    def test_fused_pred_orth_matches_procrustes(self, rng):
        a_lab = self._random_a(rng, 5)
        a_strong = self._random_a(rng, 7)
        a1 = self._random_a(rng, 7)
        r_lab = jnp.asarray(random_rotations(rng, 5))
        _, _, target = fisher.fisher_teacher_stats(a1)
        _, _, pred_orth = fisher.fisher_nll_and_cross_entropy(
            a_lab, r_lab, a_strong, target)
        np.testing.assert_allclose(np.asarray(pred_orth),
                                   np.asarray(so3.special_procrustes(a_lab)),
                                   rtol=1e-5, atol=1e-5)


class TestJacobiSVD3:
    """The unrolled-Jacobi 3x3 SVD backend (so3.svd3/jacobi_eigh3) — the
    fused elementwise replacement for XLA's while-loop SVD lowering."""

    @staticmethod
    def _cases(rng):
        q = np.linalg.qr(rng.normal(size=(64, 3, 3)))[0].astype(np.float32)
        q2 = np.linalg.qr(rng.normal(size=(64, 3, 3)))[0].astype(np.float32)

        def comp(svals):
            s = np.broadcast_to(np.asarray(svals, np.float32), (64, 3))
            return np.einsum("bij,bj,bjk->bik", q, s, q2)

        return {
            "random": rng.normal(size=(256, 3, 3)).astype(np.float32),
            "big": 500.0 * rng.normal(size=(64, 3, 3)).astype(np.float32),
            "tiny": 1e-6 * rng.normal(size=(64, 3, 3)).astype(np.float32),
            "zero": np.zeros((4, 3, 3), np.float32),
            "neardegen": comp([2.0, 2.0 + 1e-6, 0.5]),
            "rank1": comp([3.0, 0.0, 0.0]),
            "rank2": comp([3.0, 1.0, 0.0]),
            "rotations": 5.0 * q,
        }

    def test_reconstruction_orthogonality_singulars(self, rng):
        for name, a in self._cases(rng).items():
            u, s, vt = jax.jit(so3.svd3)(jnp.asarray(a))
            u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
            scale = np.maximum(np.abs(a).max(axis=(-1, -2), keepdims=True), 1e-9)
            rec = np.einsum("...ij,...j,...jk->...ik", u, s, vt)
            assert np.max(np.abs(rec - a) / scale) < 2e-3, name
            for m in (u, np.swapaxes(vt, -1, -2)):
                gram = np.einsum("...ji,...jk->...ik", m, m)
                assert np.max(np.abs(gram - np.eye(3))) < 1e-3, name
            s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
            assert np.all(np.diff(s, axis=-1) <= 1e-6), name  # descending
            assert np.all(s >= 0), name
            denom = np.maximum(s_ref[..., 0:1], 1e-9)
            assert np.max(np.abs(s - s_ref) / denom) < 2e-3, name

    def test_matches_xla_svd_on_fisher_shapes(self, rng):
        """Same subspaces as jnp.linalg.svd on typical Fisher A batches
        (column signs may differ; compare projectors and s)."""
        a = jnp.asarray(rng.normal(size=(32, 3, 3)).astype(np.float32) * 4)
        u1, s1, vt1 = so3.svd3(a)
        u2, s2, vt2 = jnp.linalg.svd(a, full_matrices=False)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-4,
                                   atol=1e-5)
        # compare one-dimensional eigenspaces via |u_i . u_i'| = 1
        dots = np.abs(np.einsum("bik,bik->bk", np.asarray(u1), np.asarray(u2)))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)
        dots_v = np.abs(np.einsum("bki,bki->bk", np.asarray(vt1),
                                  np.asarray(vt2)))
        np.testing.assert_allclose(dots_v, 1.0, atol=1e-3)

    def test_jacobi_eigh3_properties(self, rng):
        a = rng.normal(size=(128, 3, 3)).astype(np.float32)
        b = np.einsum("bji,bjk->bik", a, a)
        w, v = jax.jit(so3.jacobi_eigh3)(jnp.asarray(b))
        w, v = np.asarray(w), np.asarray(v)
        res = np.einsum("bij,bjk->bik", b, v) - v * w[:, None, :]
        assert np.max(np.abs(res)) < 1e-4
        assert np.all(np.diff(w, axis=-1) <= 1e-6)

    def test_no_while_loops_in_jaxpr(self):
        """The point of the backend: straight-line code, no while-loop
        fusion barriers in the lowered program."""
        jaxpr = jax.make_jaxpr(so3.svd3)(jnp.zeros((8, 3, 3), jnp.float32))
        assert "while" not in str(jaxpr)
