"""Matrix-Fisher distribution on SO(3): NLL, entropy, cross-entropy.

TPU-native re-design of the reference's Fisher stack
(/root/reference/src/fisher/{fisher_utils,torch_norm_factor,
between_bingham_fisher,bingham_utils}.py).  Differences that matter:

* The reference round-trips every batch to the host CPU for SVD and runs the
  normalizer quadrature as a custom torch.autograd.Function on CPU
  (fisher_utils.py:25-35).  Here everything is a single jit program: batched
  3x3 SVD on device, and the log-normalizer ``log C_F(S)`` is a
  ``jax.custom_vjp`` whose forward *and* backward are vectorized trapezoid
  quadratures of exponent-suppressed Bessel products — the same analytic
  formulas (Lee 2018, "Bayesian attitude estimation with the matrix Fisher
  distribution"), re-derived, fully fused by XLA.
* The reference computes the Bingham normalizer F and its gradient dF in
  linear space via torch.autograd.grad inside the forward pass
  (bingham_utils.py:47-73).  Here we stay in log space (``bingham_log_f``)
  and use ``jax.grad`` composition, which is overflow-safe for high
  concentrations and jit-clean.
* The gradient of the NLL w.r.t. A never differentiates through the SVD:
  for f(A) = g(sigma(A)) the exact gradient is U diag(g'(s)) V^T, which we
  install as a custom VJP — no degenerate-singular-value NaNs.

Conventions: A is the (..., 3, 3) natural parameter ("Fisher matrix") output
by the network as 9 logits; S = (s1, s2, s3) its signed singular values with
s1 >= s2 >= |s3| and sign(s3) = sign(det A); the Bingham form has a 4x4
orientation V (columns are quaternions) and concentrations LamB sorted
descending with LamB[0] = 0.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from semiuhpe_tpu.ops.quaternion import matrix_to_quaternion
from semiuhpe_tpu.ops.so3 import proper_svd, signed_singular_values, special_procrustes

LOG_2PI2 = math.log(2.0 * math.pi**2)
_QUAD_POINTS = 512

# Abramowitz & Stegun 9.8.1 / 9.8.2 polynomial coefficients for I0.
_I0_SMALL = (1.0, 3.5156229, 3.0899424, 1.2067492, 0.2659732, 0.0360768, 0.0045813)
_I0_LARGE = (0.39894228, 0.01328592, 0.00225319, -0.00157565, 0.00916281,
             -0.02057706, 0.02635537, -0.01647633, 0.00392377)


def _poly(coeffs, x):
    acc = jnp.full_like(x, coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * x + c
    return acc


def bessel_i0_scaled(x: jnp.ndarray) -> jnp.ndarray:
    """I0(x) * exp(-|x|), branchless (A&S rational approximations)."""
    ax = jnp.abs(x)
    small = _poly(_I0_SMALL, (ax / 3.75) ** 2) * jnp.exp(-ax)
    axl = jnp.maximum(ax, 3.75)
    large = _poly(_I0_LARGE, 3.75 / axl) / jnp.sqrt(axl)
    return jnp.where(ax <= 3.75, small, large)


def _quad_nodes(dtype):
    n = _QUAD_POINTS
    x = jnp.linspace(-1.0, 1.0, n, dtype=dtype)  # (n,)
    w = jnp.full((n,), 2.0 / (n - 1), dtype=dtype)
    w = w.at[0].mul(0.5).at[-1].mul(0.5)
    return x, w


def _suppressed_c_integral(s: jnp.ndarray) -> jnp.ndarray:
    """C_F(S) * exp(-(s1+s2+s3)), S = (..., 3) with s1 >= s2 >= |s3|.

    C_F(S) = 1/2 \\int_{-1}^{1} I0(f1(1-x)) I0(f2(1+x)) e^{(s2+s3)x} ...
    evaluated with every factor exponent-suppressed so all intermediates stay
    in [0, 1]-ish range regardless of concentration.
    """
    x, w = _quad_nodes(s.dtype)
    f1 = (s[..., 1] - s[..., 2])[..., None] * 0.5  # (..., 1)
    f2 = (s[..., 1] + s[..., 2])[..., None] * 0.5
    g = (s[..., 2] + s[..., 0])[..., None]
    integrand = (
        bessel_i0_scaled(f1 * (1.0 - x))
        * bessel_i0_scaled(f2 * (1.0 + x))
        * jnp.exp(g * (x - 1.0))
    )
    return 0.5 * jnp.sum(integrand * w, axis=-1)


def _suppressed_dc_integral(s_exp, s_hi, s_lo):
    """d/ds_exp of the suppressed C integral, where s_exp plays the
    exponential role and (s_hi, s_lo) = (max, min) of the other two singular
    values.  Extra factor x under the integral."""
    x, w = _quad_nodes(s_exp.dtype)
    f1 = ((s_hi - s_lo) * 0.5)[..., None]
    f2 = ((s_hi + s_lo) * 0.5)[..., None]
    g = (s_lo + s_exp)[..., None]
    integrand = (
        bessel_i0_scaled(f1 * (1.0 - x))
        * bessel_i0_scaled(f2 * (1.0 + x))
        * x
        * jnp.exp(g * (x - 1.0))
    )
    return 0.5 * jnp.sum(integrand * w, axis=-1)


def _dlog_c_ds(s: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) partials d log C_F / d s_i = (dC/ds_i) / C, via the cyclic
    rearrangement that puts s_i in the exponential role."""
    parts = []
    for i in range(3):
        s_exp = s[..., i]
        others = jnp.stack([s[..., (i + 1) % 3], s[..., (i + 2) % 3]], axis=-1)
        s_hi = jnp.max(others, axis=-1)
        s_lo = jnp.min(others, axis=-1)
        parts.append(_suppressed_dc_integral(s_exp, s_hi, s_lo))
    return jnp.stack(parts, axis=-1) / factor[..., None]


@jax.custom_vjp
def log_fisher_normalizer_from_s(s: jnp.ndarray) -> jnp.ndarray:
    """log C_F(S) for signed singular values S = (..., 3)."""
    factor = _suppressed_c_integral(s)
    return jnp.log(factor) + jnp.sum(s, axis=-1)


def _lnorm_s_fwd(s):
    factor = _suppressed_c_integral(s)
    return jnp.log(factor) + jnp.sum(s, axis=-1), (s, factor)


def _lnorm_s_bwd(res, g):
    s, factor = res
    return (g[..., None] * _dlog_c_ds(s, factor),)


log_fisher_normalizer_from_s.defvjp(_lnorm_s_fwd, _lnorm_s_bwd)


@jax.custom_vjp
def log_fisher_normalizer(a: jnp.ndarray) -> jnp.ndarray:
    """log C_F(sigma(A)) for A = (..., 3, 3), with the exact singular-value
    chain rule grad_A = U diag(dlogC/dS) V^T (never differentiates the SVD
    decomposition itself)."""
    return log_fisher_normalizer_from_s(signed_singular_values(a))


def _lnorm_a_fwd(a):
    u, s, v = proper_svd(a)
    factor = _suppressed_c_integral(s)
    out = jnp.log(factor) + jnp.sum(s, axis=-1)
    return out, (u, s, v, factor)


def _lnorm_a_bwd(res, g):
    u, s, v, factor = res
    ds = _dlog_c_ds(s, factor)  # (..., 3)
    grad_a = jnp.einsum("...ik,...k,...jk->...ij", u, ds, v)
    return (g[..., None, None] * grad_a,)


log_fisher_normalizer.defvjp(_lnorm_a_fwd, _lnorm_a_bwd)


# ---------------------------------------------------------------------------
# NLL / log-pdf
# ---------------------------------------------------------------------------

def _trace_atb(a, b):
    return jnp.sum(a * b, axis=(-1, -2))


def fisher_nll(a: jnp.ndarray, r: jnp.ndarray, overreg: float = 1.05):
    """Per-sample matrix-Fisher negative log-likelihood and the orthogonalized
    prediction (distribution mode).  Parity with the reference's ``vmf_loss``
    (/root/reference/src/fisher/fisher_utils.py:14-36):
    nll = -tr(A^T R) + overreg * log C_F(S).
    """
    a = a.reshape(a.shape[:-1] + (3, 3)) if a.shape[-1] == 9 else a
    # One shared proper SVD serves both the normalizer (gradient = exact
    # U diag(dlogC/dS) V^T via log_fisher_normalizer_from_s + safe_svd's
    # custom JVP — never through the SVD decomposition's own autodiff) and
    # the mode U V^T (== special_procrustes(a), det +1 by construction).
    u, s, v = proper_svd(a)
    nll = -_trace_atb(a, r) + overreg * log_fisher_normalizer_from_s(s)
    pred_orth = jax.lax.stop_gradient(u @ jnp.swapaxes(v, -1, -2))
    return nll, pred_orth


def fisher_log_pdf(a: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """log p(R; A) = tr(A^T R) - log C_F(S)."""
    return _trace_atb(a, r) - log_fisher_normalizer(a)


# ---------------------------------------------------------------------------
# Fisher <-> Bingham bridge
# ---------------------------------------------------------------------------

def s_to_lam(s: jnp.ndarray) -> jnp.ndarray:
    """Fisher singular values (..., 3) -> Bingham concentrations in "Fisher
    convention" (..., 4): lam_i = s_i - s_j - s_k, lam_4 = s1+s2+s3."""
    s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2]
    return jnp.stack([s1 - s2 - s3, s2 - s1 - s3, s3 - s1 - s2, s1 + s2 + s3], axis=-1)


def lam_to_s(lam4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s_to_lam` (..., 4) -> (..., 3)."""
    l1, l2, l3, l4 = lam4[..., 0], lam4[..., 1], lam4[..., 2], lam4[..., 3]
    return 0.25 * jnp.stack([l1 - l2 - l3 + l4, -l1 + l2 - l3 + l4, -l1 - l2 + l3 + l4], axis=-1)


def lam_bingham_to_s(lam_b: jnp.ndarray) -> jnp.ndarray:
    """Bingham-convention concentrations (..., 4, descending with lam[0]=0)
    -> Fisher signed singular values (s1 >= s2 >= |s3|, s3 signed)."""
    s_raw = lam_to_s(lam_b)
    # 3-element descending sorting network (no sort kernel — fuses).
    s_sorted = jnp.abs(s_raw)
    for i, j in ((0, 1), (1, 2), (0, 1)):
        lo = jnp.minimum(s_sorted[..., i], s_sorted[..., j])
        hi = jnp.maximum(s_sorted[..., i], s_sorted[..., j])
        s_sorted = s_sorted.at[..., i].set(hi).at[..., j].set(lo)
    sign = jnp.sign(jnp.prod(s_raw, axis=-1))
    return s_sorted.at[..., 2].multiply(sign)


def a_to_v_lam(a: jnp.ndarray):
    """A (..., 3, 3) -> Bingham orientation V (..., 4, 4) and Fisher-convention
    concentrations Lam (..., 4).

    Columns of V are the quaternion images of U E_i V^T with E_i = 2 e_i e_i^T
    - I and E_4 = I (the four antipodal modes of the induced Bingham on S^3),
    cf. /root/reference/src/fisher/between_bingham_fisher.py:107-135 — but
    computed as cheap column-sign flips of U instead of dense E products.
    """
    return _v_lam_from_svd(*proper_svd(a))


def _v_lam_from_svd(u, s, v):
    """Bingham (V, Lam) from a precomputed proper SVD (shared-SVD fast path)."""
    a_dtype = u.dtype
    lam = s_to_lam(s)
    vt = jnp.swapaxes(v, -1, -2)
    signs = jnp.array(
        [[1.0, -1.0, -1.0], [-1.0, 1.0, -1.0], [-1.0, -1.0, 1.0], [1.0, 1.0, 1.0]],
        dtype=a_dtype,
    )
    # m[k] = U diag(signs[k]) V^T, batched over the leading dims and k.
    m = jnp.einsum("...ij,kj,...jl->...kil", u, signs, vt)
    q = matrix_to_quaternion(m)  # (..., 4(k), 4(quat))
    return jnp.swapaxes(q, -1, -2), lam  # V columns are quaternions


def to_bingham_convention(v, lam):
    """Shift so max(lam) = 0 and sort descending, permuting V columns along.
    Parity: /root/reference/src/fisher/between_bingham_fisher.py:138-152."""
    lam_b = lam - jnp.max(lam, axis=-1, keepdims=True)
    # 4-element descending sorting network carrying V's columns along —
    # replaces argsort + two take_along_axis gathers (fusion barriers on
    # the teacher-stats hot path) with jnp.where compare-swaps.  Ties keep
    # their relative order (strict < never swaps equal lams), and equal-lam
    # columns are exchangeable downstream anyway.
    if v is None:
        for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            lo = jnp.minimum(lam_b[..., i], lam_b[..., j])
            hi = jnp.maximum(lam_b[..., i], lam_b[..., j])
            lam_b = lam_b.at[..., i].set(hi).at[..., j].set(lo)
        return None, lam_b
    v_b = v
    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        swap = lam_b[..., i] < lam_b[..., j]
        li = jnp.where(swap, lam_b[..., j], lam_b[..., i])
        lj = jnp.where(swap, lam_b[..., i], lam_b[..., j])
        lam_b = lam_b.at[..., i].set(li).at[..., j].set(lj)
        ci = jnp.where(swap[..., None], v_b[..., :, j], v_b[..., :, i])
        cj = jnp.where(swap[..., None], v_b[..., :, i], v_b[..., :, j])
        v_b = v_b.at[..., :, i].set(ci).at[..., :, j].set(cj)
    return v_b, lam_b


def _ensure_bingham4(lam_b: jnp.ndarray) -> jnp.ndarray:
    if lam_b.shape[-1] == 3:
        zeros = jnp.zeros(lam_b.shape[:-1] + (1,), dtype=lam_b.dtype)
        return jnp.concatenate([zeros, lam_b], axis=-1)
    return lam_b


def bingham_log_f(lam_b: jnp.ndarray) -> jnp.ndarray:
    """log of the Bingham normalizer on S^3 via the Fisher normalizer:
    log F = log(2 pi^2) + log C_F(S(lam)) + sum(lam)/4."""
    lam_b = _ensure_bingham4(lam_b)
    c = jnp.sum(lam_b, axis=-1) * 0.25
    s = lam_bingham_to_s(lam_b)
    return LOG_2PI2 + log_fisher_normalizer_from_s(s) + c


def bingham_dlog_f(lam_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise partials d log F / d lam_i, same trailing size as input."""
    n = lam_b.shape[-1]
    lam4 = _ensure_bingham4(lam_b)
    grad = jax.grad(lambda l: jnp.sum(bingham_log_f(l)))(lam4)
    return grad[..., 1:] if n == 3 else grad


def bingham_entropy(lam_b: jnp.ndarray) -> jnp.ndarray:
    """H = log F - sum_i lam_i dlogF_i (closed form, log-space stable)."""
    lam_b = _ensure_bingham4(lam_b)
    return bingham_log_f(lam_b) - jnp.sum(lam_b * bingham_dlog_f(lam_b), axis=-1)


def bingham_cross_entropy(v1, lam1, v2, lam2, dlogf1=None, log_f2=None):
    """H(f1, f2) between Bingham-convention distributions; f1 is the target
    (no gradients expected), f2 the prediction.

    CE = log F2 - sum_i lam2_i [ b_i^2 + sum_j (M_ij^2 - b_i^2) dlogF1_j ]
    with M = V1^T V2 restricted to the non-mode columns and b = mu1^T V2,
    mu1 = first column of V1 (the lam=0 mode quaternion).  Matches
    /root/reference/src/fisher/bingham_utils.py:5-32 with the flattened
    ``LamB1.argmax()`` pivot resolved to its batched meaning (column 0).

    ``dlogf1`` / ``log_f2`` accept precomputed values (the fused SSL path
    shares them with the entropy mask / labeled-NLL quadratures).
    """
    mu1 = v1[..., :, 0]  # (..., 4)
    v1_r, v2_r = v1[..., :, 1:], v2[..., :, 1:]  # (..., 4, 3)
    lam1_r, lam2_r = lam1[..., 1:], lam2[..., 1:]  # (..., 3)

    if log_f2 is None:
        log_f2 = bingham_log_f(lam2_r)
    if dlogf1 is None:
        dlogf1 = bingham_dlog_f(lam1_r)  # (..., 3)

    m = jnp.einsum("...ki,...kj->...ij", v1_r, v2_r)  # (..., 3, 3)
    b = jnp.einsum("...k,...kj->...j", mu1, v2_r)  # (..., 3)

    inner = b**2 + jnp.einsum("...ij,...j->...i", m**2 - b[..., :, None] ** 2, dlogf1)
    return log_f2 - jnp.sum(lam2_r * inner, axis=-1)


# ---------------------------------------------------------------------------
# User-facing entropy / cross-entropy on A
# ---------------------------------------------------------------------------

def fisher_entropy(a: jnp.ndarray) -> jnp.ndarray:
    """Differential entropy of the matrix-Fisher distribution parameterized
    by A (..., 9) or (..., 3, 3); the SSL confidence score
    (/root/reference/src/fisher/fisher_utils.py:70-81).  Only needs singular
    values — the orientation V drops out of the entropy."""
    a = a.reshape(a.shape[: -1] + (3, 3)) if a.shape[-1] == 9 else a
    s = signed_singular_values(a)
    _, lam_b = to_bingham_convention(None, s_to_lam(s))
    return bingham_entropy(lam_b) - LOG_2PI2


def fisher_cross_entropy(a1: jnp.ndarray, a2: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy H(p_{A1}, p_{A2}) between two matrix-Fisher
    distributions via their Bingham forms; A1 = teacher target, A2 = student
    prediction (gradients flow into A2 through its SVD).
    (/root/reference/src/fisher/fisher_utils.py:84-99)."""
    a1 = a1.reshape(a1.shape[:-1] + (3, 3)) if a1.shape[-1] == 9 else a1
    a2 = a2.reshape(a2.shape[:-1] + (3, 3)) if a2.shape[-1] == 9 else a2
    v1, lam1 = a_to_v_lam(jax.lax.stop_gradient(a1))
    v2, lam2 = a_to_v_lam(a2)
    vb1, lamb1 = to_bingham_convention(v1, lam1)
    vb2, lamb2 = to_bingham_convention(v2, lam2)
    return bingham_cross_entropy(vb1, lamb1, vb2, lamb2) - LOG_2PI2


# ---------------------------------------------------------------------------
# Fused SSL-step fast paths (shared SVDs / shared normalizer quadratures)
# ---------------------------------------------------------------------------

def bingham_log_f_and_dlog_f(lam_b: jnp.ndarray):
    """(logF, dlogF) for Bingham-convention lam (..., 4), computed in ONE
    forward + ONE backward quadrature pass (vs. separate ``bingham_log_f``
    + ``bingham_dlog_f`` calls, which repeat the forward).  Both outputs
    are stop-gradient-free but the caller (teacher side) wraps inputs in
    stop_gradient already."""

    def f(l):
        v = bingham_log_f(l)
        return jnp.sum(v), v

    g, v = jax.grad(f, has_aux=True)(lam_b)
    return v, g


def fisher_teacher_stats(a1: jnp.ndarray):
    """Fused teacher-side statistics for the SSL step.

    From ONE proper SVD and ONE normalizer fwd+bwd quadrature pass over the
    (stop-gradient) teacher output A1 (..., 9)/(..., 3, 3), returns::

        entropy    — differential entropy (== fisher_entropy(a1)), the
                     confidence score for the mask;
        pseudo_rot — distribution mode U V^T (== special_procrustes(a1));
        target     — (vb1, lamb1, dlogf1) consumed by
                     fisher_nll_and_cross_entropy / bingham_cross_entropy.

    Replaces the separate fisher_entropy + special_procrustes +
    fisher_cross_entropy teacher-side computations, which between them ran
    three SVDs and nine quadratures on the same tensor.
    """
    a1 = a1.reshape(a1.shape[:-1] + (3, 3)) if a1.shape[-1] == 9 else a1
    a1 = jax.lax.stop_gradient(a1)
    u, s, v = proper_svd(a1)
    pseudo_rot = u @ jnp.swapaxes(v, -1, -2)  # det=+1 by proper-SVD convention
    v1, lam1 = _v_lam_from_svd(u, s, v)
    vb1, lamb1 = to_bingham_convention(v1, lam1)
    logf4, dlogf4 = bingham_log_f_and_dlog_f(lamb1)
    entropy = logf4 - jnp.sum(lamb1 * dlogf4, axis=-1) - LOG_2PI2
    return entropy, pseudo_rot, (vb1, lamb1, dlogf4[..., 1:])


def fisher_nll_and_cross_entropy(a_lab, r_lab, a_strong, target,
                                 overreg: float = 1.05):
    """Labeled matrix-Fisher NLL + teacher->student Fisher CE, sharing ONE
    batched proper SVD and ONE log-normalizer quadrature (fwd + custom-VJP
    bwd) across the concatenated [labeled; strong-unlabeled] outputs.

    Semantically identical to ``fisher_nll(a_lab, r_lab, overreg)`` +
    ``fisher_cross_entropy(a1_teacher, a_strong)`` (the log F2 term is the
    same normalizer because the Bingham-convention shift/sort of lam is a
    uniform shift + permutation, under which lam->S is invariant back to
    the proper-SVD singular values; property-tested in tests/test_fisher.py).

    ``target`` is the third output of :func:`fisher_teacher_stats`.
    Returns (nll_per_sample, ce_per_sample, pred_orth_labeled).
    """
    vb1, lamb1, dlogf1 = target
    a_lab = a_lab.reshape(a_lab.shape[:-1] + (3, 3)) if a_lab.shape[-1] == 9 else a_lab
    a_strong = (a_strong.reshape(a_strong.shape[:-1] + (3, 3))
                if a_strong.shape[-1] == 9 else a_strong)
    n = a_lab.shape[0]
    a = jnp.concatenate([a_lab, a_strong], axis=0)
    u, s, v = proper_svd(a)
    logc = log_fisher_normalizer_from_s(s)

    nll = -_trace_atb(a_lab, r_lab) + overreg * logc[:n]
    pred_orth = jax.lax.stop_gradient(
        u[:n] @ jnp.swapaxes(v[:n], -1, -2))

    v2, lam2 = _v_lam_from_svd(u[n:], s[n:], v[n:])
    vb2, lamb2 = to_bingham_convention(v2, lam2)
    # bingham_log_f(lamb2[..., 1:]) == LOG_2PI2 + log C_F(S) + sum(lamb2)/4
    # with S the proper-SVD singular values already in hand.
    log_f2 = LOG_2PI2 + logc[n:] + 0.25 * jnp.sum(lamb2, axis=-1)
    ce = bingham_cross_entropy(vb1, lamb1, vb2, lamb2,
                               dlogf1=dlogf1, log_f2=log_f2) - LOG_2PI2
    return nll, ce, pred_orth
