"""SO(3) utilities: proper SVD, orthogonalization, Euler conventions, metrics.

TPU-first design notes
----------------------
The reference forces every 3x3 SVD to the host CPU (/root/reference/src/
fisher/fisher_utils.py:25-27, src/laplace/rotation_laplace.py:8-10) because
torch's CUDA SVD was slow/unstable for tiny batched matrices.  On TPU the
whole point is to *never* leave the device: `jnp.linalg.svd` on batched 3x3
matrices lowers to an XLA Jacobi sweep that fuses into the surrounding jit
program, so every function here is pure, jit-safe and batched.

Euler convention (matches the reference's 6DRepNet convention,
/root/reference/src/utils.py:204-284): R = Rz(roll) @ Ry(yaw) @ Rx(pitch),
angles ordered (pitch, yaw, roll) = rotations about (x, y, z).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# 3x3 SVD backend: "jacobi" (default) is the fully-unrolled fixed-count
# Jacobi eigensolver below — pure elementwise math that XLA fuses into the
# surrounding program.  "xla" is `jnp.linalg.svd`, whose TPU lowering is an
# iterative while-loop: correct, but a fusion barrier that serializes the
# step into dozens of small kernel launches (measured ~1.2 ms/call in-scan
# at (128,3,3) on v5e vs sub-0.1 ms fused).  Override: SEMIUHPE_SVD=xla.
_SVD_BACKEND = os.environ.get("SEMIUHPE_SVD", "jacobi")


def _jacobi_rotate(b: jnp.ndarray, v: jnp.ndarray, p: int, q: int):
    """One two-sided Jacobi rotation zeroing b[..., p, q] of a symmetric
    batch ``b``, accumulating the eigenvector estimate into ``v``'s columns.
    theta = 0.5*atan2(2*b_pq, b_pp - b_qq) is branch-free (atan2 handles the
    b_pp == b_qq and b_pq == 0 corners), so the whole solver is elementwise.
    """
    bpp, bqq, bpq = b[..., p, p], b[..., q, q], b[..., p, q]
    th = 0.5 * jnp.arctan2(2.0 * bpq, bpp - bqq)
    c, s = jnp.cos(th)[..., None], jnp.sin(th)[..., None]
    rp = c * b[..., p, :] + s * b[..., q, :]
    rq = -s * b[..., p, :] + c * b[..., q, :]
    b = b.at[..., p, :].set(rp).at[..., q, :].set(rq)
    cp = c * b[..., :, p] + s * b[..., :, q]
    cq = -s * b[..., :, p] + c * b[..., :, q]
    b = b.at[..., :, p].set(cp).at[..., :, q].set(cq)
    vp = c * v[..., :, p] + s * v[..., :, q]
    vq = -s * v[..., :, p] + c * v[..., :, q]
    v = v.at[..., :, p].set(vp).at[..., :, q].set(vq)
    return b, v


def jacobi_eigh3(b: jnp.ndarray, sweeps: int = 6):
    """Eigendecomposition of a symmetric (..., 3, 3) batch by ``sweeps``
    fully-unrolled cyclic Jacobi sweeps (quadratic convergence: 6 sweeps
    reach fp32 roundoff).  Returns (w, v) with eigenvalues DESCENDING and
    ``v``'s columns the matching orthonormal eigenvectors.  No
    data-dependent control flow — fuses under jit."""
    v = jnp.broadcast_to(jnp.eye(3, dtype=b.dtype), b.shape)
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            b, v = _jacobi_rotate(b, v, p, q)
    w = jnp.stack([b[..., 0, 0], b[..., 1, 1], b[..., 2, 2]], -1)

    # Descending order via a 3-element sorting network (compare-swaps on
    # (0,1),(1,2),(0,1)) — jnp.where selects, no sort kernel.
    def cswap(w, v, i, j):
        swap = (w[..., i] < w[..., j])[..., None]
        wi = jnp.where(swap[..., 0], w[..., j], w[..., i])
        wj = jnp.where(swap[..., 0], w[..., i], w[..., j])
        vi = jnp.where(swap, v[..., :, j], v[..., :, i])
        vj = jnp.where(swap, v[..., :, i], v[..., :, j])
        w = w.at[..., i].set(wi).at[..., j].set(wj)
        v = v.at[..., :, i].set(vi).at[..., :, j].set(vj)
        return w, v

    for (i, j) in ((0, 1), (1, 2), (0, 1)):
        w, v = cswap(w, v, i, j)
    return w, v


def _normalize_rows(x: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, jnp.finfo(x.dtype).tiny)


def svd3(a: jnp.ndarray, sweeps: int = 6):
    """Batched (..., 3, 3) SVD via Jacobi eigendecomposition of A^T A —
    returns (u, s, vt) with the `jnp.linalg.svd(full_matrices=False)`
    convention (s >= 0 descending, U/V column signs arbitrary).

    Rationale + trade-off: unlike the XLA SVD's iterative while-loop this
    is straight-line elementwise code, so it fuses into one kernel under
    jit.  Forming A^T A squares the condition number, so tiny singular
    values lose relative accuracy once s1/s3 exceeds ~1/sqrt(eps_f32); on
    the Fisher paths (A = concentration * rotation-ish, moderate
    anisotropy) that regime only occurs near-degenerate where the SVD is
    non-unique anyway and callers' conventions absorb it.  U columns for
    invalid (relative < 1e-5) singular values are completed orthonormally
    (Gram-Schmidt + cross products), so U stays orthogonal for
    rank-deficient A including A = 0."""
    dtype = a.dtype
    a = a.astype(jnp.float32)
    b = jnp.einsum("...ji,...jk->...ik", a, a)
    w, v = jacobi_eigh3(b, sweeps)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    scale = jnp.maximum(s[..., 0:1], jnp.finfo(jnp.float32).tiny)
    ok = s > 1e-5 * scale
    av = jnp.einsum("...ij,...jk->...ik", a, v)
    u1r = av[..., :, 0]
    e1 = jnp.zeros_like(u1r).at[..., 0].set(1.0)
    u1 = jnp.where(ok[..., 0:1], _normalize_rows(u1r), e1)
    u2r = av[..., :, 1]
    u2g = u2r - jnp.sum(u2r * u1, -1, keepdims=True) * u1
    pick = jnp.where(jnp.abs(u1[..., 0:1]) < 0.9, e1,
                     jnp.zeros_like(u1).at[..., 1].set(1.0))
    perp = _normalize_rows(jnp.cross(u1, pick))
    u2 = jnp.where(ok[..., 1:2], _normalize_rows(u2g), perp)
    u3r = av[..., :, 2]
    u3g = (u3r - jnp.sum(u3r * u1, -1, keepdims=True) * u1
               - jnp.sum(u3r * u2, -1, keepdims=True) * u2)
    u3 = jnp.where(ok[..., 2:3], _normalize_rows(u3g), jnp.cross(u1, u2))
    u = jnp.stack([u1, u2, u3], -1)
    vt = jnp.swapaxes(v, -1, -2)
    return u.astype(dtype), s.astype(dtype), vt.astype(dtype)


def _svd3_primal(a: jnp.ndarray):
    """Backend dispatch for every 3x3 SVD in this module."""
    if _SVD_BACKEND == "jacobi" and a.shape[-2:] == (3, 3):
        return svd3(a)
    return jnp.linalg.svd(a, full_matrices=False)


def _singular_values3(a: jnp.ndarray) -> jnp.ndarray:
    if _SVD_BACKEND == "jacobi" and a.shape[-2:] == (3, 3):
        a32 = a.astype(jnp.float32)
        b = jnp.einsum("...ji,...jk->...ik", a32, a32)
        w, _ = jacobi_eigh3(b)
        return jnp.sqrt(jnp.maximum(w, 0.0)).astype(a.dtype)
    return jnp.linalg.svd(a, compute_uv=False)


def proper_svd(a: jnp.ndarray):
    """Batched proper SVD of (..., 3, 3): A = U diag(s) V^T with
    det(U) = det(V) = +1 and s1 >= s2 >= |s3| (s3 may be negative).

    Mirrors the det-correction convention of the reference
    (/root/reference/src/fisher/between_bingham_fisher.py:63-82) but runs
    fully on-device under jit, with degeneracy-safe U/V gradients
    (see :func:`safe_svd`).
    """
    u, s, vt = safe_svd(a)
    v = jnp.swapaxes(vt, -1, -2)
    # The correction signs are +/-1 and locally constant: keep them out of
    # the autodiff graph (the reference wraps them in no_grad similarly).
    det_u = jax.lax.stop_gradient(jnp.sign(jnp.linalg.det(u)))[..., None]
    det_v = jax.lax.stop_gradient(jnp.sign(jnp.linalg.det(v)))[..., None]
    u = u.at[..., :, 2].multiply(det_u)
    v = v.at[..., :, 2].multiply(det_v)
    s = s.at[..., 2].multiply((det_u * det_v)[..., 0])
    return u, s, v


@jax.custom_jvp
def safe_svd(a: jnp.ndarray):
    """Batched 3x3 SVD whose U/V derivatives stay finite at (near-)repeated
    singular values.

    ``jnp.linalg.svd``'s JVP divides by the singular-gap ``s_j^2 - s_i^2``
    and produces inf/NaN gradients when singular values collide — a real
    hazard on the Fisher-CE path where the student's raw 9-dim output can
    be nearly isotropic early in training.  Here the standard SVD
    differential (dU = U (F o (P S + S P^T)), ds = diag(P),
    dV = V (F o (S P + P^T S)) with P = U^T dA V) is used with the
    Tikhonov-regularized gap inverse F_ij = gap / (gap^2 + eps) — exact
    away from degeneracies, bounded at them.
    """
    u, s, vt = _svd3_primal(a)
    return u, s, vt


@safe_svd.defjvp
def _safe_svd_jvp(primals, tangents):
    (a,) = primals
    (da,) = tangents
    u, s, vt = _svd3_primal(a)
    p = jnp.einsum("...ji,...jk,...lk->...il", u, da, vt)  # U^T dA V

    s2 = s[..., :, None] ** 2
    gap = s2.swapaxes(-1, -2) - s2  # gap_ij = s_j^2 - s_i^2
    eps = 1e-6 * jnp.maximum(jnp.max(s2, axis=(-1, -2), keepdims=True), 1e-12)
    f = gap / (gap * gap + eps)
    f = f * (1.0 - jnp.eye(s.shape[-1], dtype=a.dtype))

    ds = jnp.einsum("...ii->...i", p)
    sp = p * s[..., None, :]        # P S   (scale columns)
    ps = s[..., :, None] * p        # S P   (scale rows)
    du = u @ (f * (sp + sp.swapaxes(-1, -2)))
    dv = (f * (ps + ps.swapaxes(-1, -2)))
    dvt = (jnp.swapaxes(vt, -1, -2) @ dv).swapaxes(-1, -2)
    return (u, s, vt), (du, ds, dvt)


def signed_singular_values(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) singular values with s3 given the sign of
    det(U V^T) = sign(det(A)); the matrix-Fisher normalizer argument."""
    s = _singular_values3(a)
    sign = jnp.sign(jnp.linalg.det(a))
    return s.at[..., 2].multiply(sign)


def special_procrustes(a: jnp.ndarray) -> jnp.ndarray:
    """Orthogonalize (..., 3, 3) -> nearest rotation matrix (the matrix-Fisher
    mode).  Equivalent to the reference's `batch_torch_A_to_R`
    (/root/reference/src/fisher/fisher_utils.py:39-48), on-device.

    Not differentiated anywhere on the training path (used for pseudo-labels
    and metrics), so gradients are stopped for stability at degenerate s.
    """
    a = jax.lax.stop_gradient(a)
    u, s, vt = _svd3_primal(a)
    sign = jnp.sign(jnp.linalg.det(u @ vt))
    u = u.at[..., :, 2].multiply(sign[..., None])
    return u @ vt


def euler_to_matrix(pitch, yaw, roll):
    """Angles in radians -> (..., 3, 3); R = Rz(roll) Ry(yaw) Rx(pitch).

    Batched jnp twin of the reference's numpy `get_6DRepNet_Rot`
    (/root/reference/src/utils.py:204-225)."""
    cx, sx = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cz, sz = jnp.cos(roll), jnp.sin(roll)
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    m = jnp.stack([r00, r01, r02, r10, r11, r12, r20, r21, r22], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_euler(r: jnp.ndarray, full_range: bool = False) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) radians, order (pitch, yaw, roll).

    Behavioral parity with `compute_euler_angles_from_rotation_matrices`
    (/root/reference/src/utils.py:232-260) including the full-range yaw
    extension (sign of R[0,0] flips sy so yaw covers (-180, 180)) and the
    gimbal-lock branch — expressed with `jnp.where` instead of in-place
    writes so it is jit/vmap safe.
    """
    sy = jnp.sqrt(r[..., 0, 0] ** 2 + r[..., 1, 0] ** 2)
    if full_range:
        sy = jnp.where(r[..., 0, 0] < 0, -sy, sy)
    singular = (jnp.abs(sy) < 1e-6).astype(r.dtype)

    x = jnp.arctan2(r[..., 2, 1], r[..., 2, 2])
    y = jnp.arctan2(-r[..., 2, 0], sy)
    z = jnp.arctan2(r[..., 1, 0], r[..., 0, 0])

    xs = jnp.arctan2(-r[..., 1, 2], r[..., 1, 1])
    ys = jnp.arctan2(-r[..., 2, 0], sy)
    zs = jnp.zeros_like(z)

    out = jnp.stack(
        [
            x * (1 - singular) + xs * singular,
            y * (1 - singular) + ys * singular,
            z * (1 - singular) + zs * singular,
        ],
        axis=-1,
    )
    return out


def relative_angle(r1: jnp.ndarray, r2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Geodesic distance on SO(3) in radians: acos((tr(R1 R2^T) - 1)/2).

    Same metric as pytorch3d's `so3_relative_angle` used by the reference
    for full-range error (/root/reference/src/agent.py:447-455)."""
    m = jnp.matmul(r1, jnp.swapaxes(r2, -1, -2))
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)


def frobenius_rot_distance(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """||I - R1 R2^T||_F, the DAD-3DHeads benchmark metric
    (/root/reference/eval.py:87-98)."""
    m = jnp.eye(3, dtype=r1.dtype) - jnp.matmul(r1, jnp.swapaxes(r2, -1, -2))
    return jnp.sqrt(jnp.sum(m * m, axis=(-1, -2)))


def flip_rotation(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation of the horizontally-flipped image: R' = F R F with
    F = diag(-1, 1, 1).

    Exactly equivalent to the reference's label flip, which negates yaw
    and roll in Euler space (dataset_300WLP.py:110-113): for
    R = Rz(roll) Ry(yaw) Rx(pitch), Rz(-r) = F Rz(r) F, Ry(-y) = F Ry(y) F
    and F Rx F = Rx, so Rz(-r) Ry(-y) Rx(p) = F R F.
    """
    f = jnp.asarray([-1.0, 1.0, 1.0], r.dtype)
    return r * f[:, None] * f[None, :]


def limit_angle(angle: float, pi: float = 180.0) -> float:
    """Wrap a scalar angle (degrees) into (-pi, pi]; host-side helper used by
    DAD eval (parity with /root/reference/src/utils.py:289-300)."""
    if angle < -pi:
        k = -2 * (int(angle / pi) // 2)
        angle = angle + k * pi
    if angle > pi:
        k = 2 * ((int(angle / pi) + 1) // 2)
        angle = angle - k * pi
    return angle


def euler_to_matrix_np(pitch: float, yaw: float, roll: float) -> np.ndarray:
    """Host-side (numpy) single-sample Euler->R, for dataset label building."""
    out = euler_to_matrix(jnp.float32(pitch), jnp.float32(yaw), jnp.float32(roll))
    return np.asarray(out)
