"""Rotation Laplace distribution on SO(3) with a discretized normalizer.

Re-design of /root/reference/src/laplace/rotation_laplace.py.  The reference
ships precomputed equivolumetric grids as .npy blobs and evaluates the
normalizer as a torch broadcast over (b, N, 3, 3) tensors with CPU-side
SVD.  Here:

* Grids are **generated** (not shipped): HEALPix pixel centers on S^2
  crossed with uniform Hopf-fiber angles (Yershova et al. 2010, "Generating
  uniform incremental grids on SO(3) using the Hopf fibration") — the same
  construction behind the reference's eq_grids2/3/4 blobs (4608 / 36864 /
  294912 points at levels 2/3/4).  Each cell has equal Haar volume, so the
  normalizer sum uses a constant 1/N weight.
* The (b, N) power matrix is computed as one (b, 9) x (9, N) matmul — an
  MXU-shaped contraction — instead of materializing (b, N, 3, 3).
* Everything is jit-safe; singular values come from on-device SVD.

Power function ("RLaplace"): p(R; A) ∝ exp(-sqrt(s1+s2+s3 - tr(A^T R))) /
sqrt(...), normalized by logF = logsumexp-style discrete integral with the
1/(-power) Laplace measure factor (reference logF_const_laplace,
rotation_laplace.py:58-72).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.ops.so3 import signed_singular_values, special_procrustes

EPS = 1e-8


# ---------------------------------------------------------------------------
# Equivolumetric SO(3) grids: HEALPix (RING scheme) x Hopf fibration
# ---------------------------------------------------------------------------

def healpix_pixel_centers(nside: int) -> np.ndarray:
    """(npix, 2) array of (z=cos(theta), phi) HEALPix RING pixel centers.

    Standard pix2ang formulas from Gorski et al. 2005; pure numpy, host-side.
    """
    npix = 12 * nside * nside
    ncap = 2 * nside * (nside - 1)
    p = np.arange(npix)
    z = np.empty(npix, dtype=np.float64)
    phi = np.empty(npix, dtype=np.float64)

    # North polar cap.
    cap = p < ncap
    ph = (p[cap] + 1) / 2.0
    i = np.floor(np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1
    j = p[cap] + 1 - 2 * i * (i - 1)
    z[cap] = 1.0 - i * i / (3.0 * nside * nside)
    phi[cap] = (j - 0.5) * np.pi / (2.0 * i)

    # Equatorial belt.
    eq = (p >= ncap) & (p < npix - ncap)
    ip = p[eq] - ncap
    i = ip // (4 * nside) + nside
    j = ip % (4 * nside) + 1
    fodd = 0.5 * (1.0 + ((i + nside) % 2))
    z[eq] = 4.0 / 3.0 - 2.0 * i / (3.0 * nside)
    phi[eq] = (j - fodd) * np.pi / (2.0 * nside)

    # South polar cap (mirror of north).
    south = p >= npix - ncap
    ps = npix - 1 - p[south]
    ph = (ps + 1) / 2.0
    i = np.floor(np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1
    j = ps + 1 - 2 * i * (i - 1)
    z[south] = -(1.0 - i * i / (3.0 * nside * nside))
    phi[south] = 2.0 * np.pi - (j - 0.5) * np.pi / (2.0 * i)

    return np.stack([z, phi], axis=-1)


@functools.lru_cache(maxsize=4)
def so3_healpix_grid(level: int = 2) -> np.ndarray:
    """(N, 3, 3) equivolumetric rotation grid; N = 72 * 8^level
    (level 2 -> 4608, level 3 -> 36864, level 4 -> 294912 — matching the
    reference's eq_grids2/3/4 sizes, src/agent.py:47-56).

    Hopf lift: for each S^2 pixel (theta, phi) and fiber angle psi, the
    quaternion is
      q = (cos(t/2) cos(p/2), cos(t/2) sin(p/2),
           sin(t/2) cos(phi + p/2), sin(t/2) sin(phi + p/2)).
    """
    nside = 2**level
    n_psi = 6 * nside
    centers = healpix_pixel_centers(nside)
    theta = np.arccos(np.clip(centers[:, 0], -1.0, 1.0))
    phi = centers[:, 1]
    psi = (np.arange(n_psi) + 0.5) * 2.0 * np.pi / n_psi

    theta = theta[:, None]
    phi = phi[:, None]
    psi = psi[None, :]
    ct, st = np.cos(theta / 2.0), np.sin(theta / 2.0)
    q = np.stack(
        [
            (ct * np.cos(psi / 2.0)).ravel(),
            (ct * np.sin(psi / 2.0)).ravel(),
            (st * np.cos(phi + psi / 2.0)).ravel(),
            (st * np.sin(phi + psi / 2.0)).ravel(),
        ],
        axis=-1,
    )
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    rot = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    return rot.astype(np.float32)


# ---------------------------------------------------------------------------
# Powers and normalizers
# ---------------------------------------------------------------------------

def _traces_vs_grid(a: jnp.ndarray, grids9: jnp.ndarray) -> jnp.ndarray:
    """tr(A^T G_n) for all grid rotations as a single MXU matmul.
    a: (b, 3, 3); grids9: (N, 9) -> (b, N)."""
    return jnp.einsum(
        "bk,nk->bn", a.reshape(a.shape[0], 9), grids9,
        preferred_element_type=jnp.float32,
    )


def laplace_power_from_traces(s_sum: jnp.ndarray, traces: jnp.ndarray) -> jnp.ndarray:
    """power = -sqrt(max(sum(S) - tr(A^T R), eps)); broadcasts (b,) vs (b, N)."""
    gap = jnp.clip(s_sum[..., None] - traces, EPS, None) if traces.ndim > s_sum.ndim \
        else jnp.clip(s_sum - traces, EPS, None)
    return -jnp.sqrt(gap)


def laplace_log_normalizer(a: jnp.ndarray, grids9: jnp.ndarray) -> jnp.ndarray:
    """logF = c + log(sum(exp(power - c) / (-power)) / N); stabilized the same
    way as the reference (rotation_laplace.py:58-72)."""
    s = signed_singular_values(a)
    s_sum = jnp.sum(s, axis=-1)  # (b,)
    traces = _traces_vs_grid(a, grids9)  # (b, N)
    power = laplace_power_from_traces(s_sum, traces)
    c = jnp.max(power, axis=-1)
    n = grids9.shape[0]
    return c + jnp.log(jnp.sum(jnp.exp(power - c[..., None]) / (-power), axis=-1) / n)


def laplace_log_pdf(a: jnp.ndarray, r: jnp.ndarray, grids9: jnp.ndarray) -> jnp.ndarray:
    """Per-sample log p(R; A) for the Rotation Laplace distribution."""
    s = signed_singular_values(a)
    s_sum = jnp.sum(s, axis=-1)
    tr = jnp.sum(a * r, axis=(-1, -2))
    power = laplace_power_from_traces(s_sum, tr)
    log_f = laplace_log_normalizer(a, grids9)
    return -log_f + power - jnp.log(-power)


def laplace_nll(a: jnp.ndarray, r: jnp.ndarray, grids9: jnp.ndarray):
    """Per-sample NLL and the analytic mode (SVD orthogonalization).
    Parity with reference NLL_loss (rotation_laplace.py:24-36)."""
    a = a.reshape(a.shape[:-1] + (3, 3)) if a.shape[-1] == 9 else a
    losses = -laplace_log_pdf(a, r, grids9)
    return losses, special_procrustes(a)


def fisher_log_pdf_discrete(a: jnp.ndarray, r: jnp.ndarray, grids9: jnp.ndarray) -> jnp.ndarray:
    """Matrix-Fisher log-pdf with the *discrete-grid* normalizer; exists to
    cross-validate the grid construction against the analytic quadrature
    normalizer (the reference keeps power_fn_fisher for exactly this check,
    rotation_laplace.py:119-121)."""
    traces = _traces_vs_grid(a, grids9)  # (b, N)
    c = jnp.max(traces, axis=-1)
    n = grids9.shape[0]
    log_f = c + jnp.log(jnp.sum(jnp.exp(traces - c[..., None]), axis=-1) / n)
    tr = jnp.sum(a * r, axis=(-1, -2))
    return tr - log_f


def filter_grids(grids: np.ndarray, mode: str = "full") -> np.ndarray:
    """Keep grids within a geodesic angle of the frontal basis
    diag(1, -1, -1) — the reference's front/large/half grid subsets
    (/root/reference/src/laplace/filter_grids.py:15-39):
    'front' < 90 deg (~18%), 'large' < 100 deg (~24%), 'half' < median
    (50%), 'full' keeps everything."""
    if mode == "full":
        return grids
    basis = np.diag([1.0, -1.0, -1.0])
    m = np.einsum("ij,njk->nik", basis, np.swapaxes(grids, -1, -2))
    cos_v = (m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2] - 1.0) / 2.0
    theta = np.arccos(np.clip(cos_v, -1 + 1e-7, 1 - 1e-7))
    if mode == "front":
        thr = np.pi / 2
    elif mode == "large":
        thr = (100.0 / 180.0) * np.pi
    elif mode == "half":
        thr = np.median(theta)
    else:
        raise ValueError(f"unknown grid filter mode {mode!r}")
    return grids[theta < thr]


def grids_from_file(path: str) -> np.ndarray:
    """Load an SO(3) grid blob in the reference's .npy format — an (N, 3, 3)
    float array of rotation matrices (e.g. the shipped
    /root/reference/src/laplace/eq_grids2.npy / eq_grids3*.npy consumed at
    /root/reference/src/agent.py:43-58).  Validates that every entry is a
    proper rotation; real RotationLaplace parity runs pass such a file via
    ``--rl_grid_file`` to train on the exact reference quadrature points."""
    grids = np.load(path).astype(np.float32)
    if grids.ndim != 3 or grids.shape[-2:] != (3, 3):
        raise ValueError(
            f"grid file {path!r} has shape {grids.shape}, want (N, 3, 3)")
    g64 = grids.astype(np.float64)
    orth_err = np.abs(
        np.einsum("nij,nkj->nik", g64, g64) - np.eye(3)).max()
    det_err = np.abs(np.linalg.det(g64) - 1.0).max()
    if orth_err > 1e-4 or det_err > 1e-4:
        raise ValueError(
            f"grid file {path!r} entries are not rotations "
            f"(orth err {orth_err:.2e}, det err {det_err:.2e})")
    return grids


def grids_as_device_matrix(level: int = 2, mode: str = "full",
                           file: str | None = None) -> jnp.ndarray:
    """(N, 9) float32 device array of flattened (optionally range-filtered)
    grid rotations.  With ``file`` set, loads the quadrature point set from
    that .npy blob (reference format) instead of generating it; the ``mode``
    filter still applies (the reference ships pre-filtered subsets, so pass
    mode='full' with those)."""
    grids = grids_from_file(file) if file else so3_healpix_grid(level)
    return jnp.asarray(filter_grids(grids, mode).reshape(-1, 9))
