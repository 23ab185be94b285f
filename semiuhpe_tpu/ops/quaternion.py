"""Quaternion <-> rotation-matrix conversions, jit/vmap friendly.

TPU-native replacement for the pytorch3d `transforms` calls used by the
reference's Fisher<->Bingham bridge (/root/reference/src/fisher/
between_bingham_fisher.py:9-16).  Everything here is branchless (jnp.where
selection instead of data-dependent Python control flow) so it traces once
under jit and vmaps over arbitrary batch dims.

Convention: quaternions are (w, x, y, z), unit norm.  Note that q and -q
encode the same rotation; downstream Bingham math is antipodally symmetric,
so the sign selected here is irrelevant to losses/entropies.
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) unit quaternion (w,x,y,z) -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    m = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) unit quaternion (w,x,y,z).

    Uses the four-candidate construction: for each of (w,x,y,z) build the
    quaternion assuming that component has the largest magnitude, then select
    the candidate whose pivot 1+/-trace-combination is largest.  This is
    numerically stable for every rotation (no near-zero divisions) and fully
    vectorized.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # 4*q_i^2 for each component (may be computed as 1 + signed trace combos).
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)  # (..., 4)

    eps = 1e-12
    sw = jnp.sqrt(jnp.maximum(qw2, eps))
    sx = jnp.sqrt(jnp.maximum(qx2, eps))
    sy = jnp.sqrt(jnp.maximum(qy2, eps))
    sz = jnp.sqrt(jnp.maximum(qz2, eps))

    cand_w = jnp.stack([sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], -1)
    cand_x = jnp.stack([(m21 - m12) / sx, sx, (m10 + m01) / sx, (m02 + m20) / sx], -1)
    cand_y = jnp.stack([(m02 - m20) / sy, (m10 + m01) / sy, sy, (m21 + m12) / sy], -1)
    cand_z = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m21 + m12) / sz, sz], -1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4, 4)

    best = jnp.argmax(pivots, axis=-1)  # (...,)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = 0.5 * q[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
