"""Batched 3-D math primitives: quaternions, rotations, AABBs.

TPU-first design: every function is written over arrays with arbitrary
leading batch dimensions so it vmaps/fuses trivially; no scalar control flow.

Conventions (matching the reference engine's math library semantics as used by
src/sim.cpp): quaternions are (w, x, y, z) in the last axis, world up is +z,
body forward is +y, body right is +x. Capability parity targets:
Quat::rotateVec/inv/angleAxis composition and quatToEuler
(reference: src/sim.cpp:372-399).
"""

from __future__ import annotations

import jax.numpy as jnp

# Canonical body-frame axes (reference engine: math::fwd=+y, up=+z, right=+x).
FWD = jnp.array([0.0, 1.0, 0.0])
UP = jnp.array([0.0, 0.0, 1.0])
RIGHT = jnp.array([1.0, 0.0, 0.0])


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, (w,x,y,z) layout."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (== inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the 2-cross-product identity: v' = v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_inv(q), v)


def quat_from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Quat::angleAxis equivalent; axis must be unit length."""
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    s = jnp.sin(half)[..., None]
    c = jnp.cos(half)[..., None]
    return jnp.concatenate([c, axis * s], axis=-1)


def quat_from_yaw(yaw: jnp.ndarray) -> jnp.ndarray:
    """Rotation about +z by `yaw` (the common case for this env)."""
    yaw = jnp.asarray(yaw)
    half = 0.5 * yaw
    zero = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zero, zero, jnp.sin(half)], axis=-1)


def quat_to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Roll/pitch/yaw extraction, semantics of quatToEuler
    (reference: src/sim.cpp:372-399)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (w * y - z * x)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2.0),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )

    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)

    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix (last two axes)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """First-order quaternion integration by world-frame angular velocity."""
    omega_q = jnp.concatenate([jnp.zeros_like(omega[..., :1]), omega], axis=-1)
    dq = 0.5 * dt * quat_mul(omega_q, q)
    return quat_normalize(q + dq)


# ---------------------------------------------------------------------------
# AABB helpers (for rejection placement overlap tests; reference:
# src/level_gen.cpp:104-121 uses AABB::applyTRS + overlaps).
# ---------------------------------------------------------------------------


def obb_world_aabb(pos: jnp.ndarray, q: jnp.ndarray,
                   half_ext: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World-space AABB of an oriented box centred at `pos`.

    |R| @ half_ext gives the world half-extent of the rotated box.
    Returns (lo, hi), each [..., 3].
    """
    m = jnp.abs(quat_to_mat(q))
    # Multiply-reduce, NOT einsum/dot: a 3x3 dot_general under vmap is
    # dispatched to the MXU with ~40x padding waste; this stays on the VPU.
    world_half = jnp.sum(m * half_ext[..., None, :], axis=-1)
    return pos - world_half, pos + world_half


def aabb_overlap(lo_a, hi_a, lo_b, hi_b) -> jnp.ndarray:
    """Boolean overlap test between AABBs (broadcasting)."""
    return jnp.all(lo_a <= hi_b, axis=-1) & jnp.all(lo_b <= hi_a, axis=-1)
