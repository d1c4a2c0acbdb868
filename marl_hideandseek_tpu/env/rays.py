"""Batched raycasting against the world's primitive set.

TPU-native replacement for the reference's broadphase BVH `traceRay`
(SURVEY.md §2.4 E4): at <= ~60 primitives per world a brute-force masked
min-reduction over all primitives beats any tree — it is branch-free,
vectorizes over (worlds x rays x prims), and fuses into the surrounding step
program. Used by the grab/lock action rays (reference: src/sim.cpp:285-331),
visibility occlusion rays (src/sim.cpp:598-604), lidar (src/sim.cpp:727-744)
and the seeker->hider reward rays (src/sim.cpp:794-798).

Semantics matched to the reference BVH behavior:
  * `t` is parametric along the (possibly unnormalized) ray direction.
  * A primitive whose interior contains the ray origin is skipped (no
    backface exit hits) — this is what lets an agent trace rays from its own
    body centre without hitting itself.
  * Returns the nearest hit's entity id, or -1 on miss.

Entity id space (per world):
  [0, B)            dynamic body slots (boxes, ramps, agents)
  [B, B+MW)         wall slots
  [B+MW, B+MW+P)    planes
"""

from __future__ import annotations

import jax.numpy as jnp

from marl_hideandseek_tpu import math3d
from marl_hideandseek_tpu.config import EnvConfig, MAX_WALLS
from marl_hideandseek_tpu.types import RigidBodies, StaticGeom, body_slot_ranges

_EPS = 1e-7
_INF = jnp.inf

# Wedge (ramp) halfspaces in the collision-OBJ body frame
# (data/ramp_collision.obj: x in [-1,1], profile triangle
# (y,z) = (1,1), (1,-1), (-2,-1)).
import math

_S13 = math.sqrt(13.0)
WEDGE_NORMALS = jnp.array([
    [1.0, 0.0, 0.0],
    [-1.0, 0.0, 0.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, -1.0],
    [0.0, -2.0 / _S13, 3.0 / _S13],
])
WEDGE_OFFSETS = jnp.array([1.0, 1.0, 1.0, 1.0, 1.0 / _S13])


def ray_aabb(o, d, lo, hi):
    """Slab test. o, d: [..., 3]; lo, hi broadcastable to [..., 3].

    Returns t of the *entry* face, +inf on miss or origin-inside.
    """
    small = jnp.abs(d) < _EPS
    safe_d = jnp.where(small, _EPS, d)
    t1 = (lo - o) / safe_d
    t2 = (hi - o) / safe_d
    near = jnp.minimum(t1, t2)
    far = jnp.maximum(t1, t2)
    # Parallel ray outside the slab -> miss.
    outside = small & ((o < lo) | (o > hi))
    near = jnp.where(outside, _INF, near)
    far = jnp.where(outside, -_INF, far)
    tmin = jnp.max(near, axis=-1)
    tmax = jnp.min(far, axis=-1)
    hit = (tmax >= tmin) & (tmin > _EPS)
    return jnp.where(hit, tmin, _INF)


def ray_obb(o, d, center, quat, half_ext):
    """Oriented box: transform the ray into the box frame then slab-test."""
    o_l = math3d.quat_rotate_inv(quat, o - center)
    d_l = math3d.quat_rotate_inv(quat, d)
    return ray_aabb(o_l, d_l, -half_ext, half_ext)


def ray_convex(o_l, d_l, normals, offsets):
    """Cyrus-Beck ray vs convex polytope given local-frame ray.

    normals: [F, 3], offsets: [F]; halfspace f is n_f . x <= d_f.
    Returns entry t, +inf on miss/inside.
    """
    denom = jnp.einsum("fk,...k->...f", normals, d_l)
    num = offsets - jnp.einsum("fk,...k->...f", normals, o_l)
    small = jnp.abs(denom) < _EPS
    safe = jnp.where(small, _EPS, denom)
    t = num / safe
    t_entry = jnp.where(small | (denom > 0), -_INF, t)
    t_exit = jnp.where(small | (denom < 0), _INF, t)
    # Parallel and outside -> miss.
    miss_parallel = jnp.any(small & (num < 0), axis=-1)
    tmin = jnp.max(t_entry, axis=-1)
    tmax = jnp.min(t_exit, axis=-1)
    hit = (tmax >= tmin) & (tmin > _EPS) & ~miss_parallel
    return jnp.where(hit, tmin, _INF)


def ray_wedge(o, d, center, quat):
    o_l = math3d.quat_rotate_inv(quat, o - center)
    d_l = math3d.quat_rotate_inv(quat, d)
    return ray_convex(o_l, d_l, WEDGE_NORMALS, WEDGE_OFFSETS)


def ray_plane(o, d, point, normal):
    """One-sided plane: hits only when approaching from the normal side."""
    denom = jnp.sum(d * normal, axis=-1)
    num = jnp.sum((point - o) * normal, axis=-1)
    t = num / jnp.where(jnp.abs(denom) < _EPS, -_EPS, denom)
    hit = (denom < -_EPS) & (t > _EPS)
    return jnp.where(hit, t, _INF)


def raycast_world(cfg: EnvConfig, bodies: RigidBodies, statics: StaticGeom,
                  origins: jnp.ndarray, dirs: jnp.ndarray,
                  max_t, exclude_id=None):
    """Nearest-hit raycast for one world.

    origins, dirs: [R, 3]. max_t: scalar or [R]. exclude_id: optional [R]
    entity id never hit (the querying agent's own body).

    Returns (t [R] f32 — +inf on miss beyond max_t, hit_id [R] i32 — -1 miss).
    """
    n_body = cfg.num_dyn_bodies
    _, (ramp_lo, ramp_hi), _ = body_slot_ranges(cfg)

    o = origins[:, None, :]  # [R, 1, 3]
    d = dirs[:, None, :]

    # Dynamic bodies: boxes/agents as OBBs, ramp slots as wedges.
    slot = jnp.arange(n_body)
    is_ramp_slot = (slot >= ramp_lo) & (slot < ramp_hi)
    t_box = ray_obb(o, d, bodies.pos[None], bodies.quat[None],
                    bodies.half_ext[None])          # [R, B]
    t_wedge = ray_wedge(o, d, bodies.pos[None], bodies.quat[None])  # [R, B]
    t_dyn = jnp.where(is_ramp_slot[None, :], t_wedge, t_box)
    t_dyn = jnp.where(bodies.active[None, :], t_dyn, _INF)

    # Walls: axis-aligned slabs.
    w_lo = statics.wall_pos - statics.wall_half_ext
    w_hi = statics.wall_pos + statics.wall_half_ext
    t_wall = ray_aabb(o, d, w_lo[None], w_hi[None])  # [R, MW]
    t_wall = jnp.where(statics.wall_active[None, :], t_wall, _INF)

    # Planes.
    t_plane = ray_plane(o, d, statics.plane_point[None],
                        statics.plane_normal[None])  # [R, P]
    t_plane = jnp.where(statics.plane_active[None, :], t_plane, _INF)

    t_all = jnp.concatenate([t_dyn, t_wall, t_plane], axis=-1)  # [R, Ptot]

    max_t_arr = jnp.broadcast_to(jnp.asarray(max_t), (origins.shape[0],))
    t_all = jnp.where(t_all <= max_t_arr[:, None], t_all, _INF)

    if exclude_id is not None:
        ids = jnp.arange(t_all.shape[-1])
        t_all = jnp.where(ids[None, :] == exclude_id[:, None], _INF, t_all)

    # min + argmin reductions (gather-free: take_along_axis is slow on TPU).
    t_hit = jnp.min(t_all, axis=-1)
    hit_prim = jnp.argmin(t_all, axis=-1)
    hit_id = jnp.where(jnp.isfinite(t_hit), hit_prim, -1).astype(jnp.int32)
    return t_hit, hit_id


def entity_id_is_dyn_body(cfg: EnvConfig, hit_id):
    return (hit_id >= 0) & (hit_id < cfg.num_dyn_bodies)
