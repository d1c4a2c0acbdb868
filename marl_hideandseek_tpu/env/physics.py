"""Batched XPBD rigid-body physics for one world (vmapped over worlds).

TPU-native replacement for the reference engine's XPBD solver + broadphase +
narrowphase (SURVEY.md §2.4 E4/E5/E6; reference wiring: src/sim.cpp:19,
1156-1173 — 4 substeps at dt=1/30). Design choices for the TPU:

  * No BVH / no entity compaction: fixed primitive slots with active masks;
    all candidate contacts are materialized as fixed-shape masked arrays and
    solved with a Jacobi (simultaneous) position pass whose per-body
    corrections are count-normalized — the batched analogue of the
    reference's sequential Gauss-Seidel constraint sweep.
  * Contact model: vertex-vs-convex-SDF both directions per pair. Boxes and
    agents are OBBs, ramps are wedges (5-halfspace convex), walls are
    static AABBs, the floor is a plane. This captures vertex-face contact
    manifolds; edge-edge crossings are approximated (the reference itself
    notes its physics differs from the original OpenAI env, README.md:4).
  * Friction: velocity-level dynamic friction clamped by the accumulated
    normal lambda (XPBD velocity pass). Per-class mu_d values follow
    reference: src/mgr.cpp:476-559; pair mu = max(mu_a, mu_b).
  * Grab joints: 3-dof anchor + 3-dof relative-rotation positional
    constraints per agent slot (reference fixed joint: src/sim.cpp:343-357).

All functions are single-world; `env.py` vmaps the step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu import math3d
from marl_hideandseek_tpu.config import EnvConfig
from marl_hideandseek_tpu.env.rays import WEDGE_NORMALS, WEDGE_OFFSETS
from marl_hideandseek_tpu.types import (
    GrabState,
    RigidBodies,
    StaticGeom,
    body_slot_ranges,
)

GRAVITY = jnp.array([0.0, 0.0, -9.8])  # reference: src/sim.cpp:1360

# Relaxation for the Jacobi position solve (stabilizes simultaneous
# application of many contacts; corrections are additionally normalized by
# per-body contact counts).
_RELAX = 1.0

# Wedge vertex set (padded to 8 like a box for uniform shapes); from
# data/ramp_collision.obj.
_WEDGE_VERTS = jnp.array([
    [1.0, 1.0, 1.0],
    [1.0, 1.0, -1.0],
    [1.0, -2.0, -1.0],
    [-1.0, 1.0, 1.0],
    [-1.0, 1.0, -1.0],
    [-1.0, -2.0, -1.0],
    [1.0, -2.0, -1.0],
    [-1.0, -2.0, -1.0],
])

_BOX_CORNER_SIGNS = jnp.array([
    [sx, sy, sz]
    for sx in (-1.0, 1.0)
    for sy in (-1.0, 1.0)
    for sz in (-1.0, 1.0)
])


def body_vertices_local(cfg: EnvConfig, half_ext: jnp.ndarray) -> jnp.ndarray:
    """[B, 8, 3] local-frame vertices per dynamic body slot."""
    n_body = cfg.num_dyn_bodies
    _, (ramp_lo, ramp_hi), _ = body_slot_ranges(cfg)
    slot = jnp.arange(n_body)
    is_ramp = (slot >= ramp_lo) & (slot < ramp_hi)
    box_verts = half_ext[:, None, :] * _BOX_CORNER_SIGNS[None, :, :]
    wedge_verts = jnp.broadcast_to(_WEDGE_VERTS, (n_body, 8, 3))
    return jnp.where(is_ramp[:, None, None], wedge_verts, box_verts)


def convex_sdf_local(cfg: EnvConfig, p_local: jnp.ndarray,
                     half_ext: jnp.ndarray, is_ramp: jnp.ndarray):
    """Signed distance + outward normal of body slots' shapes, local frame.

    p_local: [..., 3] point in the body's frame. Returns (sdf, normal);
    sdf < 0 inside. For boxes the SDF is the max face distance (exact
    inside); for wedges the max halfspace distance.
    """
    # Box: distance to each of 6 faces.
    q = jnp.abs(p_local) - half_ext
    box_sdf = jnp.max(q, axis=-1)
    k = jnp.argmax(q, axis=-1)
    box_n = jnp.sign(
        jnp.take_along_axis(p_local, k[..., None], axis=-1)
    ) * jax.nn.one_hot(k, 3, dtype=p_local.dtype)

    # Wedge: max halfspace.
    d = jnp.einsum("fk,...k->...f", WEDGE_NORMALS, p_local) - WEDGE_OFFSETS
    wedge_sdf = jnp.max(d, axis=-1)
    fk = jnp.argmax(d, axis=-1)
    wedge_n = WEDGE_NORMALS[fk]

    sdf = jnp.where(is_ramp, wedge_sdf, box_sdf)
    normal = jnp.where(is_ramp[..., None], wedge_n, box_n)
    return sdf, normal


class _Contacts(NamedTuple):
    """Flat masked contact set (fixed shape)."""

    a: jnp.ndarray        # [C] i32 dyn body index (the vertex owner or -1?)
    b: jnp.ndarray        # [C] i32 dyn body index of the other side, -1=static
    p: jnp.ndarray        # [C, 3] world contact point
    n: jnp.ndarray        # [C, 3] world normal, pushes A along +n
    depth: jnp.ndarray    # [C] penetration depth (>0 when touching)
    mask: jnp.ndarray     # [C] bool
    mu: jnp.ndarray       # [C] pair dynamic friction


def _gen_plane_contacts(cfg, pos, quat, verts_world, active, statics):
    """Body corner vs plane contacts. Returns flat _Contacts."""
    n_body = cfg.num_dyn_bodies
    n_plane = statics.plane_point.shape[0]
    # [B, 8, Pl]
    rel = verts_world[:, :, None, :] - statics.plane_point[None, None, :, :]
    dist = jnp.einsum("bvpk,pk->bvp", rel, statics.plane_normal)
    depth = -dist
    mask = (depth > 0.0) & active[:, None, None] & \
        statics.plane_active[None, None, :]

    c = n_body * 8 * n_plane
    a_idx = jnp.broadcast_to(
        jnp.arange(n_body)[:, None, None], (n_body, 8, n_plane)).reshape(c)
    normal = jnp.broadcast_to(
        statics.plane_normal[None, None], (n_body, 8, n_plane, 3)).reshape(c, 3)
    return _Contacts(
        a=a_idx.astype(jnp.int32),
        b=jnp.full((c,), -1, jnp.int32),
        p=verts_world[:, :, None, :].repeat(n_plane, 2).reshape(c, 3),
        n=normal,
        depth=depth.reshape(c),
        mask=mask.reshape(c),
        mu=jnp.full((c,), 2.0),  # plane muD = 2 (reference: mgr.cpp:492)
    )


def _gen_wall_contacts(cfg, verts_world, active, friction_mu, statics):
    """Body corner vs wall (AABB) contacts."""
    n_body = cfg.num_dyn_bodies
    n_wall = statics.wall_pos.shape[0]
    # Vert in wall frame (walls are axis aligned): [B, 8, W, 3]
    rel = verts_world[:, :, None, :] - statics.wall_pos[None, None, :, :]
    q = jnp.abs(rel) - statics.wall_half_ext[None, None, :, :]
    sdf = jnp.max(q, axis=-1)
    k = jnp.argmax(q, axis=-1)
    n = jnp.sign(jnp.take_along_axis(rel, k[..., None], axis=-1)) * \
        jax.nn.one_hot(k, 3, dtype=rel.dtype)
    depth = -sdf
    mask = (depth > 0.0) & active[:, None, None] & \
        statics.wall_active[None, None, :]

    c = n_body * 8 * n_wall
    a_idx = jnp.broadcast_to(
        jnp.arange(n_body)[:, None, None], (n_body, 8, n_wall)).reshape(c)
    mu = jnp.maximum(friction_mu[:, None, None], 2.0)  # wall muD = 2
    mu = jnp.broadcast_to(mu, (n_body, 8, n_wall)).reshape(c)
    return _Contacts(
        a=a_idx.astype(jnp.int32),
        b=jnp.full((c,), -1, jnp.int32),
        p=verts_world[:, :, None, :].repeat(n_wall, 2).reshape(c, 3),
        n=n.reshape(c, 3),
        depth=depth.reshape(c),
        mask=mask.reshape(c),
        mu=mu,
    )


def _gen_pair_contacts(cfg, pos, quat, half_ext, verts_world, active,
                       friction_mu):
    """Dynamic-dynamic contacts: vertices of A inside B's SDF, for every
    ordered pair (A != B)."""
    n_body = cfg.num_dyn_bodies
    _, (ramp_lo, ramp_hi), _ = body_slot_ranges(cfg)
    slot = jnp.arange(n_body)
    is_ramp = (slot >= ramp_lo) & (slot < ramp_hi)

    # Vertex v of body a, tested in body b's frame: [A, 8, B, 3].
    rel = verts_world[:, :, None, :] - pos[None, None, :, :]
    p_local = math3d.quat_rotate_inv(quat[None, None, :, :], rel)
    sdf, n_local = convex_sdf_local(
        cfg, p_local, half_ext[None, None], is_ramp[None, None, :])
    n_world = math3d.quat_rotate(quat[None, None, :, :], n_local)
    depth = -sdf

    a_idx = jnp.broadcast_to(slot[:, None, None], (n_body, 8, n_body))
    b_idx = jnp.broadcast_to(slot[None, None, :], (n_body, 8, n_body))
    mask = (depth > 0.0) & (a_idx != b_idx) & \
        active[:, None, None] & active[None, None, :]

    c = n_body * 8 * n_body
    mu = jnp.maximum(friction_mu[:, None, None], friction_mu[None, None, :])
    return _Contacts(
        a=a_idx.reshape(c).astype(jnp.int32),
        b=b_idx.reshape(c).astype(jnp.int32),
        p=jnp.broadcast_to(
            verts_world[:, :, None, :], (n_body, 8, n_body, 3)).reshape(c, 3),
        n=n_world.reshape(c, 3),
        depth=depth.reshape(c),
        mask=mask.reshape(c),
        mu=jnp.broadcast_to(mu, (n_body, 8, n_body)).reshape(c),
    )


def _concat_contacts(*groups: _Contacts) -> _Contacts:
    return _Contacts(*[
        jnp.concatenate([getattr(g, f) for g in groups], axis=0)
        for f in _Contacts._fields
    ])


def _gather_body(idx, arr, static_val=0.0):
    """arr[idx] with idx == -1 mapping to static_val."""
    safe = jnp.maximum(idx, 0)
    out = arr[safe]
    if arr.ndim > 1:
        return jnp.where((idx >= 0)[:, None], out, static_val)
    return jnp.where(idx >= 0, out, static_val)


def _inv_inertia_world(quat, inv_inertia_diag):
    """w-frame inverse inertia applied to a vector: returns function arrays.

    We fold R * diag(invI) * R^T lazily: callers compute
    I^-1 u = R (invI * (R^T u)).
    """
    return quat, inv_inertia_diag


def _apply_inv_inertia(quat, inv_diag, u):
    u_b = math3d.quat_rotate_inv(quat, u)
    return math3d.quat_rotate(quat, inv_diag * u_b)


def solve_positions(cfg, pos, quat, eff_inv_m, inv_inertia, contacts):
    """One Jacobi position pass over all contacts.

    Returns (dpos [B,3], drot [B,3] rotation vectors, lambda_n [C]).
    """
    n_body = cfg.num_dyn_bodies
    a, b = contacts.a, contacts.b

    x_a = pos[a]
    x_b = _gather_body(b, pos)
    r_a = contacts.p - x_a
    r_b = contacts.p - x_b

    w_lin_a = eff_inv_m[a]
    w_lin_b = _gather_body(b, eff_inv_m)

    q_a = quat[jnp.maximum(a, 0)]
    q_b = quat[jnp.maximum(b, 0)]
    ii_a = inv_inertia[jnp.maximum(a, 0)]
    ii_b = jnp.where((b >= 0)[:, None], inv_inertia[jnp.maximum(b, 0)], 0.0)

    n = contacts.n
    rxn_a = jnp.cross(r_a, n)
    rxn_b = jnp.cross(r_b, n)
    w_ang_a = jnp.sum(rxn_a * _apply_inv_inertia(q_a, ii_a, rxn_a), axis=-1)
    w_ang_b = jnp.sum(rxn_b * _apply_inv_inertia(q_b, ii_b, rxn_b), axis=-1)

    w_a = w_lin_a + w_ang_a
    w_b = w_lin_b + w_ang_b
    w_sum = w_a + w_b

    lam = jnp.where(contacts.mask & (w_sum > 1e-9),
                    contacts.depth / jnp.maximum(w_sum, 1e-9), 0.0)
    imp = lam[:, None] * n  # pushes A along +n, B along -n

    # Count-normalized accumulation per body (Jacobi averaging).
    ones = contacts.mask.astype(pos.dtype)
    cnt = jnp.zeros((n_body,)).at[a].add(ones)
    cnt = cnt.at[jnp.maximum(b, 0)].add(jnp.where(b >= 0, ones, 0.0))
    norm = 1.0 / jnp.maximum(cnt, 1.0)

    dpos = jnp.zeros((n_body, 3))
    dpos = dpos.at[a].add(imp * w_lin_a[:, None])
    dpos = dpos.at[jnp.maximum(b, 0)].add(
        jnp.where((b >= 0)[:, None], -imp * w_lin_b[:, None], 0.0))
    dpos = dpos * norm[:, None] * _RELAX

    drot = jnp.zeros((n_body, 3))
    ang_a = _apply_inv_inertia(q_a, ii_a, jnp.cross(r_a, imp))
    ang_b = _apply_inv_inertia(q_b, ii_b, jnp.cross(r_b, -imp))
    drot = drot.at[a].add(ang_a)
    drot = drot.at[jnp.maximum(b, 0)].add(
        jnp.where((b >= 0)[:, None], ang_b, 0.0))
    drot = drot * norm[:, None] * _RELAX

    return dpos, drot, lam


def _apply_rot(quat, drot):
    """Apply rotation vectors to quaternions (small-angle update)."""
    dq = 0.5 * jnp.concatenate(
        [jnp.zeros_like(drot[..., :1]), drot], axis=-1)
    return math3d.quat_normalize(quat + math3d.quat_mul(dq, quat))


def solve_grab_joints(cfg, pos, quat, eff_inv_m, inv_inertia,
                      grab: GrabState):
    """Positional + angular corrections for the per-agent fixed joints.

    Anchor constraint: (x_t + R_t r2) == (x_a + R_a r1'), where
    r1' = (0, 1.25 + sep, 0.5) in the agent frame (reference attach frame
    construction, src/sim.cpp:343-356). Angular constraint drives the
    relative rotation back to its value at grab time.
    """
    n_body = cfg.num_dyn_bodies
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    n_agents = agent_hi - agent_lo

    a_slot = jnp.arange(agent_lo, agent_hi)
    t_slot = grab.target  # [A], -1 = no grab
    has = t_slot >= 0
    t_safe = jnp.maximum(t_slot, 0)

    x_a, q_a = pos[a_slot], quat[a_slot]
    x_t, q_t = pos[t_safe], quat[t_safe]

    r1 = jnp.stack(
        [jnp.zeros_like(grab.sep), 1.25 + grab.sep,
         jnp.full_like(grab.sep, 0.5)], axis=-1)
    p_a = x_a + math3d.quat_rotate(q_a, r1)
    p_t = x_t + math3d.quat_rotate(q_t, grab.r2)

    delta = p_t - p_a  # drive to zero
    c_len = jnp.linalg.norm(delta, axis=-1)
    n = delta / jnp.maximum(c_len, 1e-9)[:, None]

    r_a = p_a - x_a
    r_t = p_t - x_t
    ii_a = inv_inertia[a_slot]
    ii_t = jnp.where(has[:, None], inv_inertia[t_safe], 0.0)
    w_a = eff_inv_m[a_slot] + jnp.sum(
        jnp.cross(r_a, n) * _apply_inv_inertia(q_a, ii_a, jnp.cross(r_a, n)),
        axis=-1)
    w_t = jnp.where(has, eff_inv_m[t_safe], 0.0) + jnp.sum(
        jnp.cross(r_t, n) * _apply_inv_inertia(q_t, ii_t, jnp.cross(r_t, n)),
        axis=-1)
    w_sum = w_a + w_t
    lam = jnp.where(has & (w_sum > 1e-9), c_len / jnp.maximum(w_sum, 1e-9),
                    0.0)
    imp = lam[:, None] * n  # applied +imp to agent, -imp to target

    dpos = jnp.zeros((n_body, 3))
    dpos = dpos.at[a_slot].add(imp * eff_inv_m[a_slot][:, None])
    dpos = dpos.at[t_safe].add(
        jnp.where(has[:, None], -imp * eff_inv_m[t_safe][:, None], 0.0))

    drot = jnp.zeros((n_body, 3))
    drot = drot.at[a_slot].add(
        _apply_inv_inertia(q_a, ii_a, jnp.cross(r_a, imp)))
    drot = drot.at[t_safe].add(
        jnp.where(has[:, None],
                  _apply_inv_inertia(q_t, ii_t, jnp.cross(r_t, -imp)), 0.0))

    # Angular: relative rotation error vs stored rel_q (q_t^-1 q_a target).
    rel_now = math3d.quat_mul(math3d.quat_inv(q_t), q_a)
    err_q = math3d.quat_mul(rel_now, math3d.quat_inv(grab.rel_q))
    # Rotation vector of the error, expressed in the target frame; map to
    # world via q_t.
    sign = jnp.sign(err_q[..., :1])
    theta_local = 2.0 * err_q[..., 1:] * sign
    theta_world = math3d.quat_rotate(q_t, theta_local)

    ang_w_a = jnp.sum(_apply_inv_inertia(
        q_a, ii_a, theta_world) * theta_world, axis=-1)
    ang_w_t = jnp.sum(_apply_inv_inertia(
        q_t, ii_t, theta_world) * theta_world, axis=-1)
    tnorm2 = jnp.sum(theta_world * theta_world, axis=-1)
    denom = ang_w_a + ang_w_t
    scale = jnp.where(has & (denom > 1e-9) & (tnorm2 > 1e-12),
                      tnorm2 / jnp.maximum(denom, 1e-9), 0.0)
    # Corrections: rotate agent by -share, target by +share of the error.
    drot = drot.at[a_slot].add(
        -_apply_inv_inertia(q_a, ii_a, theta_world) * scale[:, None])
    drot = drot.at[t_safe].add(jnp.where(
        has[:, None],
        _apply_inv_inertia(q_t, ii_t, theta_world) * scale[:, None], 0.0))

    return dpos, drot


def velocity_friction(cfg, pos, quat, vel, omega, eff_inv_m, inv_inertia,
                      contacts, lam_n, h):
    """XPBD velocity-pass dynamic friction.

    For each active contact, damp the tangential relative velocity at the
    contact point by an impulse clamped to mu * |lambda_n| / h.
    """
    n_body = cfg.num_dyn_bodies
    a, b = contacts.a, contacts.b
    r_a = contacts.p - pos[a]
    r_b = contacts.p - _gather_body(b, pos)

    v_a = vel[a] + jnp.cross(omega[a], r_a)
    v_b = _gather_body(b, vel) + jnp.cross(
        _gather_body(b, omega), r_b)
    v_rel = v_a - v_b
    n = contacts.n
    v_n = jnp.sum(v_rel * n, axis=-1, keepdims=True) * n
    v_t = v_rel - v_n
    v_t_len = jnp.linalg.norm(v_t, axis=-1)
    t_dir = v_t / jnp.maximum(v_t_len, 1e-9)[:, None]

    q_a = quat[jnp.maximum(a, 0)]
    q_b = quat[jnp.maximum(b, 0)]
    ii_a = inv_inertia[jnp.maximum(a, 0)]
    ii_b = jnp.where((b >= 0)[:, None], inv_inertia[jnp.maximum(b, 0)], 0.0)
    rxt_a = jnp.cross(r_a, t_dir)
    rxt_b = jnp.cross(r_b, t_dir)
    w_a = eff_inv_m[a] + jnp.sum(
        rxt_a * _apply_inv_inertia(q_a, ii_a, rxt_a), axis=-1)
    w_b = _gather_body(b, eff_inv_m) + jnp.sum(
        rxt_b * _apply_inv_inertia(q_b, ii_b, rxt_b), axis=-1)
    w_sum = jnp.maximum(w_a + w_b, 1e-9)

    j_stop = v_t_len / w_sum
    j_max = contacts.mu * jnp.abs(lam_n) / h
    j = jnp.minimum(j_stop, j_max)
    j = jnp.where(contacts.mask & (lam_n > 0.0), j, 0.0)
    imp = -j[:, None] * t_dir  # applied to A; +j to B

    ones = (contacts.mask & (lam_n > 0.0)).astype(pos.dtype)
    cnt = jnp.zeros((n_body,)).at[a].add(ones)
    cnt = cnt.at[jnp.maximum(b, 0)].add(jnp.where(b >= 0, ones, 0.0))
    norm = 1.0 / jnp.maximum(cnt, 1.0)

    dvel = jnp.zeros((n_body, 3))
    dvel = dvel.at[a].add(imp * eff_inv_m[a][:, None])
    dvel = dvel.at[jnp.maximum(b, 0)].add(jnp.where(
        (b >= 0)[:, None], -imp * _gather_body(b, eff_inv_m)[:, None], 0.0))
    dvel = dvel * norm[:, None]

    domega = jnp.zeros((n_body, 3))
    domega = domega.at[a].add(
        _apply_inv_inertia(q_a, ii_a, jnp.cross(r_a, imp)))
    domega = domega.at[jnp.maximum(b, 0)].add(jnp.where(
        (b >= 0)[:, None],
        _apply_inv_inertia(q_b, ii_b, jnp.cross(r_b, -imp)), 0.0))
    domega = domega * norm[:, None]

    return vel + dvel, omega + domega


def physics_step(cfg: EnvConfig, bodies: RigidBodies, statics: StaticGeom,
                 grab: GrabState, ext_force: jnp.ndarray,
                 ext_torque: jnp.ndarray) -> RigidBodies:
    """Run cfg.num_physics_substeps XPBD substeps (reference task graph:
    src/sim.cpp:1162-1168)."""
    h = cfg.dt / cfg.num_physics_substeps
    n_body = cfg.num_dyn_bodies
    _, (ramp_lo, ramp_hi), _ = body_slot_ranges(cfg)
    slot = jnp.arange(n_body)
    is_ramp = (slot >= ramp_lo) & (slot < ramp_hi)

    dynamic = bodies.active & ~bodies.locked
    eff_inv_m = jnp.where(dynamic, bodies.inv_mass, 0.0)
    eff_inv_I = jnp.where(dynamic[:, None], bodies.inv_inertia, 0.0)
    verts_local = body_vertices_local(cfg, bodies.half_ext)

    def substep(carry, _):
        pos, quat, vel, omega = carry

        # --- integrate -------------------------------------------------
        acc = GRAVITY[None, :] * (eff_inv_m > 0.0)[:, None] \
            + ext_force * eff_inv_m[:, None]
        vel_i = vel + h * acc
        ang_acc = _apply_inv_inertia(quat, eff_inv_I, ext_torque)
        omega_i = omega + h * ang_acc
        pos_prev, quat_prev = pos, quat
        pos_i = pos + h * vel_i
        quat_i = math3d.quat_integrate(quat, omega_i, h)

        # --- contacts --------------------------------------------------
        verts_world = pos_i[:, None, :] + math3d.quat_rotate(
            quat_i[:, None, :], verts_local)
        cp = _gen_plane_contacts(cfg, pos_i, quat_i, verts_world,
                                 bodies.active, statics)
        cw = _gen_wall_contacts(cfg, verts_world, bodies.active,
                                bodies.friction_mu, statics)
        cd = _gen_pair_contacts(cfg, pos_i, quat_i, bodies.half_ext,
                                verts_world, bodies.active,
                                bodies.friction_mu)
        contacts = _concat_contacts(cp, cw, cd)

        dpos, drot, lam_n = solve_positions(
            cfg, pos_i, quat_i, eff_inv_m, eff_inv_I, contacts)
        pos_c = pos_i + dpos
        quat_c = _apply_rot(quat_i, drot)

        dpos_j, drot_j = solve_grab_joints(
            cfg, pos_c, quat_c, eff_inv_m, eff_inv_I, grab)
        pos_c = pos_c + dpos_j
        quat_c = _apply_rot(quat_c, drot_j)

        # --- velocities from positions --------------------------------
        vel_n = (pos_c - pos_prev) / h
        dq = math3d.quat_mul(quat_c, math3d.quat_inv(quat_prev))
        omega_n = 2.0 / h * dq[:, 1:] * jnp.sign(dq[:, :1])

        # --- velocity pass: dynamic friction --------------------------
        vel_n, omega_n = velocity_friction(
            cfg, pos_c, quat_c, vel_n, omega_n, eff_inv_m, eff_inv_I,
            contacts, lam_n, h)

        # Frozen bodies keep zero velocity.
        vel_n = jnp.where(dynamic[:, None], vel_n, 0.0)
        omega_n = jnp.where(dynamic[:, None], omega_n, 0.0)
        pos_c = jnp.where(dynamic[:, None], pos_c, pos_prev)
        quat_c = jnp.where(dynamic[:, None], quat_c, quat_prev)

        return (pos_c, quat_c, vel_n, omega_n), None

    (pos, quat, vel, omega), _ = jax.lax.scan(
        substep, (bodies.pos, bodies.quat, bodies.vel, bodies.omega),
        None, length=cfg.num_physics_substeps)

    return bodies.replace(pos=pos, quat=quat, vel=vel, omega=omega)
