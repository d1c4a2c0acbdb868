"""Batched XPBD rigid-body physics for one world (vmapped over worlds).

TPU-native replacement for the reference engine's XPBD solver + broadphase +
narrowphase (SURVEY.md §2.4 E4/E5/E6; reference wiring: src/sim.cpp:19,
1156-1173 — 4 substeps at dt=1/30). Design choices for the TPU:

  * No BVH / no entity compaction: fixed primitive slots with active masks.
  * **No dynamic scatters in the hot path.** Contacts are kept in dense
    structured groups — body-plane [B,8,P], body-wall [B,8,W], body-pair
    [B,8,B] — so every per-body impulse accumulation is a plain masked
    reduction over trailing axes, which XLA fuses into the VPU. (A flat
    contact list + scatter_add lowers to serial scatter loops on TPU and is
    ~1000x slower; measured in round 1.)
  * Contact model: vertex-vs-convex-SDF in both directions per pair. Boxes
    and agents are OBBs, ramps are wedges (5-halfspace convex), walls are
    static AABBs, the floor is a plane. Vertex-face manifolds; edge-edge
    crossings are approximated (the reference itself notes its physics
    differs from the original OpenAI env, README.md:4).
  * Jacobi (simultaneous) position solve with per-body count-normalized
    corrections — the batched analogue of the reference's sequential
    Gauss-Seidel sweep.
  * Friction: velocity-pass dynamic friction clamped by the accumulated
    normal lambda. Per-class mu_d values follow reference
    src/mgr.cpp:476-559; pair mu = max(mu_a, mu_b).
  * Grab joints: 3-dof anchor + 3-dof relative-rotation positional
    constraints per agent slot (reference fixed joint: src/sim.cpp:343-357);
    the only cross-body routing uses a tiny [A,B] one-hot matmul.

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


def convex_sdf_local(p_local: jnp.ndarray, half_ext: jnp.ndarray,
                     is_ramp: jnp.ndarray):
    """Signed distance + outward normal of body shapes, local frame.

    p_local: [..., 3]; half_ext broadcastable [..., 3]; is_ramp [...] bool.
    sdf < 0 inside (max-face distance, exact inside for convex shapes).
    """
    q = jnp.abs(p_local) - half_ext
    box_sdf = jnp.max(q, axis=-1)
    k = jnp.argmax(q, axis=-1)
    box_n = jnp.sign(
        jnp.take_along_axis(p_local, k[..., None], axis=-1)
    ) * jax.nn.one_hot(k, 3, dtype=p_local.dtype)

    d = jnp.einsum("fk,...k->...f", WEDGE_NORMALS, p_local) - WEDGE_OFFSETS
    wedge_sdf = jnp.max(d, axis=-1)
    fk = jnp.argmax(d, axis=-1)
    wedge_n = WEDGE_NORMALS[fk]

    sdf = jnp.where(is_ramp, wedge_sdf, box_sdf)
    normal = jnp.where(is_ramp[..., None], wedge_n, box_n)
    return sdf, normal


class _GroupSolveOut(NamedTuple):
    dpos: jnp.ndarray    # [B, 3] accumulated positional corrections
    drot: jnp.ndarray    # [B, 3] accumulated rotation-vector corrections
    cnt: jnp.ndarray     # [B] contact counts touching each body
    lam: jnp.ndarray     # group-shaped normal lambdas (for friction pass)


def _apply_inv_inertia(quat, inv_diag, u):
    """I^-1 u with I^-1 = R diag(inv) R^T."""
    u_b = math3d.quat_rotate_inv(quat, u)
    return math3d.quat_rotate(quat, inv_diag * u_b)


def _solve_static_group(pos_a, quat_a, w_lin_a, inv_I_a, p, n, depth, mask):
    """Contacts of dynamic bodies (leading axis B) against static geometry.

    p, n, depth, mask: [B, V, M, ...]; the static side has infinite mass.
    Returns per-body accumulations (sums over V, M) + lambdas.
    """
    r_a = p - pos_a[:, None, None, :]
    rxn = jnp.cross(r_a, n)
    q_b = quat_a[:, None, None, :]
    ii = inv_I_a[:, None, None, :]
    w_ang = jnp.sum(rxn * _apply_inv_inertia(q_b, ii, rxn), axis=-1)
    w_sum = w_lin_a[:, None, None] + w_ang

    lam = jnp.where(mask & (w_sum > 1e-9),
                    depth / jnp.maximum(w_sum, 1e-9), 0.0)
    imp = lam[..., None] * n

    dpos = jnp.sum(imp, axis=(1, 2)) * w_lin_a[:, None]
    ang = _apply_inv_inertia(q_b, ii, jnp.cross(r_a, imp))
    drot = jnp.sum(ang, axis=(1, 2))
    cnt = jnp.sum(mask, axis=(1, 2)).astype(pos_a.dtype)
    return _GroupSolveOut(dpos, drot, cnt, lam)


def _solve_pair_group(pos, quat, w_lin, inv_I, p, n, depth, mask):
    """Dense dynamic-dynamic contacts: vertex v of body a against body b.

    p, n, depth, mask: [A, V, B(, 3)] where axis 0 indexes the vertex owner
    (side a) and axis 2 the SDF owner (side b). n pushes a along +n.
    Accumulations are reductions: a-side over (V, B), b-side over (A, V).
    """
    r_a = p - pos[:, None, None, :]
    r_b = p - pos[None, None, :, :]
    q_a = quat[:, None, None, :]
    q_b = quat[None, None, :, :]
    ii_a = inv_I[:, None, None, :]
    ii_b = inv_I[None, None, :, :]

    rxn_a = jnp.cross(r_a, n)
    rxn_b = jnp.cross(r_b, n)
    w_ang_a = jnp.sum(rxn_a * _apply_inv_inertia(q_a, ii_a, rxn_a), axis=-1)
    w_ang_b = jnp.sum(rxn_b * _apply_inv_inertia(q_b, ii_b, rxn_b), axis=-1)
    w_a = w_lin[:, None, None] + w_ang_a
    w_b = w_lin[None, None, :] + w_ang_b
    w_sum = w_a + w_b

    lam = jnp.where(mask & (w_sum > 1e-9),
                    depth / jnp.maximum(w_sum, 1e-9), 0.0)
    imp = lam[..., None] * n

    dpos = (jnp.sum(imp, axis=(1, 2)) * w_lin[:, None]
            - jnp.sum(imp, axis=(0, 1)) * w_lin[:, None])
    ang_a = _apply_inv_inertia(q_a, ii_a, jnp.cross(r_a, imp))
    ang_b = _apply_inv_inertia(q_b, ii_b, jnp.cross(r_b, -imp))
    drot = jnp.sum(ang_a, axis=(1, 2)) + jnp.sum(ang_b, axis=(0, 1))
    cnt = (jnp.sum(mask, axis=(1, 2)) + jnp.sum(mask, axis=(0, 1))
           ).astype(pos.dtype)
    return _GroupSolveOut(dpos, drot, cnt, lam)


def _friction_static_group(pos_a, quat_a, vel, omega, w_lin_a, inv_I_a,
                           p, n, mask, mu, lam, h):
    """Velocity-pass dynamic friction for static-side contact groups.

    Returns (dvel [B,3], domega [B,3], cnt [B]) accumulations.
    """
    r_a = p - pos_a[:, None, None, :]
    v_c = vel[:, None, None, :] + jnp.cross(omega[:, None, None, :], r_a)
    v_n = jnp.sum(v_c * n, axis=-1, keepdims=True) * n
    v_t = v_c - v_n
    v_t_len = jnp.linalg.norm(v_t, axis=-1)
    t_dir = v_t / jnp.maximum(v_t_len, 1e-9)[..., None]

    q_b = quat_a[:, None, None, :]
    ii = inv_I_a[:, None, None, :]
    rxt = jnp.cross(r_a, t_dir)
    w_sum = w_lin_a[:, None, None] + jnp.sum(
        rxt * _apply_inv_inertia(q_b, ii, rxt), axis=-1)
    w_sum = jnp.maximum(w_sum, 1e-9)

    active = mask & (lam > 0.0)
    j = jnp.minimum(v_t_len / w_sum, mu * lam / h)
    j = jnp.where(active, j, 0.0)
    imp = -j[..., None] * t_dir

    dvel = jnp.sum(imp, axis=(1, 2)) * w_lin_a[:, None]
    dom = jnp.sum(_apply_inv_inertia(q_b, ii, jnp.cross(r_a, imp)),
                  axis=(1, 2))
    cnt = jnp.sum(active, axis=(1, 2)).astype(pos_a.dtype)
    return dvel, dom, cnt


def _friction_pair_group(pos, quat, vel, omega, w_lin, inv_I,
                         p, n, mask, mu, lam, h):
    r_a = p - pos[:, None, None, :]
    r_b = p - pos[None, None, :, :]
    v_a = vel[:, None, None, :] + jnp.cross(omega[:, None, None, :], r_a)
    v_b = vel[None, None, :, :] + jnp.cross(omega[None, None, :, :], r_b)
    v_rel = v_a - v_b
    v_n = jnp.sum(v_rel * n, axis=-1, keepdims=True) * n
    v_t = v_rel - v_n
    v_t_len = jnp.linalg.norm(v_t, axis=-1)
    t_dir = v_t / jnp.maximum(v_t_len, 1e-9)[..., None]

    q_a = quat[:, None, None, :]
    q_b = quat[None, None, :, :]
    ii_a = inv_I[:, None, None, :]
    ii_b = inv_I[None, None, :, :]
    rxt_a = jnp.cross(r_a, t_dir)
    rxt_b = jnp.cross(r_b, t_dir)
    w_sum = (w_lin[:, None, None] + w_lin[None, None, :] +
             jnp.sum(rxt_a * _apply_inv_inertia(q_a, ii_a, rxt_a), axis=-1) +
             jnp.sum(rxt_b * _apply_inv_inertia(q_b, ii_b, rxt_b), axis=-1))
    w_sum = jnp.maximum(w_sum, 1e-9)

    active = mask & (lam > 0.0)
    j = jnp.minimum(v_t_len / w_sum, mu * lam / h)
    j = jnp.where(active, j, 0.0)
    imp = -j[..., None] * t_dir

    dvel = (jnp.sum(imp, axis=(1, 2)) * w_lin[:, None]
            - jnp.sum(imp, axis=(0, 1)) * w_lin[:, None])
    dom = (jnp.sum(_apply_inv_inertia(q_a, ii_a, jnp.cross(r_a, imp)),
                   axis=(1, 2)) +
           jnp.sum(_apply_inv_inertia(q_b, ii_b, jnp.cross(r_b, -imp)),
                   axis=(0, 1)))
    cnt = (jnp.sum(active, axis=(1, 2)) + jnp.sum(active, axis=(0, 1))
           ).astype(pos.dtype)
    return dvel, dom, cnt


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
    relative rotation back to its value at grab time. Cross-body routing
    uses an [A, B] one-hot matmul (no scatters).
    """
    n_body = cfg.num_dyn_bodies
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    n_agents = agent_hi - agent_lo

    t_slot = grab.target  # [A], -1 = no grab
    has = t_slot >= 0
    onehot = (t_slot[:, None] == jnp.arange(n_body)[None, :]).astype(
        pos.dtype)  # [A, B]

    x_a = pos[agent_lo:agent_hi]
    q_a = quat[agent_lo:agent_hi]
    # Gather target state densely via the one-hot (B is tiny).
    x_t = onehot @ pos
    q_t_raw = onehot @ quat
    q_t = jnp.where(has[:, None], q_t_raw, math3d.quat_identity((n_agents,)))
    w_t = jnp.where(has, onehot @ eff_inv_m, 0.0)
    ii_t = jnp.where(has[:, None], onehot @ inv_inertia, 0.0)

    w_a = eff_inv_m[agent_lo:agent_hi]
    ii_a = inv_inertia[agent_lo:agent_hi]

    r1 = jnp.stack(
        [jnp.zeros_like(grab.sep), 1.25 + grab.sep,
         jnp.full_like(grab.sep, 0.5)], axis=-1)
    p_a = x_a + math3d.quat_rotate(q_a, r1)
    p_t = x_t + math3d.quat_rotate(q_t, grab.r2)

    delta = p_t - p_a
    c_len = jnp.linalg.norm(delta, axis=-1)
    n = delta / jnp.maximum(c_len, 1e-9)[:, None]

    r_a = p_a - x_a
    r_t = p_t - x_t
    gw_a = w_a + jnp.sum(
        jnp.cross(r_a, n) * _apply_inv_inertia(q_a, ii_a, jnp.cross(r_a, n)),
        axis=-1)
    gw_t = w_t + jnp.sum(
        jnp.cross(r_t, n) * _apply_inv_inertia(q_t, ii_t, jnp.cross(r_t, n)),
        axis=-1)
    w_sum = gw_a + gw_t
    lam = jnp.where(has & (w_sum > 1e-9), c_len / jnp.maximum(w_sum, 1e-9),
                    0.0)
    imp = lam[:, None] * n  # +imp on agent, -imp on target

    dpos_a = imp * w_a[:, None]                       # [A, 3]
    dpos_t = -imp * w_t[:, None]                      # [A, 3]
    drot_a = _apply_inv_inertia(q_a, ii_a, jnp.cross(r_a, imp))
    drot_t = _apply_inv_inertia(q_t, ii_t, jnp.cross(r_t, -imp))

    # Angular: relative rotation error vs stored rel_q.
    rel_now = math3d.quat_mul(math3d.quat_inv(q_t), q_a)
    err_q = math3d.quat_mul(rel_now, math3d.quat_inv(grab.rel_q))
    sign = jnp.sign(err_q[..., :1])
    theta_world = math3d.quat_rotate(q_t, 2.0 * err_q[..., 1:] * sign)

    ang_w_a = jnp.sum(_apply_inv_inertia(q_a, ii_a, theta_world) *
                      theta_world, axis=-1)
    ang_w_t = jnp.sum(_apply_inv_inertia(q_t, ii_t, theta_world) *
                      theta_world, axis=-1)
    tnorm2 = jnp.sum(theta_world * theta_world, axis=-1)
    denom = ang_w_a + ang_w_t
    scale = jnp.where(has & (denom > 1e-9) & (tnorm2 > 1e-12),
                      tnorm2 / jnp.maximum(denom, 1e-9), 0.0)
    drot_a = drot_a - _apply_inv_inertia(
        q_a, ii_a, theta_world) * scale[:, None]
    drot_t = drot_t + _apply_inv_inertia(
        q_t, ii_t, theta_world) * scale[:, None]

    # Route target contributions back to body slots with the one-hot.
    dpos = jnp.einsum("ab,ak->bk", onehot, dpos_t)
    drot = jnp.einsum("ab,ak->bk", onehot, drot_t)
    # Agent contributions occupy a static slice.
    dpos = dpos.at[agent_lo:agent_hi].add(dpos_a)
    drot = drot.at[agent_lo:agent_hi].add(drot_a)
    return dpos, drot


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

    active = bodies.active
    mu_body = bodies.friction_mu
    n_wall = statics.wall_pos.shape[0]
    n_plane = statics.plane_point.shape[0]

    # Pair friction/masks that don't change within the step.
    pair_valid = (active[:, None, None] & active[None, None, :] &
                  (slot[:, None, None] != slot[None, None, :]))
    pair_mu = jnp.maximum(mu_body[:, None, None], mu_body[None, None, :])
    wall_mu = jnp.maximum(mu_body, 2.0)[:, None, None]  # wall muD = 2
    plane_mu = jnp.maximum(mu_body, 2.0)[:, None, None]  # plane muD = 2

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

        # --- contact generation (dense structured groups) --------------
        verts_w = pos_i[:, None, :] + math3d.quat_rotate(
            quat_i[:, None, :], verts_local)          # [B, 8, 3]

        # Planes: [B, 8, P]
        rel_p = verts_w[:, :, None, :] - statics.plane_point[None, None]
        d_plane = jnp.einsum("bvpk,pk->bvp", rel_p, statics.plane_normal)
        plane_depth = -d_plane
        plane_mask = (plane_depth > 0.0) & active[:, None, None] & \
            statics.plane_active[None, None, :]
        plane_n = jnp.broadcast_to(
            statics.plane_normal[None, None], (n_body, 8, n_plane, 3))
        plane_p = jnp.broadcast_to(
            verts_w[:, :, None, :], (n_body, 8, n_plane, 3))

        # Walls (AABBs): [B, 8, W]
        rel_w = verts_w[:, :, None, :] - statics.wall_pos[None, None]
        qw = jnp.abs(rel_w) - statics.wall_half_ext[None, None]
        wall_sdf = jnp.max(qw, axis=-1)
        kw = jnp.argmax(qw, axis=-1)
        wall_n = jnp.sign(jnp.take_along_axis(rel_w, kw[..., None], -1)) * \
            jax.nn.one_hot(kw, 3, dtype=rel_w.dtype)
        wall_depth = -wall_sdf
        wall_mask = (wall_depth > 0.0) & active[:, None, None] & \
            statics.wall_active[None, None, :]
        wall_p = jnp.broadcast_to(
            verts_w[:, :, None, :], (n_body, 8, n_wall, 3))

        # Dynamic pairs: vertex of a in b's frame: [A, 8, B]
        rel_d = verts_w[:, :, None, :] - pos_i[None, None, :, :]
        p_local = math3d.quat_rotate_inv(quat_i[None, None, :, :], rel_d)
        pair_sdf, n_local = convex_sdf_local(
            p_local, bodies.half_ext[None, None], is_ramp[None, None, :])
        pair_n = math3d.quat_rotate(quat_i[None, None, :, :], n_local)
        pair_depth = -pair_sdf
        pair_mask = (pair_depth > 0.0) & pair_valid
        pair_p = jnp.broadcast_to(
            verts_w[:, :, None, :], (n_body, 8, n_body, 3))

        # --- position solve (Jacobi, count-normalized) -----------------
        o_pl = _solve_static_group(pos_i, quat_i, eff_inv_m, eff_inv_I,
                                   plane_p, plane_n, plane_depth, plane_mask)
        o_wl = _solve_static_group(pos_i, quat_i, eff_inv_m, eff_inv_I,
                                   wall_p, wall_n, wall_depth, wall_mask)
        o_pr = _solve_pair_group(pos_i, quat_i, eff_inv_m, eff_inv_I,
                                 pair_p, pair_n, pair_depth, pair_mask)

        cnt = o_pl.cnt + o_wl.cnt + o_pr.cnt
        norm = 1.0 / jnp.maximum(cnt, 1.0)
        dpos = (o_pl.dpos + o_wl.dpos + o_pr.dpos) * norm[:, None]
        drot = (o_pl.drot + o_wl.drot + o_pr.drot) * norm[:, None]

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
        f_pl = _friction_static_group(
            pos_c, quat_c, vel_n, omega_n, eff_inv_m, eff_inv_I,
            plane_p, plane_n, plane_mask, plane_mu, o_pl.lam, h)
        f_wl = _friction_static_group(
            pos_c, quat_c, vel_n, omega_n, eff_inv_m, eff_inv_I,
            wall_p, wall_n, wall_mask, wall_mu, o_wl.lam, h)
        f_pr = _friction_pair_group(
            pos_c, quat_c, vel_n, omega_n, eff_inv_m, eff_inv_I,
            pair_p, pair_n, pair_mask, pair_mu, o_pr.lam, h)

        fcnt = f_pl[2] + f_wl[2] + f_pr[2]
        fnorm = 1.0 / jnp.maximum(fcnt, 1.0)
        vel_n = vel_n + (f_pl[0] + f_wl[0] + f_pr[0]) * fnorm[:, None]
        omega_n = omega_n + (f_pl[1] + f_wl[1] + f_pr[1]) * fnorm[:, None]

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
