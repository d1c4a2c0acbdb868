"""Fused per-step Pallas TPU kernel: XPBD physics + the full ray sweep.

The reference runs its whole step as one CUDA megakernel launch
(src/mgr.cpp:714-737); the TPU-native analogue is this single Pallas launch
per env step. It chains:

  1. the physics substep loop (ops/pallas_physics.make_physics_core — the
     in-VMEM manifold build + 4 XPBD substeps), then
  2. a ray-sweep epilogue on the post-physics pose while it is still live in
     VMEM: visibility occlusion rays (reference: computeVisibilitySystem
     src/sim.cpp:567-710), 30-ray lidar (src/sim.cpp:712-759), the
     seeker-sees-hider reward flag (rewardsVisSystem src/sim.cpp:763-804 —
     geometrically the agent-column visibility rays, so the sweep is
     shared), and the NEXT step's grab/lock interaction rays
     (src/sim.cpp:285-331 — traced here because the pre-physics state of
     step N+1 IS this post-step state; see types.EnvState.act_hit_*).

Ray queries are built in-kernel from the solver's register state, and the
sweep results are consumed in-kernel down to exactly what the step needs
(final vis mask values, lidar depths, one hit per agent, one reward bit per
world) — no [rays x worlds] intermediate ever touches HBM and the step pays
one kernel launch instead of four (VERDICT.md round-1 item 1).

Layout: worlds ride the 128-wide lane dimension, rays ride sublanes, the
primitive loop is unrolled (prim kind per slot is static). Semantics are
pinned by the jnp reference paths (env/physics.py, env/rays.py,
env/observations.py) which tests compare against in interpreter mode.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marl_hideandseek_tpu.config import (
    EnvConfig,
    INTERACT_RAY_LEN,
    LIDAR_MAX_RANGE,
    MAX_AGENTS,
    NUM_LIDAR_SAMPLES,
    VIS_FOV_DEGREES,
)
from marl_hideandseek_tpu.env.observations import _others_index_matrix
from marl_hideandseek_tpu.ops.pallas_physics import (
    LANE,
    _qrot,
    make_physics_core,
)
from marl_hideandseek_tpu.ops.pallas_rays import (
    _BIG,
    _EPS,
    _WEDGE_FACES,
    _rot_inv,
    _slab_t,
)
from marl_hideandseek_tpu.types import body_slot_ranges

_COS_HALF_FOV = float(np.cos(np.deg2rad(VIS_FOV_DEGREES / 2.0)))


def _ray_static_tables(cfg: EnvConfig):
    """Static per-row metadata for the sweep: (R, rows-per-agent, n_tgt,
    exclude slot per row [R], max_t per row [R])."""
    n_a = cfg.max_agents
    _, _, (agent_lo, _) = body_slot_ranges(cfg)
    n_tgt = (MAX_AGENTS - 1) + cfg.max_boxes + cfg.max_ramps
    r_a = n_tgt + NUM_LIDAR_SAMPLES + 1
    r = n_a * r_a
    excl = np.zeros((r,), np.int32)
    maxt = np.zeros((r,), np.float32)
    for a in range(n_a):
        base = a * r_a
        excl[base:base + r_a] = agent_lo + a
        maxt[base:base + n_tgt] = 1.0
        maxt[base + n_tgt:base + n_tgt + NUM_LIDAR_SAMPLES] = LIDAR_MAX_RANGE
        maxt[base + r_a - 1] = INTERACT_RAY_LEN
    return r, r_a, n_tgt, excl, maxt


def _make_fused_kernel(cfg: EnvConfig, n_wall: int, n_plane: int):
    core = make_physics_core(cfg, n_wall, n_plane)
    n_body = cfg.num_dyn_bodies
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    n_a = cfg.max_agents
    n_rays, r_a, n_tgt, row_excl, row_maxt = _ray_static_tables(cfg)
    others = _others_index_matrix(n_a)                      # np [A, 5]
    t_agent_cols = MAX_AGENTS - 1

    lidar_cs = [
        (math.cos(2.0 * math.pi * k / NUM_LIDAR_SAMPLES + math.pi / 2.0),
         math.sin(2.0 * math.pi * k / NUM_LIDAR_SAMPLES + math.pi / 2.0))
        for k in range(NUM_LIDAR_SAMPLES)
    ]

    # Static target slot per vis row within an agent block (agent targets
    # use the o_safe clamp exactly like the jnp path so invalid columns
    # trace the same (masked-out) rays).
    tgt_slots = np.zeros((n_a, n_tgt), np.int32)
    for a in range(n_a):
        for k in range(t_agent_cols):
            tgt_slots[a, k] = agent_lo + min(others[a][k], n_a - 1)
        for k in range(cfg.max_boxes):
            tgt_slots[a, t_agent_cols + k] = box_lo + k
        for k in range(cfg.max_ramps):
            tgt_slots[a, t_agent_cols + cfg.max_boxes + k] = ramp_lo + k

    def kernel(*args):
        ins, outs = args[:26], args[26:]
        (pos_ref, quat_ref, vel_ref, om_ref, invm_ref, invI_ref, dyn_ref,
         act_ref, he_ref, mub_ref, f_ref, tq_ref, wp_ref, wh2_ref, wa_ref,
         pp_ref, pn_ref, pa_ref, gt_ref, gr2_ref, gq_ref, gsep_ref,
         atype_ref, aact_ref, nab_ref, nar_ref) = ins
        (pos_out, quat_out, vel_out, om_out,
         vis_out, lid_out, actt_out, actid_out, rew_out) = outs

        carry = core(*ins[:22])
        (px, py, pz, qw, qx, qy, qz, vx, vy, vz, wx, wy, wz) = carry

        pos_out[:] = jnp.stack(carry[0:3], axis=1)
        quat_out[:] = jnp.stack(carry[3:7], axis=1)
        vel_out[:] = jnp.stack(carry[7:10], axis=1)
        om_out[:] = jnp.stack(carry[10:13], axis=1)

        # ---- build the ray set from the post-physics pose ----------------
        a_fwd = []
        dx_rows, dy_rows, dz_rows = [], [], []
        ox_rows, oy_rows, oz_rows = [], [], []
        for a in range(n_a):
            s = agent_lo + a
            apx, apy, apz = px[s], py[s], pz[s]
            q = (qw[s], qx[s], qy[s], qz[s])
            one = jnp.ones_like(apx)
            zero = jnp.zeros_like(apx)
            fx, fy, fz = _qrot(q, (zero, one, zero))
            rx, ry, rz = _qrot(q, (one, zero, zero))
            a_fwd.append((fx, fy, fz))

            for k in range(n_tgt):
                t = tgt_slots[a, k]
                dx_rows.append(px[t] - apx)
                dy_rows.append(py[t] - apy)
                dz_rows.append(pz[t] - apz)
            for ck, sk in lidar_cs:
                dx_rows.append(ck * rx + sk * fx)
                dy_rows.append(ck * ry + sk * fy)
                dz_rows.append(ck * rz + sk * fz)
            dx_rows.append(fx)
            dy_rows.append(fy)
            dz_rows.append(fz)

            ox_rows.append(jnp.broadcast_to(apx[None], (r_a, LANE)))
            oy_rows.append(jnp.broadcast_to(apy[None], (r_a, LANE)))
            # Grab/lock ray origin is the eye point: pos + 0.5 * up
            # (reference: src/sim.cpp:285-289).
            oz_rows.append(jnp.concatenate([
                jnp.broadcast_to(apz[None], (r_a - 1, LANE)),
                (apz + 0.5)[None]], axis=0))

        dx = jnp.stack(dx_rows)                    # [R, L]
        dy = jnp.stack(dy_rows)
        dz = jnp.stack(dz_rows)
        ox = jnp.concatenate(ox_rows, axis=0)
        oy = jnp.concatenate(oy_rows, axis=0)
        oz = jnp.concatenate(oz_rows, axis=0)

        # ---- nearest-hit sweep over all primitives ------------------------
        t_best = jnp.full((n_rays, LANE), _BIG)
        id_best = jnp.full((n_rays, LANE), -1, jnp.int32)
        # Self-exclusion: the slot of the agent owning each ray row
        # (captured numpy constants are not allowed in Pallas kernels, so
        # build it from an iota).
        row_agent_slot = agent_lo + \
            jax.lax.broadcasted_iota(jnp.int32, (n_rays, 1), 0) // r_a

        def update(t, prim_id, extra_mask, check_excl, t_best, id_best):
            t = jnp.where(extra_mask, t, _BIG)
            if check_excl:
                t = jnp.where(row_agent_slot == prim_id, _BIG, t)
            better = t < t_best
            return (jnp.where(better, t, t_best),
                    jnp.where(better, prim_id, id_best))

        for b in range(n_body):
            pbx = px[b][None]
            pby = py[b][None]
            pbz = pz[b][None]
            qbw = qw[b][None]
            qbx = qx[b][None]
            qby = qy[b][None]
            qbz = qz[b][None]
            act = act_ref[b][None] > 0.5

            lox, loy, loz = _rot_inv(qbw, qbx, qby, qbz,
                                     ox - pbx, oy - pby, oz - pbz)
            ldx, ldy, ldz = _rot_inv(qbw, qbx, qby, qbz, dx, dy, dz)

            if ramp_lo <= b < ramp_hi:
                t_in = jnp.full((n_rays, LANE), -_BIG)
                t_out_ = jnp.full((n_rays, LANE), _BIG)
                miss = jnp.zeros((n_rays, LANE), bool)
                for (nx, ny, nz), off in _WEDGE_FACES:
                    denom = nx * ldx + ny * ldy + nz * ldz
                    num = off - (nx * lox + ny * loy + nz * loz)
                    small = jnp.abs(denom) < _EPS
                    t = num / jnp.where(small, _EPS, denom)
                    t_in = jnp.maximum(
                        t_in, jnp.where(small | (denom > 0), -_BIG, t))
                    t_out_ = jnp.minimum(
                        t_out_, jnp.where(small | (denom < 0), _BIG, t))
                    miss = miss | (small & (num < 0))
                hit = (t_out_ >= t_in) & (t_in > _EPS) & ~miss
                t = jnp.where(hit, t_in, _BIG)
            else:
                hx = he_ref[b, 0][None]
                hy = he_ref[b, 1][None]
                hz = he_ref[b, 2][None]
                t = _slab_t(lox, loy, loz, ldx, ldy, ldz, hx, hy, hz)

            t_best, id_best = update(t, b, act,
                                     agent_lo <= b < agent_hi,
                                     t_best, id_best)

        # Walls are axis-aligned, so every wall pass shares the same ray
        # dirs: hoist the 3 slab reciprocals out of the 36-wall loop
        # (divides are multi-cycle on the VPU; this replaces ~108 divides
        # per row-set with 3). Semantics identical to _slab_t.
        small_x = jnp.abs(dx) < _EPS
        small_y = jnp.abs(dy) < _EPS
        small_z = jnp.abs(dz) < _EPS
        inv_dx = 1.0 / jnp.where(small_x, _EPS, dx)
        inv_dy = 1.0 / jnp.where(small_y, _EPS, dy)
        inv_dz = 1.0 / jnp.where(small_z, _EPS, dz)

        def wall_axis(o, h, inv_d, small):
            t1 = (-h - o) * inv_d
            t2 = (h - o) * inv_d
            near = jnp.minimum(t1, t2)
            far = jnp.maximum(t1, t2)
            outside = small & (jnp.abs(o) > h)
            return (jnp.where(outside, _BIG, near),
                    jnp.where(outside, -_BIG, far))

        for w in range(n_wall):
            pwx = wp_ref[w, 0][None]
            pwy = wp_ref[w, 1][None]
            pwz = wp_ref[w, 2][None]
            hx = wh2_ref[w, 0][None]
            hy = wh2_ref[w, 1][None]
            hz = wh2_ref[w, 2][None]
            act = wa_ref[w][None] > 0.5
            n1, f1 = wall_axis(ox - pwx, hx, inv_dx, small_x)
            n2, f2 = wall_axis(oy - pwy, hy, inv_dy, small_y)
            n3, f3 = wall_axis(oz - pwz, hz, inv_dz, small_z)
            tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
            tmax = jnp.minimum(jnp.minimum(f1, f2), f3)
            hit = (tmax >= tmin) & (tmin > _EPS)
            t = jnp.where(hit, tmin, _BIG)
            t_best, id_best = update(t, n_body + w, act, False,
                                     t_best, id_best)

        for p in range(n_plane):
            nx = pn_ref[p, 0][None]
            ny = pn_ref[p, 1][None]
            nz = pn_ref[p, 2][None]
            sx = pp_ref[p, 0][None]
            sy = pp_ref[p, 1][None]
            sz = pp_ref[p, 2][None]
            act = pa_ref[p][None] > 0.5
            denom = dx * nx + dy * ny + dz * nz
            num = (sx - ox) * nx + (sy - oy) * ny + (sz - oz) * nz
            t = num / jnp.where(jnp.abs(denom) < _EPS, -_EPS, denom)
            hit = (denom < -_EPS) & (t > _EPS)
            t = jnp.where(hit, t, _BIG)
            t_best, id_best = update(t, n_body + n_wall + p, act, False,
                                     t_best, id_best)

        # Per-row max ranges are applied in the consume phase below (the
        # range check on the winning hit is equivalent to pre-filtering:
        # any in-range hit is nearer than any out-of-range one).

        # ---- consume: vis masks, lidar, action hits, reward flag ----------
        nab = nab_ref[0]                                    # [L] f32
        nar = nar_ref[0]
        act_t_rows, act_id_rows = [], []
        rew_any = jnp.zeros((LANE,), bool)
        for a in range(n_a):
            base = a * r_a
            a_act = aact_ref[a] > 0.5                       # [L]

            # Visibility: nearest hit is the target + cone + validity
            # (env/observations.py::consume_obs_sweep semantics).
            t_v = dx[base:base + n_tgt]
            u_v = dy[base:base + n_tgt]
            w_v = dz[base:base + n_tgt]
            dist = jnp.sqrt(t_v * t_v + u_v * u_v + w_v * w_v)
            fx, fy, fz = a_fwd[a]
            dot = t_v * fx[None] + u_v * fy[None] + w_v * fz[None]
            in_cone = dot >= _COS_HALF_FOV * jnp.maximum(dist, 1e-9)

            # Mosaic cannot concatenate i1 vregs — stack as f32 rows.
            hits_f = jnp.stack([
                ((id_best[base + k] == int(tgt_slots[a, k])) &
                 (t_best[base + k] <= 1.0)).astype(jnp.float32)
                for k in range(n_tgt)
            ])

            valid_rows = []
            for k in range(t_agent_cols):
                j = others[a][k]
                if j < n_a:
                    valid_rows.append(aact_ref[j])
                else:
                    valid_rows.append(jnp.zeros((LANE,)))
            for k in range(cfg.max_boxes):
                valid_rows.append((nab > float(k)).astype(jnp.float32))
            for k in range(cfg.max_ramps):
                valid_rows.append((nar > float(k)).astype(jnp.float32))
            valid_f = jnp.stack(valid_rows)                 # [n_tgt, L]

            seen_f = (hits_f * in_cone.astype(jnp.float32) * valid_f *
                      a_act[None].astype(jnp.float32))
            vis_out[a] = seen_f

            # Lidar depths: 0 on miss/out-of-range, zeroed when inactive.
            l0 = base + n_tgt
            lid_t = t_best[l0:l0 + NUM_LIDAR_SAMPLES]
            lid_id = id_best[l0:l0 + NUM_LIDAR_SAMPLES]
            lid = jnp.where((lid_id >= 0) & (lid_t <= LIDAR_MAX_RANGE),
                            lid_t, 0.0)
            lid_out[a] = lid * a_act[None].astype(jnp.float32)

            a_t = t_best[base + r_a - 1]
            a_id = id_best[base + r_a - 1]
            in_range = a_t <= INTERACT_RAY_LEN
            act_t_rows.append(jnp.where(in_range, a_t, _BIG))
            act_id_rows.append(jnp.where(in_range, a_id, -1))

            # Reward flag: seeker observer sees hider target column
            # (AGENT_SEEKER = 0, AGENT_HIDER = 1).
            is_seeker = atype_ref[a] < 0.5
            for k in range(t_agent_cols):
                j = others[a][k]
                if j < n_a:
                    col_hider = atype_ref[j] > 0.5
                    rew_any = rew_any | ((seen_f[k] > 0.5) & is_seeker &
                                         col_hider)

        actt_out[:] = jnp.stack(act_t_rows)
        actid_out[:] = jnp.stack(act_id_rows)
        rew_out[:] = rew_any[None].astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _fused_pallas(cfg: EnvConfig, interpret: bool, n_wall: int,
                  n_plane: int, *args):
    n_body = cfg.num_dyn_bodies
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    n_agents = agent_hi - agent_lo
    n_tgt = (MAX_AGENTS - 1) + cfg.max_boxes + cfg.max_ramps
    n_worlds = args[0].shape[-1]
    assert n_worlds % LANE == 0

    def wspec(*prefix):
        rank = len(prefix)
        return pl.BlockSpec(prefix + (LANE,),
                            lambda i, _r=rank: (0,) * _r + (i,),
                            memory_space=pltpu.VMEM)

    in_specs = [
        wspec(n_body, 3),   # pos
        wspec(n_body, 4),   # quat
        wspec(n_body, 3),   # vel
        wspec(n_body, 3),   # omega
        wspec(n_body),      # inv_m
        wspec(n_body, 3),   # invI
        wspec(n_body),      # dynamic
        wspec(n_body),      # active
        wspec(n_body, 3),   # half_ext
        wspec(n_body),      # friction mu
        wspec(n_body, 3),   # ext force
        wspec(n_body, 3),   # ext torque
        wspec(n_wall, 3),   # wall pos
        wspec(n_wall, 3),   # wall half
        wspec(n_wall),      # wall active
        wspec(n_plane, 3),  # plane point
        wspec(n_plane, 3),  # plane normal
        wspec(n_plane),     # plane active
        wspec(n_agents),        # grab target
        wspec(n_agents, 3),     # grab r2
        wspec(n_agents, 4),     # grab rel_q
        wspec(n_agents),        # grab sep
        wspec(n_agents),        # agent type
        wspec(n_agents),        # agent active
        wspec(1),               # num active boxes
        wspec(1),               # num active ramps
    ]
    out_specs = [
        wspec(n_body, 3), wspec(n_body, 4), wspec(n_body, 3),
        wspec(n_body, 3),
        wspec(n_agents, n_tgt),             # vis masks
        wspec(n_agents, NUM_LIDAR_SAMPLES),  # lidar
        wspec(n_agents),                    # action hit t
        wspec(n_agents),                    # action hit id
        wspec(1),                           # reward flag
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 4, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_agents, n_tgt, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct(
            (n_agents, NUM_LIDAR_SAMPLES, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_agents, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_agents, n_worlds), jnp.int32),
        jax.ShapeDtypeStruct((1, n_worlds), jnp.float32),
    ]
    return pl.pallas_call(
        _make_fused_kernel(cfg, n_wall, n_plane),
        grid=(n_worlds // LANE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # See pallas_physics._physics_pallas: the manifold build keeps many
        # metadata planes live; the sweep adds ~15 [R, 128] ray planes.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(*args)


def fused_step_packed(cfg: EnvConfig, ps, ext_force, ext_torque,
                      interpret: bool = False):
    """Fused step on worlds-minor ("packed") state: zero transposes.

    ps: EnvState with every leaf's world axis LAST (env/packed.py);
    ext_force/ext_torque [B, 3, W]. Returns (bodies', SweepResults) in the
    same packed layout (vis [A, T, W], lidar [A, 30, W], act_t/act_id
    [A, W], rew_seen [W] bool).
    """
    from marl_hideandseek_tpu.env.env import SweepResults

    bodies, statics, grab = ps.bodies, ps.statics, ps.grab
    dynamic = bodies.active & ~bodies.locked
    eff_inv_m = jnp.where(dynamic, bodies.inv_mass, 0.0)
    eff_inv_I = jnp.where(dynamic[:, None], bodies.inv_inertia, 0.0)

    f32 = lambda x: x.astype(jnp.float32)
    args = (
        f32(bodies.pos), f32(bodies.quat), f32(bodies.vel),
        f32(bodies.omega),
        f32(eff_inv_m), f32(eff_inv_I),
        f32(dynamic), f32(bodies.active),
        f32(bodies.half_ext), f32(bodies.friction_mu),
        f32(ext_force), f32(ext_torque),
        f32(statics.wall_pos), f32(statics.wall_half_ext),
        f32(statics.wall_active),
        f32(statics.plane_point), f32(statics.plane_normal),
        f32(statics.plane_active),
        f32(grab.target), f32(grab.r2), f32(grab.rel_q), f32(grab.sep),
        f32(ps.agent_type), f32(ps.agent_active),
        f32(ps.num_active_boxes)[None], f32(ps.num_active_ramps)[None],
    )
    (pos, quat, vel, omega, vis, lid, act_t, act_id, rew) = _fused_pallas(
        cfg, interpret, statics.wall_pos.shape[0],
        statics.plane_point.shape[0], *args)

    new_bodies = bodies.replace(pos=pos, quat=quat, vel=vel, omega=omega)
    return new_bodies, SweepResults(
        vis_seen=vis, lidar=lid, act_t=act_t,
        act_id=act_id.astype(jnp.int32), rew_seen=rew[0] > 0.5)


def use_fused(cfg: EnvConfig, state) -> bool:
    """Fused kernel eligibility (TPU + lane-aligned world count)."""
    n_worlds = state.step.shape[0]
    return (jax.devices()[0].platform == "tpu" and n_worlds % LANE == 0)


def fused_step(cfg: EnvConfig, state, ext_force, ext_torque,
               interpret: bool = False):
    """One fused physics + ray-sweep step for all worlds.

    state: EnvState (leading worlds axis); ext_force/ext_torque [W, B, 3].
    Returns (bodies', (vis_seen [W,A,T] f32, lidar [W,A,30] f32,
    act_t [W,A] f32, act_id [W,A] i32, rew_seen [W] bool)).
    """
    bodies, statics, grab = state.bodies, state.statics, state.grab
    dynamic = bodies.active & ~bodies.locked
    eff_inv_m = jnp.where(dynamic, bodies.inv_mass, 0.0)
    eff_inv_I = jnp.where(dynamic[..., None], bodies.inv_inertia, 0.0)

    def wmin(x):
        return jnp.moveaxis(x, 0, -1).astype(jnp.float32)

    args = (
        wmin(bodies.pos), wmin(bodies.quat), wmin(bodies.vel),
        wmin(bodies.omega),
        wmin(eff_inv_m), wmin(eff_inv_I),
        wmin(dynamic.astype(jnp.float32)),
        wmin(bodies.active.astype(jnp.float32)),
        wmin(bodies.half_ext), wmin(bodies.friction_mu),
        wmin(ext_force), wmin(ext_torque),
        wmin(statics.wall_pos), wmin(statics.wall_half_ext),
        wmin(statics.wall_active.astype(jnp.float32)),
        wmin(statics.plane_point), wmin(statics.plane_normal),
        wmin(statics.plane_active.astype(jnp.float32)),
        wmin(grab.target.astype(jnp.float32)),
        wmin(grab.r2), wmin(grab.rel_q), wmin(grab.sep),
        wmin(state.agent_type.astype(jnp.float32)),
        wmin(state.agent_active.astype(jnp.float32)),
        wmin(state.num_active_boxes.astype(jnp.float32))[None],
        wmin(state.num_active_ramps.astype(jnp.float32))[None],
    )
    (pos, quat, vel, omega, vis, lid, act_t, act_id, rew) = _fused_pallas(
        cfg, interpret, statics.wall_pos.shape[1],
        statics.plane_point.shape[1], *args)

    def wmaj(x):
        return jnp.moveaxis(x, -1, 0)

    new_bodies = bodies.replace(pos=wmaj(pos), quat=wmaj(quat),
                                vel=wmaj(vel), omega=wmaj(omega))
    sweep = (wmaj(vis), wmaj(lid), wmaj(act_t),
             wmaj(act_id), wmaj(rew)[:, 0] > 0.5)
    return new_bodies, sweep
