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


# Dynamic wall-loop trip count: the sweep's wall loop runs to the
# batch's max active-wall count (block max ~26 of 36 slots at the
# training config) instead of the full slot unroll. Round 3 measured
# this ~equal to the static form; after the round-4 megastep rebalanced
# the kernel it is a clear win (+4.7% step throughput at 16K worlds),
# so dynamic is now the default. Controls both the kernel's wall loop
# form and whether the per-step wall-count bound is computed at all.
DYNAMIC_WALLS = True


def _wall_bound(wall_active, axis: int) -> jnp.ndarray:
    """i32 [1] batch-max active-wall count for the kernel's dynamic wall
    loop (wall slots are densely packed: geometry.wall_active). A static
    constant when DYNAMIC_WALLS is off (the SMEM input must still exist
    for the kernel signature, but nothing reads it)."""
    n_wall = wall_active.shape[axis]
    if not DYNAMIC_WALLS:
        return jnp.full((1,), n_wall, jnp.int32)
    counts = jnp.sum(wall_active.astype(jnp.int32), axis=axis)
    return jnp.max(counts).astype(jnp.int32)[None]


def make_sweep(cfg: EnvConfig, n_wall: int, n_plane: int,
               dynamic_walls: bool = DYNAMIC_WALLS):
    """Build the ray-sweep + consume body shared by the fused and mega
    step kernels.

    Sweep layout (round-3 work-cut): three row-sets stacked per agent —
    VIS [A, n_tgt, L] (3-D target rays, ids tracked), LID [A, 30, L]
    (horizontal lidar rays, t-only), ACT [A, L] (horizontal grab/lock
    ray from the eye point, single-vreg planes). Exploited invariants,
    each pinned by tests:

      * agent quats are pure yaw (inv-inertia x/y are zeroed,
        reference: src/mgr.cpp:576-584), so agent basis vectors and
        agent-body ray transforms are 2-D rotations, and lidar/act ray
        dirs have exactly dz = 0;
      * every active wall shares one z slab per world (walls are
        z-extruded with constant height, env/geometry.py:walls_to_obbs;
        debug fixtures match) — the wall-loop z axis hoists to one
        per-row-set computation (VIS) or a per-agent mask (LID/ACT);
      * wall slots are densely packed (wall_active = arange < n), so the
        wall loop can bound its trip count by the block's max wall count
        (`dynamic_walls`);
      * per-agent ray origins are shared by all of the agent's rays: the
        per-body origin transform runs on [A, L] / [A, 1, L] instead of
        [R, L].

    Returns sweep(carry, act, he, wp, wh2, wa, pp, pn, pa, atype, aact,
    nab, nar, nwb_ref) -> (vis [A,T,L] f32, lid [A,30,L] f32,
    actt [A,L] f32, actid [A,L] i32, rew [L] f32); all args are arrays
    except the SMEM ref nwb_ref."""
    n_body = cfg.num_dyn_bodies
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    n_a = cfg.max_agents
    n_tgt = (MAX_AGENTS - 1) + cfg.max_boxes + cfg.max_ramps
    others = _others_index_matrix(n_a)                      # np [A, 5]
    t_agent_cols = MAX_AGENTS - 1

    lidar_cs = [
        (math.cos(2.0 * math.pi * k / NUM_LIDAR_SAMPLES + math.pi / 2.0),
         math.sin(2.0 * math.pi * k / NUM_LIDAR_SAMPLES + math.pi / 2.0))
        for k in range(NUM_LIDAR_SAMPLES)
    ]

    # Static target slot per (agent, vis column), with the o_safe clamp of
    # the jnp path (invalid columns trace the same masked-out rays).
    tgt_slots = np.zeros((n_a, n_tgt), np.int32)
    for a in range(n_a):
        for k in range(t_agent_cols):
            tgt_slots[a, k] = agent_lo + min(others[a][k], n_a - 1)
        for k in range(cfg.max_boxes):
            tgt_slots[a, t_agent_cols + k] = box_lo + k
        for k in range(cfg.max_ramps):
            tgt_slots[a, t_agent_cols + cfg.max_boxes + k] = ramp_lo + k

    def sweep_body(carry, act_ref, he_ref, wp_ref, wh2_ref, wa_ref,
                   pp_ref, pn_ref, pa_ref, atype_ref, aact_ref,
                   nab_ref, nar_ref, nwb_ref):
        (px, py, pz, qw, qx, qy, qz, vx, vy, vz, wx_, wy_, wz_) = carry

        # ---- per-agent basis + origins [A, L] -----------------------------
        # Per-agent scalars ride the sublane axis as single [A, L] planes
        # (1 vreg) instead of [A, 1, L] (A vregs at 1/8 sublane use);
        # [:, None, :] views feed the [A, R, L] broadcasts where needed.
        apx = jnp.stack([px[agent_lo + a] for a in range(n_a)])   # [A, L]
        apy = jnp.stack([py[agent_lo + a] for a in range(n_a)])
        apz = jnp.stack([pz[agent_lo + a] for a in range(n_a)])
        aqw = jnp.stack([qw[agent_lo + a] for a in range(n_a)])
        aqz = jnp.stack([qz[agent_lo + a] for a in range(n_a)])
        # Yaw-only rotation columns: fwd = q*(0,1,0) = (-2wz, 1-2z^2, 0),
        # right = q*(1,0,0) = (1-2z^2, 2wz, 0). Same expressions as the
        # general _qrot specialized at qx=qy=0 (bit-identical op order).
        c_yaw = 1.0 - 2.0 * aqz * aqz
        s_yaw = 2.0 * aqw * aqz
        fwx, fwy = -s_yaw, c_yaw                            # [A, L]
        rtx, rty = c_yaw, s_yaw

        # ---- ray dirs -----------------------------------------------------
        # VIS: target_pos - agent_pos (targets at static slots).
        def tgt_stack(comp):
            return jnp.stack([
                jnp.stack([comp[int(tgt_slots[a, k])]
                           for k in range(n_tgt)])
                for a in range(n_a)
            ])                                              # [A, n_tgt, L]

        vdx = tgt_stack(px) - apx[:, None, :]
        vdy = tgt_stack(py) - apy[:, None, :]
        vdz = tgt_stack(pz) - apz[:, None, :]
        # LID: horizontal circle in the agent frame (dz = 0 exactly).
        ldx = jnp.stack([ck * rtx + sk * fwx for ck, sk in lidar_cs],
                        axis=1)                             # [A, 30, L]
        ldy = jnp.stack([ck * rty + sk * fwy for ck, sk in lidar_cs],
                        axis=1)
        # ACT: forward from the eye point (dz = 0 exactly); [A, L] rows.
        adx, ady = fwx, fwy                                 # [A, L]
        aoz = apz + 0.5

        # ---- accumulators -------------------------------------------------
        tv = jnp.full((n_a, n_tgt, LANE), _BIG)
        iv = jnp.full((n_a, n_tgt, LANE), -1, jnp.int32)
        tl = jnp.full((n_a, NUM_LIDAR_SAMPLES, LANE), _BIG)
        ta = jnp.full((n_a, LANE), _BIG)
        ia = jnp.full((n_a, LANE), -1, jnp.int32)

        a_iota = jax.lax.broadcasted_iota(jnp.int32, (n_a, 1, 1), 0)
        a_iota2 = jax.lax.broadcasted_iota(jnp.int32, (n_a, LANE), 0)

        # ---- dynamic bodies ----------------------------------------------
        for b in range(n_body):
            pbx, pby, pbz = px[b], py[b], pz[b]             # [L]
            bact = act_ref[b] > 0.5
            is_agent = agent_lo <= b < agent_hi
            is_ramp = ramp_lo <= b < ramp_hi

            # Shared per-agent origin transform (one per row-set origin,
            # broadcast over the agent's rays).
            rel = (apx - pbx, apy - pby, apz - pbz)         # [A, L]
            if is_agent:
                bqw, bqz = qw[b], qz[b]
                bc = 1.0 - 2.0 * bqz * bqz
                bs = 2.0 * bqw * bqz

                def rotb(x, y, z):
                    # R^T for yaw rotation: x' = c x + s y, y' = -s x + c y.
                    return (bc * x + bs * y, bc * y - bs * x, z)
            else:
                bq = (qw[b], qx[b], qy[b], qz[b])

                def rotb(x, y, z):
                    o = _rot_inv(bq[0], bq[1], bq[2], bq[3], x, y, z)
                    return o

            lox, loy, loz = rotb(*rel)                      # [A, L]
            # Eye origin: base + 0.5 * (world z in body frame).
            if is_agent:
                ezx, ezy, ezz = 0.0, 0.0, 1.0
            else:
                ezx, ezy, ezz = rotb(jnp.zeros_like(pbx),
                                     jnp.zeros_like(pbx),
                                     jnp.ones_like(pbx))
                ezx, ezy, ezz = ezx[None], ezy[None], ezz[None]  # [1, L]
            aox = lox + 0.5 * ezx                           # [A, L]
            aoy = loy + 0.5 * ezy
            aoz_l = loz + 0.5 * ezz

            lox1, loy1, loz1 = (lox[:, None, :], loy[:, None, :],
                                loz[:, None, :])            # [A, 1, L]
            v_d = rotb(vdx, vdy, vdz)                       # [A, n_tgt, L]
            l_d = rotb(ldx, ldy, jnp.zeros_like(ldx))       # [A, 30, L]
            a_d = rotb(adx, ady, jnp.zeros_like(adx))       # [A, L]

            if is_ramp:
                def wedge_t(ox_, oy_, oz_, dx_, dy_, dz_):
                    t_in = jnp.full(dx_.shape, -_BIG)
                    t_out_ = jnp.full(dx_.shape, _BIG)
                    miss = jnp.zeros(dx_.shape, bool)
                    for (nx, ny, nz), off in _WEDGE_FACES:
                        denom = nx * dx_ + ny * dy_ + nz * dz_
                        num = off - (nx * ox_ + ny * oy_ + nz * oz_)
                        small = jnp.abs(denom) < _EPS
                        t = num / jnp.where(small, _EPS, denom)
                        t_in = jnp.maximum(
                            t_in, jnp.where(small | (denom > 0), -_BIG, t))
                        t_out_ = jnp.minimum(
                            t_out_, jnp.where(small | (denom < 0), _BIG, t))
                        miss = miss | (small & (num < 0))
                    hit = (t_out_ >= t_in) & (t_in > _EPS) & ~miss
                    return jnp.where(hit, t_in, _BIG)

                t_v = wedge_t(lox1, loy1, loz1, *v_d)
                t_l = wedge_t(lox1, loy1, loz1, *l_d)
                t_a = wedge_t(aox, aoy, aoz_l, *a_d)
            else:
                hx, hy, hz = he_ref[b, 0], he_ref[b, 1], he_ref[b, 2]
                if is_agent:
                    # Yaw body + dz=0 rays: z slab is a pure mask for
                    # LID/ACT (local dz stays 0); VIS keeps full 3-D.
                    t_v = _slab_t(lox1, loy1, loz1, *v_d, hx, hy, hz)
                    z_ok_l = jnp.abs(loz1) <= hz            # [A, 1, L]
                    z_ok_a = jnp.abs(aoz_l) <= hz           # [A, L]
                    t_l = _slab_t2d(lox1, loy1, l_d[0], l_d[1], hx, hy)
                    t_l = jnp.where(z_ok_l, t_l, _BIG)
                    t_a = _slab_t2d(aox, aoy, a_d[0], a_d[1], hx, hy)
                    t_a = jnp.where(z_ok_a, t_a, _BIG)
                else:
                    t_v = _slab_t(lox1, loy1, loz1, *v_d, hx, hy, hz)
                    t_l = _slab_t(lox1, loy1, loz1, *l_d, hx, hy, hz)
                    t_a = _slab_t(aox, aoy, aoz_l, *a_d, hx, hy, hz)

            if is_agent:
                own = a_iota == (b - agent_lo)
                own2 = a_iota2 == (b - agent_lo)
                t_v = jnp.where(own, _BIG, t_v)
                t_l = jnp.where(own, _BIG, t_l)
                t_a = jnp.where(own2, _BIG, t_a)

            t_v = jnp.where(bact, t_v, _BIG)
            t_l = jnp.where(bact, t_l, _BIG)
            t_a = jnp.where(bact, t_a, _BIG)

            bv = t_v < tv
            tv = jnp.where(bv, t_v, tv)
            iv = jnp.where(bv, b, iv)
            tl = jnp.minimum(tl, t_l)
            ba = t_a < ta
            ta = jnp.where(ba, t_a, ta)
            ia = jnp.where(ba, b, ia)

        # ---- walls --------------------------------------------------------
        # Reciprocals hoisted (walls share ray dirs); z slab hoisted out of
        # the whole wall loop (walls share one z extent per world).
        sm_vx = jnp.abs(vdx) < _EPS
        sm_vy = jnp.abs(vdy) < _EPS
        sm_vz = jnp.abs(vdz) < _EPS
        i_vx = 1.0 / jnp.where(sm_vx, _EPS, vdx)
        i_vy = 1.0 / jnp.where(sm_vy, _EPS, vdy)
        i_vz = 1.0 / jnp.where(sm_vz, _EPS, vdz)
        sm_lx = jnp.abs(ldx) < _EPS
        sm_ly = jnp.abs(ldy) < _EPS
        i_lx = 1.0 / jnp.where(sm_lx, _EPS, ldx)
        i_ly = 1.0 / jnp.where(sm_ly, _EPS, ldy)
        sm_ax = jnp.abs(adx) < _EPS                         # [A, L]
        sm_ay = jnp.abs(ady) < _EPS
        i_ax = 1.0 / jnp.where(sm_ax, _EPS, adx)
        i_ay = 1.0 / jnp.where(sm_ay, _EPS, ady)

        def wall_axis(o, h, inv_d, small):
            t1 = (-h - o) * inv_d
            t2 = (h - o) * inv_d
            near = jnp.minimum(t1, t2)
            far = jnp.maximum(t1, t2)
            outside = small & (jnp.abs(o) > h)
            return (jnp.where(outside, _BIG, near),
                    jnp.where(outside, -_BIG, far))

        # Shared z slab from wall slot 0 (uniform-z invariant).
        wz0 = wp_ref[0, 2][None, None]                      # [1, 1, L]
        whz0 = wh2_ref[0, 2][None, None]
        zn_v, zf_v = wall_axis(apz[:, None, :] - wz0, whz0, i_vz, sm_vz)
        z_ok_lw = (jnp.abs(apz - wz0[0]) <= whz0[0])[:, None, :]  # [A,1,L]
        z_ok_aw = jnp.abs(aoz - wz0[0]) <= whz0[0]          # [A, L]

        def wall_pass(w_idx, accs, pwx, pwy, hx, hy, wact):
            tv, iv, tl, ta, ia = accs
            ox_v = apx - pwx                                # [A, L]
            oy_v = apy - pwy
            ox_v1 = ox_v[:, None, :]                        # [A, 1, L]
            oy_v1 = oy_v[:, None, :]
            n1, f1 = wall_axis(ox_v1, hx, i_vx, sm_vx)
            n2, f2 = wall_axis(oy_v1, hy, i_vy, sm_vy)
            tmin = jnp.maximum(jnp.maximum(n1, n2), zn_v)
            tmax = jnp.minimum(jnp.minimum(f1, f2), zf_v)
            hit = (tmax >= tmin) & (tmin > _EPS) & wact
            t_v = jnp.where(hit, tmin, _BIG)

            n1, f1 = wall_axis(ox_v1, hx, i_lx, sm_lx)
            n2, f2 = wall_axis(oy_v1, hy, i_ly, sm_ly)
            tmin = jnp.maximum(n1, n2)
            tmax = jnp.minimum(f1, f2)
            hit = (tmax >= tmin) & (tmin > _EPS) & z_ok_lw & wact
            t_l = jnp.where(hit, tmin, _BIG)

            n1, f1 = wall_axis(ox_v, hx, i_ax, sm_ax)       # [A, L]
            n2, f2 = wall_axis(oy_v, hy, i_ay, sm_ay)
            tmin = jnp.maximum(n1, n2)
            tmax = jnp.minimum(f1, f2)
            hit = (tmax >= tmin) & (tmin > _EPS) & z_ok_aw & wact
            t_a = jnp.where(hit, tmin, _BIG)

            bv = t_v < tv
            tv = jnp.where(bv, t_v, tv)
            iv = jnp.where(bv, n_body + w_idx, iv)
            tl = jnp.minimum(tl, t_l)
            ba = t_a < ta
            ta = jnp.where(ba, t_a, ta)
            ia = jnp.where(ba, n_body + w_idx, ia)
            return tv, iv, tl, ta, ia

        accs = (tv, iv, tl, ta, ia)
        if dynamic_walls:
            # Trip count = the batch's max active-wall count, computed
            # outside the kernel and passed through SMEM (slots are
            # densely packed; lanes with fewer walls are masked by wact).
            bound = nwb_ref[0]

            def wall_body(w, accs):
                pwx = wp_ref[w, 0]
                pwy = wp_ref[w, 1]
                hx = wh2_ref[w, 0]
                hy = wh2_ref[w, 1]
                wact = wa_ref[w] > 0.5
                return wall_pass(w, accs, pwx, pwy, hx, hy, wact)

            accs = jax.lax.fori_loop(0, bound, wall_body, accs)
        else:
            for w in range(n_wall):
                accs = wall_pass(w, accs, wp_ref[w, 0], wp_ref[w, 1],
                                 wh2_ref[w, 0], wh2_ref[w, 1],
                                 wa_ref[w] > 0.5)
        tv, iv, tl, ta, ia = accs

        # ---- planes -------------------------------------------------------
        # LID/ACT rays are horizontal: drop the dz term from the denom.
        for p in range(n_plane):
            nx, ny, nz = pn_ref[p, 0], pn_ref[p, 1], pn_ref[p, 2]
            sx, sy, sz = pp_ref[p, 0], pp_ref[p, 1], pp_ref[p, 2]
            pact = pa_ref[p] > 0.5
            num_v = ((sx - apx) * nx + (sy - apy) * ny + (sz - apz) * nz)
            num_a = ((sx - apx) * nx + (sy - apy) * ny + (sz - aoz) * nz)

            def plane_t(denom, num):
                t = num / jnp.where(jnp.abs(denom) < _EPS, -_EPS, denom)
                hit = (denom < -_EPS) & (t > _EPS) & pact
                return jnp.where(hit, t, _BIG)

            t_v = plane_t(vdx * nx + vdy * ny + vdz * nz,
                          num_v[:, None, :])
            t_l = plane_t(ldx * nx + ldy * ny, num_v[:, None, :])
            t_a = plane_t(adx * nx + ady * ny, num_a)

            pid = n_body + n_wall + p
            bv = t_v < tv
            tv = jnp.where(bv, t_v, tv)
            iv = jnp.where(bv, pid, iv)
            tl = jnp.minimum(tl, t_l)
            ba = t_a < ta
            ta = jnp.where(ba, t_a, ta)
            ia = jnp.where(ba, pid, ia)

        # Per-row max ranges are applied in the consume phase below (the
        # range check on the winning hit is equivalent to pre-filtering:
        # any in-range hit is nearer than any out-of-range one).

        # ---- consume: vis masks, lidar, action hits, reward flag ----------
        nab = nab_ref[0][None, None]                        # [1, 1, L]
        nar = nar_ref[0][None, None]
        a_act = jnp.stack(
            [aact_ref[a] for a in range(n_a)])[:, None, :]  # [A, 1, L] f32

        # Visibility: nearest hit is the target + cone + validity
        # (env/observations.py::consume_obs_sweep semantics).
        dist = jnp.sqrt(vdx * vdx + vdy * vdy + vdz * vdz)
        dot = (vdx * fwx[:, None, :] +
               vdy * fwy[:, None, :])                       # fwd z = 0
        in_cone = dot >= _COS_HALF_FOV * jnp.maximum(dist, 1e-9)

        # Static target-slot grid from iotas (captured numpy arrays are
        # not allowed as Pallas constants).
        a_i = jax.lax.broadcasted_iota(jnp.int32, (n_a, n_tgt, 1), 0)
        k_i = jax.lax.broadcasted_iota(jnp.int32, (n_a, n_tgt, 1), 1)
        oth = jnp.minimum(k_i + (k_i >= a_i), n_a - 1)
        slot_grid = jnp.where(
            k_i < t_agent_cols, agent_lo + oth,
            jnp.where(k_i < t_agent_cols + cfg.max_boxes,
                      box_lo + (k_i - t_agent_cols),
                      ramp_lo + (k_i - t_agent_cols - cfg.max_boxes)))
        hits_f = ((iv == slot_grid) & (tv <= 1.0)).astype(jnp.float32)

        # Validity: other-agent slots active (static permutation rows),
        # boxes/ramps within the active counts.
        o_act = jnp.stack([
            jnp.stack([(aact_ref[others[a][k]] if others[a][k] < n_a
                        else jnp.zeros((LANE,)))
                       for k in range(t_agent_cols)])
            for a in range(n_a)
        ])                                                  # [A, 5, L]
        pad_cols = n_tgt - t_agent_cols
        o_act_full = jnp.concatenate(
            [o_act, jnp.zeros((n_a, pad_cols, LANE))], axis=1)
        ent_valid = jnp.where(
            k_i < t_agent_cols, o_act_full,
            jnp.where(k_i < t_agent_cols + cfg.max_boxes,
                      (nab > (k_i - t_agent_cols).astype(jnp.float32))
                      .astype(jnp.float32),
                      (nar > (k_i - t_agent_cols - cfg.max_boxes)
                       .astype(jnp.float32)).astype(jnp.float32)))

        seen_f = (hits_f * in_cone.astype(jnp.float32) * ent_valid * a_act)

        # Lidar depths: 0 on miss/out-of-range, zeroed when inactive
        # (t < _BIG iff some primitive was hit — ids are not tracked).
        lid_v = jnp.where((tl < _BIG) & (tl <= LIDAR_MAX_RANGE),
                          tl, 0.0) * a_act

        in_range = ta <= INTERACT_RAY_LEN                   # [A, L]
        actt_v = jnp.where(in_range, ta, _BIG)
        actid_v = jnp.where(in_range, ia, -1)

        # Reward flag: any seeker observer sees any hider target column
        # (AGENT_SEEKER = 0, AGENT_HIDER = 1).
        is_seeker = jnp.stack(
            [atype_ref[a] for a in range(n_a)])[:, None, :] < 0.5
        col_hider = jnp.stack([
            jnp.stack([(atype_ref[others[a][k]] if others[a][k] < n_a
                        else jnp.zeros((LANE,)))
                       for k in range(t_agent_cols)])
            for a in range(n_a)
        ]) > 0.5                                            # [A, 5, L]
        seen_agents = seen_f[:, :t_agent_cols] > 0.5
        rew = jnp.any(seen_agents & is_seeker & col_hider,
                      axis=(0, 1)).astype(jnp.float32)      # [L]
        return seen_f, lid_v, actt_v, actid_v, rew

    return sweep_body


def _make_fused_kernel(cfg: EnvConfig, n_wall: int, n_plane: int,
                       dynamic_walls: bool = DYNAMIC_WALLS):
    """Fused physics + ray-sweep kernel (see make_sweep for layout)."""
    core = make_physics_core(cfg, n_wall, n_plane)
    sweep = make_sweep(cfg, n_wall, n_plane, dynamic_walls)

    def kernel(*args):
        ins, outs = args[:27], args[27:]
        nwb_ref = ins[26]
        (pos_out, quat_out, vel_out, om_out,
         vis_out, lid_out, actt_out, actid_out, rew_out) = outs

        # Pass REFS through (not ref[:] materializations): Mosaic lowers
        # ref row indexing to direct strided loads, while slicing a
        # materialized [B, k, L] array pays a relayout per field
        # (measured ~1 ms/step at 16K worlds).
        carry = core(*ins[:22])
        pos_out[:] = jnp.stack(carry[0:3], axis=1)
        quat_out[:] = jnp.stack(carry[3:7], axis=1)
        vel_out[:] = jnp.stack(carry[7:10], axis=1)
        om_out[:] = jnp.stack(carry[10:13], axis=1)

        vis, lid, actt, actid, rew = sweep(
            carry, ins[7], ins[8], ins[12], ins[13], ins[14],
            ins[15], ins[16], ins[17], ins[22], ins[23], ins[24],
            ins[25], nwb_ref)
        vis_out[:] = vis
        lid_out[:] = lid
        actt_out[:] = actt
        actid_out[:] = actid
        rew_out[:] = rew[None]

    return kernel


def _slab_t2d(ox, oy, dx, dy, hx, hy):
    """2-D slab entry-t for horizontal rays (dz = 0); +inf on miss."""
    def axis(o, d, h):
        small = jnp.abs(d) < _EPS
        sd = jnp.where(small, _EPS, d)
        t1 = (-h - o) / sd
        t2 = (h - o) / sd
        near = jnp.minimum(t1, t2)
        far = jnp.maximum(t1, t2)
        outside = small & (jnp.abs(o) > h)
        near = jnp.where(outside, _BIG, near)
        far = jnp.where(outside, -_BIG, far)
        return near, far

    n1, f1 = axis(ox, dx, hx)
    n2, f2 = axis(oy, dy, hy)
    tmin = jnp.maximum(n1, n2)
    tmax = jnp.minimum(f1, f2)
    hit = (tmax >= tmin) & (tmin > _EPS)
    return jnp.where(hit, tmin, _BIG)


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
        pl.BlockSpec(memory_space=pltpu.SMEM),  # max active walls (i32 [1])
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
        _wall_bound(statics.wall_active, axis=0),
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
        _wall_bound(statics.wall_active, axis=1),
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


# ---------------------------------------------------------------------------
# Megastep: the ENTIRE packed env step (minus level regeneration and obs
# assembly) as one Pallas launch — movement decode, grab/lock action
# system, XPBD physics, ray sweep, zero-vel, rewards/dones and episode
# scores all run in VMEM. Replaces the XLA glue phases of PackedEnv.step
# (~2 ms/step of HBM round trips at 16K worlds). Semantics are pinned by
# env/packed.py's component functions (the CPU fallback path) and
# tests/test_pallas_kernels.py::test_megastep_packed_matches.
# Reference systems: movementSystem src/sim.cpp:202-254, actionSystem
# src/sim.cpp:270-370, agentZeroVelSystem src/sim.cpp:256-268,
# outputRewardsDonesSystem src/sim.cpp:806-841,
# updateEpisodeResultsSystem src/sim.cpp:843-893.
# ---------------------------------------------------------------------------


def _megastep_misc_layout(cfg: EnvConfig):
    """Static row layout of the packed small-output array [MR, L]."""
    n_body = cfg.num_dyn_bodies
    n_a = cfg.max_agents
    rows = {}
    r = 0

    def take(name, k):
        nonlocal r
        rows[name] = (r, r + k)
        r += k

    take("locked", n_body)
    take("owner", n_body)
    take("g_target", n_a)
    take("g_sep", n_a)
    take("g_r2", 3 * n_a)      # comp-major: x rows, y rows, z rows
    take("g_relq", 4 * n_a)
    take("actt", n_a)
    take("actid", n_a)
    take("rewards", n_a)
    take("dones", n_a)
    take("rew", 1)
    take("rscore", 2)
    take("fscore", 2)
    return rows, r


def _make_megastep_kernel(cfg: EnvConfig, n_wall: int, n_plane: int,
                          dynamic_walls: bool = DYNAMIC_WALLS):
    from marl_hideandseek_tpu.env.env import (
        _DEFAULT_BUCKETS, _DEFAULT_F_MAX, _DEFAULT_T_MAX,
        _INSTANT_BUCKETS, _INSTANT_F_MAX, _INSTANT_T_MAX,
    )
    from marl_hideandseek_tpu.types import (
        AGENT_HIDER, OWNER_HIDER, OWNER_NONE, OWNER_SEEKER,
    )
    from marl_hideandseek_tpu.config import (
        NUM_PREP_STEPS, OOB_LIMIT, OOB_PENALTY, INTERACT_RAY_LEN,
    )
    from marl_hideandseek_tpu.ops.pallas_physics import (
        _qmul, _qconj, _qnorm,
    )

    core = make_physics_core(cfg, n_wall, n_plane)
    sweep = make_sweep(cfg, n_wall, n_plane, dynamic_walls)
    n_body = cfg.num_dyn_bodies
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    n_a = cfg.max_agents
    misc_rows, misc_r = _megastep_misc_layout(cfg)

    if cfg.zero_agent_velocity:
        half = _INSTANT_BUCKETS // 2
        f_per = _INSTANT_F_MAX / half
        t_per = _INSTANT_T_MAX / half
    else:
        half = _DEFAULT_BUCKETS // 2
        f_per = _DEFAULT_F_MAX / half
        t_per = _DEFAULT_T_MAX / half

    def qrot_full(q, v, inv=False):
        # identical op order to env/packed.py's _qrot
        from marl_hideandseek_tpu.ops.pallas_physics import _qrot as _qr
        return _qr(q, v, inv=inv)

    def kernel(*args):
        ins, outs = args[:33], args[33:]
        nwb_ref = ins[32]
        # Refs stay refs where the consumer (physics core / sweep / row
        # reads) can index them directly — materializing [B, k, L] arrays
        # and slicing costs a Mosaic relayout per field. Only small flat
        # planes are read up front.
        (pos, quat, vel, om, invm_ref, invI_ref, active, locked_ref,
         owner_ref, he, mub, wp, wh2, wa, pp, pn, pa, gt_ref, g_r2,
         g_q, gsep_ref, atype_ref, aact_ref, nab, nar, act5, hitt_ref,
         hitid_ref, step_ref, seekf_ref, rscore_ref, fscore_ref) = ins[:32]
        (pos_out, quat_out, vel_out, om_out, vis_out, lid_out,
         misc_out) = outs
        invm_raw = invm_ref[:]                               # [B, L]
        invI_raw = invI_ref[:]                               # [B, 3, L]
        locked = locked_ref[:]
        owner = owner_ref[:]
        g_t = gt_ref[:]
        g_sep = gsep_ref[:]
        atype = atype_ref[:]
        aact = aact_ref[:]
        hit_t = hitt_ref[:]
        hit_id = hitid_ref[:]
        stepc = step_ref[:]
        seekf = seekf_ref[:]
        rscore = rscore_ref[:]
        fscore = fscore_ref[:]

        # ---- agent rows --------------------------------------------------
        # Row-stacks (not slices): agent_lo % 8 != 0, so [lo:hi] slices
        # carry sublane-offset layouts that force Mosaic relayouts on
        # every downstream op; stacking single rows rebuilds offset-0
        # layouts once.
        def astack(arr2, k=None):
            if k is None:
                return jnp.stack([arr2[agent_lo + a] for a in range(n_a)])
            return jnp.stack([arr2[agent_lo + a, k] for a in range(n_a)])

        ap = tuple(astack(pos, k) for k in range(3))              # [A, L]
        aq = tuple(astack(quat, k) for k in range(4))
        zero_a = jnp.zeros((n_a, LANE))

        frozen = (atype < 0.5) & (stepc < float(NUM_PREP_STEPS - 1))
        can_act = (aact > 0.5) & ~frozen
        gate = can_act.astype(jnp.float32)

        # ---- movement (movementSystem / instantMovementSystem) -----------
        def acol(k):
            return jnp.stack([act5[a, k] for a in range(n_a)])    # [A, L]

        fx_l = f_per * (acol(0) - float(half))
        fy_l = f_per * (acol(1) - float(half))
        t_z = t_per * (acol(2) - float(half))
        fw_f = qrot_full(aq, (fx_l, fy_l, zero_a))
        f_a = tuple(c * gate for c in fw_f)                      # [A, L]
        tq_a = (zero_a, zero_a, t_z * gate)

        def body_rows(agent_vals):
            """[A, L] x3 -> [B, 3, L] with zeros on non-agent rows."""
            parts = []
            if agent_lo > 0:
                parts.append(jnp.zeros((agent_lo, 3, LANE)))
            parts.append(jnp.stack(agent_vals, axis=1))
            if n_body - agent_hi > 0:
                parts.append(jnp.zeros((n_body - agent_hi, 3, LANE)))
            return jnp.concatenate(parts, axis=0)

        ext_f = body_rows(f_a)
        ext_tq = body_rows(tq_a)

        # ---- action system (grab/lock) -----------------------------------
        eye = (ap[0], ap[1], ap[2] + 0.5)
        one_a = jnp.ones((n_a, LANE))
        fwd = qrot_full(aq, (zero_a, one_a, zero_a))

        want_lock = (acol(4) == 1.0) & can_act
        want_grab = (acol(3) == 1.0) & can_act
        is_obj = (hit_id >= float(box_lo)) & (hit_id < float(ramp_hi))
        tgt = jnp.where(is_obj, hit_id, 0.0)

        sels = [tgt == float(j) for j in range(n_body)]          # [A, L]
        t_locked = jnp.zeros((n_a, LANE), bool)
        t_owner = jnp.zeros((n_a, LANE))
        t_pos = [jnp.zeros((n_a, LANE)) for _ in range(3)]
        t_quat = [jnp.zeros((n_a, LANE)) for _ in range(4)]
        for j in range(n_body):
            s = sels[j]
            t_locked = t_locked | (s & (locked[j] > 0.5))
            t_owner = jnp.where(s, owner[j], t_owner)
            t_pos = [jnp.where(s, pos[j, k], o)
                     for k, o in enumerate(t_pos)]
            t_quat = [jnp.where(s, quat[j, k], o)
                      for k, o in enumerate(t_quat)]

        my_owner = jnp.where(atype > 0.5, float(OWNER_HIDER),
                             float(OWNER_SEEKER))
        do_unlock = (want_lock & is_obj & t_locked &
                     (t_owner == my_owner))
        do_lock = (want_lock & is_obj & ~t_locked &
                   (t_owner == float(OWNER_NONE)))

        def row_any(x):
            """[A, L] bool -> [L] via unrolled ors (layout-safe)."""
            acc = x[0]
            for a in range(1, n_a):
                acc = acc | x[a]
            return acc

        def row_max(x):
            acc = x[0]
            for a in range(1, n_a):
                acc = jnp.maximum(acc, x[a])
            return acc

        locked_rows, owner_rows = [], []
        for j in range(n_body):
            s = sels[j]
            lock_j = row_any(s & do_lock)                        # [L]
            unlock_j = row_any(s & do_unlock)
            team_j = row_max(jnp.where(s & do_lock, my_owner, 0.0))
            locked_rows.append(jnp.where(
                lock_j, 1.0, jnp.where(unlock_j, 0.0, locked[j])))
            owner_rows.append(jnp.where(
                lock_j, team_j,
                jnp.where(unlock_j, float(OWNER_NONE), owner[j])))
        locked2 = jnp.stack(locked_rows)                         # [B, L]
        owner2 = jnp.stack(owner_rows)

        has_grab = g_t >= 0.0
        release = want_grab & has_grab
        grabbable = is_obj & ~t_locked & (t_owner == float(OWNER_NONE))
        acquire = want_grab & ~has_grab & grabbable

        safe_t = jnp.where(is_obj, hit_t, 0.0)
        hit_pos = tuple(e + f * safe_t for e, f in zip(eye, fwd))
        rel = tuple(h - p for h, p in zip(hit_pos, t_pos))
        r2_new = qrot_full(tuple(t_quat), rel, inv=True)
        rel_q_new = _qnorm(_qmul(_qconj(tuple(t_quat)), aq))
        sep_new = safe_t - 1.25

        def gcol(arr3, k):
            return jnp.stack([arr3[a, k] for a in range(n_a)])    # [A, L]

        g_t2 = jnp.where(release, -1.0, jnp.where(acquire, tgt, g_t))
        g_r2_2 = tuple(
            jnp.where(acquire, n, gcol(g_r2, k))
            for k, n in enumerate(r2_new))
        g_q2 = tuple(
            jnp.where(acquire, n, gcol(g_q, k))
            for k, n in enumerate(rel_q_new))
        g_sep2 = jnp.where(acquire, sep_new, g_sep)

        # ---- effective masses + physics + sweep --------------------------
        dyn = (active[:] > 0.5) & (locked2 < 0.5)
        dyn_f = dyn.astype(jnp.float32)
        eff_invm = jnp.where(dyn, invm_raw, 0.0)
        eff_invI = jnp.where(dyn[:, None, :], invI_raw, 0.0)

        carry = core(pos, quat, vel, om, eff_invm, eff_invI, dyn_f,
                     active, he, mub, ext_f, ext_tq, wp, wh2, wa,
                     pp, pn, pa, g_t2,
                     jnp.stack(g_r2_2, axis=1),
                     jnp.stack(g_q2, axis=1), g_sep2)

        vis, lid, actt, actid, rew = sweep(
            carry, active, he, wp, wh2, wa, pp, pn, pa, atype, aact,
            nab, nar, nwb_ref)

        (px, py, pz, qw_, qx_, qy_, qz_, vx, vy, vz, ox, oy, oz) = carry

        # ---- zero agent velocities (agentZeroVelSystem) ------------------
        if cfg.zero_agent_velocity:
            def zero_agent_rows(full, repl):
                parts = []
                if agent_lo > 0:
                    parts.append(full[:agent_lo])
                parts.append(repl)
                if n_body - agent_hi > 0:
                    parts.append(full[agent_hi:])
                return jnp.concatenate(parts, axis=0)

            zb = jnp.zeros((n_a, LANE))
            vx = zero_agent_rows(vx, zb)
            vy = zero_agent_rows(vy, zb)
            vz = zero_agent_rows(
                vz, jnp.minimum(astack(vz), 0.0))
            ox = zero_agent_rows(ox, zb)
            oy = zero_agent_rows(oy, zb)
            oz = zero_agent_rows(oz, zb)

        pos_out[:] = jnp.stack((px, py, pz), axis=1)
        quat_out[:] = jnp.stack((qw_, qx_, qy_, qz_), axis=1)
        vel_out[:] = jnp.stack((vx, vy, vz), axis=1)
        om_out[:] = jnp.stack((ox, oy, oz), axis=1)
        vis_out[:] = vis
        lid_out[:] = lid

        # ---- rewards / dones (outputRewardsDonesSystem) ------------------
        team_r = jnp.where(rew > 0.5, -1.0, 1.0)                 # [L]
        sign = jnp.where(atype < 0.5, -1.0, 1.0)                 # [A, L]
        reward = sign * team_r[None, :]
        apx2 = astack(px)
        apy2 = astack(py)
        oob = (jnp.abs(apx2) >= OOB_LIMIT) | (jnp.abs(apy2) >= OOB_LIMIT)
        reward = reward - OOB_PENALTY * oob.astype(jnp.float32)
        in_prep = stepc < float(NUM_PREP_STEPS - 1)
        reward = jnp.where(in_prep, 0.0, reward) * aact
        done = ((stepc == float(cfg.episode_len - 1)) &
                jnp.ones((n_a, LANE), bool)).astype(jnp.float32)

        # ---- episode results (updateEpisodeResultsSystem) ----------------
        fresh = stepc == 0.0                                     # [1, L]
        scores = jnp.where(fresh, 0.0, rscore)                   # [2, L]
        finished = jnp.where(fresh, 0.0, fscore)
        hid_idx = jnp.where(seekf > 0.5, 1.0, 0.0)               # [1, L]
        winner = jnp.where(team_r[None, :] > 0.0, hid_idx,
                           1.0 - hid_idx)
        in_seek = stepc >= float(NUM_PREP_STEPS)
        inc0 = ((winner == 0.0) & in_seek).astype(jnp.float32)
        inc1 = ((winner == 1.0) & in_seek).astype(jnp.float32)
        scores2 = scores + jnp.concatenate([inc0, inc1], axis=0)
        at_end = stepc == float(cfg.episode_len - 1)
        s0 = scores2[0:1]
        s1 = scores2[1:2]
        f0 = jnp.where(s0 > s1, 1.0, jnp.where(s0 < s1, 0.0, 0.5))
        f1 = jnp.where(s0 > s1, 0.0, jnp.where(s0 < s1, 1.0, 0.5))
        finished2 = jnp.where(at_end, jnp.concatenate([f0, f1], axis=0),
                              finished)

        # ---- packed small outputs ----------------------------------------
        def put(name, rows_arr):
            lo, hi = misc_rows[name]
            misc_out[lo:hi] = rows_arr

        put("locked", locked2)
        put("owner", owner2)
        put("g_target", g_t2)
        put("g_sep", g_sep2)
        put("g_r2", jnp.concatenate(g_r2_2, axis=0))
        put("g_relq", jnp.concatenate(g_q2, axis=0))
        put("actt", actt)
        put("actid", actid.astype(jnp.float32))
        put("rewards", reward)
        put("dones", done)
        put("rew", rew[None, :])
        put("rscore", scores2)
        put("fscore", finished2)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _megastep_pallas(cfg: EnvConfig, interpret: bool, n_wall: int,
                     n_plane: int, *args):
    n_body = cfg.num_dyn_bodies
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    n_agents = agent_hi - agent_lo
    n_tgt = (MAX_AGENTS - 1) + cfg.max_boxes + cfg.max_ramps
    n_worlds = args[0].shape[-1]
    assert n_worlds % LANE == 0
    _, misc_r = _megastep_misc_layout(cfg)

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
        wspec(n_body),      # inv_mass (raw)
        wspec(n_body, 3),   # inv_inertia (raw)
        wspec(n_body),      # active
        wspec(n_body),      # locked
        wspec(n_body),      # owner
        wspec(n_body, 3),   # half_ext
        wspec(n_body),      # friction mu
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
        wspec(n_agents, 5),     # actions (f32)
        wspec(n_agents),        # carried act hit t
        wspec(n_agents),        # carried act hit id (f32)
        wspec(1),               # step counter (f32)
        wspec(1),               # seekers_first (f32)
        wspec(2),               # running scores (f32)
        wspec(2),               # finished scores
        pl.BlockSpec(memory_space=pltpu.SMEM),  # max active walls (i32 [1])
    ]
    out_specs = [
        wspec(n_body, 3), wspec(n_body, 4), wspec(n_body, 3),
        wspec(n_body, 3),
        wspec(n_agents, n_tgt),              # vis masks
        wspec(n_agents, NUM_LIDAR_SAMPLES),  # lidar
        wspec(misc_r),                       # packed small outputs
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 4, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_agents, n_tgt, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct(
            (n_agents, NUM_LIDAR_SAMPLES, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((misc_r, n_worlds), jnp.float32),
    ]
    return pl.pallas_call(
        _make_megastep_kernel(cfg, n_wall, n_plane),
        grid=(n_worlds // LANE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(*args)


def megastep_packed(cfg: EnvConfig, ps, actions, interpret: bool = False):
    """Whole-step megakernel on packed state.

    ps: packed EnvState; actions [A, 5, W] i32. Returns
    (ps2, SweepResults, rewards [A, W] f32, dones [A, W] i32,
    team_r [W] f32) — everything PackedEnv.step needs before the reset
    phase. ps2 has updated bodies/grab/locks/scores but NOT step/seed
    bookkeeping (caller handles resets + step advance).
    """
    from marl_hideandseek_tpu.env.env import SweepResults

    bodies, statics, grab = ps.bodies, ps.statics, ps.grab
    f32 = lambda x: x.astype(jnp.float32)
    args = (
        f32(bodies.pos), f32(bodies.quat), f32(bodies.vel),
        f32(bodies.omega),
        f32(bodies.inv_mass), f32(bodies.inv_inertia),
        f32(bodies.active), f32(bodies.locked), f32(bodies.owner),
        f32(bodies.half_ext), f32(bodies.friction_mu),
        f32(statics.wall_pos), f32(statics.wall_half_ext),
        f32(statics.wall_active),
        f32(statics.plane_point), f32(statics.plane_normal),
        f32(statics.plane_active),
        f32(grab.target), f32(grab.r2), f32(grab.rel_q), f32(grab.sep),
        f32(ps.agent_type), f32(ps.agent_active),
        f32(ps.num_active_boxes)[None], f32(ps.num_active_ramps)[None],
        f32(actions), f32(ps.act_hit_t), f32(ps.act_hit_id),
        f32(ps.step)[None], f32(ps.seekers_first)[None],
        f32(ps.running_scores), f32(ps.finished_scores),
        _wall_bound(statics.wall_active, axis=0),
    )
    (pos, quat, vel, omega, vis, lid, misc) = _megastep_pallas(
        cfg, interpret, statics.wall_pos.shape[0],
        statics.plane_point.shape[0], *args)

    rows, _ = _megastep_misc_layout(cfg)

    def take(name):
        lo, hi = rows[name]
        return misc[lo:hi]

    n_a = cfg.max_agents
    locked2 = take("locked") > 0.5
    owner2 = take("owner").astype(bodies.owner.dtype)
    g_t2 = take("g_target").astype(grab.target.dtype)
    g_sep2 = take("g_sep")
    g_r2_2 = jnp.stack(
        [take("g_r2")[k * n_a:(k + 1) * n_a] for k in range(3)], axis=1)
    g_q2 = jnp.stack(
        [take("g_relq")[k * n_a:(k + 1) * n_a] for k in range(4)], axis=1)
    actt = take("actt")
    actid = take("actid").astype(jnp.int32)
    rewards = take("rewards")
    dones = take("dones").astype(jnp.int32)
    rew = take("rew")[0]
    team_r = jnp.where(rew > 0.5, -1.0, 1.0)

    ps2 = ps.replace(
        bodies=bodies.replace(pos=pos, quat=quat, vel=vel, omega=omega,
                              locked=locked2, owner=owner2),
        grab=grab.replace(target=g_t2, r2=g_r2_2, rel_q=g_q2,
                          sep=g_sep2),
        hider_team_reward=team_r,
        running_scores=take("rscore").astype(ps.running_scores.dtype),
        finished_scores=take("fscore"),
    )
    sweep = SweepResults(vis_seen=vis, lidar=lid, act_t=actt,
                         act_id=actid, rew_seen=rew > 0.5)
    return ps2, sweep, rewards, dones, team_r
