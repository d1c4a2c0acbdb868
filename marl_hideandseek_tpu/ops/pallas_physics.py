"""Pallas TPU kernel for the XPBD substep loop.

The physics substeps are the #1 hotspot: the XLA version pays HBM round
trips for every [B, C] contact intermediate. This kernel runs the whole
4-substep loop per world-block entirely in VMEM: worlds ride the 128-wide
lane dimension, bodies/contacts ride sublanes, vectors are kept in
component form (x/y/z as separate [.., 128] arrays — no tiny trailing dims
to pad), and all cross-body routing is an unrolled compare-select loop over
the 17 body slots (no gathers/scatters).

Scope: the FULL physics step — once-per-step per-vertex manifold build +
integration + contact refresh/solve + grab joints + velocity
reconstruction + velocity-pass friction — exactly
`env/physics.py::physics_step`. The manifold build runs in-kernel (a
running compare-select over planes/walls/bodies per vertex), so contact
metadata never round-trips HBM. The jnp implementation remains the
reference semantics and the CPU fallback.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marl_hideandseek_tpu.config import EnvConfig
from marl_hideandseek_tpu.env import physics as jphys
from marl_hideandseek_tpu.types import body_slot_ranges

LANE = 128

# Kernel bisection probes (profiling only; all False in production;
# used by scripts/profile_kernel_split.py-style phase accounting).
_PROBE_IO_ONLY = False        # copy inputs->outputs, no compute
_PROBE_MANIFOLD_ONLY = False  # manifold build kept alive, no substeps
_PROBE_PRESELECT_ONLY = False  # candidate preselect only, no vertex sweep

_S13 = math.sqrt(13.0)
_WEDGE_FACES = (
    ((1.0, 0.0, 0.0), 1.0),
    ((-1.0, 0.0, 0.0), 1.0),
    ((0.0, 1.0, 0.0), 1.0),
    ((0.0, 0.0, -1.0), 1.0),
    ((0.0, -2.0 / _S13, 3.0 / _S13), 1.0 / _S13),
)

_GX, _GY, _GZ = 0.0, 0.0, -9.8


# ---- component-form vector/quaternion helpers -----------------------------


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _qrot(q, v, inv=False):
    """Rotate v by q (or by conj(q) when inv)."""
    w = q[0]
    u = (q[1], q[2], q[3])
    c = _cross(u, v)
    d = _cross(u, c)
    s = -2.0 if inv else 2.0
    return (v[0] + s * w * c[0] + 2.0 * d[0],
            v[1] + s * w * c[1] + 2.0 * d[1],
            v[2] + s * w * c[2] + 2.0 * d[2])


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _qconj(q):
    return (q[0], -q[1], -q[2], -q[3])


def _qnorm(q):
    inv = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] +
                        q[3] * q[3] + 1e-12)
    return (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv)


def _apply_invI(q, invI, v):
    """R diag(invI) R^T v; invI = (ix, iy, iz)."""
    b = _qrot(q, v, inv=True)
    b = (b[0] * invI[0], b[1] * invI[1], b[2] * invI[2])
    return _qrot(q, b)


def _sym_invI_mat(q, invI):
    """Symmetric world-frame inverse-inertia matrix M = R diag(invI) R^T
    as its 6 unique components (xx, yy, zz, xy, xz, yz).

    Building M once per (q, invI) set and applying it as a 9-fma matvec
    replaces the two quaternion rotations of _apply_invI (~45 VPU ops)
    per application — the substep loop applies inverse inertia ~11 times
    per contact set, so the amortized build pays for itself many times.
    Exactly the same linear map (float op order differs)."""
    w, x, y, z = q
    c0 = (1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y + w * z),
          2.0 * (x * z - w * y))
    c1 = (2.0 * (x * y - w * z), 1.0 - 2.0 * (x * x + z * z),
          2.0 * (y * z + w * x))
    c2 = (2.0 * (x * z + w * y), 2.0 * (y * z - w * x),
          1.0 - 2.0 * (x * x + y * y))
    ix, iy, iz = invI
    xx = ix * c0[0] * c0[0] + iy * c1[0] * c1[0] + iz * c2[0] * c2[0]
    yy = ix * c0[1] * c0[1] + iy * c1[1] * c1[1] + iz * c2[1] * c2[1]
    zz = ix * c0[2] * c0[2] + iy * c1[2] * c1[2] + iz * c2[2] * c2[2]
    xy = ix * c0[0] * c0[1] + iy * c1[0] * c1[1] + iz * c2[0] * c2[1]
    xz = ix * c0[0] * c0[2] + iy * c1[0] * c1[2] + iz * c2[0] * c2[2]
    yz = ix * c0[1] * c0[2] + iy * c1[1] * c1[2] + iz * c2[1] * c2[2]
    return (xx, yy, zz, xy, xz, yz)


def _sym_apply(M, v):
    """M v for the symmetric 6-component matrix of _sym_invI_mat."""
    xx, yy, zz, xy, xz, yz = M
    return (xx * v[0] + xy * v[1] + xz * v[2],
            xy * v[0] + yy * v[1] + yz * v[2],
            xz * v[0] + yz * v[1] + zz * v[2])


def _box_sdf_normal(rel, half):
    """Componentwise box SDF + outward normal."""
    qx = jnp.abs(rel[0]) - half[0]
    qy = jnp.abs(rel[1]) - half[1]
    qz = jnp.abs(rel[2]) - half[2]
    sdf = jnp.maximum(jnp.maximum(qx, qy), qz)
    is_x = (qx >= qy) & (qx >= qz)
    is_y = (~is_x) & (qy >= qz)
    is_z = ~(is_x | is_y)
    n = (jnp.sign(rel[0]) * is_x,
         jnp.sign(rel[1]) * is_y,
         jnp.sign(rel[2]) * is_z)
    return sdf, n


def _wedge_sdf_normal(p):
    """Max-halfspace SDF + blended face normal for the ramp wedge."""
    ds = []
    for (nx, ny, nz), off in _WEDGE_FACES:
        ds.append(nx * p[0] + ny * p[1] + nz * p[2] - off)
    sdf = ds[0]
    for d in ds[1:]:
        sdf = jnp.maximum(sdf, d)
    nx = jnp.zeros_like(sdf)
    ny = jnp.zeros_like(sdf)
    nz = jnp.zeros_like(sdf)
    for i, ((fx, fy, fz), off) in enumerate(_WEDGE_FACES):
        sel = ds[i] >= sdf
        nx = nx + fx * sel
        ny = ny + fy * sel
        nz = nz + fz * sel
    inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-12)
    return sdf, (nx * inv, ny * inv, nz * inv)


def make_physics_core(cfg: EnvConfig, n_wall: int, n_plane: int):
    """Build the in-VMEM physics body shared by the physics-only kernel and
    the fused/mega step kernels (ops/pallas_step.py): takes the 22 inputs
    as ARRAYS (callers read their refs; the megastep kernel passes
    in-kernel computed values), returns the final 13-tuple carry of
    [B, L] component arrays (px..pz, qw..qz, vx..vz, ox..oz)."""
    n_body = cfg.num_dyn_bodies
    n_c = jphys.N_CONTACTS
    _, (ramp_lo, ramp_hi), (agent_lo, agent_hi) = body_slot_ranges(cfg)
    n_agents = agent_hi - agent_lo
    h = cfg.dt / cfg.num_physics_substeps
    n_sub = cfg.num_physics_substeps
    margin = jphys.CONTACT_MARGIN

    def core(pos_ref, quat_ref, vel_ref, om_ref,
             invm_ref, invI_ref, dyn_ref, act_ref, he_ref, mub_ref,
             f_ref, tq_ref,
             wp_ref, wh2_ref, wa_ref, pp_ref, pn_ref, pa_ref,
             gt_ref, gr2_ref, gq_ref, gsep_ref):
        # ---- invariants -------------------------------------------------
        inv_m = invm_ref[:]                           # [B, L]
        invI = (invI_ref[:, 0], invI_ref[:, 1], invI_ref[:, 2])
        dyn = dyn_ref[:] > 0.5                        # [B, L]
        ext_f = (f_ref[:, 0], f_ref[:, 1], f_ref[:, 2])
        ext_t = (tq_ref[:, 0], tq_ref[:, 1], tq_ref[:, 2])

        # ---- in-kernel manifold build at the predicted pose -------------
        # One slot per body vertex; each vertex keeps its nearest surface
        # (running compare-select over planes, walls, bodies) — the build
        # never leaves VMEM. jnp reference: physics.py::build_manifold.
        act = act_ref[:] > 0.5                        # [B, L]
        half = (he_ref[:, 0], he_ref[:, 1], he_ref[:, 2])
        mu_b = mub_ref[:]
        pos0 = (pos_ref[:, 0], pos_ref[:, 1], pos_ref[:, 2])
        quat0 = (quat_ref[:, 0], quat_ref[:, 1], quat_ref[:, 2],
                 quat_ref[:, 3])
        vel0 = (vel_ref[:, 0], vel_ref[:, 1], vel_ref[:, 2])

        row = jax.lax.broadcasted_iota(jnp.int32, (n_body, LANE), 0)
        ramp_row = (row >= ramp_lo) & (row < ramp_hi)

        dyn_f = dyn.astype(jnp.float32)
        pp = tuple(p + cfg.dt * v * dyn_f for p, v in zip(pos0, vel0))

        mu_stat = jnp.maximum(mu_b, 2.0)
        # Box corner v encodes sign bits (v//4, v//2, v//1) % 2; the wedge
        # vertex set matches physics.py::_WEDGE_VERTS (slots 6-7 are the
        # sloped-edge midpoints).
        wedge = [(1., 1., 1.), (1., 1., -1.), (1., -2., -1.), (-1., 1., 1.),
                 (-1., 1., -1.), (-1., -2., -1.), (1., -0.5, 0.),
                 (-1., -0.5, 0.)]

        # ---- per-body candidate preselection ------------------------------
        # Centre-distance lower bounds pick each body's K nearest walls and
        # neighbor bodies ONCE; the per-vertex sweep below then runs over
        # planes + K + K instead of planes + all walls + all bodies
        # (semantics mirrored in env/physics.py::build_manifold).
        r_bound = jnp.where(
            ramp_row, jphys._WEDGE_RADIUS,
            jnp.sqrt(half[0] * half[0] + half[1] * half[1] +
                     half[2] * half[2]))

        def select_top(lbs, params, k):
            """k smallest lower bounds in (lb, index) lexicographic order
            (matches jax.lax.top_k tie-breaking in the jnp path). Returns
            [(lb_s, fields_s)] with fields routed from the winner."""
            out = []
            prev_lb = jnp.full((n_body, LANE), -1e30)
            prev_i = jnp.full((n_body, LANE), -1.0)
            n_fields = len(params[0])
            for _ in range(k):
                best = jnp.full((n_body, LANE), 1e9)
                best_i = jnp.full((n_body, LANE), -1.0)
                fields = [jnp.zeros((n_body, LANE)) for _ in range(n_fields)]
                for i, (lb, ps) in enumerate(zip(lbs, params)):
                    fi = float(i)
                    after_prev = (lb > prev_lb) | ((lb == prev_lb) &
                                                   (fi > prev_i))
                    win = after_prev & (lb < best)
                    best = jnp.where(win, lb, best)
                    best_i = jnp.where(win, fi, best_i)
                    fields = [jnp.where(win, p, f)
                              for p, f in zip(ps, fields)]
                out.append((best, fields))
                prev_lb, prev_i = best, best_i
            return out

        wall_lbs, wall_params = [], []
        for i in range(n_wall):
            wc = (wp_ref[i, 0], wp_ref[i, 1], wp_ref[i, 2])
            wh = (wh2_ref[i, 0], wh2_ref[i, 1], wh2_ref[i, 2])
            sdf_c, _ = _box_sdf_normal(_sub(pp, wc), wh)
            wall_lbs.append(
                jnp.where(wa_ref[i] > 0.5, sdf_c - r_bound, 1e9))
            wall_params.append(wc + wh)
        wall_sel = select_top(wall_lbs, wall_params, jphys.K_WALL)

        k_pair = min(jphys.K_PAIR, n_body - 1)
        pair_lbs, pair_params = [], []
        for j in range(n_body):
            pj = (pp[0][j], pp[1][j], pp[2][j])
            dv = _sub(pp, pj)
            dist = jnp.sqrt(_dot(dv, dv) + 1e-18) - r_bound - r_bound[j]
            ok = (act_ref[j] > 0.5) & (row != j)
            pair_lbs.append(jnp.where(ok, dist, 1e9))
            pair_params.append((
                float(j),
                pj[0], pj[1], pj[2],
                quat_ref[j, 0], quat_ref[j, 1], quat_ref[j, 2],
                quat_ref[j, 3],
                he_ref[j, 0], he_ref[j, 1], he_ref[j, 2],
                float(ramp_lo <= j < ramp_hi),
                mub_ref[j],
            ))
        pair_sel = select_top(pair_lbs, pair_params, k_pair)

        # Per-slot metadata, field-shared to minimize live VMEM: `aux` is
        # the plane normal (plane kind) or the wall half extents (wall
        # kind); `fpt` is the plane point / wall centre / neighbor half
        # extents (pair kind). Unused combinations are never read (the
        # solve selects by kind).
        #
        # The sweep is vectorized over the vertex axis: all C=8 vertices
        # ride the sublane dimension ([B, C, L] arrays are exact (8, 128)
        # vreg tiles), instead of 8 separate [B, L] passes with 17->24
        # sublane padding each.
        shape3 = (n_body, n_c, LANE)
        vv = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
        sgn = [jnp.where((vv // d) % 2 == 1, 1.0, -1.0) for d in (4, 2, 1)]
        wvert = [jnp.zeros(shape3) for _ in range(3)]
        for v, cs in enumerate(wedge):
            m = vv == v
            wvert = [jnp.where(m, c, w) for c, w in zip(cs, wvert)]

        def bc(field):
            """[B, L] per-body field -> broadcastable [B, 1, L]."""
            return field[:, None, :]

        ramp3 = bc(ramp_row)
        vloc = tuple(
            jnp.where(ramp3, w, s * bc(h))
            for w, s, h in zip(wvert, sgn, half))
        # Inset samples for wall/pair SDFs (physics.py::VERT_INSET —
        # breaks the aligned-stack boundary degeneracy).
        vloc_in = tuple(v - jphys.VERT_INSET * jnp.sign(v) for v in vloc)

        pp_b = tuple(bc(c) for c in pp)
        quat0_b = tuple(bc(c) for c in quat0)
        p = _add(pp_b, _qrot(quat0_b, vloc))            # [B, C, L] x3
        p_in0 = _add(pp_b, _qrot(quat0_b, vloc_in))

        best = jnp.full(shape3, 1e9)
        zero3 = jnp.zeros(shape3)
        b_kind = zero3
        b_aux = [zero3, zero3, zero3]
        b_fpt = [zero3, zero3, zero3]
        b_nbi = zero3 - 1.0
        b_nbr = zero3
        b_mu = zero3

        def merge(win, sdf, kind, aux, fpt, mu, nbi=None, nbr=None):
            nonlocal best, b_kind, b_aux, b_fpt, b_nbi, b_nbr, b_mu
            best = jnp.where(win, sdf, best)
            b_kind = jnp.where(win, kind, b_kind)
            b_aux = [jnp.where(win, c, o) for c, o in zip(aux, b_aux)]
            b_fpt = [jnp.where(win, c, o) for c, o in zip(fpt, b_fpt)]
            if nbi is not None:
                b_nbi = jnp.where(win, nbi, b_nbi)
                b_nbr = jnp.where(win, nbr, b_nbr)
            b_mu = jnp.where(win, mu, b_mu)

        for i in range(n_plane):
            nrm = (pn_ref[i, 0], pn_ref[i, 1], pn_ref[i, 2])
            pt = (pp_ref[i, 0], pp_ref[i, 1], pp_ref[i, 2])
            d = _dot(_sub(p, pt), nrm)
            win = (d < best) & (pa_ref[i] > 0.5)
            merge(win, d, float(jphys.KIND_PLANE), aux=nrm, fpt=pt,
                  mu=bc(mu_stat))
        for lb_s, fields in wall_sel:
            wc = tuple(bc(c) for c in fields[0:3])
            wh = tuple(bc(c) for c in fields[3:6])
            sdf, _ = _box_sdf_normal(_sub(p_in0, wc), wh)
            win = (sdf < best) & bc(lb_s < 1e8)
            merge(win, sdf, float(jphys.KIND_WALL), aux=wh, fpt=wc,
                  mu=bc(mu_stat))
        for lb_s, fields in pair_sel:
            jx = bc(fields[0])
            pj = tuple(bc(c) for c in fields[1:4])
            qj = tuple(bc(c) for c in fields[4:8])
            hj = tuple(bc(c) for c in fields[8:11])
            rp_s, mu_s = bc(fields[11]), bc(fields[12])
            p_l = _qrot(qj, _sub(p_in0, pj), inv=True)
            sdf_b, _ = _box_sdf_normal(p_l, hj)
            sdf_w, _ = _wedge_sdf_normal(p_l)
            sdf = jnp.where(rp_s > 0.5, sdf_w, sdf_b)
            win = (sdf < best) & bc(lb_s < 1e8)
            merge(win, sdf, float(jphys.KIND_PAIR), aux=(zero3,) * 3,
                  fpt=hj, mu=jnp.maximum(bc(mu_b), mu_s),
                  nbi=jx, nbr=rp_s)

        v_ok = (best < margin) & bc(act)
        kind = jnp.where(v_ok, b_kind, 0.0)
        is_plane = kind == float(jphys.KIND_PLANE)
        is_wall = kind == float(jphys.KIND_WALL)
        is_pair = kind == float(jphys.KIND_PAIR)
        valid = kind > 0.5
        aux = tuple(b_aux)
        fptm = tuple(b_fpt)
        fn = aux                              # plane normal (plane kind)
        whalf = tuple(jnp.maximum(c, 1e-3) for c in aux)   # wall kind
        fpt = fptm
        nb_half = tuple(jnp.maximum(c, 1e-3) for c in fptm)  # pair kind
        nb_idx = b_nbi
        nb_ramp = b_nbr > 0.5
        mu = b_mu

        # Neighbor routing masks, computed ONCE per step (nb_idx is fixed
        # for the whole substep loop): sel[j] = 1.0 where contact routes
        # to body j. route/scatter then become fmas instead of
        # compare+selects. (A candidate-factored two-stage route was
        # measured SLOWER on v5e-lite: Mosaic's [1,1,L] lane-broadcast
        # fma is near-free while [B,L]->[B,C,L] sublane broadcasts pay
        # relayouts — the direct one-hot form is the fast one.)
        nb_sel = [
            (nb_idx == float(j)).astype(jnp.float32)   # [B, C, L]
            for j in range(n_body)
        ]

        def route(field_rows):
            """[B, L] rows -> per-contact [B, C, L] via the route masks."""
            acc = nb_sel[0] * field_rows[0][None, None, :]
            for j in range(1, n_body):
                acc = acc + nb_sel[j] * field_rows[j][None, None, :]
            return acc

        nb_w = route(inv_m) * is_pair
        nb_invI = tuple(route(c) * is_pair for c in invI)

        g_t = gt_ref[:]                               # [A, L] f32 idx
        g_has = g_t >= 0.0
        g_r2 = (gr2_ref[:, 0], gr2_ref[:, 1], gr2_ref[:, 2])
        g_q = (gq_ref[:, 0], gq_ref[:, 1], gq_ref[:, 2], gq_ref[:, 3])
        g_sep = gsep_ref[:]

        def g_route(field_rows):
            """[B, L] rows -> per-agent [A, L] via grab target compare."""
            acc = jnp.zeros((n_agents, LANE))
            for j in range(n_body):
                acc = jnp.where(g_t == float(j),
                                field_rows[j][None, :], acc)
            return acc

        gt_w = jnp.where(g_has, g_route(inv_m), 0.0)
        gt_invI = tuple(jnp.where(g_has, g_route(c), 0.0) for c in invI)

        def substep(_, carry):
            (px, py, pz, qw, qx, qy, qz, vx, vy, vz, ox, oy, oz) = carry
            pos = (px, py, pz)
            quat = (qw, qx, qy, qz)

            # ---- integrate ---------------------------------------------
            has_m = inv_m > 0.0
            vx1 = vx + h * (_GX * has_m + ext_f[0] * inv_m)
            vy1 = vy + h * (_GY * has_m + ext_f[1] * inv_m)
            vz1 = vz + h * (_GZ * has_m + ext_f[2] * inv_m)
            aa = _apply_invI(quat, invI, ext_t)
            ox1, oy1, oz1 = ox + h * aa[0], oy + h * aa[1], oz + h * aa[2]

            px1, py1, pz1 = px + h * vx1, py + h * vy1, pz + h * vz1
            # quat integration: q += 0.5 h (omega quat) * q
            dq = _qmul((jnp.zeros_like(ox1), ox1, oy1, oz1),
                       (qw, qx, qy, qz))
            q1 = _qnorm((qw + 0.5 * h * dq[0], qx + 0.5 * h * dq[1],
                         qy + 0.5 * h * dq[2], qz + 0.5 * h * dq[3]))

            pos_i = (px1, py1, pz1)
            quat_i = q1
            qa = tuple(c[:, None, :] for c in quat_i)   # [B, 1, L]
            pa = tuple(c[:, None, :] for c in pos_i)

            # ---- refresh contacts --------------------------------------
            p_ex = _add(pa, _qrot(qa, vloc))            # [B, C, L]
            p_in = _add(pa, _qrot(qa, vloc_in))

            nb_pos = tuple(route(c) for c in pos_i)
            nb_quat_r = tuple(route(c) for c in quat_i)
            nb_quat = (jnp.where(is_pair, nb_quat_r[0], 1.0),
                       jnp.where(is_pair, nb_quat_r[1], 0.0),
                       jnp.where(is_pair, nb_quat_r[2], 0.0),
                       jnp.where(is_pair, nb_quat_r[3], 0.0))
            nb_pos = tuple(jnp.where(is_pair, c, 1e6) for c in nb_pos)

            d_plane = _dot(_sub(p_ex, fpt), fn)
            sdf_w, n_w = _box_sdf_normal(_sub(p_in, fpt), whalf)
            p_l = _qrot(nb_quat, _sub(p_in, nb_pos), inv=True)
            sdf_box, n_box = _box_sdf_normal(p_l, nb_half)
            sdf_wed, n_wed = _wedge_sdf_normal(p_l)
            sdf_p = jnp.where(nb_ramp, sdf_wed, sdf_box)
            n_l = tuple(jnp.where(nb_ramp, a, b)
                        for a, b in zip(n_wed, n_box))
            n_p = _qrot(nb_quat, n_l)

            depth = jnp.where(is_plane, -d_plane,
                              jnp.where(is_wall, -sdf_w, -sdf_p))
            n = tuple(
                jnp.where(is_plane, a, jnp.where(is_wall, b, c))
                for a, b, c in zip(fn, n_w, n_p))
            # Per-kind contact point (plane: exact vertex; wall/pair:
            # the inset sample) — used for all lever arms below.
            p = tuple(jnp.where(is_plane, a, b)
                      for a, b in zip(p_ex, p_in))
            mask = valid & (kind > 0.5) & (depth > 0.0)

            # ---- position solve ----------------------------------------
            r_a = _sub(p, pa)
            r_b = _sub(p, nb_pos)
            rxn_a = _cross(r_a, n)
            rxn_b = _cross(r_b, n)
            iIa = tuple(c[:, None, :] for c in invI)
            # Amortized inverse-inertia matrices (see _sym_invI_mat):
            # own body at the predicted pose, neighbor at its routed pose.
            Ma_i = _sym_invI_mat(qa, iIa)
            Mb = _sym_invI_mat(nb_quat, nb_invI)
            w_ang_a = _dot(rxn_a, _sym_apply(Ma_i, rxn_a))
            w_ang_b = _dot(rxn_b, _sym_apply(Mb, rxn_b))
            w_sum = inv_m[:, None, :] + w_ang_a + nb_w + w_ang_b
            lam = jnp.where(mask & (w_sum > 1e-9),
                            depth / jnp.maximum(w_sum, 1e-9), 0.0)
            imp = _scale(n, lam)

            def scatter(vals):
                """Sum per-contact [B, C, L] into [B, L] rows by nb_idx."""
                rows = []
                for j in range(n_body):
                    rows.append(jnp.sum(vals * nb_sel[j], axis=(0, 1)))
                return jnp.stack(rows, axis=0)

            def accumulate(impulse):
                """Per-contact impulses -> per-body (dpos, drot) rows."""
                d_a = tuple(jnp.sum(c, axis=1) * inv_m for c in impulse)
                ang_a = _sym_apply(Ma_i, _cross(r_a, impulse))
                r_acc = tuple(jnp.sum(c, axis=1) for c in ang_a)
                i_b = _scale(impulse, -nb_w)
                a_b = _sym_apply(Mb,
                                 _cross(r_b, _scale(impulse, -1.0)))
                return (tuple(x + scatter(y) for x, y in zip(d_a, i_b)),
                        tuple(x + scatter(y) for x, y in zip(r_acc, a_b)))

            # ---- positional static friction (physics.py::_contact_solve:
            # cancel tangential contact drift inside the static cone;
            # unnormalized; stationary-neighbor drift; a-side-only w_t).
            v_eval = tuple(jnp.where(is_plane, a, b)
                           for a, b in zip(vloc, vloc_in))
            pa_pv = tuple(c[:, None, :] for c in (px, py, pz))
            qa_pv = tuple(c[:, None, :] for c in (qw, qx, qy, qz))
            p_prev_a = _add(pa_pv, _qrot(qa_pv, v_eval))
            dp_f = _sub(p, p_prev_a)
            dpn = _dot(dp_f, n)
            dpt = _sub(dp_f, _scale(n, dpn))
            dpt_len = jnp.sqrt(_dot(dpt, dpt) + 1e-18)
            t_dir = _scale(dpt, 1.0 / jnp.maximum(dpt_len, 1e-9))
            rxt_a = _cross(r_a, t_dir)
            w_t = (inv_m[:, None, :] + nb_w +
                   _dot(rxt_a, _sym_apply(Ma_i, rxt_a)))
            lam_t = dpt_len / jnp.maximum(w_t, 1e-9)
            mu_s_c = jnp.where(is_pair, jphys.MU_S_BODY, jphys.MU_S_STATIC)
            # Coulomb clamp, not a cone gate (see env/physics.py).
            static_ok = mask & (lam > 0.0) & (w_t > 1e-9)
            lam_tc = jnp.minimum(lam_t, mu_s_c * lam)
            imp_t = _scale(t_dir, -jnp.where(static_ok, lam_tc, 0.0))
            # Owning-body-only application (physics.py rationale).
            dpos_t = tuple(jnp.sum(c, axis=1) * inv_m for c in imp_t)
            ang_t = _sym_apply(Ma_i, _cross(r_a, imp_t))
            drot_t = tuple(jnp.sum(c, axis=1) for c in ang_t)

            m_f = mask.astype(jnp.float32)
            cnt_a = jnp.sum(m_f, axis=1)               # [B, L]
            dpos, drot = accumulate(imp)
            cnt = cnt_a + scatter(m_f)

            norm = 1.0 / jnp.maximum(cnt, 1.0)
            pos_c = (px1 + dpos[0] * norm + dpos_t[0],
                     py1 + dpos[1] * norm + dpos_t[1],
                     pz1 + dpos[2] * norm + dpos_t[2])
            rv = (drot[0] * norm + drot_t[0], drot[1] * norm + drot_t[1],
                  drot[2] * norm + drot_t[2])
            dq2 = _qmul((jnp.zeros_like(rv[0]),) + rv, quat_i)
            quat_c = _qnorm((quat_i[0] + 0.5 * dq2[0],
                             quat_i[1] + 0.5 * dq2[1],
                             quat_i[2] + 0.5 * dq2[2],
                             quat_i[3] + 0.5 * dq2[3]))

            # ---- grab joints -------------------------------------------
            def agent_rows(full):
                return full[agent_lo:agent_hi]

            ga_pos = tuple(agent_rows(c) for c in pos_c)
            ga_q = tuple(agent_rows(c) for c in quat_c)
            gt_pos_r = tuple(g_route(c) for c in pos_c)
            gt_q_r = tuple(g_route(c) for c in quat_c)
            gt_q = (jnp.where(g_has, gt_q_r[0], 1.0),
                    jnp.where(g_has, gt_q_r[1], 0.0),
                    jnp.where(g_has, gt_q_r[2], 0.0),
                    jnp.where(g_has, gt_q_r[3], 0.0))
            gt_pos = tuple(jnp.where(g_has, c, 0.0) for c in gt_pos_r)

            r1 = (jnp.zeros_like(g_sep), 1.25 + g_sep,
                  jnp.full_like(g_sep, 0.5))
            p_a = _add(ga_pos, _qrot(ga_q, r1))
            p_t = _add(gt_pos, _qrot(gt_q, g_r2))
            delta = _sub(p_t, p_a)
            c_len = jnp.sqrt(_dot(delta, delta) + 1e-18)
            nrm = _scale(delta, 1.0 / jnp.maximum(c_len, 1e-9))

            ra = _sub(p_a, ga_pos)
            rt = _sub(p_t, gt_pos)
            a_invm = agent_rows(inv_m)
            a_invI = tuple(agent_rows(c) for c in invI)
            rxn1 = _cross(ra, nrm)
            rxn2 = _cross(rt, nrm)
            M_ga = _sym_invI_mat(ga_q, a_invI)
            M_gt = _sym_invI_mat(gt_q, gt_invI)
            gw_a = a_invm + _dot(rxn1, _sym_apply(M_ga, rxn1))
            gw_t = gt_w + _dot(rxn2, _sym_apply(M_gt, rxn2))
            gw = gw_a + gw_t
            g_lam = jnp.where(g_has & (gw > 1e-9),
                              c_len / jnp.maximum(gw, 1e-9), 0.0)
            g_imp = _scale(nrm, g_lam)

            gdp_a = _scale(g_imp, a_invm)
            gdp_t = _scale(g_imp, -gt_w)
            gdr_a = _sym_apply(M_ga, _cross(ra, g_imp))
            gdr_t = _sym_apply(M_gt, _cross(rt, _scale(g_imp, -1.0)))

            # Angular part: drive rel rotation to stored g_q.
            rel_now = _qmul(_qconj(gt_q), ga_q)
            err = _qmul(rel_now, _qconj(g_q))
            sgn = jnp.sign(err[0])
            th_l = (2.0 * err[1] * sgn, 2.0 * err[2] * sgn,
                    2.0 * err[3] * sgn)
            th = _qrot(gt_q, th_l)
            aw_a = _dot(_sym_apply(M_ga, th), th)
            aw_t = _dot(_sym_apply(M_gt, th), th)
            tn2 = _dot(th, th)
            dn = aw_a + aw_t
            sc = jnp.where(g_has & (dn > 1e-9) & (tn2 > 1e-12),
                           tn2 / jnp.maximum(dn, 1e-9), 0.0)
            gdr_a = _sub(gdr_a, _scale(_sym_apply(M_ga, th), sc))
            gdr_t = _add(gdr_t, _scale(_sym_apply(M_gt, th), sc))

            def g_scatter(vals):
                """[A, L] per-agent target contributions -> [B, L] rows.

                The sublane reduction is unrolled into row adds: Mosaic
                rejects vector.multi_reduction over float ADD when the
                input layout has nonzero sublane offsets, which the
                agent-row slices (agent_lo % 8 != 0) produce in the
                megastep kernel."""
                rows = []
                for j in range(n_body):
                    sel = (g_t == float(j)).astype(jnp.float32)
                    prod = vals * sel
                    acc = prod[0]
                    for a in range(1, n_agents):
                        acc = acc + prod[a]
                    rows.append(acc)
                return jnp.stack(rows, axis=0)

            def add_agent_rows(full, agent_vals):
                parts = []
                if agent_lo > 0:
                    parts.append(jnp.zeros((agent_lo, LANE)))
                parts.append(agent_vals)
                if n_body - agent_hi > 0:
                    parts.append(jnp.zeros((n_body - agent_hi, LANE)))
                return full + jnp.concatenate(parts, axis=0)

            pos_c = tuple(
                add_agent_rows(c + g_scatter(t), a)
                for c, t, a in zip(pos_c, gdp_t, gdp_a))
            rvj = tuple(g_scatter(t) for t in gdr_t)
            rvj = tuple(
                add_agent_rows(r, a) for r, a in zip(rvj, gdr_a))
            dq3 = _qmul((jnp.zeros_like(rvj[0]),) + rvj, quat_c)
            quat_c = _qnorm((quat_c[0] + 0.5 * dq3[0],
                             quat_c[1] + 0.5 * dq3[1],
                             quat_c[2] + 0.5 * dq3[2],
                             quat_c[3] + 0.5 * dq3[3]))

            # ---- velocities from positions -----------------------------
            vx2 = (pos_c[0] - px) / h
            vy2 = (pos_c[1] - py) / h
            vz2 = (pos_c[2] - pz) / h
            dq4 = _qmul(quat_c, _qconj((qw, qx, qy, qz)))
            s4 = jnp.sign(dq4[0])
            ox2 = 2.0 / h * dq4[1] * s4
            oy2 = 2.0 / h * dq4[2] * s4
            oz2 = 2.0 / h * dq4[3] * s4

            # ---- velocity-pass friction --------------------------------
            vel2 = (vx2, vy2, vz2)
            om2 = (ox2, oy2, oz2)
            qa_c = tuple(c[:, None, :] for c in quat_c)
            pa_c = tuple(c[:, None, :] for c in pos_c)
            vel_b = tuple(c[:, None, :] for c in vel2)
            om_b = tuple(c[:, None, :] for c in om2)

            nb_vel = tuple(route(c) for c in vel2)
            nb_om = tuple(route(c) for c in om2)

            r_a2 = _sub(p, pa_c)
            r_b2 = _sub(p, nb_pos)
            v_a = _add(vel_b, _cross(om_b, r_a2))
            v_b = _add(nb_vel, _cross(nb_om, r_b2))
            v_rel = _sub(v_a, v_b)
            vn = _dot(v_rel, n)
            v_t = _sub(v_rel, _scale(n, vn))
            vt_len = jnp.sqrt(_dot(v_t, v_t) + 1e-18)
            t_dir = _scale(v_t, 1.0 / jnp.maximum(vt_len, 1e-9))

            rxt_a = _cross(r_a2, t_dir)
            rxt_b = _cross(r_b2, t_dir)
            Ma_c = _sym_invI_mat(qa_c, iIa)
            fw = (inv_m[:, None, :] + nb_w +
                  _dot(rxt_a, _sym_apply(Ma_c, rxt_a)) +
                  _dot(rxt_b, _sym_apply(Mb, rxt_b)))
            fw = jnp.maximum(fw, 1e-9)
            f_active = mask & (lam > 0.0)
            jimp = jnp.minimum(vt_len / fw, mu * lam / h)
            jimp = jnp.where(f_active, jimp, 0.0)
            fimp = _scale(t_dir, -jimp)

            fa = f_active.astype(jnp.float32)
            fcnt_a = jnp.sum(fa, axis=1)
            dvel_a = tuple(jnp.sum(c, axis=1) * inv_m for c in fimp)
            fang_a = _sym_apply(Ma_c, _cross(r_a2, fimp))
            dom_a = tuple(jnp.sum(c, axis=1) for c in fang_a)
            fimp_b = _scale(fimp, -nb_w)
            fang_b = _sym_apply(Mb,
                                _cross(r_b2, _scale(fimp, -1.0)))
            dvel = tuple(a + scatter(b) for a, b in zip(dvel_a, fimp_b))
            dom = tuple(a + scatter(b) for a, b in zip(dom_a, fang_b))
            fcnt = fcnt_a + scatter(fa)
            fnorm = 1.0 / jnp.maximum(fcnt, 1.0)

            vx3 = vx2 + dvel[0] * fnorm
            vy3 = vy2 + dvel[1] * fnorm
            vz3 = vz2 + dvel[2] * fnorm
            ox3 = ox2 + dom[0] * fnorm
            oy3 = oy2 + dom[1] * fnorm
            oz3 = oz2 + dom[2] * fnorm

            # ---- velocity pass: restitution ----------------------------
            # e = 0 cancels the artificial position-solve bounce on fast
            # impacts (physics.py::_contact_restitution). Reuses the
            # friction pass's vn (pre-friction normal velocity) and the
            # position solve's w_sum; owning-body-only application.
            # Owning body vs stationary neighbor (physics.py vn_pre).
            v_pre_b = tuple(c[:, None, :] for c in (vx1, vy1, vz1))
            o_pre_b = tuple(c[:, None, :] for c in (ox1, oy1, oz1))
            v_pre_a = _add(v_pre_b, _cross(o_pre_b, _sub(p, pa)))
            vn_pre = _dot(v_pre_a, n)

            need_r = (mask & (lam > 0.0) &
                      (vn_pre < -2.0 * 9.8 * h) & (w_sum > 1e-9))
            e_rest = cfg.restitution
            jr = jnp.where(need_r,
                           (-e_rest * vn_pre - vn) /
                           jnp.maximum(w_sum, 1e-9), 0.0)
            rimp = _scale(n, jr)
            dvr = tuple(jnp.sum(c, axis=1) * inv_m for c in rimp)
            rang_a = _sym_apply(Ma_c, _cross(r_a2, rimp))
            domr = tuple(jnp.sum(c, axis=1) for c in rang_a)
            vx3 = vx3 + dvr[0]
            vy3 = vy3 + dvr[1]
            vz3 = vz3 + dvr[2]
            ox3 = ox3 + domr[0]
            oy3 = oy3 + domr[1]
            oz3 = oz3 + domr[2]

            # ---- freeze static/locked bodies ---------------------------
            out_p = tuple(jnp.where(dyn, c, o)
                          for c, o in zip(pos_c, (px, py, pz)))
            out_q = tuple(jnp.where(dyn, c, o)
                          for c, o in zip(quat_c, (qw, qx, qy, qz)))
            out_v = tuple(jnp.where(dyn, c, 0.0) for c in (vx3, vy3, vz3))
            out_o = tuple(jnp.where(dyn, c, 0.0) for c in (ox3, oy3, oz3))
            return out_p + out_q + out_v + out_o

        carry = (pos_ref[:, 0], pos_ref[:, 1], pos_ref[:, 2],
                 quat_ref[:, 0], quat_ref[:, 1], quat_ref[:, 2],
                 quat_ref[:, 3],
                 vel_ref[:, 0], vel_ref[:, 1], vel_ref[:, 2],
                 om_ref[:, 0], om_ref[:, 1], om_ref[:, 2])
        if _PROBE_IO_ONLY:
            return carry
        if _PROBE_PRESELECT_ONLY:
            live = sum(s[0] for s in wall_sel) + sum(s[0] for s in pair_sel)
            return (carry[0] + 1e-30 * live,) + carry[1:]
        if _PROBE_MANIFOLD_ONLY:
            live3 = (best + b_kind + b_mu + b_nbi + b_nbr +
                     sum(b_aux) + sum(b_fpt) + nb_w + sum(nb_invI))
            live = jnp.sum(live3, axis=1) + \
                jnp.sum(gt_w, axis=0)[None, :]
            return (carry[0] + 1e-30 * live,) + carry[1:]
        return jax.lax.fori_loop(0, n_sub, substep, carry)

    return core


def _make_kernel(cfg: EnvConfig, n_wall: int, n_plane: int):
    core = make_physics_core(cfg, n_wall, n_plane)

    def kernel(*args):
        ins, outs = args[:22], args[22:]
        carry = core(*ins)
        pos_out, quat_out, vel_out, om_out = outs
        pos_out[:] = jnp.stack(carry[0:3], axis=1)
        quat_out[:] = jnp.stack(carry[3:7], axis=1)
        vel_out[:] = jnp.stack(carry[7:10], axis=1)
        om_out[:] = jnp.stack(carry[10:13], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _physics_pallas(cfg: EnvConfig, interpret: bool, n_wall: int,
                    n_plane: int, *args):
    n_body = cfg.num_dyn_bodies
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    n_agents = agent_hi - agent_lo
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
    ]
    out_specs = [wspec(n_body, 3), wspec(n_body, 4), wspec(n_body, 3),
                 wspec(n_body, 3)]
    out_shape = [
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 4, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
        jax.ShapeDtypeStruct((n_body, 3, n_worlds), jnp.float32),
    ]
    return pl.pallas_call(
        _make_kernel(cfg, n_wall, n_plane),
        grid=(n_worlds // LANE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # The in-kernel manifold build keeps ~10 metadata planes per vertex
        # live; the default 16MB scoped-vmem cap is shy of that at B=17,
        # and v5e/v5p have much more physical VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(*args)


def physics_step_batch(cfg: EnvConfig, bodies, statics, grab,
                       ext_force, ext_torque, use_pallas: bool = True,
                       interpret: bool = False):
    """Batched physics step for all worlds.

    bodies/statics/grab: leading worlds axis; ext_force/ext_torque
    [W, B, 3]. Uses the Pallas kernel on TPU (W % 128 == 0); otherwise the
    vmapped jnp reference implementation. `interpret=True` forces the
    kernel through the Pallas interpreter on any backend (testing only).
    """
    n_worlds = bodies.pos.shape[0]
    on_tpu = jax.devices()[0].platform == "tpu"
    if not ((use_pallas and on_tpu and n_worlds % LANE == 0) or
            (interpret and n_worlds % LANE == 0)):
        return jax.vmap(
            lambda b, s, g, f, t: jphys.physics_step(cfg, b, s, g, f, t)
        )(bodies, statics, grab, ext_force, ext_torque)

    # Everything — including the manifold build — runs in the kernel; XLA
    # only lays the state out worlds-minor (cheap [W, B, k] transposes).
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
        wmin(ext_force),   # [W,B,3] -> [B,3,W]
        wmin(ext_torque),
        wmin(statics.wall_pos), wmin(statics.wall_half_ext),
        wmin(statics.wall_active.astype(jnp.float32)),
        wmin(statics.plane_point), wmin(statics.plane_normal),
        wmin(statics.plane_active.astype(jnp.float32)),
        wmin(grab.target.astype(jnp.float32)),
        wmin(grab.r2), wmin(grab.rel_q), wmin(grab.sep),
    )
    pos, quat, vel, omega = _physics_pallas(
        cfg, interpret, statics.wall_pos.shape[1],
        statics.plane_point.shape[1], *args)

    def wmaj(x):
        return jnp.moveaxis(x, -1, 0)

    return bodies.replace(pos=wmaj(pos), quat=wmaj(quat), vel=wmaj(vel),
                          omega=wmaj(omega))
