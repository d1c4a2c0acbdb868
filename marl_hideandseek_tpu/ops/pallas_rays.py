"""Pallas TPU raycast kernel.

The raycast sweep (grab/lock, visibility, lidar, reward-vis —
SURVEY.md §2.4 E4) is the #2 hotspot after physics. The XLA version
materializes [rays x prims] intermediates to HBM; this kernel keeps the
whole sweep in VMEM: worlds ride the 128-wide lane dimension, rays ride
sublanes, and the primitive loop is unrolled at trace time (primitive kind
per slot is static), maintaining a running (t_best, id_best) pair.

Layout contract: all per-world inputs are transposed worlds-minor
([..., W]); the wrapper `raycast_batch` handles transposition and falls
back to the vmapped jnp path on non-TPU backends.

Entity id space matches env/rays.py: [0,B) dyn bodies, [B,B+MW) walls,
[B+MW,B+MW+P) planes, -1 miss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marl_hideandseek_tpu.config import EnvConfig, MAX_WALLS
from marl_hideandseek_tpu.env import rays as jnp_rays
from marl_hideandseek_tpu.types import body_slot_ranges

LANE = 128
_EPS = 1e-7
_BIG = 3.0e38

# Wedge halfspaces (data/ramp_collision.obj), same as env/rays.py.
import math

_S13 = math.sqrt(13.0)
_WEDGE_FACES = (
    ((1.0, 0.0, 0.0), 1.0),
    ((-1.0, 0.0, 0.0), 1.0),
    ((0.0, 1.0, 0.0), 1.0),
    ((0.0, 0.0, -1.0), 1.0),
    ((0.0, -2.0 / _S13, 3.0 / _S13), 1.0 / _S13),
)


def _rot_inv(qw, qx, qy, qz, vx, vy, vz):
    """Rotate v by the conjugate of q (component form, [.., 128] arrays)."""
    # u x v with u = (qx, qy, qz)
    cx = qy * vz - qz * vy
    cy = qz * vx - qx * vz
    cz = qx * vy - qy * vx
    # u x (u x v)
    dx = qy * cz - qz * cy
    dy = qz * cx - qx * cz
    dz = qx * cy - qy * cx
    # conj: v - 2w (u x v) + 2 u x (u x v)
    return (vx - 2.0 * qw * cx + 2.0 * dx,
            vy - 2.0 * qw * cy + 2.0 * dy,
            vz - 2.0 * qw * cz + 2.0 * dz)


def _slab_t(ox, oy, oz, dx, dy, dz, hx, hy, hz):
    """AABB slab entry-t ([R, 128] arrays); +inf on miss/inside."""
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
    n3, f3 = axis(oz, dz, hz)
    tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
    tmax = jnp.minimum(jnp.minimum(f1, f2), f3)
    hit = (tmax >= tmin) & (tmin > _EPS)
    return jnp.where(hit, tmin, _BIG)


def _make_kernel(cfg: EnvConfig, n_rays: int):
    n_body = cfg.num_dyn_bodies
    _, (ramp_lo, ramp_hi), _ = body_slot_ranges(cfg)
    n_wall = MAX_WALLS
    n_plane = 3

    def kernel(o_ref, d_ref, maxt_ref, excl_ref,
               bpos_ref, bquat_ref, bhalf_ref, bact_ref,
               wpos_ref, whalf_ref, wact_ref,
               ppt_ref, pn_ref, pact_ref,
               t_out, id_out):
        # Ray blocks: [3, R, L] components; scalars [R, L].
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
        max_t = maxt_ref[:]
        excl = excl_ref[:]

        t_best = jnp.full((n_rays, LANE), _BIG)
        id_best = jnp.full((n_rays, LANE), -1, jnp.int32)

        def update(t, prim_id, extra_mask, t_best, id_best):
            t = jnp.where(extra_mask, t, _BIG)
            t = jnp.where(excl == prim_id, _BIG, t)
            better = t < t_best
            return (jnp.where(better, t, t_best),
                    jnp.where(better, prim_id, id_best))

        # ---- dynamic bodies (OBBs / wedges) --------------------------
        for b in range(n_body):
            px = bpos_ref[b, 0][None]
            py = bpos_ref[b, 1][None]
            pz = bpos_ref[b, 2][None]
            qw = bquat_ref[b, 0][None]
            qx = bquat_ref[b, 1][None]
            qy = bquat_ref[b, 2][None]
            qz = bquat_ref[b, 3][None]
            act = bact_ref[b][None] > 0.5

            lox, loy, loz = _rot_inv(qw, qx, qy, qz,
                                     ox - px, oy - py, oz - pz)
            ldx, ldy, ldz = _rot_inv(qw, qx, qy, qz, dx, dy, dz)

            if ramp_lo <= b < ramp_hi:
                # Wedge: Cyrus-Beck over 5 static halfspaces.
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
                hx = bhalf_ref[b, 0][None]
                hy = bhalf_ref[b, 1][None]
                hz = bhalf_ref[b, 2][None]
                t = _slab_t(lox, loy, loz, ldx, ldy, ldz, hx, hy, hz)

            t_best, id_best = update(t, b, act, t_best, id_best)

        # ---- walls (axis-aligned boxes) ------------------------------
        # Wall passes all share the ray dirs: hoist the 3 slab
        # reciprocals out of the loop (divides are multi-cycle on the
        # VPU). Semantics identical to _slab_t.
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
            px = wpos_ref[w, 0][None]
            py = wpos_ref[w, 1][None]
            pz = wpos_ref[w, 2][None]
            hx = whalf_ref[w, 0][None]
            hy = whalf_ref[w, 1][None]
            hz = whalf_ref[w, 2][None]
            act = wact_ref[w][None] > 0.5
            n1, f1 = wall_axis(ox - px, hx, inv_dx, small_x)
            n2, f2 = wall_axis(oy - py, hy, inv_dy, small_y)
            n3, f3 = wall_axis(oz - pz, hz, inv_dz, small_z)
            tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
            tmax = jnp.minimum(jnp.minimum(f1, f2), f3)
            hit = (tmax >= tmin) & (tmin > _EPS)
            t = jnp.where(hit, tmin, _BIG)
            t_best, id_best = update(t, n_body + w, act, t_best, id_best)

        # ---- planes (one-sided) --------------------------------------
        for p in range(n_plane):
            nx = pn_ref[p, 0][None]
            ny = pn_ref[p, 1][None]
            nz = pn_ref[p, 2][None]
            sx = ppt_ref[p, 0][None]
            sy = ppt_ref[p, 1][None]
            sz = ppt_ref[p, 2][None]
            act = pact_ref[p][None] > 0.5
            denom = dx * nx + dy * ny + dz * nz
            num = (sx - ox) * nx + (sy - oy) * ny + (sz - oz) * nz
            t = num / jnp.where(jnp.abs(denom) < _EPS, -_EPS, denom)
            hit = (denom < -_EPS) & (t > _EPS)
            t = jnp.where(hit, t, _BIG)
            t_best, id_best = update(t, n_body + n_wall + p, act,
                                     t_best, id_best)

        over = t_best > max_t
        t_out[:] = jnp.where(over, _BIG, t_best)
        id_out[:] = jnp.where(over, -1, id_best)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 15))
def _raycast_pallas(cfg: EnvConfig, bpos, bquat, bhalf, bact,
                    wpos, whalf, wact, ppt, pn, pact,
                    origins, dirs, max_t, exclude, interpret=False):
    """All inputs worlds-minor; see raycast_batch for shapes."""
    n_rays = origins.shape[1]
    n_worlds = origins.shape[-1]
    assert n_worlds % LANE == 0, "num_worlds must be a multiple of 128"
    grid = (n_worlds // LANE,)

    def wspec(*block_prefix):
        """Block covering the full prefix dims and one lane tile."""
        rank = len(block_prefix)
        return pl.BlockSpec(
            block_prefix + (LANE,),
            lambda i, _r=rank: (0,) * _r + (i,),
            memory_space=pltpu.VMEM)

    kernel = _make_kernel(cfg, n_rays)
    t, hit = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            wspec(3, n_rays),                 # origins
            wspec(3, n_rays),                 # dirs
            wspec(n_rays),                    # max_t
            wspec(n_rays),                    # exclude
            wspec(cfg.num_dyn_bodies, 3),     # body pos
            wspec(cfg.num_dyn_bodies, 4),     # body quat
            wspec(cfg.num_dyn_bodies, 3),     # body half
            wspec(cfg.num_dyn_bodies),        # body active
            wspec(MAX_WALLS, 3),              # wall pos
            wspec(MAX_WALLS, 3),              # wall half
            wspec(MAX_WALLS),                 # wall active
            wspec(3, 3),                      # plane points
            wspec(3, 3),                      # plane normals
            wspec(3),                         # plane active
        ],
        out_specs=[wspec(n_rays), wspec(n_rays)],
        out_shape=[
            jax.ShapeDtypeStruct((n_rays, n_worlds), jnp.float32),
            jax.ShapeDtypeStruct((n_rays, n_worlds), jnp.int32),
        ],
        interpret=interpret,
    )(origins, dirs, max_t, exclude,
      bpos, bquat, bhalf, bact, wpos, whalf, wact, ppt, pn, pact)
    return t, hit


def raycast_batch(cfg: EnvConfig, state, origins, dirs, max_t, exclude,
                  use_pallas: bool = True, interpret: bool = False):
    """Batched nearest-hit raycast over all worlds.

    origins, dirs: [W, R, 3]; max_t, exclude: [W, R].
    Returns (t [W, R] — +inf miss, hit_id [W, R] — -1 miss).

    Uses the Pallas kernel on TPU when W % 128 == 0, otherwise the
    reference jnp path (identical semantics, slower). `interpret=True`
    forces the Pallas interpreter on any backend (testing only).
    """
    n_worlds = origins.shape[0]
    on_tpu = jax.devices()[0].platform == "tpu"
    if not ((use_pallas and on_tpu and n_worlds % LANE == 0) or
            (interpret and n_worlds % LANE == 0)):
        t, hit = jax.vmap(
            lambda b, s, o, d, m, e: jnp_rays.raycast_world(
                cfg, b, s, o, d, m, e)
        )(state.bodies, state.statics, origins, dirs, max_t, exclude)
        return t, hit

    def wmin(x, src_axis=0):
        """Move the worlds axis (axis 0) to the end."""
        return jnp.moveaxis(x, 0, -1)

    b = state.bodies
    s = state.statics
    args = (
        wmin(b.pos).astype(jnp.float32),          # [B, 3, W]
        wmin(b.quat).astype(jnp.float32),
        wmin(b.half_ext).astype(jnp.float32),
        wmin(b.active.astype(jnp.float32)),       # [B, W]
        wmin(s.wall_pos).astype(jnp.float32),
        wmin(s.wall_half_ext).astype(jnp.float32),
        wmin(s.wall_active.astype(jnp.float32)),
        wmin(s.plane_point).astype(jnp.float32),
        wmin(s.plane_normal).astype(jnp.float32),
        wmin(s.plane_active.astype(jnp.float32)),
        jnp.moveaxis(origins, 0, -1).swapaxes(0, 1).astype(jnp.float32),
        # ^ [W,R,3] -> [R,3,W] -> [3,R,W]
        jnp.moveaxis(dirs, 0, -1).swapaxes(0, 1).astype(jnp.float32),
        jnp.moveaxis(max_t, 0, -1).astype(jnp.float32),   # [R, W]
        jnp.moveaxis(exclude, 0, -1).astype(jnp.int32),
    )
    t, hit = _raycast_pallas(cfg, *args, interpret)
    return jnp.moveaxis(t, -1, 0), jnp.moveaxis(hit, -1, 0)


def raycast_batch_packed(cfg: EnvConfig, pstate, origins, dirs, max_t,
                         exclude, use_pallas: bool = True,
                         interpret: bool = False):
    """Worlds-minor twin of raycast_batch: no state transposes.

    pstate: packed EnvState (every leaf's world axis LAST); origins/dirs
    [R, 3, W]; max_t [R, W] f32; exclude [R, W] i32. Returns (t [R, W],
    hit_id [R, W]). Keeping the whole call packed is what lets the reset
    branch of PackedEnv.step avoid full-state transposes (which would
    force XLA layout-conversion copies of the state on EVERY step, taken
    or not — measured ~1.5 ms/step at 16K worlds)."""
    n_worlds = origins.shape[-1]
    on_tpu = jax.devices()[0].platform == "tpu"
    if not ((use_pallas and on_tpu and n_worlds % LANE == 0) or
            (interpret and n_worlds % LANE == 0)):
        return jax.vmap(
            lambda b, s, o, d, m, e: jnp_rays.raycast_world(
                cfg, b, s, o, d, m, e),
            in_axes=-1, out_axes=-1,
        )(pstate.bodies, pstate.statics, origins, dirs, max_t, exclude)

    b = pstate.bodies
    s = pstate.statics
    f32 = lambda x: x.astype(jnp.float32)
    args = (
        f32(b.pos), f32(b.quat), f32(b.half_ext), f32(b.active),
        f32(s.wall_pos), f32(s.wall_half_ext), f32(s.wall_active),
        f32(s.plane_point), f32(s.plane_normal), f32(s.plane_active),
        f32(origins.swapaxes(0, 1)),            # [R,3,W] -> [3,R,W]
        f32(dirs.swapaxes(0, 1)),
        f32(max_t), exclude.astype(jnp.int32),
    )
    return _raycast_pallas(cfg, *args, interpret)
