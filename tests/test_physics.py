"""Physics unit tests on the reference's debug levels 2-8
(reference fixtures: src/level_gen.cpp:336-526, selected via viewer keys).

Round-3 fidelity bars: settled bodies rest at their support heights (not
"somewhere above the floor"), nothing ends below the floor by more than a
contact-resolution epsilon, and positional static friction holds stacks
and sub-threshold pushes in place.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_hideandseek_tpu import math3d
from marl_hideandseek_tpu.config import EnvConfig
from marl_hideandseek_tpu.env import levelgen, physics
from marl_hideandseek_tpu.types import body_slot_ranges

CFG = EnvConfig(num_worlds=1, min_hiders=1, max_hiders=3,
                min_seekers=1, max_seekers=3)

# Contact resolution epsilon: the Jacobi position solve leaves ~2mm of
# residual penetration at rest (count-normalized corrections).
EPS_PEN = 0.01


def run_steps(state, n_steps, forces=None):
    zeros = jnp.zeros((CFG.num_dyn_bodies, 3))
    f = zeros if forces is None else forces

    @jax.jit
    def one(bodies):
        return physics.physics_step(
            CFG, bodies, state.statics, state.grab, f, zeros)

    bodies = state.bodies
    for _ in range(n_steps):
        bodies = one(bodies)
    return bodies


def lowest_vertex_z(bodies):
    verts = physics.body_vertices_local(CFG, bodies.half_ext)
    vw = bodies.pos[:, None, :] + math3d.quat_rotate(
        bodies.quat[:, None, :], verts)
    return np.asarray(vw[..., 2])


def test_cube_drop_settles():
    """Level 3: axis-aligned cube from z=5 settles AT z=1 on the plane."""
    state = levelgen._level3(CFG)
    bodies = run_steps(state, 90)  # 3 seconds
    z = float(bodies.pos[0, 2])
    assert 1.0 - EPS_PEN < z < 1.05, z
    assert float(jnp.linalg.norm(bodies.vel[0])) < 0.05
    assert lowest_vertex_z(bodies)[0].min() > -EPS_PEN


def test_tilted_cube_settles():
    """Level 2: corner-balanced cube comes to rest without sinking: either
    flat on a face (z=1) or still balanced (z=sqrt(3), the symmetric
    equilibrium) — in both cases at its support height, velocity ~0."""
    state = levelgen._level2(CFG)
    bodies = run_steps(state, 150)
    z = float(bodies.pos[0, 2])
    assert 1.0 - EPS_PEN < z < np.sqrt(3.0) + EPS_PEN, z
    assert float(jnp.linalg.norm(bodies.vel[0])) < 0.05
    assert lowest_vertex_z(bodies)[0].min() > -EPS_PEN


def test_elongated_box_settles():
    """Level 4: falling elongated box rests ON the plane at its half
    extent (z=1 for the [4, 0.75, 1] box), not somewhere in a z band."""
    state = levelgen._level4(CFG)
    bodies = run_steps(state, 150)
    z = float(bodies.pos[0, 2])
    assert 0.74 < z < 1.05, z  # face rest: one of the two half extents
    assert float(jnp.linalg.norm(bodies.vel[0])) < 0.05
    assert lowest_vertex_z(bodies)[0].min() > -EPS_PEN


def test_stacked_cubes():
    """Level 7: two tilted cubes drop into a 3-plane corner. The drop is
    chaotic (corner-first impacts), but both cubes must come to rest at a
    support height with ~zero velocity and no floor penetration."""
    state = levelgen._level7(CFG)
    bodies = run_steps(state, 200)
    z0, z1 = float(bodies.pos[0, 2]), float(bodies.pos[1, 2])
    for z in (z0, z1):
        assert 1.0 - EPS_PEN < z < 3.0 + np.sqrt(3.0), (z0, z1)
    assert float(jnp.linalg.norm(bodies.vel[0])) < 0.05
    assert float(jnp.linalg.norm(bodies.vel[1])) < 0.05
    assert lowest_vertex_z(bodies)[:2].min() > -EPS_PEN


def test_prestacked_cubes_stay_stacked():
    """Static-friction regression: two axis-aligned cubes stacked at rest
    (z=1 and z=3) must STAY stacked — the upper cube neither slides off
    nor sinks in (velocity-pass dynamic friction alone lets stacks creep
    apart; the positional static pass pins them)."""
    state = levelgen.empty_world(CFG)
    qi = math3d.quat_identity()
    state = levelgen._add_box_body(
        state, CFG, 0, [0.0, 0.0, 1.0], qi, levelgen.CUBE_HALF)
    state = levelgen._add_box_body(
        state, CFG, 1, [0.05, 0.0, 3.0], qi, levelgen.CUBE_HALF)
    bodies = run_steps(state, 150)  # 5 seconds
    z0, z1 = float(bodies.pos[0, 2]), float(bodies.pos[1, 2])
    assert abs(z0 - 1.0) < 0.05, z0
    # The stack holds with ~VERT_INSET sag (inset pair sampling).
    assert abs(z1 - 3.0) < 0.15, z1
    # The upper cube stays centered on the stack (rest-state normal flips
    # on near-tied SDF components cause a bounded micro-walk, not a
    # slide-off; without static friction it slid off entirely).
    dx = float(jnp.linalg.norm(bodies.pos[1, :2] - state.bodies.pos[1, :2]))
    assert dx < 0.5, dx


def test_static_friction_holds_subthreshold_push():
    """A cube pushed with a force below the static cone (mu_s * m * g)
    must not creep along the floor (reference muS: plane 2.0,
    src/mgr.cpp:490)."""
    state = levelgen._level3(CFG)
    bodies0 = run_steps(state, 60)  # settle first
    state = state.replace(bodies=bodies0)
    f = jnp.zeros((CFG.num_dyn_bodies, 3)).at[0, 0].set(10.0)
    bodies = run_steps(state, 60, forces=f)
    drift = float(jnp.linalg.norm(bodies.pos[0, :2] - bodies0.pos[0, :2]))
    assert drift < 0.05, drift  # 2s under F=10: held (was ~0.9 without
    #                             positional static friction)


def test_ramp_drop():
    """Level 8: fast ramp vs static ramp: the moving wedge must come to
    rest ON the floor (no tunneling, max EPS_PEN penetration)."""
    state = levelgen._level8(CFG)
    _, (ramp_lo, _), _ = body_slot_ranges(CFG)
    bodies = run_steps(state, 120)
    lows = lowest_vertex_z(bodies)
    assert lows[ramp_lo].min() > -0.05, lows[ramp_lo].min()
    # Static ramp must not have moved.
    np.testing.assert_allclose(
        np.asarray(bodies.pos[ramp_lo + 1]),
        np.asarray(state.bodies.pos[ramp_lo + 1]), atol=1e-6)


def test_free_fall_velocity():
    """No contacts: velocity integrates gravity exactly."""
    state = levelgen._level3(CFG)
    s = state.statics
    state = state.replace(
        statics=s.replace(plane_active=jnp.zeros_like(s.plane_active)))
    bodies = run_steps(state, 30)  # 1 second
    v = float(bodies.vel[0, 2])
    np.testing.assert_allclose(v, -9.8, rtol=0.02)


def test_restitution_hook_bounces():
    """cfg.restitution > 0 makes a dropped cube rebound; the default 0
    keeps the perfectly-inelastic reference behavior."""
    cfg_b = EnvConfig(num_worlds=1, min_hiders=1, max_hiders=3,
                      min_seekers=1, max_seekers=3, restitution=0.6)
    state = levelgen._level3(CFG)
    zeros = jnp.zeros((CFG.num_dyn_bodies, 3))

    def drop(cfg):
        step = jax.jit(lambda b: physics.physics_step(
            cfg, b, state.statics, state.grab, zeros, zeros))
        bodies = state.bodies
        max_vz_after_impact = 0.0
        hit = False
        for _ in range(60):
            bodies = step(bodies)
            vz = float(bodies.vel[0, 2])
            if vz < -1.0:
                hit = True
            if hit:
                max_vz_after_impact = max(max_vz_after_impact, vz)
        return max_vz_after_impact

    assert drop(cfg_b) > 1.0          # bounces back up
    assert drop(CFG) < 0.2            # inelastic default


def test_wedge_edge_contact():
    """A box dropped astride a static wedge's sloped edge must be caught
    by the edge-midpoint manifold slots, not pass into the wedge."""
    state = levelgen.empty_world(CFG)
    _, (ramp_lo, _), _ = body_slot_ranges(CFG)
    state = levelgen._add_ramp_body(
        state, CFG, 0, [0.0, 0.0, 1.0], math3d.quat_identity(),
        locked=True)
    # Drop a cube onto the sloped edge region (local x=+-1, y=-0.5, z=0).
    state = levelgen._add_box_body(
        state, CFG, 0, [0.0, -0.5, 4.0], math3d.quat_identity(),
        levelgen.CUBE_HALF)
    bodies = run_steps(state, 120)
    # The cube must end up at rest somewhere sane (on the wedge or the
    # floor beside it), never inside the wedge body or below the floor.
    assert lowest_vertex_z(bodies)[0].min() > -EPS_PEN
    # Centre never inside the wedge interior (|sdf| check at rest).
    p_l = math3d.quat_rotate_inv(bodies.quat[ramp_lo],
                                 bodies.pos[0] - bodies.pos[ramp_lo])
    sdf, _ = physics.convex_sdf_local(
        p_l, bodies.half_ext[ramp_lo], jnp.array(True))
    assert float(sdf) > -0.3, float(sdf)


def test_locked_body_static():
    """Locked (ResponseType::Static) bodies never move."""
    state = levelgen._level3(CFG)
    b = state.bodies
    state = state.replace(bodies=b.replace(locked=b.locked.at[0].set(True)))
    bodies = run_steps(state, 30)
    np.testing.assert_allclose(np.asarray(bodies.pos[0]),
                               np.asarray(state.bodies.pos[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bodies.vel[0]), 0.0, atol=1e-6)


def test_agent_only_yaws():
    """Agents have zero inverse inertia about x/y (reference hack:
    src/mgr.cpp:576-584): torque about x must not roll them."""
    state = levelgen._level5(CFG)
    _, _, (agent_lo, _) = body_slot_ranges(CFG)
    torque = jnp.zeros((CFG.num_dyn_bodies, 3)).at[agent_lo].set(
        jnp.array([50.0, 0.0, 10.0]))
    zeros = jnp.zeros((CFG.num_dyn_bodies, 3))

    bodies = state.bodies
    step = jax.jit(lambda b: physics.physics_step(
        CFG, b, state.statics, state.grab, zeros, torque))
    for _ in range(30):
        bodies = step(bodies)
    q = np.asarray(bodies.quat[agent_lo])
    # Yaw-only rotations keep x/y quaternion components at zero.
    assert abs(q[1]) < 1e-4 and abs(q[2]) < 1e-4
    assert abs(q[3]) > 0.05  # did yaw


def test_crowded_cluster_no_interpenetration():
    """K-preselect guard (K_WALL=3/K_PAIR=3): a worst-case crowd — 9
    touching cubes in a 3x3 grid + 2 ramps dropped on top — must settle
    without interpenetration or floor tunneling. Validates that 3
    preselected neighbors per body suffice at this env's max density."""
    import itertools

    state = levelgen.empty_world(CFG)
    qi = math3d.quat_identity()
    k = 0
    for gx in range(3):
        for gy in range(3):
            state = levelgen._add_box_body(
                state, CFG, k, [2.05 * (gx - 1), 2.05 * (gy - 1), 1.0],
                qi, levelgen.CUBE_HALF)
            k += 1
    state = levelgen._add_ramp_body(state, CFG, 0, [0.0, 0.0, 4.0], qi)
    state = levelgen._add_ramp_body(state, CFG, 1, [1.0, 1.0, 7.0], qi)
    bodies = run_steps(state, 150)
    pos = np.asarray(bodies.pos)
    worst = min(
        np.abs(pos[i] - pos[j]).max()
        for i, j in itertools.combinations(range(9), 2))
    assert worst > 1.95, worst  # cubes touch (2.0), never overlap deeply
    assert lowest_vertex_z(bodies)[np.asarray(bodies.active)].min() > -0.05


def test_stack_stability_long_horizon():
    """30-second stack soak (900 steps): two stacked cubes must STAY
    STACKED — no slide-off, support heights held, near-rest at the end.

    Before the Coulomb-clamped static friction this was a knife edge:
    the cone-GATED form provided zero resistance the moment the required
    correction crossed the cone, and op-order-level noise (e.g. the
    8-virtual-device CPU config vs single-device) decided between a
    0.03 micro-walk and a full slide-off at ~step 600. With the clamp
    there remains a slow bounded creep (~2e-4/step, ~0.2 over 30 s, vs
    ~2.0 for slide-off); the bound pins it. Reference fixture family:
    src/level_gen.cpp:434-462 (level 7)."""
    state = levelgen.empty_world(CFG)
    qi = math3d.quat_identity()
    state = levelgen._add_box_body(
        state, CFG, 0, [0.0, 0.0, 1.0], qi, levelgen.CUBE_HALF)
    state = levelgen._add_box_body(
        state, CFG, 1, [0.05, 0.0, 3.0], qi, levelgen.CUBE_HALF)
    bodies = run_steps(state, 900)
    z0, z1 = float(bodies.pos[0, 2]), float(bodies.pos[1, 2])
    assert abs(z0 - 1.0) < 0.05, z0
    assert abs(z1 - 3.0) < 0.15, z1
    drift = float(jnp.linalg.norm(
        bodies.pos[1, :2] - state.bodies.pos[1, :2]))
    assert drift < 0.4, drift
    assert float(jnp.linalg.norm(bodies.vel[1])) < 0.1
    assert lowest_vertex_z(bodies)[:2].min() > -EPS_PEN


def test_energy_soak_crowded_long_horizon():
    """Long-horizon energy/penetration soak at max contact density
    (advisor round 3): the 3x3 cube grid + 2 dropped ramps runs 900
    steps (3600 substeps). No slow oscillation, creep, or energy
    injection: every body near-rest, inside the arena, above the floor,
    and cube centers never deeply interpenetrating."""
    import itertools

    state = levelgen.empty_world(CFG)
    qi = math3d.quat_identity()
    k = 0
    for gx in range(3):
        for gy in range(3):
            state = levelgen._add_box_body(
                state, CFG, k, [2.05 * (gx - 1), 2.05 * (gy - 1), 1.0],
                qi, levelgen.CUBE_HALF)
            k += 1
    state = levelgen._add_ramp_body(state, CFG, 0, [0.0, 0.0, 4.0], qi)
    state = levelgen._add_ramp_body(state, CFG, 1, [1.0, 1.0, 7.0], qi)
    bodies = run_steps(state, 900)
    act = np.asarray(bodies.active)
    vel = np.asarray(jnp.linalg.norm(bodies.vel, axis=-1))[act]
    omega = np.asarray(jnp.linalg.norm(bodies.omega, axis=-1))[act]
    assert vel.max() < 0.15, vel.max()     # at rest, no oscillation
    assert omega.max() < 0.3, omega.max()
    pos = np.asarray(bodies.pos)
    assert np.abs(pos[act][:, :2]).max() < 18.0  # nothing ejected
    assert lowest_vertex_z(bodies)[act].min() > -0.05
    worst = min(
        np.abs(pos[i] - pos[j]).max()
        for i, j in itertools.combinations(range(9), 2))
    assert worst > 1.9, worst
