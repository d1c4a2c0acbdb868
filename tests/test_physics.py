"""Physics unit tests on the reference's debug levels 2-8
(reference fixtures: src/level_gen.cpp:336-526, selected via viewer keys)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_hideandseek_tpu.config import EnvConfig
from marl_hideandseek_tpu.env import levelgen, physics
from marl_hideandseek_tpu.types import body_slot_ranges

CFG = EnvConfig(num_worlds=1, min_hiders=1, max_hiders=3,
                min_seekers=1, max_seekers=3)


def run_steps(state, n_steps):
    zeros = jnp.zeros((CFG.num_dyn_bodies, 3))

    @jax.jit
    def one(bodies):
        return physics.physics_step(
            CFG, bodies, state.statics, state.grab, zeros, zeros)

    bodies = state.bodies
    for _ in range(n_steps):
        bodies = one(bodies)
    return bodies


def test_cube_drop_settles():
    """Level 3: axis-aligned cube from z=5 settles at z=1 on the plane."""
    state = levelgen._level3(CFG)
    bodies = run_steps(state, 90)  # 3 seconds
    z = float(bodies.pos[0, 2])
    assert 0.9 < z < 1.15, z
    assert float(jnp.linalg.norm(bodies.vel[0])) < 0.5


def test_tilted_cube_settles():
    """Level 2: corner-balanced cube falls over and comes to rest."""
    state = levelgen._level2(CFG)
    bodies = run_steps(state, 150)
    z = float(bodies.pos[0, 2])
    assert 0.8 < z < 1.8, z
    # Should be near the plane, not sunk through it.
    assert float(bodies.pos[0, 2]) > 0.5


def test_elongated_box_settles():
    """Level 4: falling elongated box ends up resting on the plane."""
    state = levelgen._level4(CFG)
    bodies = run_steps(state, 150)
    z = float(bodies.pos[0, 2])
    assert 0.6 < z < 4.2, z
    assert float(jnp.linalg.norm(bodies.vel[0])) < 1.0


def test_stacked_cubes():
    """Level 7: two tilted cubes drop; both must stay above the floor."""
    state = levelgen._level7(CFG)
    bodies = run_steps(state, 150)
    z0, z1 = float(bodies.pos[0, 2]), float(bodies.pos[1, 2])
    assert z0 > 0.5 and z1 > 0.5
    assert max(z0, z1) < 11.0


def test_ramp_drop():
    """Level 8: fast ramp vs static ramp; no tunneling through the floor."""
    state = levelgen._level8(CFG)
    _, (ramp_lo, _), _ = body_slot_ranges(CFG)
    bodies = run_steps(state, 120)
    z = float(bodies.pos[ramp_lo, 2])
    assert z > -1.5, z
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
