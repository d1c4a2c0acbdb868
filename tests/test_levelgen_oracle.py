"""Executable level-generation parity oracle.

A direct numpy transliteration of the reference's sequential generator —
wall grammar `makeWalls`/`applyWallOperation`/`addDoor`/`findAnotherWall`
(/root/reference/src/geo_gen.cpp:47-505) and the rejection entity
placement of `generateTrainingEnvironment`
(/root/reference/src/level_gen.cpp:79-308) — run over ~1K seeds and
compared DISTRIBUTIONALLY against the framework's fixed-shape JAX
generator (env/geometry.py + env/levelgen.py). RNG streams are
independent (semantic parity, SURVEY §2.4 E7), so the comparison is over
seed-aggregate statistics: wall counts, total wall length, door-gap
counts/widths, box/elongated counts, and the overlap-accepted-at-cap
rate of the rejection placement. Geometry statistics are extracted from
the FINAL wall rectangles / entity poses by shared, implementation-
neutral code so both generators are measured the same way.

This file exists only as a test oracle (VERDICT r3 "missing #4"): the
production generator is the JAX one.
"""

import numpy as np
import pytest

import jax

from marl_hideandseek_tpu.config import EnvConfig, SimFlags

ARENA = 18.0
DOOR_CONNECT = 0.1
DOOR_ADD = 0.2

# Asset collision half-extents (the framework's pinned constants,
# env/levelgen.py:53-57; reference OBJ AABBs via src/mgr.cpp:441-588).
HALF_ELONG = np.array([4.0, 0.75, 1.0])
HALF_CUBE = np.array([1.0, 1.0, 1.0])
HALF_RAMP = np.array([1.0, 1.5, 1.0])
RAMP_OFF = np.array([0.0, -0.5, 0.0])
HALF_AGENT = np.array([1.0, 1.0, 1.0])


# ---------------------------------------------------------------------------
# numpy oracle: wall grammar (geo_gen.cpp)
# ---------------------------------------------------------------------------


class Wall:
    __slots__ = ("p1", "p2")

    def __init__(self, p1, p2):
        p1, p2 = np.asarray(p1, np.float64), np.asarray(p2, np.float64)
        if p1[0] > p2[0] or p1[1] > p2[1]:
            p1, p2 = p2, p1
        self.p1, self.p2 = p1.copy(), p2.copy()

    def horizontal(self):
        return abs(self.p1[1] - self.p2[1]) < 1e-6

    def resort(self):
        if self.p1[0] > self.p2[0] or self.p1[1] > self.p2[1]:
            self.p1, self.p2 = self.p2.copy(), self.p1.copy()

    def length(self):
        return (self.p2[0] - self.p1[0] if self.horizontal()
                else self.p2[1] - self.p1[1])


class WallsO:
    def __init__(self):
        self.walls = []
        self.horizontal = []
        self.vertical = []

    def add(self, wall):
        (self.horizontal if wall.horizontal() else
         self.vertical).append(len(self.walls))
        self.walls.append(wall)
        return len(self.walls) - 1


def _add_door(walls, wall, door_size, rng):
    # geo_gen.cpp:275-307
    ax = 0 if wall.horizontal() else 1
    low = wall.p1[ax] + door_size
    high = wall.p2[ax] - door_size
    rat = 0.3 + rng.random() * 0.4
    c = low + rat * (high - low)
    old_p2 = wall.p2[ax]
    wall.p2[ax] = c - door_size * 0.5
    wall.resort()
    np1, np2 = wall.p1.copy(), wall.p1.copy()
    np1[ax] = c + door_size * 0.5
    np2[ax] = old_p2
    walls.add(Wall(np1, np2))


def _find_another(walls, lst, chosen_ii, rng):
    # geo_gen.cpp:177-269
    chosen = walls.walls[lst[chosen_ii]]
    ax = 0 if chosen.horizontal() else 1          # overlap axis
    cx = 1 - ax                                   # cross axis
    min_len = 0.3 if chosen.horizontal() else 0.5
    n = len(lst)
    start = chosen_ii + 1 + int(rng.integers(0, max(n - 1, 1)))
    for i in range(n - 1):
        cur = (start + i) % n
        if cur == chosen_ii:
            cur = (cur + 1) % n
        other = walls.walls[lst[cur]]
        if (not (chosen.p1[ax] >= other.p2[ax] or
                 chosen.p2[ax] <= other.p1[ax]) and
                chosen.length() >= min_len and other.length() >= min_len):
            high = min(chosen.p2[ax], other.p2[ax])
            low = max(chosen.p1[ax], other.p1[ax])
            works = True
            for j in range(n):
                if j == cur:
                    continue
                wj = walls.walls[lst[j]]
                ib_lo = max(wj.p1[ax], low - 0.1)
                ib_hi = min(wj.p2[ax], high + 0.1)
                if ib_lo < ib_hi:
                    c = wj.p1[cx]
                    c_min = min(chosen.p1[cx], other.p1[cx])
                    c_max = max(chosen.p1[cx], other.p1[cx])
                    if c_min < c < c_max:
                        works = False
                        break
            if works:
                return cur
    return -1


def _connect_op(walls, rng):
    # geo_gen.cpp:309-428 (WallConnectAndAddDoor)
    is_h = bool(rng.integers(0, 2))
    lst = walls.horizontal if is_h else walls.vertical
    wi = int(rng.integers(0, len(lst)))
    counter = 0
    while True:
        oi = _find_another(walls, lst, wi, rng)
        if oi != -1:
            break
        is_h = bool(rng.integers(0, 2))
        lst = walls.horizontal if is_h else walls.vertical
        wi = int(rng.integers(0, len(lst)))
        counter += 1
        if counter > 4:
            return
    first = walls.walls[lst[wi]]
    second = walls.walls[lst[oi]]
    ax = 0 if is_h else 1                      # overlap axis
    cx = 1 - ax
    high = min(first.p2[ax], second.p2[ax])
    low = max(first.p1[ax], second.p1[ax])
    if first.p1[cx] > second.p1[cx]:
        first, second = second, first
    rat = 0.4 + rng.random() * 0.2
    c = low + rat * (high - low)
    # connector between the two walls, perpendicular to them
    a, b = np.zeros(2), np.zeros(2)
    a[ax], a[cx] = c, first.p1[cx]
    b[ax], b[cx] = c, second.p1[cx]
    new_idx = walls.add(Wall(a, b))
    # split both walls at c
    for w in (first, second):
        old_p2 = w.p2[ax]
        w.p2[ax] = c
        w.resort()
        np1, np2 = w.p1.copy(), w.p1.copy()
        np1[ax], np2[ax] = c, old_p2
        walls.add(Wall(np1, np2))
    _add_door(walls, walls.walls[new_idx], DOOR_CONNECT, rng)


def _add_door_op(walls, rng):
    # geo_gen.cpp:410-420 (WallAddDoor): door size 2 * kDoorSize
    door = DOOR_ADD
    wi = int(rng.integers(0, len(walls.walls)))
    wall = walls.walls[wi]
    if wall.length() > 3.0 * door:
        _add_door(walls, wall, door, rng)


def make_walls_oracle(rng):
    # geo_gen.cpp:429-466
    walls = WallsO()
    walls.add(Wall([0, 0], [1, 0]))
    walls.add(Wall([0, 0], [0, 1]))
    walls.add(Wall([0, 1], [1, 1]))
    walls.add(Wall([1, 1], [1, 0]))
    counts = {"connect": 1 + int(rng.integers(0, 6)),
              "door": 4 + int(rng.integers(0, 3))}
    ops = [k for k in ("connect", "door") if counts[k] > 0]

    def select():
        i = int(rng.integers(0, len(ops)))
        op = ops[i]
        counts[op] -= 1
        if counts[op] == 0:
            ops[i] = ops[-1]
            ops.pop()
        return op

    while counts["connect"] > 0 or counts["door"] > 0:
        op = select()
        if op == "connect":
            _connect_op(walls, rng)
        else:
            _add_door_op(walls, rng)
    return walls


def oracle_wall_rects(walls):
    """Final world-space wall rectangles [(cx, cy, hx, hy)], scaled to
    [-18, 18]^2 with 0.2 thickness (geo_gen.cpp:467-505)."""
    rects = []
    for w in walls.walls:
        p1 = -ARENA + 2.0 * ARENA * w.p1
        p2 = -ARENA + 2.0 * ARENA * w.p2
        cx, cy = 0.5 * (p1[0] + p2[0]), 0.5 * (p1[1] + p2[1])
        if abs(p1[1] - p2[1]) < 1e-4:
            rects.append((cx, cy, p2[0] - cx, 0.2))
        else:
            rects.append((cx, cy, 0.2, p2[1] - cy))
    return np.array(rects)


# ---------------------------------------------------------------------------
# numpy oracle: rejection entity placement (level_gen.cpp:79-308)
# ---------------------------------------------------------------------------


def _world_aabb2(half, off, pos, theta):
    """xy AABB half-extents of a rotated box (axis-aligned bound of the
    rotated OBB — matching AABB::applyTRS semantics)."""
    c, s = abs(np.cos(theta)), abs(np.sin(theta))
    hx = c * half[0] + s * half[1]
    hy = s * half[0] + c * half[1]
    ox = off[0] * np.cos(theta) - off[1] * np.sin(theta)
    oy = off[0] * np.sin(theta) + off[1] * np.cos(theta)
    return np.array([pos[0] + ox, pos[1] + oy]), np.array([hx, hy])


def oracle_place_entities(rng, wall_rects, num_hiders, num_seekers):
    """Sequential rejection placement; returns (entities, overlap_flags)
    where entities = [(kind, cx, cy, theta)] in placement order and
    overlap_flags marks acceptances that hit the 20-rejection cap."""
    placed = [((r[0], r[1]), (r[2], r[3])) for r in wall_rects]
    ents, over = [], []

    def place(half, off, kind):
        rejections = 0
        while True:
            pos = -ARENA + rng.random(2) * 2 * ARENA
            theta = rng.random() * np.pi
            c, h = _world_aabb2(half, off, pos, theta)
            hit = any((abs(c[0] - pc[0]) < h[0] + ph[0]) and
                      (abs(c[1] - pc[1]) < h[1] + ph[1])
                      for pc, ph in placed)
            if not hit or rejections == 20:
                placed.append(((c[0], c[1]), (h[0], h[1])))
                ents.append((kind, pos[0], pos[1], theta))
                over.append(hit)
                return
            rejections += 1

    total_boxes = int(rng.integers(3, 10))
    # sampleI32(3, total): U[3, total-1], degenerating to 3 at total=3
    # (level_gen.cpp:87-88; mirrors env/levelgen.py:252-254).
    n_elong = 3 + int(rng.integers(0, max(total_boxes - 3, 1)))
    n_cube = total_boxes - n_elong
    for _ in range(n_elong):
        place(HALF_ELONG, (0, 0), "elong")
    for _ in range(n_cube):
        place(HALF_CUBE, (0, 0), "cube")
    for _ in range(2):
        place(HALF_RAMP, RAMP_OFF[:2], "ramp")
    for _ in range(num_hiders + num_seekers):
        place(HALF_AGENT, (0, 0), "agent")
    return ents, np.array(over), total_boxes, n_elong


# ---------------------------------------------------------------------------
# shared extractors (applied identically to oracle and JAX outputs)
# ---------------------------------------------------------------------------


def door_gaps(rects):
    """Collinear small gaps between wall rectangles = doors. Returns gap
    widths in world units (doors are 3.6 / 7.2; anything < 9 counts)."""
    gaps = []
    for horiz in (True, False):
        if horiz:
            group = [r for r in rects if r[2] >= r[3]]
            keyf, lo, hi = 1, 0, 2
        else:
            group = [r for r in rects if r[2] < r[3]]
            keyf, lo, hi = 0, 1, 3
        lines = {}
        for r in group:
            lines.setdefault(round(r[keyf], 3), []).append(r)
        for _, ws in lines.items():
            ws.sort(key=lambda r: r[lo])
            for a, b in zip(ws, ws[1:]):
                gap = (b[lo] - b[hi]) - (a[lo] + a[hi])
                if 0.5 < gap < 9.0:
                    gaps.append(gap)
    return gaps


def overlap_accept_fraction(centers, halves, n_walls):
    """Fraction of dynamic entities whose spawn AABB overlaps an earlier
    entity/wall AABB (the reference accepts after 20 rejections)."""
    n = len(centers)
    flags = []
    for i in range(n_walls, n):
        hit = False
        for j in range(i):
            if (abs(centers[i][0] - centers[j][0]) <
                    halves[i][0] + halves[j][0] and
                    abs(centers[i][1] - centers[j][1]) <
                    halves[i][1] + halves[j][1]):
                hit = True
                break
        flags.append(hit)
    return flags


# ---------------------------------------------------------------------------
# the comparison test
# ---------------------------------------------------------------------------

N_SEEDS = 1024


def _oracle_stats(n_seeds):
    wall_n, wall_len, door_n, door_w = [], [], [], []
    boxes, elong, over = [], [], []
    for seed in range(n_seeds):
        rng = np.random.default_rng(seed + 1)
        walls = make_walls_oracle(rng)
        rects = oracle_wall_rects(walls)
        ents, oflags, tb, ne = oracle_place_entities(rng, rects, 2, 2)
        wall_n.append(len(rects))
        wall_len.append(sum(2 * max(r[2], r[3]) for r in rects))
        g = door_gaps(rects)
        door_n.append(len(g))
        door_w.extend(g)
        boxes.append(tb)
        elong.append(ne)
        over.append(oflags.mean())
    return dict(wall_n=np.array(wall_n), wall_len=np.array(wall_len),
                door_n=np.array(door_n), door_w=np.array(door_w),
                boxes=np.array(boxes), elong=np.array(elong),
                over=np.array(over))


def _jax_stats(n_seeds):
    from marl_hideandseek_tpu.env import HideAndSeekEnv

    wall_n, wall_len, door_n, door_w = [], [], [], []
    boxes, elong, over = [], [], []
    w_batch = 256
    for b in range(n_seeds // w_batch):
        cfg = EnvConfig(num_worlds=w_batch, min_hiders=2, max_hiders=2,
                        min_seekers=2, max_seekers=2, rand_seed=100 + b,
                        sim_flags=SimFlags.RandomFlipTeams)
        env = HideAndSeekEnv(cfg)
        state, _ = jax.jit(env.init)(jax.random.PRNGKey(cfg.rand_seed))
        wp = np.asarray(state.statics.wall_pos)
        wh = np.asarray(state.statics.wall_half_ext)
        wa = np.asarray(state.statics.wall_active)
        nb = np.asarray(state.num_active_boxes)
        he = np.asarray(state.bodies.half_ext)
        act = np.asarray(state.bodies.active)
        pos = np.asarray(state.bodies.pos)
        for w in range(w_batch):
            rects = np.array([
                (wp[w, i, 0], wp[w, i, 1], wh[w, i, 0], wh[w, i, 1])
                for i in range(wp.shape[1]) if wa[w, i]])
            wall_n.append(len(rects))
            wall_len.append(sum(2 * max(r[2], r[3]) for r in rects))
            g = door_gaps(rects)
            door_n.append(len(g))
            door_w.extend(g)
            boxes.append(int(nb[w]))
            n_el = int(np.sum((he[w, :9, 0] > 3.0) & act[w, :9]))
            elong.append(n_el)
            # overlap-accepted fraction over dynamic entities, in
            # placement order (boxes, ramps, agents = slot order).
            centers = [((r[0], r[1]), (r[2], r[3])) for r in rects]
            halves = [c[1] for c in centers]
            cs = [c[0] for c in centers]
            # ramp OBB centre is offset from the body origin
            from marl_hideandseek_tpu.env.levelgen import (
                RAMP_CENTER_OFF)
            for slot in range(pos.shape[1] - 0):
                if not act[w, slot]:
                    continue
                p = pos[w, slot]
                h3 = he[w, slot]
                is_ramp = 9 <= slot < 11
                off = (np.asarray(RAMP_CENTER_OFF)[:2] if is_ramp
                       else np.zeros(2))
                # recover yaw from quat? use stored AABB via verts:
                # cheap exact route: bound via rotation-free AABB is
                # wrong for rotated boxes, so use the quat.
                q = np.asarray(state.bodies.quat)[w, slot]
                theta = 2.0 * np.arctan2(q[3], q[0])
                c, h = _world_aabb2(h3, off, p[:2], theta)
                cs.append((c[0], c[1]))
                halves.append((h[0], h[1]))
            flags = overlap_accept_fraction(
                cs, halves, len(rects))
            over.append(np.mean(flags) if flags else 0.0)
    return dict(wall_n=np.array(wall_n), wall_len=np.array(wall_len),
                door_n=np.array(door_n), door_w=np.array(door_w),
                boxes=np.array(boxes), elong=np.array(elong),
                over=np.array(over))


def test_levelgen_distribution_parity():
    o = _oracle_stats(N_SEEDS)
    j = _jax_stats(N_SEEDS)

    def close(name, a, b, tol):
        assert abs(a - b) < tol, (name, float(a), float(b))

    close("wall count mean", o["wall_n"].mean(), j["wall_n"].mean(), 0.8)
    close("wall count std", o["wall_n"].std(), j["wall_n"].std(), 0.8)
    close("total wall length", o["wall_len"].mean(),
          j["wall_len"].mean(), 8.0)
    close("door count mean", o["door_n"].mean(), j["door_n"].mean(), 0.8)
    close("door width mean", o["door_w"].mean(), j["door_w"].mean(), 0.5)
    close("box total mean", o["boxes"].mean(), j["boxes"].mean(), 0.3)
    close("elongated mean", o["elong"].mean(), j["elong"].mean(), 0.3)
    close("overlap-accept rate", o["over"].mean(), j["over"].mean(), 0.06)
