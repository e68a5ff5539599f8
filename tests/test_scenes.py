"""Non-cloth scenes + extended pyflex API surface: rope, fluid (PBF),
rigid clusters (shape matching), softbody lattice, box/capsule colliders,
phases/groups (reference softgym_scenes/*.h + pyflex.cpp:1121-1188).

These drive the numpy extended solver (env/sim.py _step_numpy_ext — the
only backend for extended scenes; the csrc native core accelerates the
legacy cloth step)."""

import numpy as np
import pytest

from bifold_tpu.env import scenes
from bifold_tpu.env.sim import (ClothSim, make_phase, PHASE_FLUID,
                                PHASE_GROUP_MASK)


def _sim(**kw):
    kw.setdefault("native", None)
    kw.setdefault("iterations", 8)
    return ClothSim(**kw)


def test_rope_hangs_from_pin():
    sim = _sim()
    scenes.rope_scene(sim, segments=30, spacing=0.01, start=(0.0, 0.5, 0.0),
                      direction=(1.0, 0.0, 0.0), pin_first=True)
    p0 = sim.get_positions()
    for _ in range(120):
        sim.step()
    p = sim.get_positions()
    assert np.all(np.isfinite(p))
    # pinned head never moves; tail swings down below the start height
    np.testing.assert_allclose(p[0, :3], p0[0, :3], atol=1e-6)
    assert p[-1, 1] < 0.35
    # inextensible chain: total length stays near rest (XPBD stretch)
    seg = np.linalg.norm(np.diff(p[:, :3], axis=0), axis=1)
    assert abs(seg.sum() - 30 * 0.01) / (30 * 0.01) < 0.15


def test_fluid_settles_in_container():
    sim = _sim(iterations=6)
    scenes.fluid_scene(sim, dim=(6, 8, 6), lower=(-0.06, 0.15, -0.06),
                       radius=0.04, bounds_lo=(-0.12, 0.0, -0.12),
                       bounds_hi=(0.12, 10.0, 0.12))
    assert (sim.get_phases() & PHASE_FLUID).all()
    top0 = sim.get_positions()[:, 1].max()
    for _ in range(60):
        sim.step()
    p = sim.get_positions()
    assert np.all(np.isfinite(p))
    # falls and stays inside the container walls
    assert p[:, 1].max() < top0
    assert p[:, 0].min() >= -0.12 - 1e-5 and p[:, 0].max() <= 0.12 + 1e-5
    assert p[:, 2].min() >= -0.12 - 1e-5 and p[:, 2].max() <= 0.12 + 1e-5
    assert p[:, 1].min() >= -1e-5
    # incompressibility: the settled puddle keeps particles separated, not
    # collapsed into a plane (density constraint pushes back)
    from scipy.spatial import cKDTree
    dmin = cKDTree(p[:, :3]).query(p[:, :3], k=2)[0][:, 1]
    assert np.median(dmin) > 0.25 * 0.04


def test_rigid_torus_keeps_shape():
    sim = _sim()
    scenes.torus_scene(sim, n_tori=1, big_r=0.05, small_r=0.02,
                       radius=0.02, height=0.15)
    n = sim.get_n_particles()
    assert sim.get_n_rigids() == 1
    assert sim.get_n_rigid_positions() == n
    p0 = sim.get_positions()[:, :3]
    d0 = np.linalg.norm(p0[0] - p0[n // 2])
    for _ in range(80):
        sim.step()
    p = sim.get_positions()[:, :3]
    assert np.all(np.isfinite(p))
    # fell (translation tracks COM) and rests on/above the floor
    t = sim.get_rigid_translations()[0]
    assert t[1] < 0.15
    assert p[:, 1].min() > -1e-4
    # shape matching: pairwise geometry preserved
    d = np.linalg.norm(p[0] - p[n // 2])
    assert abs(d - d0) / d0 < 0.05
    # rotations stay orthonormal
    r = sim.get_rigid_rotations()[0]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


def test_rigid_cloth_plates_separate_groups():
    sim = _sim()
    scenes.rigid_cloth_scene(sim, plates=2, dims=(6, 1, 4), radius=0.02)
    assert sim.get_n_rigids() == 2
    groups = sim.get_groups()
    assert set(groups.tolist()) == {1, 2}
    for _ in range(40):
        sim.step()
    p = sim.get_positions()[:, :3]
    assert np.all(np.isfinite(p))
    assert p[:, 1].min() > -1e-4  # resting on the floor


def test_softbody_block_holds_together():
    sim = _sim()
    scenes.softbody_scene(sim, dims=(5, 5, 5), spacing=0.02,
                          lower=(0.0, 0.2, 0.0), stiffness=0.4)
    ext0 = np.ptp(sim.get_positions()[:, :3], axis=0)
    for _ in range(100):
        sim.step()
    p = sim.get_positions()[:, :3]
    assert np.all(np.isfinite(p))
    assert p[:, 1].min() < 0.05  # fell to the floor
    ext = np.ptp(p, axis=0)
    # deforms but does not explode or collapse
    assert np.all(ext < 3.0 * np.maximum(ext0, 0.02))
    assert np.all(ext > 0.25 * ext0)


def test_box_collider_supports_particles():
    sim = _sim()
    scenes.softbody_scene(sim, dims=(3, 3, 3), spacing=0.02,
                          lower=(-0.02, 0.2, -0.02), stiffness=0.5)
    sim.add_box((0.1, 0.05, 0.1), pos=(0.0, 0.05, 0.0))
    for _ in range(100):
        sim.step()
    p = sim.get_positions()[:, :3]
    # rests ON the box (top at y=0.10), not on the floor through it
    assert p[:, 1].min() > 0.09


def test_capsule_collider_deflects():
    sim = _sim()
    scenes.rope_scene(sim, segments=20, spacing=0.01,
                      start=(-0.05, 0.2, 0.0), pin_first=False)
    sim.add_capsule(0.04, 0.1, pos=(0.0, 0.1, 0.0))
    for _ in range(80):
        sim.step()
    p = sim.get_positions()[:, :3]
    assert np.all(np.isfinite(p))
    # nothing ends up inside the capsule core
    t = np.clip(p[:, 0], -0.1, 0.1)
    closest = np.stack([t, np.full(len(p), 0.1), np.zeros(len(p))], axis=1)
    assert np.linalg.norm(p - closest, axis=1).min() > 0.035


def test_phase_groups_gate_collision():
    # two particles at the same spot: same group without SELF_COLLIDE
    # coexist; different groups separate to the collision distance
    for groups, expect_separated in (((1, 1), False), ((1, 2), True)):
        sim = _sim(self_collision=True, particle_radius=0.01)
        pos = np.array([[0.0, 0.05, 0.0], [0.004, 0.05, 0.0]])
        ph = np.array([make_phase(g, False, False) for g in groups], np.int32)
        sim.set_particles(pos, 0.0, phases=ph)  # pinned: isolate separation
        # pinned particles don't move; use free particles with no gravity
        # influence by stepping once only
        sim.positions[:, 3] = 1.0
        sim.step()
        d = np.linalg.norm(np.diff(sim.get_positions()[:, :3], axis=0))
        if expect_separated:
            assert d > 0.006
        else:
            assert d <= 0.006


def test_pyflex_api_surface():
    sim = _sim()
    scenes.square_cloth_scene(sim, dimx=8, dimy=8)
    assert sim.get_n_particles() == 64
    sim.add_sphere(0.05, (0, 0.1, 0))
    sim.add_box((0.1, 0.1, 0.1), (0.3, 0.1, 0))
    sim.add_capsule(0.03, 0.08, (0.6, 0.1, 0))
    assert sim.get_n_shapes() == 3
    sim.set_shape_color((1.0, 0.0, 0.0))
    assert np.allclose(sim.shape_colors[-1], (1, 0, 0))
    sim.pop_box(1)
    assert sim.get_n_shapes() == 2
    sim.clear_shapes()
    assert sim.get_n_shapes() == 0
    # phases/groups round-trip
    ph = sim.get_phases()
    assert len(ph) == 64
    sim.set_groups(np.arange(64) % 3)
    assert set((sim.get_groups()).tolist()) == {0, 1, 2}
    assert (sim.get_phases() & PHASE_GROUP_MASK == sim.get_groups()).all()
    # rest positions exposed
    assert sim.get_rest_positions().shape == (64, 3)
    # scene registry: mesh-driven entries refuse with a pointer
    with pytest.raises(ValueError):
        scenes.set_scene(sim, 6)
    # bounds accessors
    sim.set_scene_bounds((-1, 0, -1), (1, 2, 1))
    assert np.allclose(sim.get_scene_lower(), (-1, 0, -1))
    assert np.allclose(sim.get_scene_upper(), (1, 2, 1))


def test_legacy_cloth_path_unchanged():
    """Plain cloth scenes must not route through the extended solver
    (bit-compat with recorded trajectories + softgym caches)."""
    sim = _sim()
    scenes.square_cloth_scene(sim, dimx=8, dimy=8)
    assert not sim._uses_extended_features()
    sim.add_sphere(0.05, (0, 0.1, 0))  # pickers stay legacy
    assert not sim._uses_extended_features()
    sim.add_box((0.1, 0.1, 0.1), (0.3, 0.1, 0))
    assert sim._uses_extended_features()
