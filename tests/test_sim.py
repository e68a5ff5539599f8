"""ClothSim self-collision + native/numpy backend parity.

FleX self-collides cloth particles by construction (softgym_cloth3d.h:360
sets eNvFlexPhaseSelfCollide|SelfCollideFilter, :380 radius) — folded layers
rest a collision-distance apart instead of interpenetrating. Both backends
must produce the same trajectories up to float ordering.
"""

import numpy as np
import pytest

from bifold_tpu.env.native import load_native
from bifold_tpu.env.sim import ClothSim, grid_cloth

RADIUS = 0.00625
DIM = 20


def folded_cloth_sim(self_collision: bool, native: bool) -> ClothSim:
    """Grid cloth folded in half (z mirrored) with a small layer gap."""
    sim = ClothSim(particle_radius=RADIUS, substeps=2, iterations=8,
                   self_collision=self_collision, native=native)
    verts, faces = grid_cloth(DIM, DIM, RADIUS, center=(0.0, 0.02, 0.0))
    sim.set_cloth(verts, faces)
    pos = sim.get_positions()
    top = pos[:, 2] > 1e-6
    pos[top, 2] = -pos[top, 2]
    pos[top, 1] += 3.0 * RADIUS
    sim.set_positions(pos)
    sim.set_velocities(np.zeros((len(pos), 3), np.float32))
    return sim


def layer_gap(sim) -> float:
    """Median vertical separation between the two fold layers."""
    pos = sim.get_positions()
    rest = sim.rest_positions
    top = rest[:, 2] > 1e-6
    bottom = rest[:, 2] < -1e-6
    return float(np.median(pos[top, 1]) - np.median(pos[bottom, 1]))


def test_folded_layers_separate_numpy():
    sim = folded_cloth_sim(self_collision=True, native=False)
    # 30 steps: long enough for the no-collision control to fully collapse
    # (gap 0 by step 10), short enough that the unpinned crease hasn't crept
    # open (nothing holds a free fold closed forever under XPBD bend springs)
    for _ in range(30):
        sim.step()
    gap = layer_gap(sim)
    assert gap >= RADIUS, f"layers interpenetrate: gap {gap:.5f} < r {RADIUS}"
    # and the cloth didn't explode
    assert np.abs(sim.get_positions()[:, :3]).max() < 0.5


def test_no_self_collision_interpenetrates():
    """Control: with self-collision off the fold collapses to one layer —
    the behavior the VERDICT flagged."""
    sim = folded_cloth_sim(self_collision=False, native=False)
    # 30 steps: long enough for the no-collision control to fully collapse
    # (gap 0 by step 10), short enough that the unpinned crease hasn't crept
    # open (nothing holds a free fold closed forever under XPBD bend springs)
    for _ in range(30):
        sim.step()
    assert layer_gap(sim) < RADIUS / 2


@pytest.mark.skipif(load_native() is None,
                    reason="native lib not built (make -C csrc)")
def test_native_numpy_parity_with_self_collision():
    a = folded_cloth_sim(self_collision=True, native=False)
    b = folded_cloth_sim(self_collision=True, native=True)
    for _ in range(20):
        a.step()
        b.step()
    np.testing.assert_allclose(a.get_positions(), b.get_positions(),
                               rtol=0, atol=2e-4)


@pytest.mark.skipif(load_native() is None,
                    reason="native lib not built (make -C csrc)")
def test_native_folded_layers_separate():
    sim = folded_cloth_sim(self_collision=True, native=True)
    # 30 steps: long enough for the no-collision control to fully collapse
    # (gap 0 by step 10), short enough that the unpinned crease hasn't crept
    # open (nothing holds a free fold closed forever under XPBD bend springs)
    for _ in range(30):
        sim.step()
    assert layer_gap(sim) >= RADIUS


def test_mesh_neighbors_do_not_repel():
    """Rest-distance filter: a flat cloth (every near pair is a mesh
    neighborhood pair) keeps its footprint instead of inflating."""
    sim = ClothSim(particle_radius=RADIUS, substeps=2, iterations=8,
                   self_collision=True, native=False)
    verts, faces = grid_cloth(DIM, DIM, RADIUS, center=(0.0, 0.004, 0.0))
    sim.set_cloth(verts, faces)
    span0 = np.ptp(sim.get_positions()[:, 0])
    for _ in range(40):
        sim.step()
    span1 = np.ptp(sim.get_positions()[:, 0])
    assert abs(span1 - span0) < 0.15 * span0


# ---------------------------------------------------------------------------
# Render parity + shading features (VERDICT r2 missing #4)
# ---------------------------------------------------------------------------


def _uv_checker(sim):
    """Rest-plane UVs + an 8x8 two-tone checker texture."""
    rest = sim.rest_positions
    span = np.ptp(rest[:, [0, 2]], axis=0) + 1e-9
    uv = (rest[:, [0, 2]] - rest[:, [0, 2]].min(axis=0)) / span
    tex = np.zeros((8, 8, 3), np.float32)
    yy, xx = np.mgrid[0:8, 0:8]
    check = ((yy + xx) % 2).astype(bool)
    tex[check] = (0.9, 0.1, 0.1)
    tex[~check] = (0.1, 0.1, 0.9)
    return uv.astype(np.float32), tex


@pytest.mark.skipif(load_native() is None,
                    reason="native lib not built (make -C csrc)")
@pytest.mark.parametrize("shading,textured", [
    ("smooth", False), ("flat", False), ("smooth", True), ("flat", True)])
def test_native_numpy_render_bit_identical(shading, textured):
    """Native and numpy rasterizers produce bit-identical frames in every
    shading/texture mode (both are written with the same float32 op
    order; numpy draws in face order to match z-tie resolution)."""
    a = folded_cloth_sim(self_collision=True, native=False)
    b = folded_cloth_sim(self_collision=True, native=True)
    for sim in (a, b):
        sim.camera_params["width"] = sim.camera_params["height"] = 96
        sim.shading = shading
        if textured:
            sim.uvs, sim.texture = _uv_checker(sim)
    rgba_a, depth_a = a._render_numpy(96, 96)
    rgba_b, depth_b = b.render(96, 96)
    np.testing.assert_array_equal(depth_a, depth_b)
    np.testing.assert_array_equal(rgba_a, rgba_b)


def test_smooth_shading_and_texture_change_pixels():
    sim = folded_cloth_sim(self_collision=True, native=False)
    sim.shading = "flat"
    flat_rgba, flat_depth = sim._render_numpy(96, 96)
    sim.shading = "smooth"
    smooth_rgba, smooth_depth = sim._render_numpy(96, 96)
    # depth (and hence masks/unprojection) is shading-invariant
    np.testing.assert_array_equal(flat_depth, smooth_depth)
    cloth = flat_depth < 0.996
    assert cloth.any()
    diff = (flat_rgba[..., :3].astype(int)
            - smooth_rgba[..., :3].astype(int))[cloth]
    assert np.abs(diff).max() > 0  # shading model actually changed pixels

    sim.uvs, sim.texture = _uv_checker(sim)
    tex_rgba, _ = sim._render_numpy(96, 96)
    px = tex_rgba[..., :3][cloth].astype(np.float32) / 255.0
    # both checker tones appear on the cloth
    assert (px[:, 0] > px[:, 2]).any() and (px[:, 2] > px[:, 0]).any()


def test_configurable_light_direction():
    sim = folded_cloth_sim(self_collision=True, native=False)
    r1, d1 = sim._render_numpy(96, 96)
    grazing = np.array([1.0, 0.05, 0.0], np.float32)
    sim.light_dir = grazing / np.float32(np.linalg.norm(grazing))
    r2, d2 = sim._render_numpy(96, 96)
    np.testing.assert_array_equal(d1, d2)
    cloth = d1 < 0.996
    # a near-horizontal light darkens the mostly-horizontal cloth
    assert (r2[..., :3][cloth].astype(int).mean()
            < r1[..., :3][cloth].astype(int).mean() - 5)
