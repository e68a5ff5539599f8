"""pyflex-compatible module API (env/pyflex_compat.py) driven exactly the
way softgym drives pyflex: packed set_scene params, flat float32 state
arrays, (x, y, z, w) quaternions (reference surface:
/root/reference/deps/PyFlex/bindings/pyflex.cpp:1121-1188)."""

import numpy as np
import pytest

import bifold_tpu.env.pyflex_compat as pyflex


@pytest.fixture(autouse=True)
def fresh():
    pyflex.init(headless=True, render=False, camera_width=64,
                camera_height=64)
    yield
    pyflex.clean()


def _cloth_params(dimx=12, dimz=10, mass=0.5):
    # softgym_cloth.h:33-58 layout
    p = np.zeros(19, np.float32)
    p[0:3] = [0.1, 0.05, -0.2]          # ClothPos lower corner
    p[3], p[4] = dimx, dimz
    p[5:8] = [0.9, 0.3, 0.9]            # stretch/bend/shear
    p[8] = 2                            # render_type
    p[9:12] = [0.0, 0.8, 0.0]           # cam pos
    p[12:15] = [0.0, -np.pi / 2, 0.0]   # cam angle
    p[15:17] = [64, 64]
    p[17] = mass
    return p


def test_cloth_scene_packed_params_and_step():
    pyflex.set_scene(0, _cloth_params())
    n = pyflex.get_n_particles()
    assert n == 12 * 10
    pos = pyflex.get_positions().reshape(n, 4)
    # lower corner honored (softgym_cloth.h ClothPos)
    assert pos[:, 0].min() == pytest.approx(0.1, abs=1e-5)
    assert pos[:, 2].min() == pytest.approx(-0.2, abs=1e-5)
    # per-particle invMass = n / total mass
    assert pos[0, 3] == pytest.approx(n / 0.5, rel=1e-5)
    # camera tail consumed
    cam = pyflex.get_camera_params()
    assert cam[1] == pytest.approx(0.8)
    assert int(cam[6]) == 64
    before = pos[:, 1].mean()
    for _ in range(20):
        pyflex.step()
    after = pyflex.get_positions().reshape(n, 4)[:, 1].mean()
    assert after < before  # gravity pulls the free cloth down


def test_positions_velocities_flat_roundtrip():
    pyflex.set_scene(0, _cloth_params(dimx=6, dimz=6))
    n = pyflex.get_n_particles()
    pos = pyflex.get_positions()
    assert pos.shape == (n * 4,) and pos.dtype == np.float32
    pos[1::4] += 0.25
    pyflex.set_positions(pos)
    assert np.allclose(pyflex.get_positions(), pos)
    vel = pyflex.get_velocities()
    assert vel.shape == (n * 3,)
    vel[:] = 0.1
    pyflex.set_velocities(vel)
    assert np.allclose(pyflex.get_velocities(), 0.1)
    rest = pyflex.get_restPositions()
    assert rest.shape == (n * 4,)


def test_shapes_xyzw_quat_convention():
    # pyflex quats are (x, y, z, w): identity = (0, 0, 0, 1)
    pyflex.add_box([0.1, 0.2, 0.3], [0.0, 0.5, 0.0], [0.0, 0.0, 0.0, 1.0], 0)
    pyflex.add_sphere(0.05, [0.3, 0.1, 0.0], [0.0, 0.0, 0.0, 1.0])
    pyflex.add_capsule([0.04, 0.1], [0.0, 0.2, 0.3], [0.0, 0.0, 0.0, 1.0])
    assert pyflex.get_n_shapes() == 3
    states = pyflex.get_shape_states().reshape(3, 14)
    # identity quat still (0,0,0,1) on the way out
    assert np.allclose(states[:, 6:10], [0, 0, 0, 1])
    # internal storage is (w, x, y, z)
    assert np.allclose(pyflex._sim.shape_states[:, 6:10],
                       [[1, 0, 0, 0]] * 3)
    states[0, 0:3] = [1.0, 2.0, 3.0]
    pyflex.set_shape_states(states)
    assert np.allclose(pyflex._sim.shape_states[0, :3], [1, 2, 3])
    pyflex.set_shape_color([0.2, 0.4, 0.6])
    pyflex.pop_box(1)
    assert pyflex.get_n_shapes() == 2
    pyflex.clear_shapes()
    assert pyflex.get_n_shapes() == 0


def test_rigid_scene_queries():
    # softgym_rigid_cloth.h layout: dims, numPiece, invMass, stiffness, cam
    p = np.zeros(14, np.float32)
    p[0:3] = [6, 1, 4]
    p[3] = 2
    p[4], p[5] = 2.0, 1.0
    p[6:9] = [0.0, 0.8, 0.0]
    p[9:12] = [0.0, -np.pi / 2, 0.0]
    p[12:14] = [64, 64]
    pyflex.set_scene(4, p)
    assert pyflex.get_n_rigids() == 2
    assert pyflex.get_n_rigidPositions() == pyflex.get_n_particles() == 48
    offs = pyflex.get_rigidOffsets()
    assert list(offs) == [0, 24, 48]
    assert pyflex.get_rigidIndices().shape == (48,)
    assert pyflex.get_rigidLocalPositions().shape == (48 * 3,)
    # invMass override from ptr[4]
    assert np.allclose(pyflex.get_positions().reshape(-1, 4)[:, 3], 2.0)
    for _ in range(5):
        pyflex.step()
    quats = pyflex.get_rigidRotations().reshape(2, 4)
    # near-identity in xyzw order (w last, the pyflex convention)
    assert np.all(np.abs(quats[:, 3]) > 0.9)
    assert pyflex.get_rigidTranslations().shape == (6,)
    assert pyflex.get_rigidGlobalPositions().shape == (48 * 3,)


def test_fluid_rope_tshirt_softbody_scenes():
    # fluid (softgym_fluid.h layout)
    p = np.zeros(23, np.float32)
    p[0], p[1] = 0.05, 0.55
    p[8:11] = [0.0, 0.1, 0.0]
    p[11:14] = [4, 6, 4]
    p[14:17] = [0.0, 0.8, 0.0]
    p[20:22] = [64, 64]
    pyflex.set_scene(1, p)
    assert pyflex.get_n_particles() == 4 * 6 * 4
    pyflex.step()

    # rope (softgym_rope.h layout)
    p = np.zeros(17, np.float32)
    p[0:3] = [0.0, 0.5, 0.0]
    p[3], p[4] = 1.0, 0.5
    p[5], p[6] = 0.02, 20
    p[7], p[8] = 0.2, 1.0
    p[15:17] = [64, 64]
    pyflex.set_scene(2, p)
    assert pyflex.get_n_particles() == 21
    pyflex.step()

    # tshirt (softgym_tshirt.h layout; procedural garment stand-in)
    p = np.zeros(21, np.float32)
    p[0:3] = [0.0, 0.3, 0.0]
    p[3], p[4] = 0.3, 0.5
    p[8], p[9], p[10] = 0.9, 0.5, 0.00625
    p[17:19] = [64, 64]
    pyflex.set_scene(3, p)
    assert pyflex.get_n_particles() > 100
    pyflex.step()

    # softbody (softgym_softbody.h layout)
    p = np.zeros(8, np.float32)
    p[0] = 1
    p[1], p[2], p[3] = 1.8, 0.0, 0.4
    pyflex.set_scene(7, p)
    assert pyflex.get_n_particles() > 0
    pyflex.step()


def test_cloth3d_scene_procedural_fallback():
    p = np.zeros(22, np.float32)
    p[0:3] = [0.0, 0.2, 0.0]
    p[3], p[4] = 0.3, 0.0
    p[8], p[9], p[10] = 0.9, 0.5, 0.00625
    p[17:19] = [64, 64]
    p[20], p[21] = 1, 7  # Trousers #0007 — absent -> procedural fallback
    with pytest.warns(UserWarning, match="procedural"):
        pyflex.set_scene(6, p)
    assert pyflex.get_n_particles() > 100


def test_add_rigid_body_appends_particles():
    pyflex.set_scene(0, _cloth_params(dimx=4, dimz=4))
    n0 = pyflex.get_n_particles()
    pos = np.zeros((5, 4), np.float32)
    pos[:, 1] = np.arange(5) * 0.02
    pos[:, 3] = 1.0
    vel = np.zeros((5, 3), np.float32)
    pyflex.add_rigid_body(pos.reshape(-1), vel.reshape(-1), 5,
                          np.array([0.0, 0.5, 0.0], np.float32))
    assert pyflex.get_n_particles() == n0 + 5
    phases = pyflex.get_phases()
    assert phases.shape == (n0 + 5,)
    # appended particles carry the fluid/self-collide phase group 5
    assert len(set(phases[n0:].tolist())) == 1
    assert phases[n0] != phases[0]
    pyflex.step()  # consistent buffers: solver still runs


def test_render_returns_flat_buffers():
    pyflex.set_scene(0, _cloth_params(dimx=8, dimz=8))
    img, depth = pyflex.render()
    assert img.dtype == np.uint8 and img.shape == (64 * 64 * 4,)
    assert depth.dtype == np.float32 and depth.shape == (64 * 64,)
    pyflex.add_box([0.05, 0.05, 0.05], [0.0, 0.1, 0.0],
                   [0.0, 0.0, 0.0, 1.0], 0)
    img2, _ = pyflex.render_cloth()
    assert img2.shape == img.shape
    # render_cloth restores colliders afterwards
    assert pyflex.get_n_shapes() == 1


def test_camera_params_roundtrip_and_guards():
    cam = pyflex.get_camera_params()
    cam[0:3] = [0.1, 0.9, 0.2]
    pyflex.set_camera_params(cam)
    assert np.allclose(pyflex.get_camera_params()[0:3], [0.1, 0.9, 0.2])
    with pytest.raises(ValueError, match="unknown scene"):
        pyflex.set_scene(42, np.zeros(4, np.float32))
    pyflex.clean()
    with pytest.raises(RuntimeError, match="init"):
        pyflex.get_n_particles()
    pyflex.init()  # fixture's clean() runs once more harmlessly
