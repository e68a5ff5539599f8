"""Environment layer: simulator determinism, primitives, garments,
demonstrators, cache builder, and a 1-trial closed-loop evaluator smoke with
a scripted policy (counterpart of the reference's de-facto sim integration
tests — it has none; SURVEY.md §4)."""

import numpy as np
import pytest

from bifold_tpu.data.utils import get_mask_from_depth
from bifold_tpu.env.cloth_env import ClothEnv, rotate_particles, square_cloth_config
from bifold_tpu.env.demonstrators import Demonstrator
from bifold_tpu.env.garments import trousers_mesh, tshirt_mesh


@pytest.fixture(scope="module")
def env():
    e = ClothEnv(render_dim=128, native=False, substeps=2, iterations=8)
    e.reset(square_cloth_config(16, 16), settle_steps=10)
    return e


def test_sim_determinism():
    states = []
    for _ in range(2):
        e = ClothEnv(render_dim=64, native=False, substeps=2, iterations=8)
        e.reset(square_cloth_config(12, 12), settle_steps=5)
        for _ in range(10):
            e.sim.step()
        states.append(e.sim.get_positions())
    np.testing.assert_array_equal(states[0], states[1])


def test_cloth_settles_flat(env):
    pos = env.sim.get_positions()[:, :3]
    assert pos[:, 1].max() < 0.02  # resting near the floor
    assert abs(pos[:, 0].max() - pos[:, 0].min() - 15 * 0.00625) < 0.02


def test_render_and_mask(env):
    rgb, depth = env.render_image()
    assert rgb.shape == (128, 128, 3)
    mask = get_mask_from_depth(depth)
    frac = mask.mean()
    assert 0.01 < frac < 0.5  # cloth visible, not the whole frame
    # depth under the cloth ~ camera height minus cloth height
    cloth_depth = depth[mask > 0]
    assert np.all(cloth_depth < 0.996)
    assert abs(np.median(cloth_depth) - 0.65) < 0.05


def test_pixel_world_roundtrip(env):
    _, depth = env.render_image()
    mask = get_mask_from_depth(depth)
    ys, xs = np.nonzero(mask)
    mid = len(xs) // 2
    pixel = np.array([xs[mid], ys[mid]], float)
    world = env.get_world_coord_from_pixel(pixel, depth)
    pos = env.sim.get_positions()[:, :3]
    nearest = np.linalg.norm(pos - world, axis=1).min()
    assert nearest < 0.02  # unprojected pixel lands on the cloth


def test_pick_and_place_moves_corner():
    e = ClothEnv(render_dim=64, native=False, substeps=2, iterations=8)
    e.reset(square_cloth_config(16, 16), settle_steps=10)
    kps = e.get_square_keypoints_idx()
    before = e.get_keypoints(kps)
    e.pick_and_place_single(before[0].copy(), before[4].copy())
    after = e.get_keypoints(kps)
    d_before = np.linalg.norm(before[0][[0, 2]] - before[4][[0, 2]])
    d_after = np.linalg.norm(after[0][[0, 2]] - before[4][[0, 2]])
    assert d_after < 0.5 * d_before  # corner carried toward the center
    assert after[8][1] < 0.02  # opposite corner stayed down


def test_rotate_particles():
    e = ClothEnv(render_dim=64, native=False, substeps=2, iterations=8)
    e.reset(square_cloth_config(16, 12), settle_steps=5)
    pos0 = e.sim.get_positions()[:, :3]
    rotate_particles(e, [0, 90, 0])
    pos1 = e.sim.get_positions()[:, :3]
    # extents swap under a 90-degree yaw
    ext0 = pos0.max(0) - pos0.min(0)
    ext1 = pos1.max(0) - pos1.min(0)
    assert abs(ext0[0] - ext1[2]) < 1e-3 and abs(ext0[2] - ext1[0]) < 1e-3


def test_garment_keypoint_semantics():
    verts, faces, kp = tshirt_mesh()
    assert len(kp) == 8 and faces.min() >= 0 and faces.max() < len(verts)
    # left sleeve (2) left of right sleeve (5); shoulders (0, 1) above hems (6, 7)
    assert verts[kp[2], 0] < verts[kp[5], 0]
    assert verts[kp[0], 2] < verts[kp[6], 2]

    verts, faces, kp = trousers_mesh()
    assert len(kp) == 8
    xs = verts[np.asarray(kp[:4]), 0]
    assert np.all(np.diff(xs) > 0)  # waist keypoints ordered left -> right
    assert verts[kp[0], 2] < verts[kp[4], 2]  # waist above hem


@pytest.mark.parametrize("task", ["CornerFold", "TriangleFold", "StraightFold",
                                  "TshirtFold", "TrousersFold"])
def test_demonstrator_eval_structure(task):
    demo = Demonstrator[task]()
    args = (0,) if task == "StraightFold" else ()
    seen, unseen_instr, unseen_task = demo.get_eval_instruction(*args)
    n = len(demo.gammas)
    for regime in (seen, unseen_instr, unseen_task):
        assert len(regime["pick"]) == len(regime["place"]) == n
        assert len(regime["instructions"]) == len(regime["flags"]) == n
        assert all(isinstance(s, str) and len(s) > 10
                   for s in regime["instructions"])
    assert seen["pick"] == unseen_instr["pick"]  # same actions, new phrasing
    assert seen["instructions"] != unseen_instr["instructions"]


def test_straightfold_angle_modes():
    demo = Demonstrator["StraightFold"]()
    for mode in (0, 1, 2):
        seen, _, _ = demo.get_eval_instruction(mode)
        assert len(seen["pick"]) == 3


def test_cache_builder_square(tmp_path):
    from bifold_tpu.env.cache_builder import build_cache
    path = build_cache("Square", tmp_path, n_configs=2, settle_steps=10)
    import pickle
    with open(path, "rb") as f:
        data = pickle.load(f)
    assert len(data["configs"]) == len(data["states"]) == 2
    st = data["states"][0]
    assert st["particle_pos"].shape[1] == 4
    assert st["max_area"] > 0


def test_evaluator_one_trial(tmp_path):
    """Closed loop with a scripted center-pixel policy: runs end-to-end and
    records all metric streams."""
    from bifold_tpu.data.processor import Processor
    from bifold_tpu.env.action import Action
    from bifold_tpu.env.softgym_evaluator import SoftgymSingleEvaluator

    proc = Processor(
        {"model_image_size": 64, "text_encoder": None, "sigma": 5,
         "requires_graph": False, "spatial_augment": False, "strategy": "gmm",
         "mask_depth": True, "standardize_depth": False},
        partition="test", max_context_length=3)

    def policy(batch):
        mask = np.asarray(batch["mask"])[0, 0]
        ys, xs = np.nonzero(mask > 0)
        if len(xs) == 0:
            ys = xs = np.array([32])
        p = np.array([[xs.mean(), ys.mean()]])
        return Action(pick=p, place=p + 2), None

    ev = SoftgymSingleEvaluator(cache_dir=str(tmp_path), policy=policy,
                                processor=proc, image_size=64)
    ev.env = ClothEnv(render_dim=64, native=False, substeps=2, iterations=6)
    ev.K = ev.env.intrinsic_from_fov(64, 64)
    ev.error_threshold = ev.env.particle_radius * 2
    ev.evaluate(num_evals=1, task="CornerFold", seed=0)
    summary = ev.summary()
    assert "CornerFold si" in summary
    assert "error CornerFold si" in summary
    assert "average_success" in summary
    assert 0 <= summary["average_success"] <= 100


def test_oracle_pixel_roundtrip_consistency(tmp_path):
    """Geometric chain check: answering with the ground-truth keypoint action
    projected to pixels (then unprojected by the evaluator through the
    rendered depth) must track the oracle rollout to a few particle radii —
    validating camera matrices, rendering, unprojection, and the grasp
    primitive together."""
    from bifold_tpu.data.processor import Processor
    from bifold_tpu.env.action import Action
    from bifold_tpu.env.softgym_evaluator import SoftgymSingleEvaluator
    from bifold_tpu.ops.geometry import pixel_from_world

    res = 224
    proc = Processor({"model_image_size": res, "text_encoder": None, "sigma": 5,
                      "requires_graph": False, "spatial_augment": False,
                      "strategy": "gmm", "mask_depth": True,
                      "standardize_depth": False}, partition="test",
                     max_context_length=3)

    class PixelOracle:
        queue = None

        def __call__(self, batch):
            return self.queue.pop(0), None

    policy = PixelOracle()
    ev = SoftgymSingleEvaluator(cache_dir=str(tmp_path), policy=policy,
                                processor=proc, image_size=res)
    ev.env = ClothEnv(render_dim=res, substeps=2, iterations=8)
    ev.K = ev.env.intrinsic_from_fov(res, res)
    ev.error_threshold = ev.env.particle_radius * 2

    orig = ev.execute_model

    def execute_model(eval_data, keypoints_index, eval_index, eval_name, *a, **kw):
        class LazyQueue:
            def pop(self, _):
                kp = ev.env.get_keypoints(keypoints_index)
                i = len(ev.additional_metrics["error"][ev.task][eval_name])
                idx = i % len(eval_data["pick"])
                pick_pos = kp[eval_data["pick"][idx]]
                place_pos = pick_pos + eval_data["gammas"][idx] * (
                    kp[eval_data["place"][idx]] - pick_pos)

                def to_px(w):
                    uv = np.asarray(pixel_from_world(
                        w[None], ev.env.camera_matrix, ev.K))
                    return np.clip(uv[:, 0], 0, res - 1)

                return Action(pick=to_px(pick_pos)[None],
                              place=to_px(place_pos)[None])

        policy.queue = LazyQueue()
        return orig(eval_data, keypoints_index, eval_index, eval_name, *a, **kw)

    ev.execute_model = execute_model
    ev.evaluate(num_evals=1, task="CornerFold", seed=0)
    errors = ev.additional_metrics["error"]["CornerFold"]["si"]
    ious = ev.additional_metrics["iou"]["CornerFold"]["si"]
    # within a few particle radii throughout the 4-fold sequence; the first
    # fold's silhouette closely matches the oracle's (later folds compare
    # ever-smaller silhouettes, where small positional drift dominates IoU)
    assert max(errors) < 6 * ev.env.particle_radius, errors
    assert ious[0] > 55, ious


def test_trousers_closed_loop_oracle(tmp_path):
    """Garment-mesh closed loop: the TrousersFold oracle executes its
    3-action script on the procedural trousers mesh (dual-column fold then
    half fold) and meaningfully shrinks the silhouette."""
    from bifold_tpu.env.cache_builder import build_cache
    import pickle

    path = build_cache("Trousers", tmp_path, n_configs=1, settle_steps=20)
    with open(path, "rb") as f:
        cache = pickle.load(f)
    e = ClothEnv(render_dim=96, substeps=2, iterations=8)
    e.reset(cache["configs"][0], state=cache["states"][0], cloth3d=True,
            lift_height=0.15)
    kp_idx = cache["keypoints"][0]
    demo = Demonstrator["TrousersFold"]()
    seen, _, _ = demo.get_eval_instruction()

    _, depth0 = e.render_image()
    area0 = get_mask_from_depth(depth0).sum()
    for pick_i, place_i, gamma in zip(seen["pick"], seen["place"], seen["gammas"]):
        kp = e.get_keypoints(kp_idx)
        pick = kp[pick_i]
        place = pick + gamma * (kp[place_i] - pick)
        e.pick_and_place_single(pick.copy(), place.copy())
    _, depth1 = e.render_image()
    area1 = get_mask_from_depth(depth1).sum()
    assert area1 < 0.62 * area0, (area0, area1)  # folded at least ~40% smaller


def test_cloth3d_config_mesh_resolution(tmp_path, monkeypatch):
    """Reference-format CLOTH3D configs (cloth_index + $CLOTH3D_PATH) load."""
    from bifold_tpu.env.garments import tshirt_mesh
    from bifold_tpu.env.sim import grid_cloth

    verts, faces, _ = tshirt_mesh(resolution=17)
    obj_dir = tmp_path / "Trousers"
    obj_dir.mkdir()
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f " + " ".join(str(i + 1) for i in f) for f in faces]
    (obj_dir / "0003.obj").write_text("\n".join(lines))
    monkeypatch.setenv("CLOTH3D_PATH", str(tmp_path))

    e = ClothEnv(render_dim=64, substeps=2, iterations=6)
    cfg = square_cloth_config(2, 2)
    cfg.pop("ClothSize")
    cfg.update({"cloth_type": 1, "cloth_index": 3, "scale": 1.0, "rot": 0.0,
                "mass": 0.5})
    e.reset(cfg, cloth3d=True, settle_steps=3)
    assert len(e.sim.get_positions()) == len(np.unique(
        np.round(verts / 1e-6).astype(np.int64), axis=0))


def test_tshirt_closed_loop_oracle(tmp_path):
    """TshirtFold oracle script (both sleeves in, then hem-to-shoulders as
    two singles) executes on the procedural tshirt and shrinks the
    silhouette."""
    from bifold_tpu.env.cache_builder import build_cache
    import pickle

    path = build_cache("Tshirt", tmp_path, n_configs=1, settle_steps=20)
    with open(path, "rb") as f:
        cache = pickle.load(f)
    e = ClothEnv(render_dim=96, substeps=2, iterations=8)
    e.reset(cache["configs"][0], state=cache["states"][0], cloth3d=True,
            lift_height=0.125)
    kp_idx = cache["keypoints"][0]
    demo = Demonstrator["TshirtFold"]()
    seen, _, _ = demo.get_eval_instruction()

    _, depth0 = e.render_image()
    area0 = get_mask_from_depth(depth0).sum()
    for pick_i, place_i, gamma in zip(seen["pick"], seen["place"], seen["gammas"]):
        kp = e.get_keypoints(kp_idx)
        pick = kp[pick_i]
        place = pick + gamma * (kp[place_i] - pick)
        e.pick_and_place_single(pick.copy(), place.copy())
    _, depth1 = e.render_image()
    area1 = get_mask_from_depth(depth1).sum()
    assert area1 < 0.75 * area0, (area0, area1)
