"""ctypes loader for the C++ simulator core (csrc/bifold_sim.cpp).

The reference's native layer is pybind11 over prebuilt FleX CUDA libs
(/root/reference/deps/PyFlex/bindings/pyflex.cpp). Ours is a small C ABI
(step + render over raw float buffers) so the binding needs no pybind11 —
ctypes on a `make -C csrc`-built shared object. Falls back to None (numpy
backend) when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["load_native", "NativeSim"]

_LIB_NAMES = ("libbifold_sim.so",)


def _find_library() -> Optional[Path]:
    env = os.environ.get("BIFOLD_SIM_LIB")
    if env and Path(env).exists():
        return Path(env)
    root = Path(__file__).resolve().parent.parent.parent
    for sub in ("csrc/build", "csrc", "."):
        for name in _LIB_NAMES:
            p = root / sub / name
            if p.exists():
                return p
    return None


class NativeSim:
    """Thin dispatcher: hands the sim's numpy buffers to the C core."""

    def __init__(self, lib: ctypes.CDLL):
        self.lib = lib
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.bifold_step.restype = ctypes.c_int
        lib.bifold_step.argtypes = [
            f32p, f32p, ctypes.c_int64,               # positions(N,4), velocities(N,3), N
            i64p, f32p, f32p, ctypes.c_int64,         # edges(E,2), rest(E), stiff(E), E
            f32p, f32p, ctypes.c_int64,               # sphere pos(S,14), radii(S), S
            ctypes.c_float, ctypes.c_float, ctypes.c_float,  # dt, damping, friction
            ctypes.c_int, ctypes.c_int, ctypes.c_float,      # substeps, iters, radius
            f32p, ctypes.c_float,                     # rest_positions(N,3), self_coll_dist
        ]
        lib.bifold_render_ex.restype = ctypes.c_int
        lib.bifold_render_ex.argtypes = [
            f32p, ctypes.c_int64,                     # positions(N,4), N
            i64p, ctypes.c_int64,                     # faces(F,3), F
            f32p,                                     # colors(N,3)
            f32p,                                     # world->camera 4x4 row major
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,  # fx fy u0 v0
            ctypes.c_int, ctypes.c_int,               # width height
            f32p,                                     # light_dir(3,) normalized
            ctypes.c_float, ctypes.c_float,           # ambient, diffuse
            ctypes.c_int,                             # smooth (0 flat, 1 smooth)
            f32p, f32p,                               # uvs(N,2) / texture(TH,TW,3), NULL ok
            ctypes.c_int, ctypes.c_int,               # tex_h, tex_w
            ctypes.POINTER(ctypes.c_uint8), f32p,     # out rgba, out depth
        ]

    @staticmethod
    def _ptr(arr, ctype):
        return arr.ctypes.data_as(ctypes.POINTER(ctype))

    def step(self, sim) -> bool:
        pos = np.ascontiguousarray(sim.positions, np.float32)
        vel = np.ascontiguousarray(sim.velocities, np.float32)
        edges = np.ascontiguousarray(sim.edges, np.int64)
        rest = np.ascontiguousarray(sim.rest_lengths, np.float32)
        stiff = np.ascontiguousarray(sim.stretch_stiffness, np.float32)
        sph = np.ascontiguousarray(sim.shape_states, np.float32)
        radii = np.ascontiguousarray(sim.shape_radii, np.float32)
        rest_pos = np.ascontiguousarray(sim.rest_positions, np.float32)
        use_self = (getattr(sim, "self_collision", False)
                    and len(rest_pos) == len(pos))
        ok = self.lib.bifold_step(
            self._ptr(pos, ctypes.c_float), self._ptr(vel, ctypes.c_float),
            len(pos),
            self._ptr(edges, ctypes.c_int64), self._ptr(rest, ctypes.c_float),
            self._ptr(stiff, ctypes.c_float), len(edges),
            self._ptr(sph, ctypes.c_float), self._ptr(radii, ctypes.c_float),
            len(radii),
            sim.dt, sim.damping, sim.ground_friction,
            sim.substeps, sim.iterations, sim.particle_radius,
            self._ptr(rest_pos, ctypes.c_float),
            sim.self_collision_dist if use_self else 0.0)
        if ok != 0:
            return False
        sim.positions = pos
        sim.velocities = vel
        return True

    def render(self, sim, width: int, height: int):
        from bifold_tpu.ops.geometry import intrinsic_from_fov
        if len(sim.faces) == 0:
            return None
        pos = np.ascontiguousarray(sim.positions, np.float32)
        faces = np.ascontiguousarray(sim.faces, np.int64)
        colors = np.ascontiguousarray(sim.colors, np.float32)
        m = np.ascontiguousarray(sim._camera_matrix(), np.float32)
        k = intrinsic_from_fov(height, width, fov=45)
        light = np.ascontiguousarray(sim.light_dir, np.float32)
        smooth = int(getattr(sim, "shading", "flat") == "smooth")
        uvs = tex = None
        th = tw = 0
        if sim.uvs is not None and sim.texture is not None:
            uvs = np.ascontiguousarray(sim.uvs, np.float32)
            tex = np.ascontiguousarray(sim.texture, np.float32)
            th, tw = tex.shape[:2]
        null_f32 = ctypes.POINTER(ctypes.c_float)()
        rgba = np.empty((height, width, 4), np.uint8)
        depth = np.empty((height, width), np.float32)
        ok = self.lib.bifold_render_ex(
            self._ptr(pos, ctypes.c_float), len(pos),
            self._ptr(faces, ctypes.c_int64), len(faces),
            self._ptr(colors, ctypes.c_float),
            self._ptr(m, ctypes.c_float),
            k[0, 0], k[1, 1], k[0, 2], k[1, 2],
            width, height,
            self._ptr(light, ctypes.c_float),
            float(sim.ambient), float(sim.diffuse), smooth,
            self._ptr(uvs, ctypes.c_float) if uvs is not None else null_f32,
            self._ptr(tex, ctypes.c_float) if tex is not None else null_f32,
            th, tw,
            rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._ptr(depth, ctypes.c_float))
        if ok != 0:
            return None
        return rgba, depth


def load_native() -> Optional[NativeSim]:
    path = _find_library()
    if path is None:
        return None
    try:
        return NativeSim(ctypes.CDLL(str(path)))
    except OSError:
        return None
