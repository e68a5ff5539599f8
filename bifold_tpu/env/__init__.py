"""Environment layer: Action type, cloth simulator, env, oracles, evaluators.

Counterpart of /root/reference/bifold/env/: the Action container, the
SoftGym-style cloth environment (bifold_tpu.env.cloth_env over the XPBD
simulator in bifold_tpu.env.sim), task demonstrators, and closed-loop
evaluators. Heavy submodules import lazily — `from bifold_tpu.env import
Action` must not pull in cv2/scipy."""

from bifold_tpu.env.action import DUMMY_PICK, Action

__all__ = ["Action", "DUMMY_PICK"]
