from bifold_tpu.env.action import DUMMY_PICK, Action

__all__ = ["Action", "DUMMY_PICK"]
