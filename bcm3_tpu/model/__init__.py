from bcm3_tpu.model.variables import VariableSet
from bcm3_tpu.model.prior import Prior

__all__ = ["VariableSet", "Prior"]
