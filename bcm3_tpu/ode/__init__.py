from bcm3_tpu.ode.dp5 import DP5Result, solve_at_times
from bcm3_tpu.ode import linear_pk

__all__ = ["DP5Result", "solve_at_times", "linear_pk"]
