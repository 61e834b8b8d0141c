from lbm_tpu.utils.timing import PhaseTimer
from lbm_tpu.utils.invariants import calc_reynolds, total_density

__all__ = ["PhaseTimer", "calc_reynolds", "total_density"]
