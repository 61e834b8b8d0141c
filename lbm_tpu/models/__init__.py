from lbm_tpu.models.driver import RunConfig, RunResult, run_simulation
from lbm_tpu.models.variants import VARIANTS, resolve_variant

__all__ = ["RunConfig", "RunResult", "run_simulation", "VARIANTS", "resolve_variant"]
