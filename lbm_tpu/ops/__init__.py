from lbm_tpu.ops.fused_jnp import fused_step_single, fused_step_slab, make_single_step

__all__ = ["fused_step_single", "fused_step_slab", "make_single_step"]
