from lbm_tpu.parallel.mesh import make_row_mesh, row_sharding
from lbm_tpu.parallel.modes import StepProgram, build_sharded_program, build_single_program

__all__ = [
    "make_row_mesh",
    "row_sharding",
    "StepProgram",
    "build_sharded_program",
    "build_single_program",
]
