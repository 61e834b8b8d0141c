from lbm_tpu.core import lattice, oracle
from lbm_tpu.core.lattice import (
    CX,
    CY,
    NSPEEDS,
    OPP,
    W0,
    W1,
    W2,
    equilibrium_rest,
)

__all__ = [
    "lattice",
    "oracle",
    "CX",
    "CY",
    "NSPEEDS",
    "OPP",
    "W0",
    "W1",
    "W2",
    "equilibrium_rest",
]
