from goicp_tpu.bnb.bounds import BoundsEvaluator, lattice_slack
from goicp_tpu.bnb.fullcert import register_full_cert
from goicp_tpu.bnb.solver import BnbParams, GoIcpResult, GoIcpSolver, make_solver, register

__all__ = [
    "BoundsEvaluator",
    "lattice_slack",
    "BnbParams",
    "GoIcpResult",
    "GoIcpSolver",
    "make_solver",
    "register",
    "register_full_cert",
]
