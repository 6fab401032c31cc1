from goicp_tpu.dist.sharding import (
    make_mesh,
    sharded_evaluate_se3,
    sharded_bounds_step,
    sharded_icp_step,
    sharded_sse,
)

__all__ = [
    "make_mesh",
    "sharded_evaluate_se3",
    "sharded_bounds_step",
    "sharded_icp_step",
    "sharded_sse",
    "GoIcpSolverMultiHost",
]


def __getattr__(name):
    # lazy: multihost pulls in multihost_utils / distributed machinery that
    # single-process users never need
    if name == "GoIcpSolverMultiHost":
        from goicp_tpu.dist.multihost import GoIcpSolverMultiHost

        return GoIcpSolverMultiHost
    raise AttributeError(name)
