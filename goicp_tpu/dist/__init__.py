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
]
