from goicp_tpu.core.config import Config, Mode
from goicp_tpu.core.logging import Logger, LogLevel, get_logger
from goicp_tpu.core.types import RigidTransform, CubeBatch, Bounds

__all__ = [
    "Config",
    "Mode",
    "Logger",
    "LogLevel",
    "get_logger",
    "RigidTransform",
    "CubeBatch",
    "Bounds",
]
