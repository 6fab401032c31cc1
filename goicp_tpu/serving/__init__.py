"""The serving package: resident-target registration over JSON lines.

- :mod:`goicp_tpu.serving.service` — resident state (targets, distance
  fields, normals, jitted tracking executables) and the solve methods.
- :mod:`goicp_tpu.serving.protocol` — wire encoding, request dispatch,
  stdio transport.
- :mod:`goicp_tpu.serving.tcp` — TCP transport with cross-connection
  micro-batching and token authentication.
- :mod:`goicp_tpu.serving.cli` — the ``python -m goicp_tpu serve`` entry.

``goicp_tpu.serve`` re-exports this surface (the original single-module
home; both import paths are stable).
"""

from goicp_tpu.serving.cli import main
from goicp_tpu.serving.protocol import handle_request, serve_stdio
from goicp_tpu.serving.service import MultiTargetService, RegistrationService
from goicp_tpu.serving.tcp import Batcher, serve_tcp

__all__ = [
    "Batcher",
    "MultiTargetService",
    "RegistrationService",
    "handle_request",
    "main",
    "serve_stdio",
    "serve_tcp",
]
