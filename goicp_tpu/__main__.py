"""``python -m goicp_tpu <scenario.toml>`` — ≙ the reference binary's single
positional TOML argument (``src/main.cpp:33``)."""

import sys

from goicp_tpu.cli import main

sys.exit(main())
