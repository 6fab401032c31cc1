"""``python -m goicp_tpu <scenario.toml>`` — ≙ the reference binary's single
positional TOML argument (``src/main.cpp:33``).

``python -m goicp_tpu serve <target>`` starts the target-resident
registration service (``goicp_tpu/serve.py``) — the serving surface the
single-shot reference binary lacks.
"""

import sys

if len(sys.argv) > 1 and sys.argv[1] == "serve":
    from goicp_tpu.serve import main

    sys.exit(main(sys.argv[2:]))

from goicp_tpu.cli import main

sys.exit(main())
