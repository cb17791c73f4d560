"""``python -m ocm_tpu`` entrypoint (see ocm_tpu/cli.py)."""

import sys

from ocm_tpu.cli import main

sys.exit(main())
