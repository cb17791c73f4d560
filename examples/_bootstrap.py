"""Example front-door bootstrap: import this FIRST in every example.

Two jobs, both needed for ``python examples/<name>.py`` to work bare —
from any cwd, without a pip install, and with the hosted-TPU tunnel down:

1. **sys.path**: insert the repo root (for ``ocm_tpu``) and the examples
   dir (for sibling helpers like ``_synthetic``) ahead of everything else.
   Running a file as a script only adds the script's own directory.

2. **TPU-outage fallback**: the axon site hook force-registers the hosted
   TPU and ``jax.devices()`` raises ``RuntimeError: Unable to initialize
   backend 'axon'`` when the tunnel is down — killing every example at
   first device use.  A failed plugin init is cached for the life of a
   process (the bench.py postmortem), so the probe runs in a SUBPROCESS;
   on failure this module pins the CPU backend via
   ``jax.config.update("jax_platforms", "cpu")`` — the config-update-
   after-import override (env var alone is ignored under the site hook).

Env knobs:
- ``OCM_EXAMPLES_PLATFORM=cpu``  pin CPU, skip the probe (fast path for
  scripted runs; ``JAX_PLATFORMS=cpu`` is honored the same way).
- ``OCM_EXAMPLES_PLATFORM=tpu``  skip the probe, use the default backend.
- ``OCM_EXAMPLES_PROBE_TIMEOUT_S``  probe subprocess timeout (default 90).
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
for _p in (_HERE, _ROOT):
    if _p not in sys.path:
        sys.path.insert(0, _p)


def _device_probe_ok(timeout_s: float) -> bool:
    """One subprocess probe of the default backend.  Subprocess, not
    try/except: a failed axon init is cached per-process, and we must not
    poison THIS process before the fallback config update can land."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s,
            env={k: v for k, v in os.environ.items()
                 if k != "OCM_EXAMPLES_PLATFORM"})
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _setup() -> None:
    want = os.environ.get("OCM_EXAMPLES_PLATFORM", "").strip().lower()
    if not want and os.environ.get("JAX_PLATFORMS", "").strip().lower() \
            == "cpu":
        want = "cpu"  # honor the user's env intent the site hook ignores
    if want not in ("cpu", "tpu", ""):
        raise SystemExit(f"OCM_EXAMPLES_PLATFORM={want!r}: want cpu|tpu")
    if want == "":
        timeout_s = float(os.environ.get("OCM_EXAMPLES_PROBE_TIMEOUT_S",
                                         "90"))
        if not _device_probe_ok(timeout_s):
            print("[_bootstrap] default backend unavailable (TPU tunnel "
                  "down?) — falling back to CPU", file=sys.stderr)
            want = "cpu"
    if want == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


_setup()
