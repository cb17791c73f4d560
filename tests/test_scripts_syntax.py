"""Anti-rot: every scripts/*.py must at least parse.

The probe/protocol scripts are measurement records' executable
counterparts (BENCHMARKS/QUALITY cite them by name); they are not
imported by the package or the suite, so a stale API reference in one
would otherwise only surface when someone re-runs a measurement."""

import ast
import pathlib

import pytest

SCRIPTS = sorted(
    (pathlib.Path(__file__).parent.parent / "scripts").glob("*.py"))


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.name)
def test_script_parses(path):
    ast.parse(path.read_text(), filename=str(path))


def test_scripts_present():
    # the measurement scripts BENCHMARKS.md / QUALITY.md cite by name
    names = {p.name for p in SCRIPTS}
    for cited in ("probe_train_roofline.py", "probe_conv_width.py",
                  "hpo_shared_protocol.py", "hpo_sklearn_facade.py",
                  "probe_streaming.py", "probe_serving_dtypes.py"):
        assert cited in names, f"cited measurement script missing: {cited}"
