"""Documentation anti-rot: every ``ocm_tpu`` dotted path named in
docs/MIGRATION.md (and the README) must resolve to a real module/attr, so
the migration cookbook cannot silently drift from the API it documents."""

import importlib
import os
import re

import pytest

DOCS = ["docs/MIGRATION.md", "README.md", "docs/PARITY.md", "docs/API.md"]
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# dotted paths like ocm_tpu.models.simca.fit_simca / ocm_tpu.serving
PATTERN = re.compile(r"\bocm_tpu(?:\.[A-Za-z_][A-Za-z0-9_]*)+")


def _resolve(path: str) -> bool:
    parts = path.split(".")
    # find the longest importable module prefix, then walk attrs
    obj = None
    for i in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:i]))
            rest = parts[i:]
            break
        except ImportError:
            continue
    else:
        return False
    for attr in rest:
        if not hasattr(obj, attr):
            return False
        obj = getattr(obj, attr)
    return True


def _paths_in(doc: str):
    with open(os.path.join(ROOT, doc)) as f:
        text = f.read()
    return sorted(set(PATTERN.findall(text)))


@pytest.mark.parametrize("doc", DOCS)
def test_documented_symbols_resolve(doc):
    paths = _paths_in(doc)
    assert paths, f"{doc}: no ocm_tpu references found (pattern broken?)"
    missing = [p for p in paths if not _resolve(p)]
    assert not missing, f"{doc} references nonexistent symbols: {missing}"
