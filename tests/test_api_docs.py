"""docs/api.md freshness gate.

Regenerates the API reference in-memory and diffs against the committed
file, so signature or docstring-summary drift fails CI until
``python tools/gen_api_docs.py`` is re-run.
"""

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", REPO / "tools" / "gen_api_docs.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_api_docs_fresh():
    generator = _load_generator()
    want = generator.generate()
    got = (REPO / "docs" / "api.md").read_text()
    assert got == want, (
        "docs/api.md is stale — regenerate with `python tools/gen_api_docs.py`"
    )
