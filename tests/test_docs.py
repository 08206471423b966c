"""Documentation guards: generated API docs stay fresh, and the migration
guide's dotted symbol references actually resolve in the package."""

import importlib
import re
import subprocess
import sys


def test_api_docs_fresh():
    res = subprocess.run(
        [sys.executable, "tools/gen_api_docs.py", "--check"],
        capture_output=True, text=True, timeout=180, cwd=".",
    )
    assert res.returncode == 0, (
        "docs/API.md is stale -- run tools/gen_api_docs.py\n"
        + res.stdout + res.stderr
    )


import pytest


@pytest.mark.parametrize("doc", ["docs/MIGRATION.md", "docs/DEPLOYMENT.md"])
def test_doc_symbols_resolve(doc):
    """Every dotted `auditory_tpu...`/`dsp...` reference in the doc must
    resolve to a real module attribute (guards doc rot when symbols
    move)."""
    text = open(doc).read()
    pkg = importlib.import_module("auditory_tpu")
    pat = re.compile(
        r"`((?:auditory_tpu|dsp|speech|pipeline|nn|io|utils|config|parallel)"
        r"(?:\.\w+)+)"
    )
    failures = []
    for ref in sorted(set(pat.findall(text))):
        path = ref if ref.startswith("auditory_tpu") else "auditory_tpu." + ref
        parts = path.split(".")
        obj = None
        for split in range(len(parts), 0, -1):
            try:
                obj = importlib.import_module(".".join(parts[:split]))
            except ImportError:
                continue
            rest = parts[split:]
            try:
                for a in rest:
                    obj = getattr(obj, a)
            except AttributeError:
                obj = None
                continue
            break
        if obj is None:
            failures.append(ref)
    assert not failures, f"{doc} references unresolvable: {failures}"
