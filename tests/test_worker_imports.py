"""Fresh-interpreter entry-import test for every pipelines/queries_* module.

A Ray worker deserializing a closure entry-imports the closure's defining
module FIRST; if any pipeline module from-imports another pipeline module at
module scope (directly or at decoration time), the worker re-enters the
pipelines.queries import cycle and dies with `partially initialized module`
— exactly what broke `avg_upslope_flowpath` in CORRECTNESS_r03 (a warm
pytest session masks it because the package is already fully imported).
This test imports each module first in a clean subprocess, in parallel.
"""
from __future__ import annotations

import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import pytest

_PKG = Path(__file__).resolve().parents[1] / "whitebox_tools_ray"
_MODULES = sorted(
    f"whitebox_tools_ray.pipelines.{p.stem}"
    for p in (_PKG / "pipelines").glob("*.py")
    if p.stem != "__init__"
) + ["whitebox_tools_ray.pipelines.flagship"]


def _entry_import(mod: str) -> tuple[str, int, str]:
    r = subprocess.run(
        [sys.executable, "-c", f"import {mod}"],
        capture_output=True, text=True, timeout=300,
        cwd=str(_PKG.parent),
    )
    return mod, r.returncode, r.stderr[-2000:]


def test_every_pipeline_module_entry_imports_clean():
    with ThreadPoolExecutor(max_workers=16) as ex:
        results = list(ex.map(_entry_import, _MODULES))
    bad = [(m, err) for m, rc, err in results if rc != 0]
    assert not bad, "entry-import failures:\n" + "\n".join(
        f"--- {m}\n{err}" for m, err in bad)


def test_no_module_scope_cross_pipeline_imports():
    """Static guard: no `from .queries_*` / `from .flagship` at column 0."""
    offenders = []
    for p in (_PKG / "pipelines").glob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if line.startswith("from .queries_") or \
                    line.startswith("from .flagship"):
                offenders.append(f"{p.name}:{i}: {line}")
    assert not offenders, "\n".join(offenders)
