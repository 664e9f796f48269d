"""Run snippets against the REFERENCE implementation in a subprocess.

The reference tree (/root/reference) needs plotting/ML libraries this
container doesn't have — but its numeric kernels are pure numpy/pandas.
This harness launches a subprocess that installs import stubs for the
missing GUI/ML libraries, puts the reference on sys.path, runs a snippet
and returns its printed JSON. Subprocess isolation keeps the stubbed
modules out of the test process.

Used to EXECUTE the reference's own algorithms as parity oracles (a
stronger check than reimplemented formula oracles): the engine's outputs
must match what the reference's code actually computes on the same
arrays.
"""

from __future__ import annotations

import json
import subprocess
import sys

_PRELUDE = r"""
import sys, types, importlib.abc, importlib.machinery

STUB_ROOTS = {"matplotlib", "scipy", "sklearn", "statsmodels", "xgboost",
              "shap", "lmfit", "joblib", "rich", "mpl_toolkits",
              "uncertainties", "plotly", "seaborn", "skimage", "PIL",
              "numba", "yellowbrick", "frozendict", "dtaidistance",
              "bokeh", "folium", "windrose", "plotnine", "polars"}

class _Dummy:
    def __init__(self, name="dummy"): self._name = name
    def __getattr__(self, item): return _Dummy(self._name + "." + item)
    def __call__(self, *a, **k): return _Dummy(self._name + "()")
    def __iter__(self): return iter(())
    def __mro_entries__(self, bases): return (object,)

class StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        m = types.ModuleType(spec.name)
        m.__getattr__ = lambda item, _n=spec.name: _Dummy(_n + "." + item)
        m.__path__ = []
        return m
    def exec_module(self, module): pass

class StubFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path, target=None):
        if fullname.split(".")[0] in STUB_ROOTS:
            return importlib.machinery.ModuleSpec(fullname, StubLoader())
        return None

sys.meta_path.insert(0, StubFinder())
import rich.console
class _Console:
    def __init__(self, *a, **k): pass
    def print(self, *a, **k): pass
    def rule(self, *a, **k): pass
rich.console.Console = _Console
sys.path.insert(0, "/root/reference")
import json
import numpy as np
import pandas as pd
"""


def run_reference(snippet: str, timeout: int = 300) -> dict:
    """Execute ``snippet`` after the stub prelude; the snippet must print
    ONE json line (``print(json.dumps(...))``). Returns the parsed dict."""
    proc = subprocess.run(
        [sys.executable, "-c", _PRELUDE + "\n" + snippet],
        capture_output=True, text=True, timeout=timeout,
    )
    lines = [l for l in proc.stdout.strip().splitlines()
             if l.startswith("{") or l.startswith("[")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"reference subprocess failed (rc={proc.returncode}):\n"
            f"{proc.stderr[-3000:]}")
    return json.loads(lines[-1])
