"""Interpreter-startup shim for the whole-CLI wire lane.

Imported automatically by the ``site`` module in EVERY process whose
PYTHONPATH contains this directory -- the CLI driver subprocess AND the
PySpark UDF worker daemons it forks. It appends the reference venv's
site-packages to the END of sys.path so the pure-Python openai SDK
stack (openai/httpx/httpcore/h11/anyio/distro -- absent natively)
becomes importable WITHOUT the venv's cp39-darwin compiled wheels
(pandas, numpy, ...) ever shadowing the native ones: an END-append
means the native interpreter's packages always win the lookup.

This replaces the broken round-6 approach of prepending the venv to
PYTHONPATH itself, which resolved ``import pandas`` in the driver to a
macOS/py39 binary wheel and crashed before Spark started.
"""

import sys

_REF = "/root/reference/.venv/lib/python3.9/site-packages"

if _REF not in sys.path:
    sys.path.append(_REF)
