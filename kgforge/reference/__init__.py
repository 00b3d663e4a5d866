"""Single-threaded pure-Python reference emitter ("the oracle").

The distributed Ray pipeline is graded against this implementation:
byte-identical extracted text per url and triple P/R ≥ 0.95
(BASELINE.md). See `kgforge/reference/emitter.py`.
"""

from .emitter import ReferenceResult, run_reference  # noqa: F401
