"""End-to-end optimizer pipelines (reference ``stable.py``,
``Lero/dynamic.py``, ``Lero/deployment.py``)."""

from .stable import run_stable  # noqa: F401
from .dynamic import run_dynamic  # noqa: F401
