"""Engine exception hierarchy.

The reference signals failures with return-dict ``success/error`` fields
(e.g. application/enhanced_query_service.py:29-51) plus a few raw
exceptions; we keep the result-contract style at the service layer
(plans/contracts.py) and use typed exceptions inside the engine.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine failures."""


class TableNotFoundError(EngineError):
    """Referenced table is not registered in the catalog."""


class SyncError(EngineError):
    """A sync pipeline failed after exhausting retries."""


class LockHeldError(EngineError):
    """Mutual-exclusion lock is held by another live process."""


class InvalidIntervalError(EngineError):
    """Unsupported or non-fixed-width time-bucket interval."""
