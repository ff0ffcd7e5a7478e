"""Engine error type for the user-facing API (reference: sedonadb._lib
SedonaError — the single exception class plan-build and execution errors
surface as)."""


class SedonaError(Exception):
    """Raised for plan-build and execution errors in the API layer."""
