from .validate_stream import stateful_violation_counts, validate_stream

__all__ = ["validate_stream", "stateful_violation_counts"]
