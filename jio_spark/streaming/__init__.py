from .validate_stream import (decode_stream, stateful_violation_counts,
                              validate_stream)

__all__ = ["validate_stream", "stateful_violation_counts", "decode_stream"]
