from .validate_stream import validate_stream

__all__ = ["validate_stream"]
