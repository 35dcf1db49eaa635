from .writers import Manifest, RunSink

__all__ = ["Manifest", "RunSink"]
