from .binary import (decode_image_stub, extract_features, frame_sample,
                     media_metadata, resize_stub)

__all__ = ["media_metadata", "decode_image_stub", "resize_stub",
           "extract_features", "frame_sample"]
