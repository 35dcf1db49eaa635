from .binary import (decode_image, decode_image_stub, decode_payload,
                     extract_features, frame_sample, media_metadata,
                     parse_bmp, parse_ppm, resize_stub, synth_bmp,
                     synth_pixels, synth_ppm)

__all__ = ["media_metadata", "decode_image", "decode_image_stub",
           "decode_payload", "parse_bmp", "parse_ppm", "resize_stub",
           "extract_features", "frame_sample", "synth_bmp", "synth_ppm",
           "synth_pixels"]
