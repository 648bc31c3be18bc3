from dislib_spark.multimodal.binary import (
    MEDIA_SCHEMA, audio_windows, decode_features, decode_image, fake_decode, frame_sample, load_binary_dir,
)

__all__ = [
    "MEDIA_SCHEMA", "audio_windows", "decode_features", "decode_image", "fake_decode",
    "frame_sample", "load_binary_dir",
]
