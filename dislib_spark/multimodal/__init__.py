from dislib_spark.multimodal.binary import (
    MEDIA_SCHEMA, audio_windows, decode_features, decode_image, fake_decode, fake_pcm_decode, frame_sample,
    load_binary_dir, pgm_decode, pil_decode, soundfile_pcm_decode, wav_pcm_decode,
)
from dislib_spark.multimodal.imagemeta import (
    audio_meta, image_meta, parse_image_header, parse_mp4_header,
    parse_wav_header, video_meta,
)

__all__ = [
    "MEDIA_SCHEMA", "audio_windows", "decode_features", "decode_image", "fake_decode",
    "fake_pcm_decode", "pgm_decode", "pil_decode", "soundfile_pcm_decode", "wav_pcm_decode",
    "frame_sample", "load_binary_dir",
    "audio_meta", "image_meta", "parse_image_header", "parse_mp4_header",
    "parse_wav_header", "video_meta",
]
