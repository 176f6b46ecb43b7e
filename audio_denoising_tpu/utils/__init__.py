from audio_denoising_tpu.utils.cache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
