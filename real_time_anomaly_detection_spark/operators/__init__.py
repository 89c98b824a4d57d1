from . import audio_checks, drift, referential, stats, uniqueness  # noqa: F401
