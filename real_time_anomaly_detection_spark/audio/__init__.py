from . import codecs  # noqa: F401
