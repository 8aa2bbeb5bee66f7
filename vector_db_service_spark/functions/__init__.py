from . import similarity  # noqa: F401
