from . import boxes, coder  # noqa: F401
