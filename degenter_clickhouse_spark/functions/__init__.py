from . import business, parse  # noqa: F401
