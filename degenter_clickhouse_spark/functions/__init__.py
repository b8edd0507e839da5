from . import business, hashing, parse  # noqa: F401
