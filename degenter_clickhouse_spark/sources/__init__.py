from . import blocks, csv_pools  # noqa: F401
