from . import dedupe, joins, latest, merge, ohlcv, topk  # noqa: F401
