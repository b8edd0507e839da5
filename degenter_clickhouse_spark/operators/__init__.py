from . import dedupe, joins, latest, ohlcv, topk  # noqa: F401
