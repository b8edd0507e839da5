from . import (  # noqa: F401
    alerts,
    holders,
    leaderboards,
    pool_matrix,
    security,
    swap,
    token_matrix,
    tokens_api,
    trades_feed,
    views,
)
