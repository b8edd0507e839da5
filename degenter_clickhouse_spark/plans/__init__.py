from . import (  # noqa: F401
    accounts,
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
