"""DegenterEngine — the single entry point a user of the reference
backend would switch to.

Wraps a SparkSession + a table catalog (in-memory DataFrames or a
parquet/Delta storage directory) and exposes every serving surface the
reference offers: rollup refresh jobs, token lists, gainers/losers,
OHLCV with gap fill, trade feeds with router combining, swap routing,
holders/security, alert evaluation, and SQL over the canonical views.

``sql()`` queries see the base tables AND the decorrelated latest-row
views (latest_prices, latest_token_prices, latest_pool_state,
holders_counts) — user SQL therefore never needs the correlated
``ORDER BY updated_at DESC LIMIT 1`` pattern the reference's leftover
Postgres queries used (SURVEY.md §4): the view layer IS the rewrite
rule, applied by construction rather than by a Catalyst hook.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas as S
from .plans import (
    alerts as AL,
)
from .plans import (
    holders as H,
)
from .plans import (
    leaderboards as LB,
)
from .plans import (
    pool_matrix as PM,
)
from .plans import (
    security as SEC,
)
from .plans import (
    swap as SW,
)
from .plans import (
    token_matrix as TM,
)
from .plans import (
    tokens_api as TA,
)
from .plans import (
    trades_feed as TF,
)
from .plans import views
from .sources import blocks as BLK
from .operators.joins import dim_broadcast

BASE_TABLES = (
    "tokens",
    "pools",
    "trades",
    "prices",
    "pool_state",
    "ohlcv_1m",
    "exchange_rates",
    "holders",
)


class DegenterEngine:
    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        storage_dir: str | None = None,
    ):
        self.spark = spark
        self.tables: dict[str, DataFrame] = dict(tables or {})
        self.storage_dir = storage_dir
        if storage_dir:
            for name in BASE_TABLES:
                path = os.path.join(storage_dir, name)
                if os.path.exists(path) and name not in self.tables:
                    self.tables[name] = spark.read.parquet(path)
        self.ensure_minimal_dims()
        self.register_views()

    def ensure_minimal_dims(self) -> None:
        """An indexer-only storage dir has facts but no curated dims;
        synthesize them so the jobs/read layers run out of the box:
        tokens from the pool legs (exponent NULL -> the 6 fallback the
        display-scaling paths already apply), empty holders."""
        if "tokens" not in self.tables and "pools" in self.tables:
            pools = self.tables["pools"]
            if "base_denom" in pools.columns:
                legs = pools.select(
                    F.col("base_token_id").alias("token_id"),
                    F.col("base_denom").alias("denom"),
                ).unionByName(
                    pools.select(
                        F.col("quote_token_id").alias("token_id"),
                        F.col("quote_denom").alias("denom"),
                    )
                ).dropDuplicates(["token_id"])
                self.tables["tokens"] = legs.select(
                    "token_id",
                    "denom",
                    F.lit(None).cast("string").alias("type"),
                    F.lit(None).cast("string").alias("name"),
                    F.lit(None).cast("string").alias("symbol"),
                    F.lit(None).cast("string").alias("display"),
                    F.lit(None).cast("int").alias("exponent"),
                    F.lit(None).cast("string").alias("image_uri"),
                    F.lit(None).cast("string").alias("website"),
                    F.lit(None).cast("string").alias("twitter"),
                    F.lit(None).cast("decimal(38,0)").alias("max_supply_base"),
                    F.lit(None).cast("decimal(38,0)").alias("total_supply_base"),
                    F.lit(None).cast("boolean").alias("can_mint"),
                    F.lit(None).cast("boolean").alias("can_change_cap"),
                    F.lit(None).cast("string").alias("creator_address"),
                    F.lit(None).cast("timestamp").alias("created_at"),
                )
        if "holders" not in self.tables:
            self.tables["holders"] = self.spark.createDataFrame([], S.HOLDERS)

    # -- catalog -----------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    def set_table(self, name: str, df: DataFrame) -> None:
        self.tables[name] = df
        self.register_views()

    def register_views(self) -> None:
        for name, df in self.tables.items():
            df.createOrReplaceTempView(name)
        if "prices" in self.tables:
            views.latest_prices(self.tables["prices"]).createOrReplaceTempView(
                "latest_prices"
            )
            views.latest_token_prices(self.tables["prices"]).createOrReplaceTempView(
                "latest_token_prices"
            )
            views.latest_token_prices_all(
                self.tables["prices"]
            ).createOrReplaceTempView("latest_token_prices_all")
        if "pool_state" in self.tables:
            views.latest_pool_state(self.tables["pool_state"]).createOrReplaceTempView(
                "latest_pool_state"
            )
        if "holders" in self.tables:
            views.holders_counts(self.tables["holders"]).createOrReplaceTempView(
                "holders_counts"
            )

    def sql(self, query: str) -> DataFrame:
        """SQL over base tables + latest_* views. Reference-dialect
        correlated latest-row probes (``ORDER BY updated_at DESC LIMIT
        1``) are rewritten to the decorrelated views first — ported
        queries run verbatim (plans/rewrite.py)."""
        from .plans.rewrite import rewrite_correlated_latest

        return self.spark.sql(rewrite_correlated_latest(query))

    # -- ingest ------------------------------------------------------------

    def ingest_blocks(self, raw: DataFrame, router_addr: str | None = None) -> dict:
        out = BLK.ingest(
            raw,
            existing_pools=self.tables.get("pools"),
            existing_trades=self.tables.get("trades"),
            router_addr=router_addr,
            tokens_exp=self.tables.get("tokens"),
        )
        for name in ("pools", "trades", "prices", "pool_state", "ohlcv_1m"):
            if name in self.tables:
                self.tables[name] = self.tables[name].unionByName(
                    out[name], allowMissingColumns=True
                )
            else:
                self.tables[name] = out[name]
        self.register_views()
        return out

    # -- rollup jobs (the reference's 60 s loops) --------------------------

    def pool_matrix(self, bucket: str = "24h", now: Column | None = None) -> DataFrame:
        return PM.rollup(
            self.table("trades"),
            self.table("pools"),
            self.table("tokens"),
            self.table("prices"),
            self.table("pool_state"),
            self.table("ohlcv_1m"),
            now if now is not None else F.current_timestamp(),
            bucket,
        )

    def token_matrix(self, bucket: str = "24h", now: Column | None = None) -> DataFrame:
        return TM.rollup(
            self.table("trades"),
            self.table("pools"),
            self.table("tokens"),
            self.table("prices"),
            self.table("holders"),
            self.table("ohlcv_1m"),
            now if now is not None else F.current_timestamp(),
            bucket,
        )

    def leaderboard(self, bucket: str = "24h", now: Column | None = None) -> DataFrame:
        return LB.leaderboard(
            self.table("trades"),
            now if now is not None else F.current_timestamp(),
            PM.BUCKETS[bucket],
        )

    def large_trades(
        self, bucket: str = "24h", min_zig: float = 1000.0, now: Column | None = None
    ) -> DataFrame:
        return LB.large_trades(
            self.table("trades"),
            now if now is not None else F.current_timestamp(),
            PM.BUCKETS[bucket],
            min_zig,
        )

    def holder_stats(self) -> DataFrame:
        return H.holder_stats(self.table("holders"))

    def security_scan(self, now: Column | None = None) -> DataFrame:
        return SEC.scan(
            self.table("tokens"),
            self.table("holders"),
            now if now is not None else F.current_timestamp(),
        )

    # -- read side (the reference's REST surface) --------------------------

    def token_list(self, sort: str = "volume", desc: bool = True, limit: int = 50,
                   offset: int = 0, bucket: str = "24h",
                   now: Column | None = None) -> DataFrame:
        return TA.token_list(self.token_matrix(bucket, now), sort, desc, limit, offset)

    def gainers_losers(self, cutoff: Column, n: int = 10) -> DataFrame:
        """O5. When the catalog is backed by a day-partitioned ohlcv
        store, the change% legs ride backward day probes instead of a
        full-history scan: the plan only needs each native pool's
        latest bar and its latest bar at the cutoff, and substituting
        that dimension-sized union is exact (max-of-per-pool-maxima).
        This is the reference's ORDER BY pk DESC LIMIT 1 early-stop
        (api/util/pool-select.js:100-113) — Catalyst cannot stop a
        max_by early, so without it every /gainers call re-reads all
        of candle history."""
        src = self._ohlcv_change_source(cutoff)
        return TA.gainers_losers(
            src if src is not None else self.table("ohlcv_1m"),
            self.table("pools"),
            cutoff,
            n,
        )

    def _ohlcv_change_source(self, cutoff: Column) -> DataFrame | None:
        import glob

        if not self.storage_dir:
            return None
        path = os.path.join(self.storage_dir, "ohlcv_1m")
        if not (
            glob.glob(os.path.join(path, "__day=*"))
            or glob.glob(os.path.join(path, "dt=*"))
        ):
            return None
        from .operators.latest import latest_by_backscan

        uni = (
            self.table("pools")
            .filter(F.col("is_uzig_quote"))
            .select("pool_id")
        )
        last, _ = latest_by_backscan(
            self.spark, path, ["pool_id"], ["close"], ["bucket_start"], uni
        )
        # the prev-at-cutoff leg never finds anything in day partitions
        # newer than the cutoff's date — evaluate the cutoff once (a
        # one-row local job; it is an input-free expression) and hand
        # the backscan a hi_day so those probes are skipped outright
        # instead of each costing an empty scan + collect
        try:
            hi_day = (
                self.spark.range(1)
                .select(F.date_format(cutoff, "yyyy-MM-dd"))
                .first()[0]
            )
        except Exception:
            hi_day = None  # cutoff not evaluable standalone: probe all
        prev, _ = latest_by_backscan(
            self.spark, path, ["pool_id"], ["close"], ["bucket_start"], uni,
            where=F.col("bucket_start") <= cutoff,
            hi_day=hi_day,
        )
        return last.unionByName(prev)

    def native_pools_of(self, token_id: int) -> list[int]:
        rows = (
            self.table("pools")
            .filter(F.col("is_uzig_quote") & (F.col("base_token_id") == token_id))
            .select("pool_id")
            .collect()
        )
        return [r.pool_id for r in rows]

    def ohlcv(
        self,
        token_id: int,
        step_sec: int,
        ts_from: Column,
        ts_to: Column,
        fill: str = "prev",
        price_source: str = "all",
        pool_id: int | None = None,
        unit_zig_usd: Column | None = None,
        mcap_circ_disp: Column | None = None,
    ) -> DataFrame:
        """GET /tokens/:id/ohlcv (§3.3): pool-set selection ∈
        {all, pool, best} then the full resample/gap-fill pipeline.
        ``best`` stays fully relational: the winning pool (or the
        native-pool fallback when no pool simulates) is a one-row
        frame semi-joined against ohlcv_1m — no driver collect."""
        if price_source == "pool" and pool_id is not None:
            pool_ids: list[int] | DataFrame = [pool_id]
        elif price_source == "best":
            cands = SW.candidate_pools(
                self.table("pools"), self.table("tokens"), self.table("pool_state")
            ).filter(F.col("base_token_id") == token_id)
            best = SW.best_pool_by_simulation(cands, F.lit(100.0)).select("pool_id")
            native = (
                self.table("pools")
                .filter(F.col("is_uzig_quote") & (F.col("base_token_id") == token_id))
                .select("pool_id")
            )
            # fallback fires only when `best` is empty: an anti join on a
            # TRUE condition keeps the native rows iff best has no rows
            fallback = native.join(best, F.lit(True), "left_anti")
            pool_ids = best.unionByName(fallback)
        else:
            pool_ids = (
                self.table("pools")
                .filter(F.col("is_uzig_quote") & (F.col("base_token_id") == token_id))
                .select("pool_id")
            )
        return TA.ohlcv_series(
            self.table("ohlcv_1m"),
            pool_ids,
            step_sec,
            ts_from,
            ts_to,
            fill=fill,
            zig_usd=unit_zig_usd,
            circ_supply_disp=mcap_circ_disp,
        )

    def trades_feed(
        self,
        zig_usd: Column,
        combine_router: bool = True,
        ts_from: Column | None = None,
        ts_to: Column | None = None,
        **filters,
    ) -> DataFrame:
        """F2/F3 trades feed. ``ts_from``/``ts_to`` are the reference's
        from/to page bounds (api/routes/trades.js:62-69); they bound
        created_at AND statically prune the dt partition layout —
        without them a feed page plans and footer-reads every day
        partition of history (VERDICT r11 #1)."""
        t = self.table("trades").filter(F.col("action") == "swap")
        if ts_from is not None:
            t = views.prune_day_partition(t, lo=ts_from, day_col="dt").filter(
                F.col("created_at") >= ts_from
            )
        if ts_to is not None:
            t = views.prune_day_partition(t, hi=ts_to, day_col="dt").filter(
                F.col("created_at") <= ts_to
            )
        if "pool_id" in filters:
            t = t.filter(F.col("pool_id") == filters["pool_id"])
        if "token_id" in filters:
            # the reference's tokenId scope is the pool's BASE token
            # (api/routes/trades.js:740-742 `b.token_id = $n` through
            # tradesFromJoin's pools->base-token join): a token's feed
            # is every trade in a pool whose base is that token. A
            # dimension-sized broadcast semi-join keeps the fact scan
            # one-pass and prunes BEFORE shaping/combining.
            tok_pools = (
                self.table("pools")
                .filter(F.col("base_token_id") == filters["token_id"])
                .select("pool_id")
            )
            t = t.join(F.broadcast(tok_pools), "pool_id", "left_semi")
        if "signer" in filters:
            t = t.filter(F.col("signer") == filters["signer"])
        if "direction" in filters:
            t = t.filter(F.col("direction") == filters["direction"])
        shaped = TF.shape(
            t,
            self.table("tokens"),
            views.latest_token_prices(self.table("prices")),
            self.table("pools"),
            zig_usd,
        )
        return TF.combine_router_legs(shaped) if combine_router else shaped

    def best_route(self, amount_in_zig: float = 100.0, min_tvl_zig: float = 0.0) -> DataFrame:
        cands = SW.candidate_pools(
            self.table("pools"),
            self.table("tokens"),
            self.table("pool_state"),
            min_tvl_zig=min_tvl_zig,
        )
        return SW.best_pool_by_simulation(cands, F.lit(amount_in_zig))

    def swap_route(self, requests: DataFrame, min_tvl_zig: float = 0.0) -> DataFrame:
        """Two-hop TOKEN A -> uzig -> TOKEN B routing
        (api/routes/swap.js:284-350) for a whole batch of requests in
        one relational plan: ``requests`` carries (from_token_id,
        to_token_id, amount_in) plus any id columns. Pool mids come
        from the latest-prices view (the reference loads them from
        ``prices`` per pool, swap.js:66), falling back to the reserve
        ratio for pools that have never ticked."""
        cands = SW.candidate_pools(
            self.table("pools"),
            self.table("tokens"),
            self.table("pool_state"),
            min_tvl_zig=min_tvl_zig,
        )
        lp = views.latest_prices(self.table("prices")).select(
            "pool_id", F.col("latest_price_zig").alias("mid_zig")
        )
        reserve_mid = F.when(
            F.col("reserve_token") > 0, F.col("reserve_zig") / F.col("reserve_token")
        )
        cands = cands.join(dim_broadcast(lp), "pool_id", "left").withColumn(
            "mid_zig", F.coalesce(F.col("mid_zig"), reserve_mid)
        )
        return SW.route_via_uzig(requests, cands)

    def token_detail(self, token_id: int, bucket: str = "24h",
                     now: Column | None = None) -> DataFrame:
        """The token-page assembly (api/routes/tokens.js:822-894): one
        nested row — metadata struct, rollup stats, security, top-10
        holders array, pool list array. Nesting happens relationally
        (collect_list(struct)), never driver-side."""
        now = now if now is not None else F.current_timestamp()
        tok = self.table("tokens").filter(F.col("token_id") == token_id)
        tm = self.token_matrix(bucket, now).filter(F.col("token_id") == token_id)
        sec = SEC.scan(self.table("tokens"), self.table("holders"), now).filter(
            F.col("token_id") == token_id
        ).select("token_id", "score", "risk_flags", "top10_pct", "creator_pct")
        tops = (
            H.top_holders(self.table("holders"), k=10)
            .filter(F.col("token_id") == token_id)
            .groupBy("token_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("rank", "address", "balance_base"))
                ).alias("top_holders")
            )
        )
        pls = (
            self.table("pools")
            .filter(F.col("base_token_id") == token_id)
            .groupBy(F.col("base_token_id").alias("token_id"))
            .agg(
                F.collect_list(
                    F.struct("pool_id", "pair_contract", "pair_type", "is_uzig_quote")
                ).alias("pools")
            )
        )
        meta = tok.select(
            "token_id",
            F.struct("denom", "name", "symbol", "display", "exponent").alias("meta"),
        )
        return (
            meta.join(tm.drop("denom", "updated_at"), "token_id", "left")
            .join(dim_broadcast(sec), "token_id", "left")
            .join(dim_broadcast(tops), "token_id", "left")
            .join(dim_broadcast(pls), "token_id", "left")
        )

    def watchlist(self, wallet_id: int, bucket: str = "24h",
                  now: Column | None = None) -> DataFrame:
        from .plans import accounts

        return accounts.watchlist_view(
            self.table("watchlist"), self.token_matrix(bucket, now), wallet_id
        )

    def wallet_summary(self, address: str, bucket: str = "24h",
                       now: Column | None = None) -> DataFrame:
        from .plans import accounts

        return accounts.wallet_summary(
            self.table("trades"),
            address,
            now if now is not None else F.current_timestamp(),
            PM.BUCKETS[bucket],
        )

    def meta_refresh_queue(self, k: int = 3) -> DataFrame:
        from .plans import accounts

        return accounts.meta_refresh_queue(self.table("tokens"), k)

    # -- storage -----------------------------------------------------------

    def save(self, storage_dir: str) -> None:
        """Persist the catalog with the at-scale layout: fact tables
        partitioned by dt (partition pruning for every trailing-window
        read) and sorted within partitions by (pool_id, created_at) —
        the analogue of the reference's monthly RANGE partitions +
        B-tree indexes (phase3schema.sql:91-116)."""
        for name, df in self.tables.items():
            path = os.path.join(storage_dir, name)
            if name == "trades":
                (
                    df.withColumn("dt", F.to_date("created_at"))
                    .sortWithinPartitions("pool_id", "created_at")
                    .write.mode("overwrite")
                    .partitionBy("dt")
                    .parquet(path)
                )
            elif name == "ohlcv_1m":
                (
                    df.withColumn("dt", F.to_date("bucket_start"))
                    .sortWithinPartitions("pool_id", "bucket_start")
                    .write.mode("overwrite")
                    .partitionBy("dt")
                    .parquet(path)
                )
            else:
                df.write.mode("overwrite").parquet(path)

    def save_bucketed(
        self, n_buckets: int = 32, prefix: str = "degenter", path_dir: str | None = None
    ) -> dict[str, str]:
        """Bucketed fact layout for the 100 TB cluster: trades and
        ohlcv_1m hash-bucketed by pool_id (and sorted by time within
        buckets), so every per-pool rollup, OHLCV aggregation, and
        trades<->candles join reads co-located buckets and runs with NO
        shuffle — the scan itself reports HashPartitioning(pool_id) and
        Catalyst drops the Exchange. This is the Spark-native analogue
        of the reference's per-pool locality (ClickHouse ORDER BY
        (pool_id, ts) primary key, phase3schema.sql:91-116).

        Bucketing requires the table-catalog write path (saveAsTable);
        ``n_buckets`` should be sized so one bucket's hot window fits an
        executor (32 here; thousands on a real cluster). Returns
        {logical name: catalog table name}."""
        out: dict[str, str] = {}
        for name, time_col in (("trades", "created_at"), ("ohlcv_1m", "bucket_start")):
            if name not in self.tables:
                continue
            tbl = f"{prefix}_{name}_bucketed"
            w = (
                self.tables[name]
                .write.mode("overwrite")
                .format("parquet")
                .bucketBy(n_buckets, "pool_id")
                .sortBy("pool_id", time_col)
            )
            if path_dir is not None:
                w = w.option("path", os.path.join(path_dir, tbl))
            w.saveAsTable(tbl)
            out[name] = tbl
        return out

    def evaluate_alerts(
        self,
        alerts: DataFrame,
        now: Column | None = None,
        large_trades: DataFrame | None = None,
        signer_partials: DataFrame | None = None,
        max_wallet_window_min: int | None = None,
    ) -> DataFrame:
        """ST8 composite evaluation. ``large_trades`` /
        ``signer_partials`` substitute pre-aggregated inputs for the
        raw-trades legs (VERDICT r9 #2: the JobsRunner passes its CDC-
        or stream-maintained stores so the 10 s tick never scans the
        fact table): large_trade alerts then see only STORED rows —
        an alert min_zig below the store threshold sees store rows
        only, exactly like the reference's alerts querying its
        large_trades TABLE (jobs/alerts.js:71-81) — and wallet_trade
        counts ride the per-(signer, minute) partials at minute
        granularity."""
        now = now if now is not None else F.current_timestamp()
        lt = (
            large_trades
            if large_trades is not None
            else LB.large_trades(self.table("trades"), now, 1440, min_zig=0.0)
        )
        wallet = (
            AL.eval_wallet_trade_from_partials(
                alerts, signer_partials, now,
                max_since_min=max_wallet_window_min,
            )
            if signer_partials is not None
            else AL.eval_wallet_trade(alerts, self.table("trades"), now)
        )
        outs = [
            AL.eval_price_cross(alerts, self.table("prices"), now),
            wallet,
            AL.eval_large_trade(alerts, lt, now),
            AL.eval_tvl_change(alerts, self.table("pool_state"), None, now),
        ]
        if "price_ticks" in self.tables:  # optional extension kind
            outs.append(
                AL.eval_price_anomaly(
                    alerts,
                    self.table("price_ticks"),
                    now,
                    price_col="price_in_zig",
                    seq_col=None,
                )
            )
        fired = None
        for o in outs:
            o = o.select("alert_id", "kind", "fired_at")
            fired = o if fired is None else fired.unionByName(o)
        return fired
