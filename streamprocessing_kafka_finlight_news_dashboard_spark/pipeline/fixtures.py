"""Deterministic fixture generators for the reference-domain tables
(FIXTURES.md §1-2): news articles with nested publisher structs and
bursty per-ticker-day coverage, and weekday-only OHLCV price bars with
engineered stop-loss / take-profit moves. Seeded numpy → Arrow-backed
``spark.createDataFrame`` with explicit schemas (SURVEY §1.3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TICKERS = ["AAPL", "MSFT", "GOOGL", "AMZN", "NVDA", "META", "TSLA", "AVGO", "ORCL", "CRM"]

NEWS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "publisher",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("homepage_url", T.StringType()),
                    T.StructField("logo_url", T.StringType()),
                    T.StructField("favicon_url", T.StringType()),
                ]
            ),
        ),
        T.StructField("title", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("published_utc", T.TimestampType()),
        T.StructField("article_url", T.StringType()),
        T.StructField("tickers", T.ArrayType(T.StringType())),
        T.StructField("description", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("ticker_queried", T.StringType()),
    ]
)

PRICES_SCHEMA = T.StructType(
    [
        T.StructField("date", T.TimestampType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
    ]
)

_POS = ["strong gain as profit beats estimates", "record growth and bullish upgrade"]
_NEG = ["terrible loss after lawsuit and downgrade", "weak results crash the stock"]
_NEU = ["quarterly report released on schedule", "company holds annual meeting"]


def make_prices(
    spark: SparkSession,
    n_days: int = 400,
    start: str = "2024-01-01",
    seed: int = 7,
    tickers: list[str] | None = None,
) -> DataFrame:
    """Weekday-only positive random-walk closes; ticker[0] gets a -8%
    day (stop-loss trigger) and ticker[1] a +25% run (take-profit)."""
    rng = np.random.default_rng(seed)
    tickers = tickers or TICKERS
    days = pd.bdate_range(start=start, periods=n_days, tz=None)
    rows = []
    for ti, tk in enumerate(tickers):
        close = 100.0 * (1 + 0.1 * rng.random())
        for di, d in enumerate(days):
            drift = rng.normal(0.0005, 0.015)
            if tk == tickers[0] and di == 40:
                drift = -0.08
            if len(tickers) > 1 and tk == tickers[1] and 60 <= di < 70:
                drift = 0.025
            close = max(1.0, close * (1 + drift))
            spread = abs(rng.normal(0, 0.01)) * close
            rows.append(
                (
                    d.to_pydatetime(),
                    tk,
                    close * (1 + rng.normal(0, 0.003)),
                    close + spread,
                    max(0.5, close - spread),
                    close,
                    float(rng.integers(1_000_000, 50_000_000)),
                )
            )
    pdf = pd.DataFrame(rows, columns=["date", "ticker", "open", "high", "low", "close", "volume"])
    return spark.createDataFrame(pdf, schema=PRICES_SCHEMA)


def make_news(
    spark: SparkSession,
    n_articles: int = 4000,
    start: str = "2024-01-01",
    span_days: int = 550,
    seed: int = 11,
    tickers: list[str] | None = None,
    dup_url_frac: float = 0.02,
) -> DataFrame:
    """Bursty article stream: some ticker-days get >=7 articles, many
    get 0-2 (so MIN_NEWS_COUNT gates bite); ~2% duplicate article_urls
    (keep-last dedup, reference scripts/02_fetch_news.py:117-120);
    titles with clear positive/negative/neutral wording; occasional
    null titles/descriptions (coalesce path)."""
    rng = np.random.default_rng(seed)
    tickers = tickers or TICKERS
    t0 = pd.Timestamp(start)
    rows = []
    for i in range(n_articles):
        tk = tickers[int(rng.integers(len(tickers)))]
        # bursty: half the articles land in 10% of the days
        if rng.random() < 0.5:
            day = int(rng.integers(span_days))
        else:
            day = int(rng.choice(rng.integers(0, span_days, size=max(1, span_days // 10))))
        ts = t0 + pd.Timedelta(days=day, seconds=int(rng.integers(86_400)))
        mood = rng.random()
        pool = _POS if mood < 0.45 else (_NEG if mood < 0.75 else _NEU)
        title = f"{tk} {pool[int(rng.integers(len(pool)))]}"
        if rng.random() < 0.03:
            title = None
        desc = None if rng.random() < 0.25 else f"Details on {tk}: {pool[int(rng.integers(len(pool)))]}"
        url = f"https://news.example.com/{tk.lower()}/{i}"
        if rng.random() < dup_url_frac and i > 10:
            url = f"https://news.example.com/{tk.lower()}/{int(rng.integers(i))}"
        rows.append(
            (
                f"art-{i}",
                ("Wire " + str(int(rng.integers(5))), "https://w.example.com", None, None),
                title,
                f"author-{int(rng.integers(40))}",
                ts.to_pydatetime(),
                url,
                [tk] + ([tickers[int(rng.integers(len(tickers)))]] if rng.random() < 0.3 else []),
                desc,
                ["markets", tk.lower()],
                tk,
            )
        )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "id", "publisher", "title", "author", "published_utc",
            "article_url", "tickers", "description", "keywords", "ticker_queried",
        ],
    )
    return spark.createDataFrame(pdf, schema=NEWS_SCHEMA)
