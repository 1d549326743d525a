"""Fallback VADER-style scorer: rule heuristics + distribution shape.

The reference's published corpus stats (todo/implementation_roadmap.md
Task 1.4: compound mean 0.433, 74.7% positive on title+description)
come from the full VADER lexicon on real financial news. The vendored
lexicon can't be bit-identical, but on a realistic positively-skewed
headline sample the fallback must reproduce the distribution SHAPE:
clearly positive mean, ~three-quarters positive share."""

from __future__ import annotations

from streamprocessing_kafka_finlight_news_dashboard_spark.functions.sentiment import (
    _fallback_compound as score,
)

# A financial-news-shaped headline sample: positively skewed the way
# wire coverage is (upgrades/beats dominate), with a negative tail.
HEADLINES = [
    "Shares surge after earnings beat estimates",
    "Analyst upgrades stock on strong growth outlook",
    "Record quarterly profit drives rally",
    "Company reports robust revenue growth",
    "Stock climbs on bullish guidance",
    "Dividend increase rewards shareholders",
    "Breakthrough product launch boosts confidence",
    "Shares advance as margins improve",
    "Outlook upbeat after successful expansion",
    "Strong demand lifts profits to record high",
    "Upgrade follows impressive earnings momentum",
    "Investors optimistic about recovery",
    "Buyback program signals confidence",
    "Partnership deal opens new opportunities",
    "Solid results exceed expectations",
    "Gains accelerate on positive sentiment",
    "Quarterly report released on schedule",
    "Company holds annual meeting",
    "Shares tumble after earnings miss",
    "Stock plunges on fraud investigation",
    "Lawsuit and downgrade weigh on shares",
    "Weak guidance sparks selloff",
    "Bankruptcy fears drive collapse",
    "Recession worries pressure markets",
]


def test_sign_and_rule_heuristics():
    assert score("good results") > 0
    assert score("bad results") < 0
    # negation flips within the 3-token window
    assert score("not good results") < 0
    assert score("no gain today") < 0
    # boosters intensify, dampeners soften
    assert score("very good results") > score("good results")
    assert score("slightly good results") < score("good results")
    # ALL-CAPS emphasis in mixed-case text
    assert score("GREAT results for the company") > score("great results for the company")
    # bounds and null safety
    assert score("") == 0.0
    assert -1.0 <= score("crash crash crash crash crash") <= 1.0


def test_headline_distribution_shape():
    scores = [score(h) for h in HEADLINES]
    nonzero = [s for s in scores if s != 0.0]
    # lexicon coverage: nearly every realistic headline hits the lexicon
    assert len(nonzero) >= len(HEADLINES) - 2
    mean = sum(scores) / len(scores)
    pct_pos = sum(1 for s in scores if s > 0.05) / len(scores)
    # shape of the reference's published distribution (mean 0.433,
    # 74.7% positive) — generous bands, not value parity
    assert 0.2 <= mean <= 0.6, mean
    assert 0.55 <= pct_pos <= 0.9, pct_pos


def test_fixture_pools_separate():
    from streamprocessing_kafka_finlight_news_dashboard_spark.pipeline import fixtures

    pos = [score(t) for t in fixtures._POS]
    neg = [score(t) for t in fixtures._NEG]
    assert min(pos) > 0.25
    assert max(neg) < -0.25
