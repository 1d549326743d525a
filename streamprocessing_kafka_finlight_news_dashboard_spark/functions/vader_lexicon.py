"""Vendored VADER-style valence lexicon + modifier word lists.

The reference scores news with the full VADER lexicon
(reference scripts/03_add_sentiment.py:10,28). The vaderSentiment
package is not installed in this container, so the fallback scorer in
``sentiment.py`` uses this vendored subset: ~400 words with valences
on VADER's published [-4, +4] scale (Hutto & Gilbert 2014, "VADER: A
Parsimonious Rule-based Model for Sentiment Analysis of Social Media
Text" — lexicon published under the MIT license), weighted toward the
finance/news vocabulary the reference's corpus actually exercises.
Values are the well-known published magnitudes where memorable
(good=1.9, great=3.1) and category-consistent approximations
elsewhere; exact-file parity is an environment limit, documented in
SURVEY §2.10 F1.

Also vendors VADER's published rule constants: booster/dampener
increments (B_INCR/B_DECR), the negation flip scalar (N_SCALAR) and
the ALL-CAPS emphasis increment (C_INCR).
"""

from __future__ import annotations

B_INCR = 0.293
B_DECR = -0.293
C_INCR = 0.733
N_SCALAR = -0.74
NORM_ALPHA = 15.0

NEGATIONS = frozenset(
    """never no nothing nowhere noone none not havent hasnt hadnt cant couldnt
    shouldnt wont wouldnt dont doesnt didnt isnt arent aint without rarely
    seldom despite""".split()
)

BOOSTERS: dict[str, float] = {
    # intensifiers
    "absolutely": B_INCR, "amazingly": B_INCR, "completely": B_INCR,
    "considerably": B_INCR, "decidedly": B_INCR, "deeply": B_INCR,
    "enormously": B_INCR, "especially": B_INCR, "exceptionally": B_INCR,
    "extremely": B_INCR, "greatly": B_INCR, "highly": B_INCR,
    "hugely": B_INCR, "incredibly": B_INCR, "intensely": B_INCR,
    "majorly": B_INCR, "more": B_INCR, "most": B_INCR, "much": B_INCR,
    "particularly": B_INCR, "purely": B_INCR, "quite": B_INCR,
    "really": B_INCR, "remarkably": B_INCR, "so": B_INCR,
    "substantially": B_INCR, "thoroughly": B_INCR, "totally": B_INCR,
    "tremendously": B_INCR, "unusually": B_INCR, "utterly": B_INCR,
    "very": B_INCR, "sharply": B_INCR, "significantly": B_INCR,
    "strongly": B_INCR, "massively": B_INCR, "wildly": B_INCR,
    # dampeners
    "almost": B_DECR, "barely": B_DECR, "hardly": B_DECR,
    "kinda": B_DECR, "less": B_DECR, "little": B_DECR,
    "marginally": B_DECR, "occasionally": B_DECR, "partly": B_DECR,
    "scarcely": B_DECR, "slightly": B_DECR, "somewhat": B_DECR,
    "mildly": B_DECR, "modestly": B_DECR,
}

LEXICON: dict[str, float] = {
    # --- general positive (VADER-scale magnitudes) ---
    "good": 1.9, "great": 3.1, "greater": 2.0, "greatest": 3.2,
    "excellent": 3.2, "excellence": 3.1, "positive": 2.3, "positively": 2.4,
    "perfect": 2.7, "perfectly": 3.2, "best": 3.2, "better": 1.9,
    "nice": 1.8, "amazing": 2.8, "awesome": 3.1, "fantastic": 2.6,
    "wonderful": 2.7, "superb": 3.1, "outstanding": 3.1, "impressive": 2.3,
    "impress": 2.1, "impressed": 2.1, "terrific": 2.1, "remarkable": 2.2,
    "love": 3.2, "loved": 2.9, "like": 1.5, "liked": 1.7, "likes": 1.6,
    "win": 2.8, "wins": 2.8, "winner": 2.8, "winning": 2.4, "won": 2.7,
    "success": 2.7, "successful": 2.8, "succeed": 2.2, "succeeded": 2.1,
    "happy": 2.7, "happier": 2.6, "glad": 2.0, "pleased": 1.9,
    "delight": 2.9, "delighted": 2.8, "exciting": 2.2, "excited": 2.3,
    "hope": 1.9, "hopeful": 2.0, "hopes": 1.7, "promising": 2.0,
    "confident": 2.2, "confidence": 2.3, "optimism": 2.4, "optimistic": 2.2,
    "strength": 1.9, "strengthen": 1.8, "strengthened": 1.8,
    "favorable": 2.0, "favourable": 2.0, "benefit": 1.9, "benefits": 1.8,
    "beneficial": 1.9, "advantage": 1.7, "advantages": 1.8,
    "improve": 1.9, "improved": 2.1, "improvement": 2.0, "improving": 1.9,
    "progress": 1.8, "achievement": 2.4, "achieve": 1.9, "achieved": 1.9,
    "reward": 2.2, "rewarded": 2.1, "rewarding": 2.3, "bonus": 2.4,
    "opportunity": 1.7, "opportunities": 1.6, "innovative": 2.2,
    "innovation": 1.9, "breakthrough": 2.3, "momentum": 1.3,
    "solid": 1.6, "healthy": 1.9, "robust": 1.9, "resilient": 1.7,
    "stable": 1.2, "stabilize": 1.2, "stabilized": 1.2,
    "support": 1.7, "supported": 1.6, "supportive": 1.9,
    "safe": 1.9, "safer": 1.9, "secure": 1.6, "secured": 1.5,
    "free": 2.3, "freedom": 2.2, "ease": 1.5, "easy": 1.9, "easier": 1.8,
    "clear": 1.2, "clarity": 1.4, "smart": 1.9, "wise": 2.1,
    "true": 1.6, "trust": 2.3, "trusted": 2.2, "trustworthy": 2.6,
    # --- finance/news positive ---
    "gain": 1.8, "gains": 1.8, "gained": 1.7, "gaining": 1.6,
    "profit": 2.1, "profits": 1.9, "profitable": 2.3, "profitability": 2.0,
    "growth": 1.9, "grow": 1.6, "grew": 1.5, "growing": 1.5,
    "strong": 2.0, "stronger": 2.1, "strongest": 2.3,
    "beat": 1.7, "beats": 1.7, "exceed": 1.8, "exceeded": 1.9,
    "exceeds": 1.8, "outperform": 2.1, "outperformed": 2.1,
    "surge": 2.0, "surges": 2.0, "surged": 2.0, "surging": 2.0,
    "rally": 1.8, "rallies": 1.8, "rallied": 1.8,
    "soar": 2.2, "soars": 2.2, "soared": 2.2, "soaring": 2.2,
    "jump": 1.4, "jumps": 1.4, "jumped": 1.4, "climb": 1.3,
    "climbs": 1.3, "climbed": 1.3, "advance": 1.3, "advanced": 1.2,
    "record": 1.5, "upgrade": 1.9, "upgraded": 1.9, "upgrades": 1.8,
    "bullish": 2.6, "bull": 1.4, "upbeat": 2.1, "upside": 1.6,
    "boom": 1.9, "booming": 2.2, "buyback": 1.3, "dividend": 1.2,
    "dividends": 1.2, "expansion": 1.5, "expand": 1.3, "expanding": 1.3,
    "recovery": 1.7, "recover": 1.4, "recovered": 1.6, "rebound": 1.7,
    "rebounds": 1.7, "rebounded": 1.7, "milestone": 1.8, "accelerate": 1.4,
    "accelerating": 1.5, "tailwind": 1.5, "tailwinds": 1.5,
    "overweight": 1.1, "buy": 1.3, "approval": 1.9, "approved": 1.9,
    "partnership": 1.4, "deal": 1.1, "launch": 1.1, "launches": 1.1,
    # --- general negative ---
    "bad": -2.5, "worse": -2.1, "worst": -3.1, "poor": -2.1,
    "poorly": -2.2, "terrible": -3.0, "terribly": -2.9, "awful": -2.8,
    "horrible": -2.5, "horribly": -2.8, "negative": -2.3,
    "negatively": -2.3, "fail": -2.5, "failed": -2.3, "failure": -2.6,
    "failures": -2.5, "failing": -2.2, "fails": -2.3,
    "lose": -2.0, "loses": -1.9, "loser": -2.5, "losing": -1.9,
    "lost": -1.3, "hate": -2.7, "hated": -2.8, "dislike": -1.6,
    "problem": -1.7, "problems": -1.7, "problematic": -1.9,
    "trouble": -2.0, "troubled": -1.9, "troubles": -1.9,
    "crisis": -3.1, "catastrophe": -3.4, "catastrophic": -2.2,
    "disaster": -3.1, "disastrous": -2.9, "chaos": -2.7, "panic": -2.6,
    "fear": -2.2, "fears": -1.9, "feared": -2.0, "afraid": -2.2,
    "worry": -1.9, "worried": -1.7, "worries": -1.8, "worrying": -1.9,
    "concern": -1.2, "concerns": -1.2, "concerned": -1.2,
    "doubt": -1.5, "doubts": -1.5, "doubtful": -1.6,
    "uncertain": -1.4, "uncertainty": -1.4, "risk": -1.1, "risks": -1.1,
    "risky": -1.6, "danger": -2.4, "dangerous": -2.2, "threat": -2.1,
    "threats": -2.0, "threatened": -2.0, "threatens": -1.9,
    "wrong": -2.1, "error": -1.7, "errors": -1.7, "mistake": -1.7,
    "mistakes": -1.8, "flaw": -1.8, "flaws": -1.8, "flawed": -2.0,
    "broken": -1.8, "break": -1.1, "breaks": -1.0, "damage": -2.2,
    "damaged": -1.9, "damaging": -2.1, "hurt": -2.1, "hurts": -1.9,
    "harm": -2.2, "harmful": -2.3, "harsh": -1.9, "severe": -1.8,
    "weakness": -1.8, "vulnerable": -1.6, "unstable": -1.7,
    "sad": -2.1, "angry": -2.3, "anger": -2.4, "upset": -1.8,
    "disappoint": -2.0, "disappointed": -2.2, "disappointing": -2.2,
    "disappointment": -2.2, "disappoints": -2.1,
    # --- finance/news negative ---
    "loss": -2.1, "losses": -2.1, "decline": -1.6, "declines": -1.5,
    "declined": -1.5, "declining": -1.6, "drop": -1.7, "drops": -1.6,
    "dropped": -1.6, "dropping": -1.6, "fall": -1.6, "falls": -1.5,
    "fell": -1.5, "falling": -1.6, "plunge": -2.2, "plunges": -2.2,
    "plunged": -2.2, "plunging": -2.2, "tumble": -1.9, "tumbles": -1.9,
    "tumbled": -1.9, "slump": -1.9, "slumps": -1.9, "slumped": -1.9,
    "slide": -1.3, "slides": -1.3, "slid": -1.3, "sink": -1.7,
    "sinks": -1.7, "sank": -1.7, "crash": -3.2, "crashes": -3.0,
    "crashed": -2.9, "collapse": -2.7, "collapsed": -2.6,
    "collapses": -2.6, "weak": -1.8, "weaker": -1.9, "weakest": -2.0,
    "weakened": -1.8, "miss": -1.6, "missed": -1.6, "misses": -1.6,
    "shortfall": -1.8, "deficit": -1.6, "debt": -1.3, "default": -2.1,
    "defaulted": -2.1, "bankruptcy": -2.9, "bankrupt": -2.8,
    "insolvent": -2.4, "downgrade": -1.9, "downgraded": -1.9,
    "downgrades": -1.8, "bearish": -2.6, "bear": -1.2, "downside": -1.5,
    "downturn": -1.9, "recession": -2.4, "slowdown": -1.6,
    "inflation": -1.1, "layoff": -2.2, "layoffs": -2.2, "fired": -2.1,
    "cuts": -1.2, "cut": -1.1, "cutback": -1.5, "cutbacks": -1.5,
    "fraud": -3.4, "fraudulent": -3.0, "scandal": -2.6, "scandals": -2.5,
    "lawsuit": -2.2, "lawsuits": -2.1, "sued": -2.0, "sue": -1.8,
    "probe": -1.3, "investigation": -1.4, "investigated": -1.4,
    "fine": -1.0, "fined": -1.6, "penalty": -1.7, "penalties": -1.7,
    "sanction": -1.6, "sanctions": -1.6, "recall": -1.5, "recalls": -1.5,
    "warning": -1.6, "warnings": -1.6, "warn": -1.4, "warns": -1.4,
    "warned": -1.4, "halt": -1.4, "halts": -1.4, "halted": -1.4,
    "suspend": -1.6, "suspended": -1.7, "delay": -1.3, "delays": -1.3,
    "delayed": -1.3, "headwind": -1.5, "headwinds": -1.5,
    "underperform": -1.9, "underperformed": -1.9, "sell": -0.9,
    "selloff": -2.0, "volatile": -1.3, "volatility": -1.2,
    "turmoil": -2.2, "pressure": -1.2, "pressured": -1.3,
    "disrupt": -1.5, "disruption": -1.5, "shortage": -1.6,
    "shortages": -1.6, "strike": -1.6, "strikes": -1.5,
}
