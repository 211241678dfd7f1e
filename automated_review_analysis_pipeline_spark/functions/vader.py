"""In-engine VADER sentiment scorer (reference C1, survey_analysis.py:118-129).

The reference's PRIMARY demo sentiment is the public VADER algorithm
(Hutto, C.J. & Gilbert, E.E. (2014). "VADER: A Parsimonious Rule-based
Model for Sentiment Analysis of Social Media Text", ICWSM-14; released as
the MIT-licensed ``vaderSentiment`` package, v3.3.2). This module is an
independent implementation of that published algorithm so the engine can
execute the C1 branch without the third-party package installed. Rule
constants (booster scalars, negation list, special-case idioms) are the
published empirical constants of the algorithm -- they ARE the spec, the
same way FILLER_VALUES and the demo keyword taxonomy are.

Parity contract: ``VaderScorer.polarity_scores`` must return the exact
dict vaderSentiment 3.3.2 returns for the same text -- INCLUDING its
order-of-operation quirks (the ``_but_check`` duplicate-value index
re-scan, the ``(never and so|this) or (so|this)`` precedence in the
3-back negation check, the spacing behavior of emoji substitution).
tests/test_vader.py pins this against the real package (imported from a
known site-packages path) on canonical sentences, the bundled survey
corpus, adversarial constructions, and hypothesis fuzz.

The word lexicon itself (~7 500 ``token\\tmean-valence`` rows) and the
emoji-description lexicon are DATA, not code, and are not vendored into
the repo: they are loaded at plan-build time on the driver from (in
order) an explicit path argument, the ``ARAP_VADER_LEXICON_DIR``
environment variable, or an importable ``vaderSentiment`` installation.
The loaded dicts ride the classify kernel's closure to executors --
~150 KB once per task deserialization, the same shipping model Spark uses
for any broadcast-small side input. With no lexicon available the caller
falls back to the tiny-lexicon branch, exactly like the reference when
``vaderSentiment`` is absent (survey_analysis.py:131-137).

Scale: scoring is per-string pure Python -- inherently the slow path, so
it runs ONLY inside Arrow-batched pandas UDFs and only on cache-miss
rows (the C7 anti-join collapses ~7x duplicate answers first).
"""

from __future__ import annotations

import math
import os
import string

__all__ = [
    "VaderScorer",
    "build_scorer",
    "discover_lexicon_dir",
    "load_emoji_lexicon",
    "load_lexicon",
]

# Empirical constants of the published algorithm (Hutto & Gilbert 2014).
B_INCR = 0.293
B_DECR = -0.293
C_INCR = 0.733          # ALL-CAPS emphasis
N_SCALAR = -0.74        # negation flip-and-dampen

NEGATE = frozenset([
    "aint", "arent", "cannot", "cant", "couldnt", "darent", "didnt",
    "doesnt", "ain't", "aren't", "can't", "couldn't", "daren't", "didn't",
    "doesn't", "dont", "hadnt", "hasnt", "havent", "isnt", "mightnt",
    "mustnt", "neither", "don't", "hadn't", "hasn't", "haven't", "isn't",
    "mightn't", "mustn't", "neednt", "needn't", "never", "none", "nope",
    "nor", "not", "nothing", "nowhere", "oughtnt", "shant", "shouldnt",
    "uhuh", "wasnt", "werent", "oughtn't", "shan't", "shouldn't", "uh-uh",
    "wasn't", "weren't", "without", "wont", "wouldnt", "won't",
    "wouldn't", "rarely", "seldom", "despite",
])

_INCR_WORDS = (
    "absolutely amazingly awfully completely considerable considerably "
    "decidedly deeply effing enormous enormously entirely especially "
    "exceptional exceptionally extreme extremely fabulously flipping "
    "flippin frackin fracking fricking frickin frigging friggin fully "
    "fuckin fucking fuggin fugging greatly hella highly hugely incredible "
    "incredibly intensely major majorly more most particularly purely "
    "quite really remarkably so substantially thoroughly total totally "
    "tremendous tremendously uber unbelievably unusually utter utterly "
    "very"
).split()
_DECR_WORDS = (
    "almost barely hardly kinda kindof kind-of less little marginal "
    "marginally occasional occasionally partly scarce scarcely slight "
    "slightly somewhat sorta sortof sort-of"
).split()
BOOSTER_DICT: dict[str, float] = {
    **{w: B_INCR for w in _INCR_WORDS},
    **{w: B_DECR for w in _DECR_WORDS},
    # multi-word dampeners (matched as n-grams in the idiom pass)
    "just enough": B_DECR, "kind of": B_DECR, "sort of": B_DECR,
}

SPECIAL_CASES: dict[str, float] = {
    "the shit": 3, "the bomb": 3, "bad ass": 1.5, "badass": 1.5,
    "bus stop": 0.0, "yeah right": -2, "kiss of death": -1.5,
    "to die for": 3, "beating heart": 3.5,
}

_PUNC = string.punctuation


# ---------------------------------------------------------------------------
# Lexicon loading / discovery
# ---------------------------------------------------------------------------

def load_lexicon(path: str) -> dict[str, float]:
    """``token<TAB>mean-valence`` rows -> dict (extra columns ignored)."""
    out: dict[str, float] = {}
    with open(path, encoding="utf-8") as f:
        for line in f.read().rstrip("\n").split("\n"):
            if not line:
                continue
            word, measure = line.strip().split("\t")[0:2]
            out[word] = float(measure)
    return out


def load_emoji_lexicon(path: str) -> dict[str, str]:
    """``emoji<TAB>description`` rows -> dict."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f.read().rstrip("\n").split("\n"):
            if not line:
                continue
            emoji, description = line.strip().split("\t")[0:2]
            out[emoji] = description
    return out


def discover_lexicon_dir() -> str | None:
    """Directory holding ``vader_lexicon.txt`` (+ optional emoji lexicon):
    ``ARAP_VADER_LEXICON_DIR`` env var first, then an importable
    ``vaderSentiment`` package. None when neither exists."""
    env_dir = os.environ.get("ARAP_VADER_LEXICON_DIR")
    if env_dir and os.path.isfile(os.path.join(env_dir, "vader_lexicon.txt")):
        return env_dir
    try:
        import importlib.util

        spec = importlib.util.find_spec("vaderSentiment")
        if spec and spec.submodule_search_locations:
            for loc in spec.submodule_search_locations:
                if os.path.isfile(os.path.join(loc, "vader_lexicon.txt")):
                    return loc
    except (ImportError, ValueError):
        pass
    return None


def build_scorer(lexicon_dir: str | None = None) -> "VaderScorer | None":
    """Load + construct a scorer from ``lexicon_dir`` (or discovery).
    Returns None when no lexicon can be found -- callers then take the
    tiny-lexicon fallback branch, mirroring the reference's optional
    import (survey_analysis.py:41-48)."""
    d = lexicon_dir or discover_lexicon_dir()
    if d is None:
        return None
    lex_path = os.path.join(d, "vader_lexicon.txt")
    if not os.path.isfile(lex_path):
        return None
    emoji_path = os.path.join(d, "emoji_utf8_lexicon.txt")
    emojis = load_emoji_lexicon(emoji_path) if os.path.isfile(emoji_path) \
        else {}
    return VaderScorer(load_lexicon(lex_path), emojis)


# ---------------------------------------------------------------------------
# Scorer
# ---------------------------------------------------------------------------

def _normalize(score: float, alpha: float = 15) -> float:
    norm = score / math.sqrt(score * score + alpha)
    return max(-1.0, min(1.0, norm))


def _strip_punc_if_word(token: str) -> str:
    # <=2 chars after stripping => likely an emoticon (":)" -> ""), keep raw
    stripped = token.strip(_PUNC)
    return token if len(stripped) <= 2 else stripped


def _tokenize(text: str) -> list[str]:
    return [_strip_punc_if_word(t) for t in text.split()]


def _is_cap_diff(tokens: list[str]) -> bool:
    """Some-but-not-all tokens are ALL CAPS."""
    n_upper = sum(1 for t in tokens if t.isupper())
    return 0 < len(tokens) - n_upper < len(tokens)


def _negated(words_lower: list[str]) -> bool:
    return any(w in NEGATE or "n't" in w for w in words_lower)


def _scalar_inc_dec(word: str, lower: str, valence: float,
                    is_cap_diff: bool) -> float:
    scalar = BOOSTER_DICT.get(lower, 0.0)
    if scalar:
        if valence < 0:
            scalar *= -1
        if word.isupper() and is_cap_diff:
            scalar += C_INCR if valence > 0 else -C_INCR
    return scalar


class VaderScorer:
    """Pure-Python VADER with exact vaderSentiment-3.3.2 score parity.

    Construct once per worker from plain lexicon dicts (picklable); each
    ``polarity_scores`` call is independent, so instances are thread-safe
    for scoring."""

    def __init__(self, lexicon: dict[str, float],
                 emojis: dict[str, str] | None = None):
        self.lexicon = lexicon
        self.emojis = emojis or {}

    # -- public ------------------------------------------------------------

    def polarity_scores(self, text: str) -> dict[str, float]:
        text = self._substitute_emojis(str(text))
        tokens = _tokenize(text)
        lower = [t.lower() for t in tokens]
        cap_diff = _is_cap_diff(tokens)

        sentiments: list[float] = []
        for i, item in enumerate(tokens):
            # standalone boosters and the "kind of" bigram head carry no
            # valence of their own even when the lexicon has them
            if lower[i] in BOOSTER_DICT or (
                i < len(tokens) - 1 and lower[i] == "kind"
                and lower[i + 1] == "of"
            ):
                sentiments.append(0.0)
                continue
            sentiments.append(
                self._token_valence(tokens, lower, cap_diff, i))

        self._but_rescale(lower, sentiments)
        return self._score_valence(sentiments, text)

    def compound(self, text: str) -> float:
        return self.polarity_scores(text)["compound"]

    # -- pipeline stages ---------------------------------------------------

    def _substitute_emojis(self, text: str) -> str:
        if not self.emojis:
            return text.strip()
        # parity quirk: a substituted description gets a space BEFORE it
        # (unless one is already there) but none after, fusing it with any
        # directly following character
        out: list[str] = []
        prev_space = True
        for ch in text:
            desc = self.emojis.get(ch)
            if desc is not None:
                if not prev_space:
                    out.append(" ")
                out.append(desc)
                prev_space = False
            else:
                out.append(ch)
                prev_space = ch == " "
        return "".join(out).strip()

    def _token_valence(self, tokens: list[str], lower: list[str],
                       cap_diff: bool, i: int) -> float:
        lex = self.lexicon
        item_low = lower[i]
        if item_low not in lex:
            return 0.0
        valence = lex[item_low]

        # "no" immediately before a lexicon word acts as a negator, not as
        # its own sentiment token
        if item_low == "no" and i != len(tokens) - 1 \
                and lower[i + 1] in lex:
            valence = 0.0
        if (i > 0 and lower[i - 1] == "no") \
                or (i > 1 and lower[i - 2] == "no") \
                or (i > 2 and lower[i - 3] == "no"
                    and lower[i - 1] in ("or", "nor")):
            valence = lex[item_low] * N_SCALAR

        if tokens[i].isupper() and cap_diff:
            valence += C_INCR if valence > 0 else -C_INCR

        for back in range(3):
            j = i - (back + 1)
            if i > back and lower[j] not in lex:
                s = _scalar_inc_dec(tokens[j], lower[j], valence, cap_diff)
                if s != 0 and back == 1:
                    s *= 0.95
                if s != 0 and back == 2:
                    s *= 0.9
                valence += s
                valence = self._negation_adjust(lower, back, i, valence)
                if back == 2:
                    valence = self._idiom_adjust(lower, i, valence)

        return self._least_adjust(lower, i, valence)

    def _negation_adjust(self, lower: list[str], back: int, i: int,
                         valence: float) -> float:
        if back == 0:
            if _negated([lower[i - 1]]):
                valence *= N_SCALAR
        elif back == 1:
            if lower[i - 2] == "never" and lower[i - 1] in ("so", "this"):
                valence *= 1.25
            elif lower[i - 2] == "without" and lower[i - 1] == "doubt":
                pass
            elif _negated([lower[i - 2]]):
                valence *= N_SCALAR
        else:
            # parity quirk (operator precedence in the published source):
            # (never AND so|this-at-2) OR (so|this-at-1) -- a bare
            # "so"/"this" one back triggers the 1.25 boost by itself
            if (lower[i - 3] == "never"
                    and (lower[i - 2] in ("so", "this"))) \
                    or (lower[i - 1] in ("so", "this")):
                valence *= 1.25
            elif lower[i - 3] == "without" and "doubt" in (
                    lower[i - 2], lower[i - 1]):
                pass
            elif _negated([lower[i - 3]]):
                valence *= N_SCALAR
        return valence

    def _idiom_adjust(self, lower: list[str], i: int,
                      valence: float) -> float:
        onezero = f"{lower[i - 1]} {lower[i]}"
        twoonezero = f"{lower[i - 2]} {lower[i - 1]} {lower[i]}"
        twoone = f"{lower[i - 2]} {lower[i - 1]}"
        threetwoone = f"{lower[i - 3]} {lower[i - 2]} {lower[i - 1]}"
        threetwo = f"{lower[i - 3]} {lower[i - 2]}"
        for seq in (onezero, twoonezero, twoone, threetwoone, threetwo):
            if seq in SPECIAL_CASES:
                valence = SPECIAL_CASES[seq]
                break
        if len(lower) - 1 > i:
            zeroone = f"{lower[i]} {lower[i + 1]}"
            if zeroone in SPECIAL_CASES:
                valence = SPECIAL_CASES[zeroone]
        if len(lower) - 1 > i + 1:
            zeroonetwo = f"{lower[i]} {lower[i + 1]} {lower[i + 2]}"
            if zeroonetwo in SPECIAL_CASES:
                valence = SPECIAL_CASES[zeroonetwo]
        # trailing booster n-grams ("sort of", ...) apply cumulatively
        for seq in (threetwoone, threetwo, twoone):
            if seq in BOOSTER_DICT:
                valence += BOOSTER_DICT[seq]
        return valence

    def _least_adjust(self, lower: list[str], i: int,
                      valence: float) -> float:
        lex = self.lexicon
        if i > 1 and lower[i - 1] not in lex and lower[i - 1] == "least":
            if lower[i - 2] != "at" and lower[i - 2] != "very":
                valence *= N_SCALAR
        elif i > 0 and lower[i - 1] not in lex and lower[i - 1] == "least":
            valence *= N_SCALAR
        return valence

    @staticmethod
    def _but_rescale(lower: list[str], sentiments: list[float]) -> None:
        """Halve pre-'but' scores, 1.5x post-'but' scores -- preserving the
        published implementation's list-rescan quirk: each positional value
        is located via first-match ``index``, so duplicate values re-edit
        the FIRST occurrence rather than their own slot."""
        if "but" not in lower:
            return
        bi = lower.index("but")
        # replicate `for sentiment in sentiments` over the mutating list
        k = 0
        while k < len(sentiments):
            sentiment = sentiments[k]
            si = sentiments.index(sentiment)
            if si < bi:
                sentiments[si] = sentiment * 0.5
            elif si > bi:
                sentiments[si] = sentiment * 1.5
            k += 1

    @staticmethod
    def _score_valence(sentiments: list[float],
                       text: str) -> dict[str, float]:
        if not sentiments:
            return {"neg": 0.0, "neu": 0.0, "pos": 0.0, "compound": 0.0}
        # punctuation emphasis: up to 4 "!", 2-3+ "?"
        ep = min(text.count("!"), 4) * 0.292
        qm_count = text.count("?")
        qm = 0.0
        if qm_count > 1:
            qm = qm_count * 0.18 if qm_count <= 3 else 0.96
        punct_amp = ep + qm

        sum_s = float(sum(sentiments))
        if sum_s > 0:
            sum_s += punct_amp
        elif sum_s < 0:
            sum_s -= punct_amp
        compound = _normalize(sum_s)

        pos_sum = sum(s + 1 for s in sentiments if s > 0)
        neg_sum = sum(s - 1 for s in sentiments if s < 0)
        neu_count = sum(1 for s in sentiments if s == 0)
        if pos_sum > math.fabs(neg_sum):
            pos_sum += punct_amp
        elif pos_sum < math.fabs(neg_sum):
            neg_sum -= punct_amp
        total = pos_sum + math.fabs(neg_sum) + neu_count
        return {
            "neg": round(math.fabs(neg_sum / total), 3),
            "neu": round(math.fabs(neu_count / total), 3),
            "pos": round(math.fabs(pos_sum / total), 3),
            "compound": round(compound, 4),
        }
