"""English (Porter2) Snowball stemmer, implemented from scratch from the
published algorithm description at snowballstem.org/algorithms/english/stemmer.html.

The reference pipeline applies ``org.tartarus.snowball.ext.englishStemmer``
to every token after truncation
(/root/reference/src/main/java/it/unipi/utils/TextProcessingUtils.java:47-53);
this module reproduces that algorithm. Input tokens in the pipeline are
already lowercase ``[a-z0-9]+`` (the tokenizer strips everything else), but
the implementation is complete — apostrophe handling included — so it can be
validated against standard Porter2 vocabularies.

Pure Python by design: called only on the *unique* tokens of a batch (Zipf
skew makes that a small set) and memoised per worker, so it is never the
hot loop.
"""

from __future__ import annotations

VOWELS = frozenset("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDINGS = frozenset("cdeghkmnrt")

# exceptional forms checked before any processing
_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# invariant forms checked after step 1a
_EXCEPTION2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_STEP2_SUFFIXES = (
    # (suffix, replacement, condition) — scanned longest-first; the longest
    # matching suffix wins and if its R1/extra condition fails the whole step
    # fails (snowball `among` semantics: no backtracking to shorter entries).
    ("ization", "ize", None),
    ("ational", "ate", None),
    ("fulness", "ful", None),
    ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None),
    ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None),
    ("ation", "ate", None),
    ("alism", "al", None),
    ("aliti", "al", None),
    ("ousli", "ous", None),
    ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None),
    ("anci", "ance", None),
    ("abli", "able", None),
    ("izer", "ize", None),
    ("ator", "ate", None),
    ("alli", "al", None),
    ("bli", "ble", None),
    ("ogi", "og", "l"),     # only when preceded by l
    ("li", "", "li"),       # only when preceded by a valid li-ending
)

_STEP3_SUFFIXES = (
    ("ational", "ate", None),
    ("tional", "tion", None),
    ("alize", "al", None),
    ("icate", "ic", None),
    ("iciti", "ic", None),
    ("ative", "", "R2"),    # delete only if in R2
    ("ical", "ic", None),
    ("ness", "", None),
    ("ful", "", None),
)

_STEP4_SUFFIXES = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _mark_regions(word: str) -> tuple[int, int]:
    """Return (r1, r2) start offsets. R1 = after the first non-vowel that
    follows a vowel (special-cased gener/commun/arsen prefixes); R2 = the
    same rule applied within R1."""
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable: either (a) vowel followed
    by a non-vowel other than w/x/Y, preceded by a non-vowel, or (b) a vowel
    at the beginning of the word followed by a non-vowel."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and word[n - 1] not in VOWELS
            and word[n - 1] not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(segment: str) -> bool:
    return any(c in VOWELS for c in segment)


def stem(token: str) -> str:
    """Stem one lowercase token (Porter2 / Snowball English)."""
    word = token
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]
    if len(word) <= 2:
        return word

    # prelude: initial y and y-after-vowel become consonant Y
    y_found = False
    if word.startswith("y"):
        word = "Y" + word[1:]
        y_found = True
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
            y_found = True
    word = "".join(chars)

    r1, r2 = _mark_regions(word)

    # step 0: 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete s if a vowel exists before the penultimate character
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # step 1b
    if word.endswith(("eed", "eedly")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in VOWELS
    ):
        word = word[:-1] + "i"

    # step 2 (suffix must be in R1)
    for suf, repl, cond in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if cond == "l":
                    if len(word) > len(suf) and word[-len(suf) - 1] == "l":
                        word = word[: -len(suf)] + repl
                elif cond == "li":
                    if len(word) > len(suf) and word[-len(suf) - 1] in LI_ENDINGS:
                        word = word[: -len(suf)] + repl
                else:
                    word = word[: -len(suf)] + repl
            break

    # step 3 (suffix must be in R1; 'ative' additionally in R2)
    for suf, repl, cond in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if cond == "R2":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)] + repl
                else:
                    word = word[: -len(suf)] + repl
            break

    # step 4 (suffix must be in R2; 'ion' only after s/t)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
        word = word[:-1]

    if y_found:
        word = word.replace("Y", "y")
    return word
