"""Porter2 (Snowball English) stemmer vectors.

High-confidence pairs taken from the published algorithm description at
snowballstem.org/algorithms/english/stemmer.html (per-step examples and the
exceptional-form lists), plus structural property checks. The reference
applies org.tartarus.snowball.ext.englishStemmer to every token
(/root/reference/src/main/java/it/unipi/utils/TextProcessingUtils.java:47-53).
"""

from __future__ import annotations

import pytest

from invertedindex_ray.functions.porter2 import stem

EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

EXCEPTION2 = [
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
]

# (input, expected) — per-step examples from the algorithm description
VECTORS = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "tie"),
    ("cries", "cri"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("gas", "gas"),
    ("this", "this"),
    ("gaps", "gap"),
    ("kiwis", "kiwi"),
    # step 1b
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("cry", "cri"),
    ("by", "by"),
    ("say", "say"),
    ("happy", "happi"),
    ("apply", "appli"),
    ("fly", "fli"),
    # step 2
    ("relational", "relat"),
    ("conditional", "condit"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensibiliti", "sensibl"),
    ("joyfulli", "joy"),
    # step 3
    ("triplicate", "triplic"),
    ("formalize", "formal"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologous", "homolog"),
    ("activate", "activ"),
    ("effective", "effect"),
    # step 5
    ("cease", "ceas"),
    ("rate", "rate"),
    ("controll", "control"),
    ("roll", "roll"),
    # gener/commun/arsen region exception
    ("generate", "generat"),
    ("generates", "generat"),
    ("generated", "generat"),
    ("generating", "generat"),
    ("generously", "generous"),
    ("generally", "general"),
    # misc well-known behavior
    ("running", "run"),
    ("runner", "runner"),
    ("argument", "argument"),
    ("arguments", "argument"),
    ("knightly", "knight"),
    ("national", "nation"),
    ("dogs", "dog"),
    ("doing", "do"),
    ("meetings", "meet"),
    ("meeting", "meet"),
    ("was", "was"),
    ("is", "is"),
    ("be", "be"),
    ("a", "a"),
    ("ab", "ab"),
]


@pytest.mark.parametrize("word,expected", VECTORS, ids=[v[0] for v in VECTORS])
def test_vector(word, expected):
    assert stem(word) == expected


@pytest.mark.parametrize("word,expected", sorted(EXCEPTION1.items()))
def test_exception1(word, expected):
    assert stem(word) == expected


@pytest.mark.parametrize("word", EXCEPTION2)
def test_exception2_invariant(word):
    assert stem(word) == word


def test_short_words_unchanged():
    for w in ["a", "b", "ab", "is", "as", "x", ""]:
        assert stem(w) == w


def test_digits_pass_through():
    # pipeline tokens may contain digits; they act as consonants
    assert stem("123") == "123"
    assert stem("abc123") == "abc123"


def test_idempotent_on_common_words():
    # stemming a stem should be stable for typical index terms
    for w in ["run", "hope", "nation", "effect", "adopt", "condition"]:
        assert stem(stem(w)) == stem(w)


def test_y_consonant_marking():
    # initial y is a consonant: 'youth' keeps its y
    assert stem("young") == "young"
    # y after vowel is a consonant: 'boy' unchanged; 'enjoy' unchanged
    assert stem("boy") == "boy"
    assert stem("enjoy") == "enjoy"
    # y after consonant at end -> i
    assert stem("army") == "armi"
