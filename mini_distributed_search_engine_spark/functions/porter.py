"""Porter stemmer (Porter 1980, release-4 semantics) — pure Python, vectorized.

Behavioral parity target: the public-domain tartarus PorterStemmer used by the
reference indexer (`Integration/src/cis5550/external/PorterStemmer.java`,
`Integration/src/cis5550/jobs/Indexer.java:173,186-189`). This is a fresh
implementation of the published algorithm (Porter, "An algorithm for suffix
stripping", Program 14(3), 1980, plus the release-3 departures bli->ble and
logi->log), written string-functionally rather than as a char-buffer port.

Words of length <= 2 are returned unchanged (the reference's ``if (k > 1)``
guard, PorterStemmer.java:359).

Vectorization: `stem_series` stems a pandas Series by stemming each *unique*
token once (vocabulary << token count in any real corpus), which keeps the
Arrow-batched pandas UDF path fast without per-row Python overhead per token
occurrence.
"""

from __future__ import annotations

import functools

_VOWELS = "aeiou"


class _Stemmer:
    """One stemming pass over a single lowercase word.

    State mirrors the published algorithm: ``b`` is the working buffer,
    ``k`` the index of its last live char, ``j`` the offset left of the
    candidate suffix set by ``ends``. The buffer is kept trimmed so that
    ``len(b) == k + 1`` always holds.
    """

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    # -- predicates ------------------------------------------------------
    def cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of VC sequences in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in "wxy"

    # -- buffer edits ----------------------------------------------------
    def ends(self, s: str) -> bool:
        length = len(s)
        o = self.k - length + 1
        if o < 0:
            return False
        if self.b[o : self.k + 1] != list(s):
            return False
        self.j = self.k - length
        return True

    def setto(self, s: str) -> None:
        self.b = self.b[: self.j + 1] + list(s)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    def _trim(self) -> None:
        self.b = self.b[: self.k + 1]

    # -- steps -----------------------------------------------------------
    def step1ab(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
            self._trim()
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
                self._trim()
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            self._trim()
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                self.k -= 1
                self._trim()
                if self.b[self.k] in "lsz":
                    self.b.append(self.b[self.k])
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.j = self.k
                self.setto("e")

    def step1c(self) -> None:
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    def step2(self) -> None:
        if self.k == 0:
            return
        c = self.b[self.k - 1]
        rules = {
            "a": (("ational", "ate"), ("tional", "tion")),
            "c": (("enci", "ence"), ("anci", "ance")),
            "e": (("izer", "ize"),),
            "l": (
                ("bli", "ble"),  # release-3 departure (was abli->able)
                ("alli", "al"),
                ("entli", "ent"),
                ("eli", "e"),
                ("ousli", "ous"),
            ),
            "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
            "s": (
                ("alism", "al"),
                ("iveness", "ive"),
                ("fulness", "ful"),
                ("ousness", "ous"),
            ),
            "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
            "g": (("logi", "log"),),  # release-3 departure
        }.get(c, ())
        for suffix, replacement in rules:
            if self.ends(suffix):
                self.r(replacement)
                return

    def step3(self) -> None:
        c = self.b[self.k]
        rules = {
            "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
            "i": (("iciti", "ic"),),
            "l": (("ical", "ic"), ("ful", "")),
            "s": (("ness", ""),),
        }.get(c, ())
        for suffix, replacement in rules:
            if self.ends(suffix):
                self.r(replacement)
                return

    def step4(self) -> None:
        if self.k == 0:
            return
        c = self.b[self.k - 1]
        suffixes = {
            "a": ("al",),
            "c": ("ance", "ence"),
            "e": ("er",),
            "i": ("ic",),
            "l": ("able", "ible"),
            "n": ("ant", "ement", "ment", "ent"),
            "o": ("ion", "ou"),
            "s": ("ism",),
            "t": ("ate", "iti"),
            "u": ("ous",),
            "v": ("ive",),
            "z": ("ize",),
        }.get(c, ())
        for suffix in suffixes:
            if self.ends(suffix):
                if suffix == "ion" and not (
                    self.j >= 0 and self.b[self.j] in "st"
                ):
                    continue
                if self.m() > 1:
                    self.k = self.j
                    self._trim()
                return

    def step5(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
                self._trim()
                # The Java original leaves the stripped 'e' in its buffer and
                # measures through it; a trailing vowel never completes a VC
                # pair, so re-anchoring j at the trimmed end is equivalent.
                self.j = self.k
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1
            self._trim()

    def run(self) -> str:
        if self.k > 1:
            self.step1ab()
            self.step1c()
            self.step2()
            self.step3()
            self.step4()
            self.step5()
        return "".join(self.b[: self.k + 1])


@functools.lru_cache(maxsize=1 << 20)
def porter_stem(word: str) -> str:
    """Stem one lowercase word; length <= 2 returned unchanged."""
    if len(word) <= 2:
        return word
    return _Stemmer(word).run()


def stem_series(tokens) -> "object":
    """Stem a pandas Series of tokens, one stem computation per unique value.

    Returns a same-index Series of stems. This is the body used inside the
    Arrow-batched pandas UDF (``no per-row Python`` discipline: one Python
    call per *unique* token per batch, not per row).
    """
    uniques = tokens.unique()
    mapping = {u: porter_stem(u) for u in uniques}
    return tokens.map(mapping)
