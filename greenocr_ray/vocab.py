"""Frozen character vocabulary + CTC-style codec.

Semantics follow the reference's fixed hand-assembled vocabulary and
CTC indexing convention (reference: ``exe_t.py:79-114``, ``train.py:133-164``):

- blank at index 0, characters indexed from 1;
- encoding silently drops characters that are not in the vocabulary
  (``exe_t.py:112-114``);
- greedy decode collapses repeats and drops blanks (``exe_t.py:420-427``);
- final text is whitespace-normalized (``exe_t.py:531-533``).

The engine restricts the *renderable* vocabulary to the deterministic
glyph atlas (ASCII letters/digits/punctuation + space); the full
reference vocabulary is kept for codec parity tests.
"""

from __future__ import annotations

import string

# Reference vocabulary, reproduced as data (exe_t.py:79). Order matters:
# it defines index assignment.
VOCAB: tuple[str, ...] = (
    ("<blank>",)
    + tuple("ÈĒĖēėěęĚĘëéèÉÊËðÐŊŋ")
    + tuple("£§êàâé£§⊥")
    + ("£", "ſ", "—", "“", "„", "’", "ô", "é")
    + tuple(string.ascii_letters + string.digits + string.punctuation + " ")
    + ("ä", "ö", "ü", "Ä", "Ö", "Ü", "ß", "å", "Å", "æ", "Æ", "ø", "Ø")
)

BLANK_INDEX = 0
NUM_CLASSES = len(VOCAB) + 1  # exe_t.py:81

# char -> index starting from 1 (0 reserved for blank), exe_t.py:95.
# Duplicated characters keep the LAST index (dict-comprehension semantics
# of the reference).
CHAR_TO_IDX: dict[str, int] = {c: i + 1 for i, c in enumerate(VOCAB)}
IDX_TO_CHAR: dict[int, str] = {i + 1: c for i, c in enumerate(VOCAB)}
IDX_TO_CHAR[BLANK_INDEX] = ""

# The reference's raison d'être is faded GERMANIC/NORDIC documents:
# its vocabulary (exe_t.py:79) carries the umlaut/Nordic set and the
# codec round-trips it, so the renderer/recognizer must read it too —
# an extraction engine that silently drops every umlaut is wrong on
# the reference's own target corpus.
NORDIC: str = "äöüÄÖÜßåÅæÆøØ"

# The subset the deterministic glyph renderer/recognizer supports.
# The atlas generator is codepoint-generic; every char here gets a
# deterministic glyph with guaranteed Hamming margin (glyphs.py).
RENDERABLE: str = (
    string.ascii_letters + string.digits + string.punctuation + " " + NORDIC
)


def encode_text(text: str) -> list[int]:
    """String -> index list; silently drops OOV chars (exe_t.py:112-114)."""
    return [CHAR_TO_IDX[c] for c in text if c in CHAR_TO_IDX]


def ctc_greedy_decode(indices: list[int], blank: int = BLANK_INDEX) -> list[int]:
    """Collapse repeats, drop blanks (exe_t.py:420-427)."""
    out: list[int] = []
    prev = None
    for p in indices:
        if p != prev and p != blank:
            out.append(p)
        prev = p
    return out


def indices_to_text(indices: list[int]) -> str:
    """Index sequence -> string via the vocab table (exe_t.py:98-104,528)."""
    return "".join(IDX_TO_CHAR.get(int(i), "?") for i in indices)


def normalize_whitespace(text: str) -> str:
    """Collapse all whitespace runs to single spaces (exe_t.py:531-533)."""
    return " ".join(text.split())
