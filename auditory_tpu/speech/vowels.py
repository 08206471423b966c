"""Hillenbrand vowel corpus (American English vowels).

Analog of the reference ``speech/vowels`` package
(speech/vowels/vowels.go:24-115). See Hillenbrand et al. (1995, 2001);
wav files + docs at https://homepages.wmich.edu/~hillenbr/voweldata.html.
"""

from __future__ import annotations

from typing import List, Tuple

from . import Unit

__all__ = ["CATS", "load_transcription", "load_times", "idx_from_snd", "snd_from_idx"]

# the 12 vowel categories (vowels.go:25)
CATS = ["ae", "ah", "aw", "eh", "ei", "er", "ih", "iy", "oa", "oo", "uh", "uw"]


def load_transcription(fn: str) -> List[str]:
    """Space-split *last* line of the file (vowels.go:30-47)."""
    with open(fn, "r") as fp:
        s = ""
        for line in fp.read().split("\n"):
            if line:
                s = line
    return s.split(" ")


def load_times(fn: str, names: List[str]) -> List[Unit]:
    """Per-line '<start-s> <end-s>' times in seconds -> ms. Blank line stops
    parsing; lines starting with a backslash carry start/end *frequency*
    data and are skipped; parsing also stops once every name is consumed
    (vowels.go:50-91)."""
    units: List[Unit] = []
    with open(fn, "r") as fp:
        lines = fp.read().split("\n")
    i = 0
    for t in lines:
        if t == "":
            break
        if t.startswith("\\"):
            continue
        u = Unit()
        units.append(u)
        fields = t.split()
        try:
            u.start = float(fields[0]) * 1000.0
        except (ValueError, IndexError):
            pass
        try:
            u.end = float(fields[1]) * 1000.0
        except (ValueError, IndexError):
            pass
        u.name = names[i]
        i += 1
        if i == len(names):
            return units
    return units


def idx_from_snd(s: str, set_id: str = "") -> Tuple[int, bool]:
    """Index of the vowel in :data:`CATS`; ``set_id`` is ignored -- the
    corpus has no subsets (vowels.go:95-107)."""
    try:
        return CATS.index(s), True
    except ValueError:
        return -1, False


def snd_from_idx(idx: int, set_id: str = "") -> Tuple[str, bool]:
    """Vowel at ``idx`` in :data:`CATS`; ``set_id`` ignored
    (vowels.go:111-122)."""
    if 0 <= idx < len(CATS):
        return CATS[idx], True
    return "", False
