"""Character sets & confusion maps for the edit-distance transforms.

The reference parameterizes its edits with a flat charset — `letters` for
character columns, `0:9` for its "number" class
(`/root/reference/R/2_edit_distance_errors.R:20,58-60`). The north star
extends `repl`'s charset into *structured* confusions: keyboard-adjacency
typos and OCR confusions. Both are small driver-side dicts shipped inside
the pandas-UDF closure (the Spark analogue of broadcast lookup dims).
"""

from __future__ import annotations

LETTERS = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"

# QWERTY physical adjacency (lowercase letters + digits row).
KEYBOARD_ADJACENT: dict[str, str] = {
    "q": "wa12", "w": "qeas23", "e": "wrsd34", "r": "etdf45", "t": "ryfg56",
    "y": "tugh67", "u": "yihj78", "i": "uojk89", "o": "ipkl90", "p": "ol0",
    "a": "qwsz", "s": "awedxz", "d": "serfcx", "f": "drtgvc", "g": "ftyhbv",
    "h": "gyujnb", "j": "huikmn", "k": "jiolm", "l": "kop",
    "z": "asx", "x": "zsdc", "c": "xdfv", "v": "cfgb", "b": "vghn",
    "n": "bhjm", "m": "njk",
    "1": "2q", "2": "13qw", "3": "24we", "4": "35er", "5": "46rt",
    "6": "57ty", "7": "68yu", "8": "79ui", "9": "80io", "0": "9op",
}

# Classic OCR glyph confusions, single-char → candidate replacements.
OCR_CONFUSIONS: dict[str, str] = {
    "0": "o", "o": "0c", "1": "li", "l": "1i", "i": "1l",
    "5": "s", "s": "5", "8": "b", "b": "86", "6": "b",
    "2": "z", "z": "2", "9": "g", "g": "9q", "q": "g",
    "c": "eo", "e": "c", "u": "v", "v": "u", "n": "m", "m": "n",
    "a": "o", "d": "cl", "h": "b", "t": "f", "f": "t",
    "r": "n", "k": "x", "x": "k",
}

CHARSETS: dict[str, str] = {
    "letters": LETTERS,
    "digits": DIGITS,
    "alnum": LETTERS + DIGITS,
}

CONFUSION_MAPS: dict[str, dict[str, str]] = {
    "keyboard": KEYBOARD_ADJACENT,
    "ocr": OCR_CONFUSIONS,
}
