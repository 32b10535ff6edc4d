"""Text normalisation and language auto-detection.

Behavior-compatible with the reference frontend (`text_utils.py:23-210`):
`punc_norm` cleans LLM-style punctuation; `detect_language` runs the same
three-stage cascade — Unicode script ranges, then diacritic scoring, then
accent-stripped stopword matching — over the 23 supported languages.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable, Optional

SUPPORTED_LANGUAGES = {
    "ar": "Arabic", "da": "Danish", "de": "German", "el": "Greek",
    "en": "English", "es": "Spanish", "fi": "Finnish", "fr": "French",
    "he": "Hebrew", "hi": "Hindi", "it": "Italian", "ja": "Japanese",
    "ko": "Korean", "ms": "Malay", "nl": "Dutch", "no": "Norwegian",
    "pl": "Polish", "pt": "Portuguese", "ru": "Russian", "sv": "Swedish",
    "sw": "Swahili", "tr": "Turkish", "zh": "Chinese",
}

_EMPTY_FALLBACK = "You need to add some text for me to talk."

_REPLACEMENTS = (
    ("...", ", "), ("…", ", "), (":", ","), (" - ", ", "), (";", ", "),
    ("—", "-"), ("–", "-"), (" ,", ","), ("“", '"'), ("”", '"'),
    ("‘", "'"), ("’", "'"),
)

_ENDERS = (".", "!", "?", "-", ",", "、", "，", "。", "？", "！")


_SEGMENT_ENDERS = (".", "!", "?", "。", "？", "！", ";", "；")


def split_segments(text: str, max_chars: int = 300,
                   min_chars: int = 12) -> list[str]:
    """Split text into sentence-ish segments for streaming synthesis.

    Splits after sentence enders (Latin + CJK), merges fragments shorter
    than `min_chars` into their successor, and hard-wraps runs longer than
    `max_chars` at the last space.  Segments concatenate back to the input
    (modulo surrounding whitespace)."""
    text = text.strip()
    if not text:
        return []
    parts: list[str] = []
    start = 0
    for i, ch in enumerate(text):
        if ch in _SEGMENT_ENDERS and (i + 1 == len(text)
                                      or text[i + 1] in (" ", "\n", "\t")
                                      or ord(ch) > 0x2000):
            seg = text[start:i + 1].strip()
            if seg:
                parts.append(seg)
            start = i + 1
    tail = text[start:].strip()
    if tail:
        parts.append(tail)
    # merge tiny fragments forward
    merged: list[str] = []
    for seg in parts:
        if merged and len(merged[-1]) < min_chars:
            merged[-1] = f"{merged[-1]} {seg}"
        else:
            merged.append(seg)
    if len(merged) > 1 and len(merged[-1]) < min_chars:
        merged[-2] = f"{merged[-2]} {merged[-1]}"
        merged.pop()
    # hard-wrap overlong runs at spaces
    out: list[str] = []
    for seg in merged:
        while len(seg) > max_chars:
            cut = seg.rfind(" ", min_chars, max_chars)
            if cut < 0:
                cut = max_chars
            out.append(seg[:cut].strip())
            seg = seg[cut:].strip()
        if seg:
            out.append(seg)
    return out


def punc_norm(text: str) -> str:
    """Normalise punctuation; capitalise; guarantee a sentence ender."""
    if not text:
        return _EMPTY_FALLBACK
    if text[0].islower():
        text = text[0].upper() + text[1:]
    text = " ".join(text.split())
    for old, new in _REPLACEMENTS:
        text = text.replace(old, new)
    text = text.rstrip(" ")
    if not text.endswith(_ENDERS):
        text += "."
    return text


# -- stage 1: script ranges --------------------------------------------------

_SCRIPTS: dict[str, tuple[tuple[int, int], ...]] = {
    "zh": ((0x4E00, 0x9FFF), (0x3400, 0x4DBF)),
    "ja": ((0x3040, 0x309F), (0x30A0, 0x30FF)),
    "ko": ((0xAC00, 0xD7AF),),
    "ru": ((0x0400, 0x04FF),),
    "el": ((0x0370, 0x03FF),),
    "ar": ((0x0600, 0x06FF), (0x0750, 0x077F)),
    "he": ((0x0590, 0x05FF),),
    "hi": ((0x0900, 0x097F),),
}

# -- stage 2: language-specific diacritics ----------------------------------

_DIACRITICS: dict[str, str] = {
    "es": "áéíóúüñ¡¿",
    "fr": "àâæçéèêëîïôœùûüÿ",
    "de": "äöüß",
    "it": "àèéìíîòóù",
    "pt": "áâãàéêíóôõúç",
    "pl": "ąćęłńóśźż",
    "sv": "åäö",
    "fi": "åäö",
    "da": "æøå",
    "no": "æøå",
    "tr": "çğıöşü",
}

# -- stage 3: accent-stripped stopwords --------------------------------------

_STOPWORDS: dict[str, tuple[str, ...]] = {
    "es": ("que", "de", "para", "como", "pero", "hola", "gracias", "cuando",
           "donde", "buenos", "tienes", "usted", "bienvenido", "buenas"),
    "fr": ("bonjour", "merci", "avec", "pour", "vous", "etre", "etes", "pas",
           "nous", "toujours", "aller"),
    "de": ("und", "nicht", "der", "die", "das", "aber", "danke", "bitte",
           "hallo", "mich", "doch"),
    "it": ("ciao", "grazie", "perche", "allora", "questo", "quello", "anche",
           "sempre", "sono", "bene"),
    "pt": ("ola", "obrigado", "voce", "nao", "porque", "tambem", "tudo",
           "bem", "vamos"),
    "nl": ("hallo", "dank", "als", "jij", "niet", "goed", "alstublieft",
           "gezellig"),
    "da": ("hej", "tak", "ikke", "bare", "mange", "venligst", "hvad"),
    "no": ("hei", "takk", "ikke", "bare", "mange", "venn", "hva", "hvordan"),
    "sv": ("hej", "tack", "inte", "bara", "manga", "snalla", "varsagod"),
    "fi": ("hei", "kiitos", "en", "olen", "paljon", "miksi", "kuinka",
           "ystava"),
    "pl": ("czesc", "dziekuje", "prosze", "jest", "nie", "dzien", "dobry",
           "jak", "dobrze"),
    "tr": ("merhaba", "tesekkur", "gorusuruz", "degil", "icin", "bunu",
           "sen", "ben", "kadar"),
    "ms": ("apa", "khabar", "selamat", "sudah", "tidak", "terima kasih",
           "saya", "anda", "kamu"),
    "sw": ("habari", "asante", "karibu", "rafiki", "safari", "wewe", "mimi",
           "sisi"),
}


def _strip_accents(s: str) -> str:
    return "".join(c for c in unicodedata.normalize("NFKD", s)
                   if not unicodedata.combining(c))


def _compile_stopword_patterns() -> dict[str, re.Pattern]:
    patterns = {}
    for lang, words in _STOPWORDS.items():
        cleaned = sorted({re.escape(_strip_accents(w.lower())) for w in words if w},
                         key=len, reverse=True)
        patterns[lang] = re.compile(r"(?<!\w)(?:" + "|".join(cleaned) + r")(?!\w)")
    return patterns


_STOPWORD_RE = _compile_stopword_patterns()


def detect_language(text: str, supported: Optional[Iterable[str]] = None,
                    default: str = "en") -> str:
    """Three-stage cascade; falls back to `default`."""
    langs = set(supported) if supported else set(SUPPORTED_LANGUAGES)
    if not langs:
        langs = {default}
    text = text.strip()
    if not text:
        return default if default in langs else sorted(langs)[0]

    # scripts
    counts: dict[str, int] = {}
    for ch in text:
        cp = ord(ch)
        for lang, ranges in _SCRIPTS.items():
            if lang in langs and any(lo <= cp <= hi for lo, hi in ranges):
                counts[lang] = counts.get(lang, 0) + 1
                break
    if counts:
        return max(counts, key=counts.get)

    # diacritics
    lower = text.lower()
    best, best_n = None, 0
    for lang, chars in _DIACRITICS.items():
        if lang not in langs:
            continue
        n = sum(lower.count(c) for c in chars)
        if n > best_n:
            best, best_n = lang, n
    if best:
        return best

    # stopwords
    normalized = _strip_accents(text).lower()
    best, best_n, best_matches = None, 0, []
    for lang, pattern in _STOPWORD_RE.items():
        if lang not in langs:
            continue
        matches = pattern.findall(normalized)
        if len(matches) > best_n:
            best, best_n, best_matches = lang, len(matches), matches
    if best is not None and best_n > 0:
        if best_n >= 2:
            return best
        longest = max((len(m.strip()) for m in best_matches), default=0)
        if longest >= 5 or len(normalized) >= 30:
            return best

    return default if default in langs else sorted(langs)[0]
