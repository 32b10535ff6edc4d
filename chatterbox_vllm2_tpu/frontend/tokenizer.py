"""Text tokenizers for T3.

Capability parity with the reference's EnTokenizer / MTLTokenizer
(`models/t3/entokenizer.py`, `models/t3/mtltokenizer.py`), re-architected:
tokenizers run host-side in our frontend (the reference registers them
*inside* vLLM via TokenizerRegistry and smuggles a `<lang>` tag through the
prompt string, `tts.py:435-441` + `mtltokenizer.py:300-327`; our language id
is just an argument).

Vocab JSONs (`tokenizer.json` 704-vocab BPE for English;
`grapheme_mtl_merged_expanded_v1.json` 2454-vocab grapheme for the 23
languages) are checkpoint assets loaded by path — not shipped in this repo.

Per-language normalisation (multilingual):
  zh -> Cangjie codes (needs Cangjie5_TC.json asset; pkuseg segmentation used
        when installed, skipped otherwise — same fallback as the reference)
  ja -> kanji->hiragana via pykakasi when installed, else passthrough
  he -> diacritics via dicta_onnx when installed, else passthrough
  ko -> Hangul -> Jamo decomposition (pure python, always on)
  ru -> stress marks via russian_text_stresser when installed, else passthrough
"""

from __future__ import annotations

import json
import logging
import unicodedata
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

SOT = "[START]"
EOT = "[STOP]"
UNK = "[UNK]"
SPACE = "[SPACE]"


def _decompose_hangul(ch: str) -> str:
    """Hangul syllable -> Jamo (reference `mtltokenizer.py:106-124`)."""
    if not ("가" <= ch <= "힯"):
        return ch
    base = ord(ch) - 0xAC00
    initial = chr(0x1100 + base // (21 * 28))
    medial = chr(0x1161 + (base % (21 * 28)) // 28)
    final = chr(0x11A7 + base % 28) if base % 28 else ""
    return initial + medial + final


class CangjieConverter:
    """Chinese glyph -> Cangjie-code tokens (reference `mtltokenizer.py:146-220`)."""

    def __init__(self, mapping_path: Optional[str] = None):
        self.word2cj: dict[str, str] = {}
        self.cj2word: dict[str, list[str]] = {}
        self.segmenter = None
        if mapping_path and Path(mapping_path).exists():
            with open(mapping_path, encoding="utf-8") as fp:
                for entry in json.load(fp):
                    word, code = entry.split("\t")[:2]
                    self.word2cj[word] = code
                    self.cj2word.setdefault(code, []).append(word)
        try:
            from spacy_pkuseg import pkuseg  # optional

            self.segmenter = pkuseg()
        except Exception:
            self.segmenter = None

    def __call__(self, text: str) -> str:
        if self.segmenter is not None:
            text = " ".join(self.segmenter.cut(text))
        out = []
        for ch in text:
            if unicodedata.category(ch) == "Lo" and self.word2cj:
                code = self.word2cj.get(ch)
                if code is None:
                    out.append(ch)
                    continue
                idx = self.cj2word[code].index(ch)
                suffix = str(idx) if idx > 0 else ""
                out.append("".join(f"[cj_{c}]" for c in code + suffix) + "[cj_.]")
            else:
                out.append(ch)
        return "".join(out)


def _optional_normalizer(import_fn, label):
    try:
        return import_fn()
    except Exception:
        logger.warning("%s not available - normalisation skipped", label)
        return None


class SpeechTextTokenizer:
    """Unified tokenizer: English BPE or multilingual grapheme, chosen by vocab."""

    def __init__(self, vocab_file: str, multilingual: Optional[bool] = None,
                 cangjie_path: Optional[str] = None):
        from tokenizers import Tokenizer

        self.tok = Tokenizer.from_file(str(vocab_file))
        vocab = self.tok.get_vocab()
        assert SOT in vocab and EOT in vocab, "vocab missing [START]/[STOP]"
        self.vocab_size = self.tok.get_vocab_size()
        self.multilingual = (self.vocab_size > 704) if multilingual is None else multilingual
        self.sot_id = vocab[SOT]
        self.eot_id = vocab[EOT]
        self._cangjie = CangjieConverter(cangjie_path) if self.multilingual else None
        self._kakasi = None
        self._dicta = None
        self._stresser = None

    # -- per-language normalisation ----------------------------------------

    def _normalize(self, text: str, language_id: Optional[str]) -> str:
        text = unicodedata.normalize("NFKD", text.lower())
        if language_id == "zh" and self._cangjie is not None:
            text = self._cangjie(text)
        elif language_id == "ja":
            text = self._japanese(text)
        elif language_id == "he":
            text = self._hebrew(text)
        elif language_id == "ko":
            text = "".join(_decompose_hangul(c) for c in text).strip()
        elif language_id == "ru":
            text = self._russian(text)
        return text

    def _japanese(self, text: str) -> str:
        if self._kakasi is None:
            self._kakasi = _optional_normalizer(
                lambda: __import__("pykakasi").kakasi(), "pykakasi")
        if self._kakasi is None:
            return text
        out = []
        for r in self._kakasi.convert(text):
            orig, hira = r["orig"], r["hira"]
            if any(19968 <= ord(c) <= 40959 for c in orig):
                if hira and hira[0] in ("は", "へ"):
                    hira = " " + hira
                out.append(hira)
            else:
                out.append(orig)
        return unicodedata.normalize("NFKD", "".join(out))

    def _hebrew(self, text: str) -> str:
        if self._dicta is None:
            self._dicta = _optional_normalizer(
                lambda: __import__("dicta_onnx", fromlist=["Dicta"]).Dicta(),
                "dicta_onnx")
        return self._dicta.add_diacritics(text) if self._dicta else text

    def _russian(self, text: str) -> str:
        if self._stresser is None:
            def make():
                from russian_text_stresser.text_stresser import RussianTextStresser
                return RussianTextStresser()
            self._stresser = _optional_normalizer(make, "russian_text_stresser")
        return self._stresser.stress_text(text) if self._stresser else text

    # -- encode -------------------------------------------------------------

    def encode(self, text: str, language_id: Optional[str] = None) -> list[int]:
        """Raw text (WITHOUT markers) -> token ids, id-identical to the
        reference tokenizers fed the orchestrator's prompt string.

        English (reference `entokenizer.py:69-71`): `[START]text[STOP]` with
        spaces -> [SPACE]; the markers stay intact (special tokens 255 / 0).

        Multilingual (reference `mtltokenizer.py:288-327` + `tts.py:435-441`):
        the reference lowercases + NFKD-normalises the WHOLE prompt — markers
        included, so `[START]` becomes the literal characters `[start]` and is
        grapheme-tokenized as `[ st ar t ]` — then runs the per-language
        normalizer and prepends the `[lang]` tag BEFORE the (lowercased)
        start marker.  Quirky, but id-parity with the shipped checkpoints
        requires reproducing it exactly (verified token-for-token against the
        reference tokenizers in tests/test_tokenizer_parity.py).
        """
        if self.multilingual:
            body = self._normalize(f"{SOT}{text}{EOT}", language_id)
            if language_id:
                body = f"[{language_id.lower()}]{body}"
        else:
            body = f"{SOT}{text}{EOT}"
        return self.tok.encode(body.replace(" ", SPACE)).ids

    def decode(self, ids: list[int]) -> str:
        text = "".join(self.tok.id_to_token(i) or "" for i in ids)
        return (text.replace(" ", "").replace(SPACE, " ")
                .replace(SOT, "").replace(EOT, "").replace(UNK, ""))
