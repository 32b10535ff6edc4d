"""Token-id parity against the REFERENCE tokenizers on the REAL vocabs.

Loads the reference's `EnTokenizer` / `MTLTokenizer` (pure Python,
`entokenizer.py` / `mtltokenizer.py`) straight from /root/reference by file
path, feeds them the exact prompt strings the reference orchestrator builds
(`tts.py:435-441`: "<lang>" + "[START]" + punc_norm(text) + "[STOP]"), and
asserts our `SpeechTextTokenizer.encode` returns identical ids — including
the reference's quirks (markers lowercased + grapheme-split in the MTL path,
[lang] tag first).  Inputs: the shipped benchmark texts
(`docs/benchmark-text-*.txt`) plus ko/ru/he/ja snippets.  VERDICT r3 item 5.

Skipped when the reference checkout isn't present (e.g. CI without the
sandbox mount).
"""

import importlib.util
import logging
import sys
import warnings
from pathlib import Path

import pytest

REF = Path("/root/reference/src/chatterbox_vllm")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not available")

from chatterbox_vllm2_tpu.frontend.text import punc_norm
from chatterbox_vllm2_tpu.frontend.tokenizer import SpeechTextTokenizer


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_tokenizers():
    logging.disable(logging.WARNING)
    warnings.filterwarnings("ignore")
    ent = _load("ref_entok", REF / "models/t3/entokenizer.py")
    mtlt = _load("ref_mtltok", REF / "models/t3/mtltokenizer.py")
    en = ent.EnTokenizer(vocab_file=str(REF / "models/t3/tokenizer.json"))
    mtl = mtlt.MTLTokenizer(
        vocab_file_path=str(REF / "models/t3/grapheme_mtl_merged_expanded_v1.json"))
    logging.disable(logging.NOTSET)
    return en, mtl


@pytest.fixture(scope="module")
def ours():
    en = SpeechTextTokenizer(str(REF / "models/t3/tokenizer.json"),
                             multilingual=False)
    mtl = SpeechTextTokenizer(
        str(REF / "models/t3/grapheme_mtl_merged_expanded_v1.json"),
        multilingual=True)
    return en, mtl


def _ref_ids(tok, prompt):
    return [tok._convert_token_to_id(t) for t in tok._tokenize(prompt)]


def _bench_text(name, limit=600):
    p = Path("/root/reference/docs") / name
    return p.read_text(encoding="utf-8")[:limit]


EN_TEXTS = [
    "Hello world, this is a TEST.",
    "Dr. Smith's 2nd opinion: “don't panic” — it costs $3.50!",
    _bench_text("benchmark-text-1.txt"),
    _bench_text("benchmark-text-2.txt"),
]

MTL_CASES = [
    ("en", _bench_text("benchmark-text-1.txt")),
    ("fr", _bench_text("benchmark-text-fr-1.txt")),
    ("zh", _bench_text("benchmark-text-zh-1.txt", 200)),
    ("es", "Hola, ¿cómo estás? ¡Muy bien!"),
    ("de", "Straße, über, schön — ganz GROSS."),
    ("ko", "안녕하세요, 반갑습니다."),
    ("ru", "Привет, как дела?"),
    ("he", "שלום עולם!"),
    ("ja", "こんにちは、世界！"),
    (None, "No language tag at all."),
]


@pytest.mark.parametrize("i", range(len(EN_TEXTS)))
def test_english_parity(ref_tokenizers, ours, i):
    ref_en, _ = ref_tokenizers
    our_en, _ = ours
    text = punc_norm(EN_TEXTS[i])
    want = _ref_ids(ref_en, f"[START]{text}[STOP]")
    got = our_en.encode(text)
    assert got == want


@pytest.mark.parametrize("lang,raw", MTL_CASES,
                         ids=[str(l) for l, _ in MTL_CASES])
def test_multilingual_parity(ref_tokenizers, ours, lang, raw):
    _, ref_mtl = ref_tokenizers
    _, our_mtl = ours
    text = punc_norm(raw)
    prompt = (f"<{lang}>" if lang else "") + f"[START]{text}[STOP]"
    want = _ref_ids(ref_mtl, prompt)
    got = our_mtl.encode(text, language_id=lang)
    assert got == want, (
        f"lang={lang}: first divergence at "
        f"{next((j for j, (a, b) in enumerate(zip(got, want)) if a != b), 'len')}"
        f" (ours {len(got)} ids, ref {len(want)})")


def test_punc_norm_parity():
    ref_tu = _load("ref_text_utils", REF / "text_utils.py")
    cases = ["", "hello world", "wait... what: really; yes — ok – fine",
             "“quoted” and ‘single’  spaced   out",
             "ends with dash -", "no ender here"]
    for c in cases:
        assert punc_norm(c) == ref_tu.punc_norm(c), repr(c)


# --------------------------------------------------------------------- #
# optional-dep normalizers (ja/he/ru) — VERDICT r4 weak #6: the passthrough
# branch was the only one ever tested.  Deterministic fake modules stand in
# for pykakasi/dicta_onnx/russian_text_stresser on BOTH sides, so the
# surrounding wiring (kanji-run handling, は/へ particle spacing, post-kakasi
# NFKD, diacritic/stress insertion points) is verified against the
# reference's logic even without the real packages installed.
# --------------------------------------------------------------------- #


def _install_fake_normalizer_deps(monkeypatch):
    import types

    def is_kanji(c):
        return 0x4E00 <= ord(c) <= 0x9FFF

    class _FakeKakasi:
        def convert(self, text):
            out, run, run_kanji = [], "", None
            for ch in text + "\x00":
                k = is_kanji(ch) if ch != "\x00" else None
                if run and k != run_kanji:
                    if run_kanji:
                        # deterministic "reading"; some start with は to
                        # exercise the particle-spacing branch
                        hira = ("は" if ord(run[0]) % 2 == 0 else "り")
                        hira += "かな"[: max(len(run) - 1, 0)]
                        out.append({"orig": run, "hira": hira})
                    else:
                        out.append({"orig": run, "hira": run})
                    run = ""
                if ch != "\x00":
                    run += ch
                    run_kanji = k
            return out

    pykakasi = types.ModuleType("pykakasi")
    pykakasi.kakasi = lambda: _FakeKakasi()

    class _FakeDicta:
        def add_diacritics(self, text):
            return "".join(c + "ְ" if 0x5D0 <= ord(c) <= 0x5EA else c
                           for c in text)

    dicta = types.ModuleType("dicta_onnx")
    dicta.Dicta = _FakeDicta

    class _FakeStresser:
        def stress_text(self, text):
            return text.replace("а", "а́").replace("е", "е́")

    rts = types.ModuleType("russian_text_stresser")
    rts_ts = types.ModuleType("russian_text_stresser.text_stresser")
    rts_ts.RussianTextStresser = _FakeStresser
    rts.text_stresser = rts_ts

    for name, mod in [("pykakasi", pykakasi), ("dicta_onnx", dicta),
                      ("russian_text_stresser", rts),
                      ("russian_text_stresser.text_stresser", rts_ts)]:
        monkeypatch.setitem(sys.modules, name, mod)


NORMALIZER_CASES = [
    ("ja", "日本語は難しいですが、東京都へ行きます。"),
    ("ja", "漢字とカタカナのテキスト混在です。"),
    ("he", "שלום עולם! מה שלומך?"),
    ("ru", "Привет, как дела? Всё хорошо."),
]


@pytest.mark.parametrize("lang,raw", NORMALIZER_CASES,
                         ids=[f"{l}-{i}" for i, (l, _) in
                              enumerate(NORMALIZER_CASES)])
def test_normalizer_dependency_wiring_parity(monkeypatch, lang, raw):
    _install_fake_normalizer_deps(monkeypatch)
    # fresh loads AFTER the fakes are installed (both sides lazy-init and
    # cache their normalizers)
    mtlt = _load("ref_mtltok_fakedeps", REF / "models/t3/mtltokenizer.py")
    ref_mtl = mtlt.MTLTokenizer(
        vocab_file_path=str(REF / "models/t3/grapheme_mtl_merged_expanded_v1.json"))
    our_mtl = SpeechTextTokenizer(
        str(REF / "models/t3/grapheme_mtl_merged_expanded_v1.json"),
        multilingual=True)

    text = punc_norm(raw)
    prompt = f"<{lang}>[START]{text}[STOP]"
    want = _ref_ids(ref_mtl, prompt)
    got = our_mtl.encode(text, language_id=lang)
    assert got == want, (
        f"lang={lang} with real-dependency branch: first divergence at "
        f"{next((j for j, (a, b) in enumerate(zip(got, want)) if a != b), 'len')}")
