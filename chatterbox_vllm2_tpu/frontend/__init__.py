from .text import punc_norm, detect_language, SUPPORTED_LANGUAGES
from .tokenizer import SpeechTextTokenizer
