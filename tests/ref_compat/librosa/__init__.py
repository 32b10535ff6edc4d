"""librosa stub backed by our numpy mel-filterbank (golden tests only)."""
from . import filters  # noqa: F401
