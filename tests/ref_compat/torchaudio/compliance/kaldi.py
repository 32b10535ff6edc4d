"""Import-only stub; golden tests that need kaldi fbank implement it locally."""


def fbank(*a, **k):
    raise NotImplementedError("torchaudio.compliance.kaldi stub")
