"""S3 speech tokenizer verification (VERDICT r4 missing #1).

The FSMN+FSQ encoder is a from-scratch port of the `s3tokenizer` pip package
the reference wraps (reference `models/s3tokenizer/s3tokenizer.py:22`).  What
IS testable without that package:

  * the 128-bin log-mel frontend against the reference's own
    `log_mel_spectrogram` (reference `s3tokenizer.py:128-168`) — the reference
    class instantiates fine on the ref_compat nn.Module stub because the mel
    path only touches buffers it registers itself;
  * FSQ quantizer semantics (3^8 id construction, saturation, rate contract);
  * the checkpoint converter's name/shape contract.

A full numeric parity test against the real pip package runs when (and only
when) that package is installed — it is gated, not stubbed, so installing
`s3tokenizer` upgrades coverage without code changes.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

STUBS = os.path.join(os.path.dirname(__file__), "ref_compat")
REF = "/root/reference/src"
for p in (STUBS, REF):
    if p not in sys.path:
        sys.path.insert(0, p)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chatterbox_vllm2_tpu.config import S3TokenizerConfig  # noqa: E402
from chatterbox_vllm2_tpu.models.s3tokenizer.s3tokenizer import (  # noqa: E402
    S3TokenizerModel,
    convert_s3tokenizer,
    init_s3tokenizer,
    log_mel_spectrogram_128,
    s3tokenizer_quantize,
)


def _real_pip_package_available() -> bool:
    spec = importlib.util.find_spec("s3tokenizer")
    return spec is not None and STUBS not in (spec.origin or STUBS)


# --------------------------------------------------------------------------- #
# (a) log-mel frontend vs the reference's own implementation — runnable today
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def ref_tokenizer():
    from chatterbox_vllm.models.s3tokenizer.s3tokenizer import S3Tokenizer

    return S3Tokenizer()


@pytest.mark.parametrize("make_wav", [
    lambda: np.random.RandomState(0).randn(11200).astype(np.float32) * 0.3,
    lambda: np.sin(2 * np.pi * 440 * np.arange(16000) / 16000
                   ).astype(np.float32),
    lambda: np.zeros(6400, np.float32),
], ids=["noise", "sine", "silence"])
def test_logmel_matches_reference(ref_tokenizer, make_wav):
    wav = make_wav()
    ours = log_mel_spectrogram_128(wav)                        # [128, T]
    theirs = ref_tokenizer.log_mel_spectrogram(
        torch.from_numpy(wav)).numpy()                         # [128, T]
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_logmel_padding_matches_reference(ref_tokenizer):
    """The 40 ms-multiple wav padding path (reference `s3tokenizer.py:54-76`)
    produces the same mel the host wrapper computes."""
    wav = np.random.RandomState(1).randn(10000).astype(np.float32) * 0.2
    # reference pad: ceil to a token boundary
    padded = ref_tokenizer.pad([torch.from_numpy(wav)], sr=16000)[0][0].numpy()
    ours = log_mel_spectrogram_128(padded)
    theirs = ref_tokenizer.log_mel_spectrogram(
        torch.from_numpy(padded)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
    assert ours.shape[1] % 4 == 0      # 4 mel frames per speech token


# --------------------------------------------------------------------------- #
# (c) FSQ quantizer semantics + rate contract
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def tiny():
    cfg = S3TokenizerConfig(n_audio_state=64, n_audio_head=4, n_audio_layer=2)
    params = init_s3tokenizer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_token_rate_and_range(tiny):
    cfg, params = tiny
    model = S3TokenizerModel(params, cfg)
    wavs = [np.random.RandomState(2).randn(16000).astype(np.float32) * 0.1,
            np.random.RandomState(3).randn(8000).astype(np.float32) * 0.1]
    tokens, lens = model(wavs)
    # 25 tokens per second of 16 kHz audio
    assert lens[0] == 25 and lens[1] == 13     # ceil(0.5 s * 25)
    assert tokens.shape[1] >= lens.max()
    assert np.all(tokens >= 0) and np.all(tokens < 6561)
    # deterministic
    tokens2, _ = model(wavs)
    np.testing.assert_array_equal(tokens, tokens2)


def test_fsq_saturation_bounds(tiny):
    """Forcing the FSQ projection to saturate must produce the extreme ids:
    all-positive -> every ternary digit 2 -> id 3^8-1 = 6560; all-negative ->
    id 0 (token id = sum digit_i * 3^i, digits = round(tanh)+1)."""
    cfg, params = tiny
    mel = np.random.RandomState(4).randn(1, 128, 16).astype(np.float32)
    mask = np.ones((1, 16), bool)
    for sign, expect in ((+10.0, 6560), (-10.0, 0)):
        p = dict(params)
        p["fsq_down"] = {
            "w": jnp.zeros_like(params["fsq_down"]["w"]),
            "b": jnp.full_like(params["fsq_down"]["b"], sign),
        }
        toks, lens = s3tokenizer_quantize(p, cfg, jnp.asarray(mel),
                                          jnp.asarray(mask))
        assert np.all(np.asarray(toks)[0, : int(lens[0])] == expect)


def test_converter_shape_contract(tiny):
    """A state dict with the pip package's names (encoder.*/quantizer.*)
    converts to exactly the init_s3tokenizer tree (same structure, shapes)."""
    cfg, params = tiny
    d, m = cfg.n_audio_state, cfg.n_mels

    sd = {
        "encoder.conv1.weight": torch.randn(d, m, 3),
        "encoder.conv1.bias": torch.randn(d),
        "encoder.conv2.weight": torch.randn(d, d, 3),
        "encoder.conv2.bias": torch.randn(d),
        "encoder.ln_post.weight": torch.randn(d),
        "encoder.ln_post.bias": torch.randn(d),
        "quantizer.fsq.project_down.weight": torch.randn(cfg.fsq_dim, d),
        "quantizer.fsq.project_down.bias": torch.randn(cfg.fsq_dim),
    }
    for i in range(cfg.n_audio_layer):
        b = f"encoder.blocks.{i}."
        sd.update({
            b + "attn_ln.weight": torch.randn(d),
            b + "attn_ln.bias": torch.randn(d),
            b + "attn.query.weight": torch.randn(d, d),
            b + "attn.query.bias": torch.randn(d),
            b + "attn.key.weight": torch.randn(d, d),
            b + "attn.value.weight": torch.randn(d, d),
            b + "attn.value.bias": torch.randn(d),
            b + "attn.out.weight": torch.randn(d, d),
            b + "attn.out.bias": torch.randn(d),
            b + "attn.fsmn_block.weight": torch.randn(d, 1, 31),
            b + "mlp_ln.weight": torch.randn(d),
            b + "mlp_ln.bias": torch.randn(d),
            b + "mlp.0.weight": torch.randn(4 * d, d),
            b + "mlp.0.bias": torch.randn(4 * d),
            b + "mlp.2.weight": torch.randn(d, 4 * d),
            b + "mlp.2.bias": torch.randn(d),
        })
    converted = convert_s3tokenizer(sd, cfg)

    ref_shapes = jax.tree.map(lambda a: a.shape, params)
    got_shapes = jax.tree.map(lambda a: a.shape, converted)
    assert ref_shapes == got_shapes
    # converted weights must drive the forward pass
    mel = np.zeros((1, 128, 8), np.float32)
    toks, lens = s3tokenizer_quantize(converted, cfg, jnp.asarray(mel),
                                      jnp.asarray(np.ones((1, 8), bool)))
    assert toks.shape[0] == 1 and int(lens[0]) == 2


# --------------------------------------------------------------------------- #
# (b) full parity vs the real pip package — gated, not stubbed
# --------------------------------------------------------------------------- #


@pytest.mark.skipif(not _real_pip_package_available(),
                    reason="real `s3tokenizer` pip package not installed "
                           "(ref_compat stub only supports the mel path)")
def test_full_parity_vs_pip_package():
    """Random-weight numeric parity: the pip package's S3TokenizerV2 forward
    vs ours through convert_s3tokenizer, same mel in, same token ids out."""
    import s3tokenizer as pip_pkg

    ref = pip_pkg.model_v2.S3TokenizerV2("speech_tokenizer_v2_25hz")
    ref.eval()
    sd = {k: v.detach() for k, v in ref.state_dict().items()}
    cfg = S3TokenizerConfig()
    ours = convert_s3tokenizer(sd, cfg)

    wav = np.random.RandomState(5).randn(16000).astype(np.float32) * 0.2
    mel = log_mel_spectrogram_128(wav)
    mel_t = torch.from_numpy(mel[None])
    with torch.no_grad():
        ref_tokens, ref_lens = ref.quantize(
            mel_t, torch.tensor([mel.shape[1]]))
    toks, lens = s3tokenizer_quantize(
        ours, cfg, jnp.asarray(mel[None]),
        jnp.asarray(np.ones((1, mel.shape[1]), bool)))
    assert int(lens[0]) == int(ref_lens[0])
    np.testing.assert_array_equal(np.asarray(toks)[0, : int(lens[0])],
                                  ref_tokens[0, : int(ref_lens[0])].numpy())
