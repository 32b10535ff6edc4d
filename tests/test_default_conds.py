"""Default-voice (conds.pt) loading: voice-free requests must work.

Reference ships a pickled default conditioning (`Conditionals.load`,
reference `tts.py:54-58,207-208`); we convert it torch->numpy and rebuild the
cond prefix with our own encoder (`ChatterboxTTS.load_default_conds`).
"""

import numpy as np
import pytest

from chatterbox_vllm2_tpu.config import Config, EngineConfig, T3Config


@pytest.fixture(scope="module")
def tiny_model():
    import jax.numpy as jnp

    from chatterbox_vllm2_tpu.tts import ChatterboxTTS

    config = Config(
        t3=T3Config.tiny(),
        engine=EngineConfig(max_batch_size=2, max_model_len=64,
                            prefill_buckets=(16,), kv_cache_dtype="float32",
                            decode_steps_per_dispatch=4, engine_kind="dense"),
    )
    return ChatterboxTTS.from_random(config, compute_dtype=jnp.float32)


def _fake_conds_pt(tmp_path, t3cfg, mel_bins=80):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    n_tok = 12
    payload = {
        "t3": {
            "speaker_emb": torch.tensor(
                rng.randn(1, t3cfg.speaker_embed_size).astype(np.float32)),
            "cond_prompt_speech_tokens": torch.tensor(
                rng.randint(0, 100, size=(1, n_tok)).astype(np.int64)),
            "emotion_adv": torch.tensor([[[0.5]]], dtype=torch.float32),
        },
        "gen": {
            "prompt_token": torch.tensor(
                rng.randint(0, 100, size=(1, n_tok)).astype(np.int64)),
            "prompt_token_len": torch.tensor([n_tok]),
            "prompt_feat": torch.tensor(
                rng.randn(1, 2 * n_tok, mel_bins).astype(np.float32)),
            "prompt_feat_len": torch.tensor([2 * n_tok]),
            "embedding": torch.tensor(rng.randn(1, 192).astype(np.float32)),
        },
    }
    p = tmp_path / "conds.pt"
    torch.save(payload, p)
    return p


def test_load_default_conds_enables_voice_free(tiny_model, tmp_path):
    path = _fake_conds_pt(tmp_path, tiny_model.t3cfg)
    assert tiny_model.default_conds is None
    tiny_model.load_default_conds(path)
    dc = tiny_model.default_conds
    assert dc is not None
    assert dc.cond_emb.shape == (tiny_model.t3cfg.cond_seq_len,
                                 tiny_model.t3cfg.hidden_size)
    assert dc.ref.prompt_token.dtype == np.int32
    assert dc.ref.prompt_feat.shape[1] == 80
    # voice-free conditioning now resolves to the default
    conds = tiny_model.get_audio_conditionals(None)
    assert conds is dc


def test_voice_free_raises_without_default(tiny_model):
    tiny_model.default_conds = None
    tiny_model._cond_cache.clear()
    with pytest.raises(ValueError, match="no audio prompt"):
        tiny_model.get_audio_conditionals(None)
