"""T3 Llama backbone golden vs HuggingFace transformers LlamaModel.

The reference runs its backbone through vLLM's LlamaModel, which is
weight-compatible with HF llama (same config.json, reference
`t3-model/config.json`).  Matching HF on random weights validates RMSNorm,
SiLU-MLP, GQA-less attention, and the llama3-scaled RoPE end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chatterbox_vllm2_tpu.config import T3Config  # noqa: E402
from chatterbox_vllm2_tpu.models.t3.model import (  # noqa: E402
    KVCache,
    make_rope_tables,
    t3_prefill,
)
from chatterbox_vllm2_tpu.utils.checkpoint import convert_t3  # noqa: E402


def test_backbone_matches_hf_llama():
    import dataclasses

    torch.manual_seed(0)
    L = 2
    hf_cfg = transformers.LlamaConfig(
        vocab_size=8, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=L, num_attention_heads=16, num_key_value_heads=16,
        head_dim=64, rms_norm_eps=1e-5, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        max_position_embeddings=131072, attention_bias=False, mlp_bias=False,
    )
    hf = transformers.LlamaModel(hf_cfg).eval()

    cfg = dataclasses.replace(T3Config.multilingual(), num_layers=L)
    sd = {f"tfmr.{k}": v.detach().numpy() for k, v in hf.state_dict().items()}
    # satisfy the converter's non-backbone entries with dummies
    h = cfg.hidden_size
    sd.update({
        "text_emb.weight": np.zeros((cfg.text_vocab_size, h), np.float32),
        "speech_emb.weight": np.zeros((cfg.speech_vocab_size, h), np.float32),
        "text_pos_emb.emb.weight": np.zeros((cfg.max_text_tokens + 2, h), np.float32),
        "speech_pos_emb.emb.weight": np.zeros((cfg.max_speech_tokens + 4, h), np.float32),
        "speech_head.weight": np.zeros((cfg.speech_vocab_size, h), np.float32),
    })
    params = convert_t3(sd, cfg, dtype=jnp.float32)

    B, T, max_len = 2, 12, 32
    x = torch.randn(B, T, 1024) * 0.1
    with torch.no_grad():
        hf_out = hf(inputs_embeds=x).last_hidden_state

    cos, sin = make_rope_tables(cfg, max_len)
    kv = KVCache.zeros(cfg, B, max_len, jnp.float32)
    plen = jnp.full((B,), T, jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T)).astype(jnp.int32)
    out, _ = t3_prefill(params, cfg, jnp.asarray(x.numpy()), pos, plen,
                        kv, cos, sin)
    np.testing.assert_allclose(np.asarray(out), hf_out.numpy(), rtol=2e-3, atol=2e-3)
