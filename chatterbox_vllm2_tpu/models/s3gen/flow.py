"""Token -> mel flow pipeline (reference `flow.py:181-288`,
CausalMaskedDiffWithXvec.inference).

Steps:
  1. x-vector [192] -> L2 normalize -> linear -> spks [80]
  2. tokens = concat(prompt_tokens, generated_tokens); embed (6561 -> 512)
  3. UpsampleConformerEncoder -> [B, 2*T_tok, 512]; project 512 -> 80 = mu
  4. conds: prompt mel in the first mel_len1 frames, zeros after
  5. CFM Euler solve; return mel[:, :, mel_len1:]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import S3GenConfig
from .cfm import cfm_solve
from .conformer import init_upsample_encoder, upsample_encoder_apply
from .layers import init_linear, linear
from .unet import init_unet


def init_flow(key: jax.Array, cfg: S3GenConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 8))
    enc_dim = cfg.encoder.input_size
    return {
        "input_embedding": (jax.random.normal(next(keys), (cfg.speech_vocab_size, enc_dim),
                                              jnp.float32) * 0.02).astype(dtype),
        "spk_embed_affine": init_linear(next(keys), cfg.spk_embed_dim, cfg.mel_bins, dtype),
        "encoder": init_upsample_encoder(next(keys), cfg.encoder, dtype),
        "encoder_proj": init_linear(next(keys), cfg.encoder.output_size, cfg.mel_bins, dtype),
        "unet": init_unet(next(keys), cfg.unet, dtype),
    }


def flow_inference(
    params: dict,
    cfg: S3GenConfig,
    tokens: jnp.ndarray,        # [B, T_tok] int32 — prompt + generated, right-padded
    token_mask: jnp.ndarray,    # [B, T_tok] bool — True = valid
    prompt_feat: jnp.ndarray,   # [B, P_max, 80] prompt mel, right-padded
    prompt_mel_len: jnp.ndarray,  # [B] int32 — true prompt mel length (= 2*prompt_tok)
    embedding: jnp.ndarray,     # [B, 192] x-vector
    rand_noise: jnp.ndarray,    # [1, 80, >= 2*T_tok]
    *,
    pos_table: jnp.ndarray,
    pos_table_len: int,
    n_timesteps: int = 10,
    finalize: bool = True,
) -> jnp.ndarray:
    """Returns the FULL mel [B, 80, T_mel = 2*T_tok] (prompt + generated).
    The caller slices frames [prompt_mel_len, prompt_mel_len + 2*n_gen) per
    sample; frames beyond a sample's true token length are garbage
    (static-shape batching).
    """
    B, T_tok = tokens.shape
    P_max = prompt_feat.shape[1]

    emb_f32 = embedding.astype(jnp.float32)
    emb_norm = emb_f32 * jax.lax.rsqrt(
        jnp.sum(emb_f32 * emb_f32, axis=-1, keepdims=True) + 1e-12)
    spks = linear(params["spk_embed_affine"],
                  emb_norm.astype(prompt_feat.dtype))          # [B, 80]

    tok = jnp.clip(tokens, 0, cfg.speech_vocab_size - 1)
    x = params["input_embedding"][tok] * token_mask[..., None]

    h = upsample_encoder_apply(params["encoder"], cfg.encoder, x, token_mask,
                               pos_table=pos_table, pos_table_len=pos_table_len)
    if not finalize:
        h = h[:, : -cfg.encoder.pre_lookahead_len * cfg.token_mel_ratio]
    h = linear(params["encoder_proj"], h)                      # [B, T_mel, 80]
    T_mel = h.shape[1]

    # conds: prompt mel occupies the first prompt_mel_len frames, zeros after
    conds = jnp.zeros((B, T_mel, cfg.mel_bins), h.dtype)
    P_eff = min(P_max, T_mel)
    conds = conds.at[:, :P_eff].set(prompt_feat[:, :P_eff].astype(h.dtype))
    in_prompt = (jnp.arange(T_mel)[None, :] < prompt_mel_len[:, None])[..., None]
    conds = jnp.where(in_prompt, conds, 0.0)

    mel_mask = jnp.repeat(token_mask, cfg.token_mel_ratio, axis=-1)[:, :T_mel]
    mask = mel_mask[:, None, :].astype(h.dtype)                # [B, 1, T_mel]

    return cfm_solve(
        params["unet"], cfg.unet, cfg.cfm,
        mu=h.transpose(0, 2, 1),
        spks=spks,
        cond=conds.transpose(0, 2, 1),
        rand_noise=rand_noise,
        mask=mask,
        n_timesteps=n_timesteps,
    )
