"""Checkpoint conversion: reference safetensors -> our parameter pytrees.

One tool, no symlink hacks (the reference smuggles weights to vLLM via a
symlinked model dir, `tts.py:225-245`).  Handles the reference's weight
layouts:

  * Linear         -> {"w": weight.T, "b": bias}
  * Conv1d         -> {"w": weight[out, in, k], "b": bias}
  * ConvTranspose1d-> {"w": weight[in, out, k], "b": bias}  (torch layout kept)
  * weight-norm convs are folded: w = g * v / ||v||, accepting all three
    on-disk forms (plain `weight`, `weight_g`+`weight_v`, or
    `parametrizations.weight.original0/1`).

Sources: t3 checkpoints (`t3_cfg.safetensors` / `t3_mtl23ls_v2.safetensors`),
`s3gen.safetensors`, `ve.safetensors` at the pinned HF revisions the
reference uses (`tts.py:220,236`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class MissingKey(KeyError):
    pass


def _get(sd: dict, key: str) -> np.ndarray:
    if key not in sd:
        raise MissingKey(key)
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _weight_folded(sd: dict, base: str) -> np.ndarray:
    """Resolve `base`'s conv/linear weight, folding weight-norm if present."""
    for g_key, v_key in (
        (f"{base}.weight_g", f"{base}.weight_v"),
        (f"{base}.parametrizations.weight.original0",
         f"{base}.parametrizations.weight.original1"),
    ):
        if g_key in sd:
            g = _get(sd, g_key)
            v = _get(sd, v_key)
            norm = np.sqrt((v.astype(np.float64) ** 2).sum(
                axis=tuple(range(1, v.ndim)), keepdims=True))
            return (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)
    return _get(sd, f"{base}.weight")


def linear_p(sd, base, bias=True):
    p = {"w": jnp.asarray(_weight_folded(sd, base).T)}
    if bias and f"{base}.bias" in sd:
        p["b"] = jnp.asarray(_get(sd, f"{base}.bias"))
    return p


def conv_p(sd, base, bias=True):
    p = {"w": jnp.asarray(_weight_folded(sd, base))}
    if bias and f"{base}.bias" in sd:
        p["b"] = jnp.asarray(_get(sd, f"{base}.bias"))
    return p


def norm_p(sd, base):
    return {"w": jnp.asarray(_get(sd, f"{base}.weight")),
            "b": jnp.asarray(_get(sd, f"{base}.bias"))}


def emb_p(sd, base):
    return jnp.asarray(_get(sd, f"{base}.weight"))


# ---------------------------------------------------------------------------
# T3 (reference t3 safetensors: prefixes tfmr.*, cond_enc.*, text_emb.*,
# speech_emb.*, *_pos_emb.*, speech_head.*; see reference `tts.py:112-137`
# and `models/t3/t3.py:300-332`)
# ---------------------------------------------------------------------------


def convert_t3(sd: dict, cfg, dtype=jnp.bfloat16) -> dict:
    from ..models.t3.model import fuse_gate_up, fuse_qkv

    L = cfg.num_layers

    # Pre-quantized AWQ checkpoint (qweight/qzeros/scales per linear — the
    # layout vLLM's AWQ loader consumes for the reference,
    # `quantization.py:161-185`): linears come from the AWQ converter,
    # everything else (norms, embeddings, head) loads densely below.
    if "tfmr.layers.0.self_attn.q_proj.qweight" in sd:
        from ..ops.awq import convert_awq_t3_layers

        awq_layers = convert_awq_t3_layers(sd, cfg)
        # Dense pieces (norms, embeddings, head) load through the normal
        # path; the quantized linears are stubbed with zeros there and then
        # replaced by the AWQ QuantTensors.
        h, nh, hd, inter = (cfg.hidden_size, cfg.num_heads, cfg.head_dim,
                            cfg.intermediate_size)
        sd2 = dict(sd)
        for i in range(L):
            b = f"tfmr.layers.{i}"
            for name, shape in (
                (f"{b}.self_attn.q_proj.weight", (nh * hd, h)),
                (f"{b}.self_attn.k_proj.weight", (nh * hd, h)),
                (f"{b}.self_attn.v_proj.weight", (nh * hd, h)),
                (f"{b}.self_attn.o_proj.weight", (h, nh * hd)),
                (f"{b}.mlp.gate_proj.weight", (inter, h)),
                (f"{b}.mlp.up_proj.weight", (inter, h)),
                (f"{b}.mlp.down_proj.weight", (h, inter)),
            ):
                sd2.setdefault(name, np.zeros(shape, np.float32))
        out = _convert_t3_dense(sd2, cfg, dtype)
        out["layers"].update(awq_layers)
        return out

    return _convert_t3_dense(sd, cfg, dtype)


def _convert_t3_dense(sd: dict, cfg, dtype=jnp.bfloat16) -> dict:
    from ..models.t3.model import fuse_gate_up, fuse_qkv

    L = cfg.num_layers

    def stack(fmt, transpose=True):
        ws = []
        for i in range(L):
            w = _get(sd, fmt.format(i))
            ws.append(w.T if transpose else w)
        return jnp.asarray(np.stack(ws), dtype)

    def stack_fused(fuse, *fmts):
        ws = []
        for i in range(L):
            ws.append(fuse(*(_get(sd, f.format(i)).T for f in fmts)))
        return jnp.asarray(np.stack(ws), dtype)

    # QKV and gate/up are fused at load (like vLLM's weight loader does for
    # the reference, `models/t3/t3.py:300-332`); on disk they are separate HF
    # names.  Column orders are TP-friendly — see model.fuse_qkv/fuse_gate_up.
    layers = {
        "input_norm": stack("tfmr.layers.{}.input_layernorm.weight", transpose=False),
        "qkv_proj": stack_fused(
            lambda q, k, v: fuse_qkv(q, k, v, cfg),
            "tfmr.layers.{}.self_attn.q_proj.weight",
            "tfmr.layers.{}.self_attn.k_proj.weight",
            "tfmr.layers.{}.self_attn.v_proj.weight"),
        "o_proj": stack("tfmr.layers.{}.self_attn.o_proj.weight"),
        "post_norm": stack("tfmr.layers.{}.post_attention_layernorm.weight", transpose=False),
        "gate_up_proj": stack_fused(
            fuse_gate_up,
            "tfmr.layers.{}.mlp.gate_proj.weight",
            "tfmr.layers.{}.mlp.up_proj.weight"),
        "down_proj": stack("tfmr.layers.{}.mlp.down_proj.weight"),
    }
    head = _get(sd, "speech_head.weight").T          # [h, V]
    pad = cfg.speech_vocab_padded - head.shape[1]
    if pad:
        head = np.concatenate([head, np.zeros((head.shape[0], pad), head.dtype)], axis=1)
    return {
        "layers": layers,
        "final_norm": jnp.asarray(_get(sd, "tfmr.norm.weight"), dtype),
        "text_emb": jnp.asarray(_get(sd, "text_emb.weight"), dtype),
        "speech_emb": jnp.asarray(_get(sd, "speech_emb.weight"), dtype),
        "text_pos_emb": jnp.asarray(_get(sd, "text_pos_emb.emb.weight"), dtype),
        "speech_pos_emb": jnp.asarray(_get(sd, "speech_pos_emb.emb.weight"), dtype),
        "speech_head": jnp.asarray(head, dtype),
    }


def convert_cond_enc(sd: dict, cfg, dtype=jnp.float32, prefix="cond_enc.") -> dict:
    p = prefix
    return {
        "spkr_enc": linear_p(sd, p + "spkr_enc"),
        "emotion_adv_fc": {"w": jnp.asarray(_get(sd, p + "emotion_adv_fc.weight").T)},
        "perceiver": {
            "query": jnp.asarray(_get(sd, p + "perceiver.pre_attention_query")[0]),
            "norm": norm_p(sd, p + "perceiver.attn.norm"),
            "to_q": linear_p(sd, p + "perceiver.attn.to_q"),
            "to_k": linear_p(sd, p + "perceiver.attn.to_k"),
            "to_v": linear_p(sd, p + "perceiver.attn.to_v"),
            "proj_out": linear_p(sd, p + "perceiver.attn.proj_out"),
        },
    }


# ---------------------------------------------------------------------------
# S3Gen flow (prefix "flow." in s3gen.safetensors)
# ---------------------------------------------------------------------------


def _conformer_layer(sd, base):
    return {
        "norm_mha": norm_p(sd, f"{base}.norm_mha"),
        "attn": {
            "q": linear_p(sd, f"{base}.self_attn.linear_q"),
            "k": linear_p(sd, f"{base}.self_attn.linear_k"),
            "v": linear_p(sd, f"{base}.self_attn.linear_v"),
            "out": linear_p(sd, f"{base}.self_attn.linear_out"),
            "pos": linear_p(sd, f"{base}.self_attn.linear_pos", bias=False),
            "pos_bias_u": jnp.asarray(_get(sd, f"{base}.self_attn.pos_bias_u")),
            "pos_bias_v": jnp.asarray(_get(sd, f"{base}.self_attn.pos_bias_v")),
        },
        "norm_ff": norm_p(sd, f"{base}.norm_ff"),
        "ff_w1": linear_p(sd, f"{base}.feed_forward.w_1"),
        "ff_w2": linear_p(sd, f"{base}.feed_forward.w_2"),
    }


def _unet_resnet(sd, base):
    return {
        "mlp": linear_p(sd, f"{base}.mlp.1"),
        "block1": {"conv": conv_p(sd, f"{base}.block1.block.0"),
                   "norm": norm_p(sd, f"{base}.block1.block.2")},
        "block2": {"conv": conv_p(sd, f"{base}.block2.block.0"),
                   "norm": norm_p(sd, f"{base}.block2.block.2")},
        "res_conv": conv_p(sd, f"{base}.res_conv"),
    }


def _unet_transformer(sd, base):
    return {
        "norm1": norm_p(sd, f"{base}.norm1"),
        "to_q": linear_p(sd, f"{base}.attn1.to_q", bias=False),
        "to_k": linear_p(sd, f"{base}.attn1.to_k", bias=False),
        "to_v": linear_p(sd, f"{base}.attn1.to_v", bias=False),
        "to_out": linear_p(sd, f"{base}.attn1.to_out.0"),
        "norm3": norm_p(sd, f"{base}.norm3"),
        "ff_in": linear_p(sd, f"{base}.ff.net.0.proj"),
        "ff_out": linear_p(sd, f"{base}.ff.net.2"),
    }


def convert_flow(sd: dict, cfg, dtype=jnp.float32, prefix="flow.") -> dict:
    p = prefix
    enc = p + "encoder."
    est = p + "decoder.estimator."
    n_blocks = cfg.encoder.num_blocks
    n_up = cfg.encoder.num_up_blocks
    return {
        "input_embedding": emb_p(sd, p + "input_embedding"),
        "spk_embed_affine": linear_p(sd, p + "spk_embed_affine_layer"),
        "encoder_proj": linear_p(sd, p + "encoder_proj"),
        "encoder": {
            "embed": {"linear": linear_p(sd, enc + "embed.out.0"),
                      "norm": norm_p(sd, enc + "embed.out.1")},
            "pre_lookahead": {
                "conv1": conv_p(sd, enc + "pre_lookahead_layer.conv1"),
                "conv2": conv_p(sd, enc + "pre_lookahead_layer.conv2"),
            },
            "encoders": [_conformer_layer(sd, f"{enc}encoders.{i}")
                         for i in range(n_blocks)],
            "up_layer": {"conv": conv_p(sd, enc + "up_layer.conv")},
            "up_embed": {"linear": linear_p(sd, enc + "up_embed.out.0"),
                         "norm": norm_p(sd, enc + "up_embed.out.1")},
            "up_encoders": [_conformer_layer(sd, f"{enc}up_encoders.{i}")
                            for i in range(n_up)],
            "after_norm": norm_p(sd, enc + "after_norm"),
        },
        "unet": {
            "time_mlp": {"linear1": linear_p(sd, est + "time_mlp.linear_1"),
                         "linear2": linear_p(sd, est + "time_mlp.linear_2")},
            "down": {
                "resnet": _unet_resnet(sd, est + "down_blocks.0.0"),
                "transformers": [_unet_transformer(sd, f"{est}down_blocks.0.1.{j}")
                                 for j in range(4)],
                "downsample": conv_p(sd, est + "down_blocks.0.2"),
            },
            "mid": [
                {"resnet": _unet_resnet(sd, f"{est}mid_blocks.{i}.0"),
                 "transformers": [_unet_transformer(sd, f"{est}mid_blocks.{i}.1.{j}")
                                  for j in range(4)]}
                for i in range(cfg.unet.num_mid_blocks)
            ],
            "up": {
                "resnet": _unet_resnet(sd, est + "up_blocks.0.0"),
                "transformers": [_unet_transformer(sd, f"{est}up_blocks.0.1.{j}")
                                 for j in range(4)],
                "upsample": conv_p(sd, est + "up_blocks.0.2"),
            },
            "final_block": {"conv": conv_p(sd, est + "final_block.block.0"),
                            "norm": norm_p(sd, est + "final_block.block.2")},
            "final_proj": conv_p(sd, est + "final_proj"),
        },
    }


# ---------------------------------------------------------------------------
# HiFT (prefix "mel2wav." in s3gen.safetensors)
# ---------------------------------------------------------------------------


def convert_hift(sd: dict, cfg, dtype=jnp.float32, prefix="mel2wav.") -> dict:
    p = prefix

    def resblock(base, kernel, dilations):
        n = len(dilations)
        return {
            "convs1": [conv_p(sd, f"{base}.convs1.{i}") for i in range(n)],
            "convs2": [conv_p(sd, f"{base}.convs2.{i}") for i in range(n)],
            "alpha1": [jnp.asarray(_get(sd, f"{base}.activations1.{i}.alpha"))
                       for i in range(n)],
            "alpha2": [jnp.asarray(_get(sd, f"{base}.activations2.{i}.alpha"))
                       for i in range(n)],
            "_meta": {"kernel": kernel, "dilations": tuple(dilations)},
        }

    n_up = len(cfg.upsample_rates)
    resblocks = []
    for i in range(n_up):
        for j, (k, d) in enumerate(zip(cfg.resblock_kernel_sizes,
                                       cfg.resblock_dilation_sizes)):
            resblocks.append(resblock(f"{p}resblocks.{i * len(cfg.resblock_kernel_sizes) + j}", k, d))
    return {
        "f0_predictor": {
            "convs": [conv_p(sd, f"{p}f0_predictor.condnet.{2 * i}") for i in range(5)],
            "classifier": linear_p(sd, f"{p}f0_predictor.classifier"),
        },
        "source_linear": linear_p(sd, f"{p}m_source.l_linear"),
        "conv_pre": conv_p(sd, f"{p}conv_pre"),
        "ups": [
            {"w": jnp.asarray(_weight_folded(sd, f"{p}ups.{i}")),
             **({"b": jnp.asarray(_get(sd, f"{p}ups.{i}.bias"))}
                if f"{p}ups.{i}.bias" in sd else {})}
            for i in range(n_up)
        ],
        "source_downs": [conv_p(sd, f"{p}source_downs.{i}") for i in range(n_up)],
        "source_resblocks": [
            resblock(f"{p}source_resblocks.{i}",
                     cfg.source_resblock_kernel_sizes[i],
                     cfg.source_resblock_dilation_sizes[i])
            for i in range(n_up)
        ],
        "resblocks": resblocks,
        "conv_post": conv_p(sd, f"{p}conv_post"),
    }


def load_safetensors(path: str) -> dict:
    from safetensors.numpy import load_file

    return load_file(path)
