"""Numeric goldens: our JAX S3Gen stack vs the reference's torch modules.

The reference torch code is imported read-only from /root/reference/src (with
test-only stubs for diffusers/conformer/omegaconf, see ref_compat/README.md)
and run on CPU with random weights; our implementations must match through
the checkpoint converter's name mapping.
"""

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
torch.manual_seed(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chatterbox_vllm2_tpu.config import S3GenConfig, HiftConfig, UNetConfig  # noqa: E402
from chatterbox_vllm2_tpu.models.s3gen.conformer import (  # noqa: E402
    espnet_rel_pos_table,
    upsample_encoder_apply,
)
from chatterbox_vllm2_tpu.models.s3gen.unet import unet_apply  # noqa: E402
from chatterbox_vllm2_tpu.models.s3gen.cfm import cfm_solve  # noqa: E402
from chatterbox_vllm2_tpu.models.s3gen.hift import hift_apply  # noqa: E402
from chatterbox_vllm2_tpu.utils import checkpoint as ckpt  # noqa: E402

import dataclasses  # noqa: E402

TOL = dict(rtol=2e-3, atol=2e-4)


def sd_np(module, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def s3cfg():
    return S3GenConfig()


def test_conformer_encoder_golden(s3cfg):
    from chatterbox_vllm.models.s3gen.transformer.upsample_encoder import (
        UpsampleConformerEncoder,
    )

    enc_cfg = dataclasses.replace(s3cfg.encoder, num_blocks=2)
    ref = UpsampleConformerEncoder(
        output_size=512, attention_heads=8, linear_units=2048, num_blocks=2,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        normalize_before=True, input_layer="linear",
        pos_enc_layer_type="rel_pos_espnet", selfattention_layer_type="rel_selfattn",
        input_size=512, use_cnn_module=False, macaron_style=False,
    ).eval()

    T = 24
    x = torch.randn(1, T, 512)
    with torch.no_grad():
        ref_out, _ = ref(x, torch.tensor([T]))

    sd = sd_np(ref, "flow.encoder.")
    # reuse the flow converter's encoder section
    params = {
        "embed": {"linear": ckpt.linear_p(sd, "flow.encoder.embed.out.0"),
                  "norm": ckpt.norm_p(sd, "flow.encoder.embed.out.1")},
        "pre_lookahead": {
            "conv1": ckpt.conv_p(sd, "flow.encoder.pre_lookahead_layer.conv1"),
            "conv2": ckpt.conv_p(sd, "flow.encoder.pre_lookahead_layer.conv2"),
        },
        "encoders": [ckpt._conformer_layer(sd, f"flow.encoder.encoders.{i}")
                     for i in range(2)],
        "up_layer": {"conv": ckpt.conv_p(sd, "flow.encoder.up_layer.conv")},
        "up_embed": {"linear": ckpt.linear_p(sd, "flow.encoder.up_embed.out.0"),
                     "norm": ckpt.norm_p(sd, "flow.encoder.up_embed.out.1")},
        "up_encoders": [ckpt._conformer_layer(sd, f"flow.encoder.up_encoders.{i}")
                        for i in range(4)],
        "after_norm": ckpt.norm_p(sd, "flow.encoder.after_norm"),
    }
    table = jnp.asarray(espnet_rel_pos_table(512, 256))
    out = upsample_encoder_apply(
        params, enc_cfg, jnp.asarray(x.numpy()),
        jnp.ones((1, T), bool), pos_table=table, pos_table_len=256,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), **TOL)


def _ref_unet(num_mid):
    from chatterbox_vllm.models.s3gen.decoder import ConditionalDecoder

    return ConditionalDecoder(
        in_channels=320, out_channels=80, causal=True, channels=[256],
        dropout=0.0, attention_head_dim=64, n_blocks=4,
        num_mid_blocks=num_mid, num_heads=8, act_fn="gelu",
    ).eval()


def _unet_params(ref, cfg):
    sd = sd_np(ref, "flow.decoder.estimator.")
    flow_sd = dict(sd)
    full = ckpt.convert_flow.__wrapped__ if hasattr(ckpt.convert_flow, "__wrapped__") else None
    est = "flow.decoder.estimator."
    return {
        "time_mlp": {"linear1": ckpt.linear_p(flow_sd, est + "time_mlp.linear_1"),
                     "linear2": ckpt.linear_p(flow_sd, est + "time_mlp.linear_2")},
        "down": {
            "resnet": ckpt._unet_resnet(flow_sd, est + "down_blocks.0.0"),
            "transformers": [ckpt._unet_transformer(flow_sd, f"{est}down_blocks.0.1.{j}")
                             for j in range(4)],
            "downsample": ckpt.conv_p(flow_sd, est + "down_blocks.0.2"),
        },
        "mid": [
            {"resnet": ckpt._unet_resnet(flow_sd, f"{est}mid_blocks.{i}.0"),
             "transformers": [ckpt._unet_transformer(flow_sd, f"{est}mid_blocks.{i}.1.{j}")
                              for j in range(4)]}
            for i in range(cfg.num_mid_blocks)
        ],
        "up": {
            "resnet": ckpt._unet_resnet(flow_sd, est + "up_blocks.0.0"),
            "transformers": [ckpt._unet_transformer(flow_sd, f"{est}up_blocks.0.1.{j}")
                             for j in range(4)],
            "upsample": ckpt.conv_p(flow_sd, est + "up_blocks.0.2"),
        },
        "final_block": {"conv": ckpt.conv_p(flow_sd, est + "final_block.block.0"),
                        "norm": ckpt.norm_p(flow_sd, est + "final_block.block.2")},
        "final_proj": ckpt.conv_p(flow_sd, est + "final_proj"),
    }


def test_unet_golden():
    cfg = dataclasses.replace(UNetConfig(), num_mid_blocks=2)
    ref = _ref_unet(2)
    params = _unet_params(ref, cfg)

    B, T = 2, 20
    x = torch.randn(B, 80, T)
    mu = torch.randn(B, 80, T)
    t = torch.tensor([0.3, 0.7])
    spks = torch.randn(B, 80)
    cond = torch.randn(B, 80, T)
    mask = torch.ones(B, 1, T)
    with torch.no_grad():
        ref_out = ref(x, mask, mu, t, spks, cond)

    out = unet_apply(params, cfg, jnp.asarray(x.numpy()), jnp.asarray(mu.numpy()),
                     jnp.asarray(t.numpy()), jnp.asarray(spks.numpy()),
                     jnp.asarray(cond.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), **TOL)


def test_cfm_solver_golden(s3cfg):
    from chatterbox_vllm.models.s3gen.flow_matching import CausalConditionalCFM, CFM_PARAMS

    torch.manual_seed(1)
    ucfg = dataclasses.replace(UNetConfig(), num_mid_blocks=1)
    est = _ref_unet(1)
    ref = CausalConditionalCFM(spk_emb_dim=80, cfm_params=CFM_PARAMS, estimator=est).eval()

    B, T = 1, 16
    mu = torch.randn(B, 80, T)
    spks = torch.randn(B, 80)
    cond = torch.randn(B, 80, T)
    mask = torch.ones(B, 1, T)
    with torch.no_grad():
        ref_mel, _ = ref(mu, mask, n_timesteps=4, spks=spks, cond=cond)

    params = _unet_params(est, ucfg)
    noise = jnp.asarray(ref.rand_noise.numpy())
    mel = cfm_solve(params, ucfg, s3cfg.cfm, jnp.asarray(mu.numpy()),
                    jnp.asarray(spks.numpy()), jnp.asarray(cond.numpy()),
                    noise, jnp.asarray(mask.numpy()), n_timesteps=4)
    np.testing.assert_allclose(np.asarray(mel), ref_mel.numpy(), rtol=5e-3, atol=5e-4)


def test_hift_golden():
    from chatterbox_vllm.models.s3gen.hifigan import HiFTGenerator
    from chatterbox_vllm.models.s3gen.f0_predictor import ConvRNNF0Predictor

    torch.manual_seed(2)
    ref = HiFTGenerator(
        sampling_rate=24000, upsample_rates=[8, 5, 3],
        upsample_kernel_sizes=[16, 11, 7],
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        f0_predictor=ConvRNNF0Predictor(),
    ).eval()

    T_mel = 10
    mel = torch.randn(1, 80, T_mel) * 0.5
    cache = torch.randn(1, 1, T_mel * 480) * 0.05   # overrides the random source
    with torch.no_grad():
        ref_wav, ref_src = ref.inference(mel, cache_source=cache)

    cfg = HiftConfig()
    params = ckpt.convert_hift(sd_np(ref, "mel2wav."), cfg)
    wav, src = hift_apply(params, cfg, jnp.asarray(mel.numpy()),
                          jax.random.PRNGKey(0),
                          cache_source=jnp.asarray(cache.numpy()))
    assert wav.shape == ref_wav.shape
    np.testing.assert_allclose(np.asarray(src), ref_src.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(wav), ref_wav.numpy(), rtol=5e-3, atol=2e-3)


def _namespace_pkg(name, path):
    """Register a synthetic package so reference submodules can be imported
    without running package __init__ chains that need vllm."""
    import types

    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        sys.modules[name] = pkg
    return sys.modules[name]


def test_cond_enc_golden():
    _namespace_pkg("ref_t3_modules", REF + "/chatterbox_vllm/models/t3/modules")
    from ref_t3_modules.cond_enc import T3Cond, T3CondEnc
    from ref_t3_modules.t3_config import T3Config as RefT3Config

    from chatterbox_vllm2_tpu.config import T3Config
    from chatterbox_vllm2_tpu.models.t3.cond import cond_enc_apply

    torch.manual_seed(3)
    ref = T3CondEnc(RefT3Config()).eval()

    spk = torch.randn(256)
    prompt = torch.randn(150, 1024)
    emo = torch.tensor([[0.7]])
    with torch.no_grad():
        ref_out = ref(T3Cond(
            speaker_emb=spk, cond_prompt_speech_tokens=torch.ones(150),
            cond_prompt_speech_emb=prompt, emotion_adv=emo,
        ))

    params = ckpt.convert_cond_enc(sd_np(ref, "cond_enc."), None)
    out = cond_enc_apply(params, T3Config(), jnp.asarray(spk.numpy()),
                         jnp.asarray(prompt.numpy()), jnp.asarray(0.7))
    assert out.shape == (34, 1024)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), **TOL)
