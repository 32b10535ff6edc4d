"""Goldens for the conditioning encoders: CAMPPlus x-vector network and the
VoiceEncoder LSTM, vs the reference torch modules with randomised weights
(batch-norm running stats randomised too, so inference-mode BN is exercised)."""

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

from chatterbox_vllm2_tpu.config import CampPlusConfig, VoiceEncoderConfig  # noqa: E402
from chatterbox_vllm2_tpu.models.s3gen.xvector import campplus_apply, convert_campplus  # noqa: E402
from chatterbox_vllm2_tpu.models.voice_encoder import (  # noqa: E402
    convert_voice_encoder,
    voice_encoder_forward,
)


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)


def test_campplus_golden():
    from chatterbox_vllm.models.s3gen.xvector import CAMPPlus

    torch.manual_seed(0)
    ref = CAMPPlus(feat_dim=80, embedding_size=192).eval()
    _randomize_bn(ref)

    feats = torch.randn(2, 180, 80)
    with torch.no_grad():
        ref_out = ref(feats)

    params = convert_campplus(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    out = campplus_apply(params, CampPlusConfig(), jnp.asarray(feats.numpy()))
    assert out.shape == (2, 192)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=2e-3, atol=2e-3)


def test_voice_encoder_golden():
    torch.manual_seed(1)
    lstm = torch.nn.LSTM(40, 256, num_layers=3, batch_first=True).eval()
    proj = torch.nn.Linear(256, 256)

    mels = torch.rand(3, 160, 40)
    with torch.no_grad():
        _, (hidden, _) = lstm(mels)
        raw = torch.relu(proj(hidden[-1]))
        ref_out = raw / torch.linalg.norm(raw, dim=1, keepdim=True)

    sd = {f"lstm.{k}": v.detach().numpy() for k, v in lstm.state_dict().items()}
    sd.update({f"proj.{k}": v.detach().numpy() for k, v in proj.state_dict().items()})
    params = convert_voice_encoder(sd, VoiceEncoderConfig())
    out = voice_encoder_forward(params, jnp.asarray(mels.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=2e-3, atol=2e-4)
