from .model import (
    init_t3_params,
    t3_prefill,
    t3_decode,
    build_prefill_embeds,
    build_decode_embeds,
    speech_logits,
    cfg_combine,
)
from .cond import init_cond_enc_params, cond_enc_apply
