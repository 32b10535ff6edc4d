"""The serving engine: what the reference borrows from vLLM, rebuilt TPU-native.

  engine      — jitted CFG-paired prefill + decode loop over a slotted KV cache
  scheduler   — continuous-batching scheduler (slot admission / eviction)
  analyzer    — alignment stream analyzer as an in-loop logit processor
"""

from .engine import T3Engine, T3Request, T3Result
from .scheduler import ContinuousEngine, make_engine
