"""The serving engine: what the reference borrows from vLLM, rebuilt TPU-native.

  engine      — jitted CFG-paired prefill + decode loop over a slotted KV cache
  scheduler   — continuous-batching scheduler (slot admission / eviction);
                make_engine() factory (auto-selects multi-host in
                multi-process jobs)
  paged       — paged-KV continuous engine (pair-level block tables + the
                Pallas pair-lane attention kernel)
  multihost   — lockstep multi-host serving driver over a global mesh
  analyzer    — alignment stream analyzer as an in-loop logit processor
"""

from .engine import T3Engine, T3Request, T3Result
from .scheduler import ContinuousEngine, make_engine

__all__ = ["T3Engine", "T3Request", "T3Result", "ContinuousEngine",
           "make_engine"]
