"""Collective census of the mesh-sharded decode step (VERDICT r4 item 9).

Lowers the sharded ContinuousEngine decode chunk on a virtual (data, model)
CPU mesh, then counts and sizes every collective in the compiled HLO —
attributing the virtual-mesh scaling loss to specific ops instead of a
single end-to-end number.

    python scripts/attr_collectives.py [--mesh 2x4] [--pairs 8]
"""

import argparse
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from chatterbox_vllm2_tpu.config import Config, EngineConfig, MeshConfig, T3Config  # noqa: E402
from chatterbox_vllm2_tpu.engine import T3Engine  # noqa: E402
from chatterbox_vllm2_tpu.engine.scheduler import ContinuousEngine  # noqa: E402
from chatterbox_vllm2_tpu.models.t3.model import init_t3_params  # noqa: E402
from chatterbox_vllm2_tpu.parallel import make_mesh  # noqa: E402

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
               "f16": 2, "u8": 1, "s64": 8}


def shape_bytes(sh: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", sh)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="2x4")
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    data, _, model = args.mesh.partition("x")
    mesh = make_mesh(MeshConfig(data=int(data), model=int(model)))

    t3 = T3Config.multilingual()
    config = Config(
        t3=t3,
        engine=EngineConfig(max_batch_size=args.pairs, max_model_len=384,
                            prefill_buckets=(64,),
                            decode_steps_per_dispatch=args.steps))
    params = init_t3_params(jax.random.PRNGKey(0), t3, jnp.bfloat16)
    eng = ContinuousEngine(T3Engine(config, params, mesh=mesh))

    lowered = eng.engine._decode_chunk.lower(
        eng.engine.params, eng._state, eng._sampling, eng._cfg_scale,
        eng._max_new, eng._text_len, num_steps=args.steps, cache_len=256)
    txt = lowered.compile().as_text()

    pat = re.compile(
        r"%?\S*\s*=\s*(\S+)\s+(all-gather|all-reduce|collective-permute|"
        r"reduce-scatter|all-to-all)(?:-start)?\(")
    counts = defaultdict(lambda: [0, 0])
    in_loop = defaultdict(lambda: [0, 0])
    loop_depth = 0
    for line in txt.splitlines():
        if "while" in line and "body" in line and "{" in line:
            pass
        m = pat.search(line)
        if m:
            sh, kind = m.groups()
            b = shape_bytes(sh)
            counts[kind][0] += 1
            counts[kind][1] += b
            if "while" in line or True:
                pass
    # per-op listing with shapes (collectives are few; print them all)
    print(f"mesh {args.mesh}, {args.pairs} pairs, {args.steps}-step chunk, "
          f"cache_len 256 — compiled HLO {len(txt.splitlines())} lines")
    print("\nALL collectives in the decode-chunk module:")
    n_total = 0
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            sh, kind = m.groups()
            meta = ""
            mm = re.search(r'op_name="([^"]*)"', line)
            if mm:
                meta = mm.group(1)[-70:]
            print(f"  {kind:20s} {sh:24s} {shape_bytes(sh):>10,} B  {meta}")
            n_total += 1
    print(f"\n{n_total} collective ops total")
    for kind, (n, b) in sorted(counts.items()):
        print(f"  {kind:20s} x{n:<3d} {b:>12,} bytes touched")

    # replicated-buffer survey: large buffers with no sharded dimension
    print("\nLarge (>=1 MB) buffers and their layouts (top 12):")
    bufs = []
    for line in txt.splitlines():
        for m in re.finditer(r"(\w+\[[\d,]+\])", line):
            b = shape_bytes(m.group(1))
            if b >= 1 << 20:
                bufs.append((b, m.group(1)))
    seen = {}
    for b, sh in bufs:
        seen.setdefault(sh, [0, b])[0] += 1
    top = sorted(seen.items(), key=lambda kv: -kv[1][1])[:12]
    for sh, (n, b) in top:
        print(f"  {sh:28s} x{n:<4d} {b:>12,} B each")


if __name__ == "__main__":
    main()
