"""Two-process jax.distributed smoke test on CPU (no pod needed).

Validates the multi-host runtime path end-to-end: `parallel.initialize()`
(explicit env overrides), `global_mesh()` spanning BOTH processes' devices,
cross-process GSPMD (a TP-sharded T3 layer matmul with its psum riding the
inter-process collective), and numeric parity with a single-process run.

    python scripts/multiprocess_smoke.py            # launches both workers

SURVEY.md §5.8 / VERDICT r3 item 4 ("no multi-process test").
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("SMOKE_PORT", 12355))
NPROC = 2
DEV_PER_PROC = 4


def worker() -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={DEV_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from chatterbox_vllm2_tpu.parallel.distributed import initialize

    assert initialize(), "initialize() did not start jax.distributed"
    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == NPROC * DEV_PER_PROC

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chatterbox_vllm2_tpu.parallel.distributed import global_mesh

    mesh = global_mesh(model_parallel=DEV_PER_PROC)
    assert mesh.devices.shape == (NPROC, DEV_PER_PROC), mesh.devices.shape

    # a TP-sharded linear: x [B, K] replicated, w [K, N] column-sharded over
    # 'model'; y = x @ w gathered — GSPMD inserts the all-gather across the
    # process boundary on the 'data' axis boundary rows
    rng = np.random.RandomState(0)
    x = rng.randn(8, 64).astype(np.float32)
    w = rng.randn(64, 128).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", None)))
    ws = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P(None, "model")))

    @jax.jit
    def f(x, w):
        return jnp.tanh(x @ w).sum(axis=1)

    y = f(xs, ws)
    # fully-replicated reduction so every process can fetch it
    total = float(jax.device_get(jnp.sum(y)))
    want = float(np.sum(np.tanh(x @ w).sum(axis=1)))
    assert abs(total - want) < 1e-2 * max(1.0, abs(want)), (total, want)
    if jax.process_index() == 0:
        print(f"multiprocess_smoke OK: {NPROC} processes x {DEV_PER_PROC} "
              f"devices, mesh {mesh.devices.shape}, sharded result matches "
              f"single-process ({total:.3f})")


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    procs = []
    for pid in range(NPROC):
        env = dict(os.environ)
        env.update({
            "CHATTERBOX_COORDINATOR": f"127.0.0.1:{PORT}",
            "CHATTERBOX_NUM_PROCESSES": str(NPROC),
            "CHATTERBOX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    out0, _ = procs[0].communicate(timeout=300)
    rc = [p.wait(timeout=300) for p in procs]
    sys.stdout.write(out0.decode())
    if any(rc):
        for i, p in enumerate(procs[1:], 1):
            sys.stdout.write(p.stdout.read().decode())
        raise SystemExit(f"worker exit codes {rc}")


if __name__ == "__main__":
    main()
