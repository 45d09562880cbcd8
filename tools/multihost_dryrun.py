"""Multi-HOST validation without a multi-host slice: 2 OS processes x 4
virtual CPU devices, real cross-process collectives.

The single-program SPMD design (SURVEY §2.5: the reference's gloo sockets
dissolve into in-program collectives) is validated on one process by the
8-device dryrun; what that cannot show is the *process boundary* — on a
real v5e/v5p multi-host slice every stage hop that crosses hosts rides DCN
through exactly the machinery exercised here: `jax.distributed` runtime,
a global mesh spanning processes, `device_put` of host data onto global
shardings, ppermute/psum across the boundary, and fully-replicated output
fetches. JAX's CPU gloo collectives implement the same program semantics
over TCP, so this run proves the engine code is multi-process-correct
(the reference needs 5 torchrun ranks + hand-rolled socket threads for
the same topology, comm/comm_handler.py).

Usage:
    python tools/multihost_dryrun.py            # parent: spawns 2 children
    python tools/multihost_dryrun.py --pid N    # child (internal)

Writes MULTIHOST_r02.json at the repo root on success.
"""

import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

N_PROCS = 2
DEVS_PER_PROC = 4
PORT = int(os.environ.get("MULTIHOST_PORT", "29512"))


def dataclasses_replace_topology(cfg, n_stages: int):
    import dataclasses
    from flowspec_tpu.config import StageTopology
    return dataclasses.replace(
        cfg, topology=StageTopology.even(cfg.model.num_hidden_layers,
                                         n_stages))


def child(pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVS_PER_PROC} "
        + os.environ.get("XLA_FLAGS", ""))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=N_PROCS, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, StageTopology, TreeConfig,
    )
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.parallel import PipelineEngine
    from flowspec_tpu.runtime import SpecEngine

    p = N_PROCS * DEVS_PER_PROC
    assert len(jax.devices()) == p, (pid, jax.devices())
    assert len(jax.local_devices()) == DEVS_PER_PROC

    # identical host data on every process (deterministic PRNG keys) — on a
    # real slice this is exactly how per-host weight loading works
    mc = ModelConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                     num_hidden_layers=2 * p, num_attention_heads=8,
                     num_key_value_heads=4, max_position_embeddings=512,
                     dtype="float32")
    tc = TreeConfig(top_k=6, depth=3, total_tokens=18, expand_tokens=12,
                    expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=12,
                    chunk_len=4, chunk_cap=12)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=8,
                       topology=StageTopology.even(2 * p, p))
    params = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(1), mc, embed=params.embed,
                              dtype=jnp.float32)
    prompt = np.arange(10, 30)

    # per-process local reference (no collectives): the lossless AR stream
    ref = SpecEngine(params, draft, cfg)
    ar, _ = ref.generate_ar(prompt, max_new_tokens=6, eos_token_id=-1)

    # global (stage,) mesh spanning both processes: stages 0-3 live on
    # process 0, stages 4-7 on process 1 — every chunk hop 3->4 and the
    # ring wrap 7->0 crosses the process boundary
    mesh = Mesh(np.array(jax.devices()), ("stage",))
    results = {}
    # ALL SIX schedules of the real product engine over the cross-process
    # mesh (r4 verdict #7): every stage hop 3->4 and ring wrap 7->0 is a
    # real TCP collective
    for schedule in ("ar", "serial", "naive", "pruned", "continuous",
                     "pipedec"):
        eng = PipelineEngine(params, draft, cfg, mesh=mesh,
                             schedule=schedule)
        out, stats = eng.generate_fused(prompt, max_new_tokens=6,
                                        eos_token_id=-1)
        ok = (stats["new_tokens"] == 6) and (out == ar)
        results[schedule] = {"ok": bool(ok), "turns": stats.get("turns")}
        print(f"[p{pid}] {schedule}: ok={ok} {stats}", flush=True)
        assert ok, (pid, schedule, out, ar, stats)

    # PP x TP across the boundary: a (stage=4, tp=2) mesh — each stage's
    # tp pair is intra-process, the stage ring crosses processes
    mesh2 = Mesh(np.array(jax.devices()).reshape(4, 2), ("stage", "tp"))
    cfg2 = dataclasses_replace_topology(cfg, 4)
    eng = PipelineEngine(params, draft, cfg2, mesh=mesh2,
                         schedule="continuous")
    out, stats = eng.generate_fused(prompt, max_new_tokens=6,
                                    eos_token_id=-1)
    ok = (stats["new_tokens"] == 6) and (out == ar)
    results["continuous_pp_x_tp"] = {"ok": bool(ok),
                                     "turns": stats.get("turns")}
    print(f"[p{pid}] continuous (stage=4, tp=2): ok={ok} {stats}",
          flush=True)
    assert ok, (pid, "pp_x_tp", out, ar, stats)

    # galaxy TP across the boundary: sequence-sharded ring all-gather /
    # reduce-scatter (parallel/galaxy.py) where half the ring hops cross
    # the process boundary — the reference's flagship TP mode
    # (tp/tp_modeling_llama.py:611-962), here under real multi-process
    # collectives
    from flowspec_tpu.parallel.tp import TPEngine
    from jax.sharding import Mesh as _Mesh
    # tp=4 (kv heads must divide tp), straddling the boundary: 2 devices
    # from each process
    gx = TPEngine(params, draft, cfg,
                  mesh=_Mesh(np.array(jax.devices()[2:6]), ("tp",)),
                  galaxy=True)
    out, stats = gx.generate(prompt, max_new_tokens=6, eos_token_id=-1)
    ok = (stats["new_tokens"] == 6) and (out == ar)
    results["galaxy_tp4"] = {"ok": bool(ok)}
    print(f"[p{pid}] galaxy tp=4 (cross-process): ok={ok} {stats}",
          flush=True)
    assert ok, (pid, "galaxy", out, ar, stats)
    print(f"[p{pid}] MULTIHOST OK {json.dumps(results)}", flush=True)


def parent() -> None:
    t0 = time.perf_counter()
    procs = []
    logs = []
    for pid in range(N_PROCS):
        log = open(f"/tmp/multihost_p{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--pid", str(pid)],
            stdout=log, stderr=subprocess.STDOUT, cwd=_ROOT))
    codes = [q.wait(timeout=1200) for q in procs]
    for log in logs:
        log.close()
    oks = []
    for pid in range(N_PROCS):
        text = open(f"/tmp/multihost_p{pid}.log").read()
        oks.append("MULTIHOST OK" in text)
        tail = text.strip().splitlines()[-3:]
        print(f"--- p{pid} (exit {codes[pid]}):")
        print("\n".join(tail))
    ok = all(c == 0 for c in codes) and all(oks)
    rec = {"ok": ok, "processes": N_PROCS,
           "devices_per_process": DEVS_PER_PROC,
           "schedules": ["ar", "serial", "naive", "pruned", "continuous",
                         "pipedec", "continuous_pp_x_tp", "galaxy_tp4"],
           "collectives": "gloo (cross-process TCP)",
           "wall_s": round(time.perf_counter() - t0, 1)}
    if not os.environ.get("MULTIHOST_NO_RECORD"):
        with open(os.path.join(
                _ROOT, os.environ.get("MULTIHOST_OUT",
                                      "MULTIHOST_r05.json")), "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if "--pid" in sys.argv:
        child(int(sys.argv[sys.argv.index("--pid") + 1]))
    else:
        parent()
