"""Deviceless Mosaic pre-gate for serving tile policies.

A scoped-VMEM overflow in a Pallas stage kernel is a COMPILE-time
Mosaic error, but with a live TPU it surfaces only at the first jit
call — on the tunneled backend that can mean a remote-compile HTTP 500
after minutes of tracing (round-4 verdict, weak #4).  The image ships
libtpu, so the full XLA:TPU + Mosaic pipeline runs WITHOUT a chip via
`jax.experimental.topologies.get_topology_desc` (round-3 discovery,
tools/aot_compile_check.py): this module wraps that as a subprocess
gate `build_serving_decode` runs before returning an aggressive tile
policy on a shape that was never hardware-verified.  Gate failure (or
timeout) degrades to the universally-safe th=8/nck=0 policy instead of
crashing the caller's first decode.

Matches the serving role of the reference's decode path
(/root/reference/model_hnerv.py:160-175): the reference has no
compile-feasibility question (eager CUDA), so this gate is TPU-only
infrastructure with no reference analog.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys

_OK_MARK = "BNT_AOT_GATE_OK"


def _child_env():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # axon site-hook must not leak in
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    env.setdefault("TPU_WORKER_ID", "0")
    # the deviceless child must never touch the (single-client) tunnel
    env.pop("BNT_DECODE_TH", None)
    env.pop("BNT_DECODE_NCK", None)
    env.pop("BNT_DECODE_SPLIT", None)
    return env


def gate_policy(cfg, th, nck, split, w8a8: bool,
                planar_from_h: int = 200,
                timeout_s: float | None = None) -> bool:
    """AOT-compile the v5 decode at `cfg` under the given tile policy on
    the deviceless v5e target.  True = the policy compiles (safe to jit
    on the real chip); False = compile failed or timed out (callers
    should fall back to the safe policy).  Runs in a subprocess: the
    topology runtime must not initialize inside a process that may also
    own the tunneled TPU backend."""
    if timeout_s is None:
        timeout_s = float(os.environ.get("BNT_AOT_GATE_TIMEOUT", 900))
    payload = json.dumps({
        "cfg": dataclasses.asdict(cfg),
        "th": th, "nck": nck, "split": split,
        "w8a8": bool(w8a8), "planar_from_h": planar_from_h,
    })
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "from boosting_nerv_tpu.runtime.aot_gate import _gate_main; "
             "_gate_main()"],
            input=payload, capture_output=True, text=True,
            timeout=timeout_s, env=_child_env(),
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    except subprocess.TimeoutExpired:
        print(f"aot_gate: compile gate timed out (> {timeout_s:.0f}s); "
              "treating the policy as infeasible", file=sys.stderr)
        return False
    if _OK_MARK in (r.stdout or ""):
        return True
    tail = ((r.stderr or "") + (r.stdout or "")).strip().splitlines()
    detail = tail[-1][:200] if tail else "no output"
    print(f"aot_gate: policy failed deviceless compile rc={r.returncode} "
          f"({detail})", file=sys.stderr)
    return False


def _intkeys(v):
    if isinstance(v, dict):
        return {(int(k) if str(k).lstrip("-").isdigit() else k): int(x)
                for k, x in v.items()}
    return v


def _gate_main():  # pragma: no cover - exercised via subprocess
    spec = json.loads(sys.stdin.read())

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

    from boosting_nerv_tpu.config import BoostConfig, decoder_stage_plan
    from boosting_nerv_tpu.models import build_model
    from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v5

    cfg = BoostConfig(**spec["cfg"])
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    dev = topo.devices[0]

    model = build_model(cfg)
    h, w = (int(x) for x in cfg.crop_list.split("_"))

    # compile feasibility depends on shapes only: zero params from
    # eval_shape (a real 1080p model.init costs ~2 min on this host)
    if cfg.model.startswith("HNeRV"):
        pshapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0),
                               jnp.zeros((1, h, w, 3), jnp.float32),
                               jnp.zeros((1,), jnp.float32)))
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), pshapes)
        eshape = jax.eval_shape(
            lambda p: model.apply(p, jnp.zeros((1, h, w, 3), jnp.float32),
                                  method="encode"), params)
        embed = jnp.zeros(eshape.shape, eshape.dtype)
    else:  # NeRV / ENeRV families: t-only models, embed is a dummy
        pshapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0),
                               jnp.zeros((1,), jnp.float32)))
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), pshapes)
        embed = jnp.zeros((1, 1), jnp.float32)

    bounds = None
    if spec["w8a8"]:
        plan = decoder_stage_plan(
            cfg, cfg.fc_dim, hnerv_style=cfg.model.startswith("HNeRV"))
        bounds = {}
        for bi in range(len(plan)):
            bounds[f"{bi}.x"] = np.ones(plan[bi].ngf, np.float32)
            for k in ("t0", "t1"):
                bounds[f"{bi}.{k}"] = np.ones(plan[bi].new_ngf, np.float32)
        bounds[f"{len(plan) - 1}.h"] = np.ones(plan[-1].new_ngf, np.float32)

    dec = build_fast_decode_v5(
        cfg, params, planar_from_h=spec["planar_from_h"],
        th=_intkeys(spec["th"]), nck=_intkeys(spec["nck"]),
        split=_intkeys(spec["split"]), w8a8_bounds=bounds)

    shd = SingleDeviceSharding(dev)
    espec = jax.ShapeDtypeStruct(embed.shape, embed.dtype, sharding=shd)
    tspec = jax.ShapeDtypeStruct((1,), jnp.float32, sharding=shd)
    jax.jit(dec).trace(espec, tspec).lower().compile()
    print(_OK_MARK, flush=True)
