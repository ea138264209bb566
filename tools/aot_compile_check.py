"""Deviceless Mosaic compile check of the v5 decode at the UVG-1080p
bench config — no TPU needed.

Discovery (round 3, while the axon tunnel was down): the image ships
libtpu, and `jax.experimental.topologies.get_topology_desc` with
TPU_ACCELERATOR_TYPE=v5litepod-4 / TPU_WORKER_HOSTNAMES=localhost gives
a deviceless v5e target that runs the FULL XLA:TPU + Mosaic backend at
`lowered.compile()`.  Scoped-VMEM overflows (the th=12/16 blocker, see
CLAUDE.md) are compile-time errors, so per-policy feasibility of the
whole decode program is decidable offline; only timings need hardware.

Run from /root/repo:
  env -u PYTHONPATH JAX_PLATFORMS=cpu TPU_ACCELERATOR_TYPE=v5litepod-4 \
    TPU_WORKER_HOSTNAMES=localhost TPU_WORKER_ID=0 \
    python -c "exec(open('tools/aot_compile_check.py').read())"
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v5

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2")
DEV = topo.devices[0]
print("deviceless target:", DEV, flush=True)

cfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_80", enc_strds=[5, 3, 2, 2, 2],
    enc_dim="64_16", dec_strds=[5, 3, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    ks="0_1_5", reduce=1.2, lower_width=12, modelsize=2.8,
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=32, crop_list="1080_1920")
cfg = resolve_sizes(cfg, final_size=1920 * 1080, full_data_length=120)

model = build_model(cfg)
img = jnp.zeros((1, 1080, 1920, 3), jnp.float32)
t = jnp.asarray([0.5], jnp.float32)
params = model.init(jax.random.key(0), img, t)
embed = jax.jit(lambda p, i: model.apply(p, i, method="encode"))(params, img)
print("model built", flush=True)

shd = SingleDeviceSharding(DEV)
espec = jax.ShapeDtypeStruct(embed.shape, embed.dtype, sharding=shd)
tspec = jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=shd)

POLICIES = [
    ("default th270_16", dict(th={270: 16})),
    ("nck3@540", dict(th={270: 16}, nck={540: 3})),
    ("nck3@540 split", dict(th={270: 16}, nck={540: 3}, split=1)),
    ("nck4 split all", dict(th={270: 16}, nck={540: 4, 270: 2, 135: 2},
                            split=1)),
    ("th A540_12 nck3 split", dict(th={270: 16, "A540": 12},
                                   nck={540: 3}, split=1)),
    ("th540_12 nck3 split", dict(th={270: 16, 540: 12}, nck={540: 3},
                                 split=1)),
    ("th540_16 nck4 split", dict(th={270: 16, 540: 16}, nck={540: 4},
                                 split=1)),
    ("th540_12 nck3 nosplit", dict(th={270: 16, 540: 12}, nck={540: 3})),
    # round-3b frontier: can deeper chunks unlock th=16+ at 540, or
    # taller 270 tiles?  (feasibility only; time the survivors on hw)
    ("th540_16 nck6", dict(th={270: 16, 540: 16}, nck={540: 6})),
    ("th540_16 nck8", dict(th={270: 16, 540: 16}, nck={540: 8})),
    ("thA540_16 nck4 B12nck3", dict(th={270: 16, "A540": 16, "B540": 12},
                                    nck={"A540": 4, "B540": 3})),
    ("th540_12 nck4 split", dict(th={270: 16, 540: 12}, nck={540: 4},
                                 split=1)),
    ("th540_20 nck5", dict(th={270: 16, 540: 20}, nck={540: 5})),
    ("th270_24 540_12nck3", dict(th={270: 24, 540: 12}, nck={540: 3})),
    ("th270_32 540_12nck3", dict(th={270: 32, 540: 12}, nck={540: 3})),
]

import os

# BNT_AOT_W8A8=1: check int8 (W8A8) policies instead.  Compile
# feasibility is independent of the calibration values, so dummy
# all-ones bounds stand in for calibrate_planar_bounds.
if os.environ.get("BNT_AOT_W8A8"):
    import numpy as np
    from boosting_nerv_tpu.config import decoder_stage_plan

    plan = decoder_stage_plan(cfg, cfg.fc_dim, hnerv_style=True)
    BOUNDS = {}
    for bi in range(2, len(plan)):  # planar tail of the 1080p config
        BOUNDS[f"{bi}.x"] = np.ones(plan[bi].ngf, np.float32)
        for k in ("t0", "t1"):
            BOUNDS[f"{bi}.{k}"] = np.ones(plan[bi].new_ngf, np.float32)
    BOUNDS[f"{len(plan)-1}.h"] = np.ones(plan[-1].new_ngf, np.float32)
    POLICIES = [
        ("i8 th8", dict(th={270: 16}, w8a8_bounds=BOUNDS)),
        ("i8 th540_12", dict(th={270: 16, 540: 12}, w8a8_bounds=BOUNDS)),
        ("i8 th540_16", dict(th={270: 16, 540: 16}, w8a8_bounds=BOUNDS)),
        ("i8 th540_12 270_24", dict(th={270: 24, 540: 12},
                                    w8a8_bounds=BOUNDS)),
        ("i8 th540_16 270_24", dict(th={270: 24, 540: 16},
                                    w8a8_bounds=BOUNDS)),
        # bf16 A270 (cpi=80, int8-ineligible) keeps its nck3 chunking
        ("i8 th540_12 A270nck3", dict(th={270: 16, 540: 12},
                                      nck={"A270": 3},
                                      w8a8_bounds=BOUNDS)),
        # round-5 frontier: zero-convert (default) shrank scoped VMEM —
        # th={270:24,540:16} is the hardware-verified 40 fps policy; can
        # taller tiles (or taller 135-zone tiles) fit now?
        ("zc th540_20 270_24", dict(th={270: 24, 540: 20},
                                    w8a8_bounds=BOUNDS)),
        ("zc th540_24 270_24", dict(th={270: 24, 540: 24},
                                    w8a8_bounds=BOUNDS)),
        ("zc th540_16 270_32", dict(th={270: 32, 540: 16},
                                    w8a8_bounds=BOUNDS)),
        ("zc th540_16 270_24 135_16", dict(th={135: 16, 270: 24, 540: 16},
                                           w8a8_bounds=BOUNDS)),
        ("zc max 135_16 270_32 540_24", dict(th={135: 16, 270: 32,
                                                 540: 24},
                                             w8a8_bounds=BOUNDS)),
    ]

_only = os.environ.get("BNT_AOT_ONLY")  # substring filter, comma-separated
if _only:
    keys = [s.strip() for s in _only.split(",")]
    POLICIES = [(t, k) for t, k in POLICIES
                if any(s in t for s in keys)]
    print("filtered policies:", [t for t, _ in POLICIES], flush=True)

for tag, kw in POLICIES:
    t0 = time.perf_counter()
    try:
        dec = build_fast_decode_v5(cfg, params, planar_from_h=200, **kw)
        compiled = jax.jit(dec).trace(espec, tspec).lower().compile()
        mem = compiled.memory_analysis()
        print(f"{tag:28s} COMPILE OK  temp={mem.temp_size_in_bytes/2**20:.0f}M"
              f"  ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{tag:28s} FAIL {type(e).__name__}: {msg}", flush=True)
