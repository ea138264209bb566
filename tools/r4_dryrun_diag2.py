"""Which sharding axis breaks the forward, and where in the output?

Run:  env -u PYTHONPATH JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -c "exec(open('tools/r4_dryrun_diag2.py').read())"
"""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import tempfile

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger

b = 8
H, W = 160, 160
frames = synthetic_video(b, H, W)


def run(dp, sp):
    tmp = tempfile.mkdtemp(prefix=f"d2_{dp}_{sp}_")
    cfg = BoostConfig(
        model="HNeRV_Boost", embed="pe_1.25_80",
        enc_strds=[5, 2, 2, 2, 2], enc_dim="64_16",
        dec_strds=[5, 2, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
        ks="0_1_5", reduce=1.2, lower_width=12, modelsize=1.275,
        conv_type=["convnext", "pshuffel_3x3"], act="sin",
        norm="none", sft_block="res_sft", ch_t=32,
        crop_list=f"{H}_{W}", loss="L2",
        epochs=1, batchSize=b, lr=1e-3, outf=tmp, not_resume=True,
        dp=dp, sp=sp,
    )
    cfg = resolve_sizes(cfg, final_size=720 * 1280, full_data_length=132)
    tr = RegressionTrainer(cfg, video=VideoData(frames),
                           logger=RunLogger(tmp, enable_tb=False))
    batch = tr.video.get_batch(list(range(b)))
    img = tr.mesh.shard_batch(jnp.asarray(batch["img"]),
                              spatial_axis=1 if sp > 1 else None)
    t = tr.mesh.shard_batch(jnp.asarray(batch["norm_idx"]))
    out = jax.jit(lambda p, i, tt: tr._forward(p, i, tt))(tr.params, img, t)
    emb = jax.jit(lambda p, i: tr.model.apply(p, i, method="encode"))(
        tr.params, img)
    return np.asarray(jax.device_get(out)), np.asarray(jax.device_get(emb))


out_ref, emb_ref = run(1, 1)
for dp, sp in ((8, 1), (4, 2), (2, 4)):
    out, emb = run(dp, sp)
    d = np.abs(out - out_ref)
    de = np.abs(emb - emb_ref).max()
    print(f"dp={dp} sp={sp}: out maxdiff {d.max():.3e}  "
          f"embed maxdiff {de:.3e}", flush=True)
    if d.max() > 1e-5:
        rows = d.max(axis=(0, 2, 3))
        bad = np.where(rows > d.max() * 0.1)[0]
        print(f"   worst rows (H): {bad[:20]} of {rows.shape[0]}",
              flush=True)
