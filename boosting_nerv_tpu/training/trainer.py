"""Regression / inpainting / interpolation trainer.

Orchestration parity with /root/reference/train_nerv_all.py:153-448 —
seeded init, seen/unseen split, per-step string-schedule LR, Fusion10_freq
loss on masked frames, 8-slot {pred,quant}x{seen,unseen}x{PSNR,MS-SSIM}
eval, PTQ (8-bit weights + 6-bit embeddings) + Huffman bits/param + bpp,
decode-FPS measurement (encoder excluded for the HNeRV family,
model_hnerv.py:240), model_latest checkpoint + auto-resume, CSV dump.

TPU-native design:
 - one jitted `train_step` covering forward + loss + backward + Adan update;
   the LR is a device scalar argument (no retrace per step);
 - batches are device_put with a ('data','spatial') NamedSharding; on a
   multi-chip mesh XLA inserts the gradient psum over ICI (the DDP
   equivalent) — the same code path runs on a 1x1 mesh single-chip;
 - decode FPS is measured on a jitted decode function with
   block_until_ready around a rep loop (the analog of the reference's
   cuda.synchronize-bracketed clock).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import BoostConfig, resolve_sizes
from ..data.video import VideoData, data_split, make_inpaint_mask
from ..models import build_model
from ..ops.losses import loss_fn
from ..ops.metrics import msssim_per_frame, psnr_per_frame
from ..ops.msssim import ssim
from ..ops.ptq import dequant_tensor, quant_tensor
from ..compress.huffman import huffman_code_lengths
from ..parallel.mesh import MeshPlan, make_mesh_plan
from ..utils.logger import RunLogger
from .adan import adan
from .checkpoint import (load_checkpoint, save_checkpoint,
                         save_checkpoint_async, tree_restore,
                         wait_pending_saves)
from .schedules import lr_multiplier

METRIC_NAMES = [
    "pred_seen_psnr", "pred_seen_ssim", "pred_unseen_psnr", "pred_unseen_ssim",
    "quant_seen_psnr", "quant_seen_ssim", "quant_unseen_psnr", "quant_unseen_ssim",
]


def make_optimizer(optim_type: str, clip_max_norm: Optional[float] = 0.0):
    """Adan (reference default) or Adam; LR injected per step.
    The reference's case-sensitive dispatch crash on the lowercase default
    (train_nerv_all.py:78,260-263) is fixed by case-insensitive matching."""
    name = optim_type.lower()
    if name == "adan":
        base = adan(learning_rate=1.0)
    elif name == "adam":
        inner = optax.scale_by_adam()

        def update(grads, state, params=None, *, lr=None):
            u, s = inner.update(grads, state, params)
            u = jax.tree_util.tree_map(lambda x: -lr * x, u)
            return u, s

        base = optax.GradientTransformation(inner.init, update)
    else:
        raise ValueError(f"unknown optim_type {optim_type}")

    if clip_max_norm and clip_max_norm > 0:
        clipper = optax.clip_by_global_norm(clip_max_norm)

        def update2(grads, state, params=None, *, lr=None):
            grads, cstate = clipper.update(grads, state[0], params)
            u, bstate = base.update(grads, state[1], params, lr=lr)
            return u, (cstate, bstate)

        return optax.GradientTransformation(
            lambda p: (clipper.init(p), base.init(p)), update2)
    return base


def params_m(params) -> float:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params)) / 1e6


def encoder_split(params) -> Tuple[Dict, Dict]:
    """Split flat param dict into (encoder, non-encoder) leaves by path."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params)
    enc = {k: v for k, v in flat.items() if any("encoder" in str(p) for p in k)}
    dec = {k: v for k, v in flat.items() if k not in enc}
    return enc, dec


class RegressionTrainer:
    def __init__(self, cfg: BoostConfig, video: Optional[VideoData] = None,
                 logger: Optional[RunLogger] = None):
        self.cfg0 = cfg
        np.random.seed(cfg.manualSeed)
        # training numerics: the reference trains fp32; on TPU the default
        # 1-pass-bf16 matmuls make the high-frequency (FFT) loss diverge
        # (see BoostConfig.train_precision), so the ENeRV transformer trunk
        # is pinned to "highest" matmul precision.  Precision alone does
        # NOT stabilize it, though: the trunk's norm-free post-residual
        # blocks (/root/reference/model_enerv.py:59-71, prenorm=False)
        # walk to exploding activations on this stack (trans2 std 14398
        # after 60 flatlined epochs vs 0.12 at init —
        # tools/r4_enerv_postmortem.py; sin wraps downstream so the loss
        # never penalizes scale).  Global grad clipping caps the early
        # steps that walk there — measured: 15.08 dB flatline without it,
        # monotone climb through 18+ dB with clip=1.0 (BASELINE.md round
        # 4).  The reference exposes the same flag
        # (train_nerv_all.py:79,346-347, default 0); torch/fp32 dynamics
        # evidently don't need it, ours do, so the ENeRV default is 1.0
        # here (explicit --clip_max_norm wins).
        if cfg.model.startswith("ENeRV"):
            if cfg.train_precision != "highest":
                print(f"train_precision {cfg.train_precision!r} -> "
                      "'highest': the E-NeRV transformer trunk diverges "
                      "below full matmul precision (measured, BASELINE.md)")
                cfg = cfg.replace(train_precision="highest")
            if cfg.clip_max_norm is None:
                print("clip_max_norm unset -> 1.0: the E-NeRV trunk's "
                      "norm-free residuals need grad clipping on this "
                      "stack (measured, BASELINE.md round 4); pass an "
                      "explicit --clip_max_norm 0 to disable")
                cfg = cfg.replace(clip_max_norm=1.0)
            self.cfg0 = cfg
        if cfg.clip_max_norm is None:
            cfg = cfg.replace(clip_max_norm=0.0)
            self.cfg0 = cfg
        jax.config.update("jax_default_matmul_precision", cfg.train_precision)

        self.video = video if video is not None else VideoData.from_dir(
            cfg.data_path, cfg.crop_list, cfg.interpolation, cfg.embed_inter)
        self.cfg = cfg = resolve_sizes(cfg, self.video.final_size, self.video.n)

        split = [int(x) for x in cfg.data_split.split("_")]
        self.train_ind, self.val_ind = data_split(
            list(range(self.video.n)), split, cfg.shuffle_data, 0)
        self.val_ind_set = set(self.val_ind)

        self.model = build_model(cfg)
        self.mesh: MeshPlan = make_mesh_plan(cfg.dp, cfg.sp)

        # optional memory-saving planar-layout training forward (see
        # config.planar_train); numerically equivalent, so it also serves
        # eval_step. Ineligible configs fall back to the standard path.
        self._planar_fwd = None
        self._planar_dec = None  # decode-from-embedding (CEM trainer)
        if cfg.planar_train:
            from .planar_forward import build_planar_forward
            try:
                self._planar_fwd = build_planar_forward(
                    cfg, self.model, cfg.planar_train)
                if cfg.model == "HNeRV_Boost":
                    self._planar_dec = build_planar_forward(
                        cfg, self.model, cfg.planar_train, decode_only=True)
            except ValueError as e:
                print(f"planar_train disabled: {e}")

        # Resident dataset: on a single device, park the whole video in HBM
        # as uint8 once and gather+normalise per step INSIDE jit. Streaming
        # each frame host->device per step costs more than the step itself
        # on a tunneled TPU (measured 1.26 s/step vs 0.38 s compute at
        # 720p); resident frames remove all per-step host traffic.
        self._resident = (cfg.dp * cfg.sp == 1)
        self.frames_dev = (jax.device_put(self.video.frames)
                           if self._resident else None)
        self._gather = jax.jit(
            lambda f, i: f[i].astype(jnp.float32) / 255.0)

        key = jax.random.key(cfg.manualSeed)
        h, w = self.video.frames.shape[1:3]
        dummy_img = jnp.zeros((1, h, w, 3), jnp.float32)
        dummy_t = jnp.zeros((1,), jnp.float32)
        if cfg.model == "HNeRV_Boost":
            self.params = self.model.init(key, dummy_img, dummy_t)
        elif cfg.model == "HNeRV":
            self.params = self.model.init(
                key, dummy_img if cfg.enc_strds else dummy_t)
        else:
            self.params = self.model.init(key, dummy_t)
        self.params = self.mesh.replicate(self.params)

        self.opt = make_optimizer(cfg.optim_type, cfg.clip_max_norm)
        self.opt_state = self.opt.init(self.params)

        mask = make_inpaint_mask(h, w, cfg.inpanting)
        self.inpaint_mask = (None if mask is None
                             else jnp.asarray(mask)[None, :, :, None])

        self.logger = logger or RunLogger(cfg.outf)
        self.start_epoch = max(cfg.start_epoch, 0)

        # param accounting (reference train_nerv_all.py:238-243)
        from flax.traverse_util import flatten_dict

        flat = flatten_dict(jax.device_get(self.params))
        self.encoder_param = sum(
            int(np.prod(v.shape)) for k, v in flat.items()
            if any("encoder" in str(s) for s in k)) / 1e6
        self.decoder_param = params_m(self.params) - self.encoder_param
        self.total_param = (self.decoder_param
                            + getattr(cfg, "embed_param", 0.0) / 1e6)
        self.fps = 0.0
        self.fps_decode_path = "flax"
        self.bits_per_param = 0.0
        self.full_bits_per_param = 0.0
        self.total_bpp = 0.0
        self.best_metrics = {k: 0.0 for k in METRIC_NAMES}
        self.psnr_history: List[float] = []

        self._build_steps()

    # ------------------------------------------------------------------ #
    def _forward(self, params, img, t):
        cfg = self.cfg
        if self._planar_fwd is not None:
            return self._planar_fwd(params, img, t)
        if cfg.model == "HNeRV_Boost":
            return self.model.apply(params, img, t)
        if cfg.model == "HNeRV":
            return self.model.apply(params, img if cfg.enc_strds else t)
        return self.model.apply(params, t)

    def _build_steps(self):
        cfg = self.cfg
        mask = self.inpaint_mask

        fwd = (jax.checkpoint(self._forward) if cfg.remat
               else self._forward)

        def loss_and_grads(params, img, t):
            img_in = jnp.clip(img * mask, 0, 1) if mask is not None else img

            def lossf(p):
                out = fwd(p, img_in, t)
                if mask is not None:
                    l = loss_fn(out * mask, img * mask, cfg.loss)
                else:
                    l = loss_fn(out, img, cfg.loss)
                return l, out

            (l, out), grads = jax.value_and_grad(lossf, has_aux=True)(params)
            return l, out, grads

        mb = cfg.micro_batch

        def step(params, opt_state, img, t, lr):
            if mb and img.shape[0] > mb and img.shape[0] % mb == 0:
                # gradient accumulation: scan over micro-batches so the
                # activation working set stays at micro_batch frames
                n_chunks = img.shape[0] // mb
                imgs = img.reshape((n_chunks, mb) + img.shape[1:])
                tsc = t.reshape(n_chunks, mb)

                def body(acc, chunk):
                    ci, ct = chunk
                    l, out, grads = loss_and_grads(params, ci, ct)
                    g_acc, l_acc = acc
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                    return (g_acc, l_acc + l), psnr_per_frame(out, ci)

                zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
                (g_sum, l_sum), psnrs = jax.lax.scan(
                    body, (zero_g, jnp.float32(0.0)), (imgs, tsc))
                grads = jax.tree_util.tree_map(
                    lambda g: g / n_chunks, g_sum)
                l = l_sum / n_chunks
                psnr = psnrs.reshape(-1)
            else:
                l, out, grads = loss_and_grads(params, img, t)
                psnr = psnr_per_frame(out, img)
            updates, opt_state = self.opt.update(grads, opt_state, params,
                                                 lr=lr)
            params = optax.apply_updates(params, updates)
            return params, opt_state, l, psnr

        self.train_step = jax.jit(step, donate_argnums=(0, 1))

        def step_idx(params, opt_state, frames, idx, t, lr):
            img = frames[idx].astype(jnp.float32) / 255.0
            return step(params, opt_state, img, t, lr)

        self.train_step_idx = jax.jit(step_idx, donate_argnums=(0, 1))

        h, w = self.video.frames.shape[1:3]
        use_ms = min(h, w) >= 176
        # single-scale fallback for small frames; clamp the window to fit
        win = min(11, (min(h, w) // 2) * 2 - 1)

        def _ssim_metric(out, img):
            if use_ms:
                return msssim_per_frame(out, img)
            return ssim(out, img, size_average=False, win_size=win)

        self._ssim_metric = _ssim_metric

        def eval_step(params, img, t):
            img_in = jnp.clip(img * mask, 0, 1) if mask is not None else img
            out = self._forward(params, img_in, t)
            return out, psnr_per_frame(out, img), _ssim_metric(out, img)

        self.eval_step = jax.jit(eval_step)

        if cfg.is_hnerv_family and cfg.enc_strds:
            self.encode_step = jax.jit(
                lambda params, img: self.model.apply(params, img, method="encode"))
            if cfg.model == "HNeRV_Boost":
                self.decode_step = jax.jit(
                    lambda params, e, t: self.model.apply(params, e, t,
                                                          method="decode"))
            else:
                self.decode_step = jax.jit(
                    lambda params, e, t: self.model.apply(params, e,
                                                          method="decode"))
        else:
            self.encode_step = None
            self.decode_step = jax.jit(lambda params, e, t:
                                       self._forward(params, None, t))

    # ------------------------------------------------------------------ #
    def _device_batch(self, batch):
        """Shard a host batch: frames over 'data', H (NHWC axis 1) over
        'spatial' when --sp > 1. XLA SPMD inserts the conv halo exchanges
        and the gradient psum (the DDP equivalent, SURVEY.md §5.8)."""
        sp_ax = 1 if self.mesh.sp > 1 else None
        img = self.mesh.shard_batch(jnp.asarray(batch["img"]),
                                    spatial_axis=sp_ax)
        t = self.mesh.shard_batch(jnp.asarray(batch["norm_idx"]))
        return img, t

    def maybe_resume(self):
        cfg = self.cfg
        if cfg.weight not in ("None", "", None):
            ck = load_checkpoint(cfg.weight)
            self.params = self.mesh.replicate(
                tree_restore(self.params, ck["params"]))
            self.logger.print(f"=> loaded checkpoint '{cfg.weight}' "
                              f"(epoch {ck['epoch']})")
            self.start_epoch = max(cfg.start_epoch, 0)
        if not cfg.not_resume:
            path = os.path.join(cfg.outf, "model_latest.ckpt")
            if os.path.isfile(path):
                ck = load_checkpoint(path)
                self.params = self.mesh.replicate(
                    tree_restore(self.params, ck["params"]))
                self.start_epoch = ck["epoch"]
                self.logger.print(
                    f"=> Auto resume loaded checkpoint '{path}' "
                    f"(epoch {ck['epoch']})")

    # ------------------------------------------------------------------ #
    def train(self):
        cfg = self.cfg
        self.logger.dump_config(self.cfg0)
        self.maybe_resume()
        n_train_batches = max(len(self.train_ind) // cfg.batchSize, 1)
        t_start = time.time()

        profiling = False
        for epoch in range(self.start_epoch, cfg.epochs):
            ep_start = time.time()
            psnr_accum = []
            batches = self.video.epoch_batches(
                self.train_ind, cfg.batchSize, shuffle=True,
                seed=cfg.manualSeed + epoch)
            for i, batch in enumerate(batches):
                if i > 10 and cfg.debug:
                    break
                # optional step-trace capture (SURVEY.md §5.1: the reference
                # has no profiler; we expose jax.profiler on steps 2-6)
                if cfg.profile and epoch == self.start_epoch:
                    try:
                        if i == 2 and not profiling:
                            jax.profiler.start_trace(
                                os.path.join(cfg.outf, "profile"))
                            profiling = True
                        elif i == 7 and profiling:
                            jax.profiler.stop_trace()
                            profiling = False
                            self.logger.print("profiler trace captured")
                    except Exception as e:
                        self.logger.print(f"profiler unavailable: {e}")
                        profiling = False
                progress = (epoch + i / n_train_batches) / cfg.epochs
                lr = cfg.lr * lr_multiplier(
                    cfg.lr_type, progress, cur_iter=i, epochs=cfg.epochs,
                    full_data_length=self.video.n, cur_epoch=epoch)
                if self._resident:
                    self.params, self.opt_state, loss, psnr = \
                        self.train_step_idx(
                            self.params, self.opt_state, self.frames_dev,
                            jnp.asarray(batch["idx"]),
                            jnp.asarray(batch["norm_idx"]), jnp.float32(lr))
                else:
                    img, t = self._device_batch(batch)
                    self.params, self.opt_state, loss, psnr = self.train_step(
                        self.params, self.opt_state, img, t,
                        jnp.float32(lr))
                # keep psnr on device: a per-step host sync serialises
                # dispatch against the tunnel round-trip
                psnr_accum.append(psnr)
                if i % cfg.print_freq == 0 or i == n_train_batches - 1:
                    cur = float(jnp.concatenate(psnr_accum).mean())
                    self.logger.print(
                        f"Epoch[{epoch + 1}/{cfg.epochs}], "
                        f"Step [{i + 1}/{n_train_batches}], lr:{lr:.2e} "
                        f"pred_PSNR: {cur:.4f}")

            ep_psnr = (float(jnp.concatenate(psnr_accum).mean())
                       if psnr_accum else 0.0)
            self.logger.scalar("Train/pred_PSNR", ep_psnr, epoch + 1)
            self.logger.scalar("Train/lr", lr, epoch + 1)
            self.logger.print(
                f"Time/epoch: {time.time() - ep_start:.2f}s "
                f"avg {(time.time() - t_start) / (epoch + 1 - self.start_epoch):.2f}s")

            last = cfg.epochs - epoch
            if (epoch + 1) % cfg.eval_freq == 0 or last in (1, 3, 5):
                results = self.evaluate(
                    dump_vis=(cfg.dump_images or cfg.dump_videos) and last == 1,
                    huffman_coding=(last == 1))
                msg = f"Eval at epoch {epoch + 1}: "
                for k in METRIC_NAMES:
                    v = results[k]
                    self.best_metrics[k] = max(self.best_metrics[k], v)
                    if "psnr" in k:
                        self.logger.scalar(f"Val/{k}", v, epoch + 1)
                        if k == "pred_seen_psnr":
                            self.psnr_history.append(v)
                    msg += f"{k}: {v:.4f} | "
                self.logger.print(msg)

            save_checkpoint_async(
                os.path.join(cfg.outf, "model_latest.ckpt"),
                epoch + 1, self.params, self.opt_state)

        wait_pending_saves()
        # async saves may drop epochs while a download is in flight; the
        # final state must land unconditionally
        if cfg.epochs > self.start_epoch:
            save_checkpoint(os.path.join(cfg.outf, "model_latest.ckpt"),
                            cfg.epochs, self.params, self.opt_state)
        self.train_time = time.time() - t_start
        self.cur_epoch = cfg.epochs
        self.dump_csv(f"epoch{cfg.epochs}.csv")
        self.logger.print(f"Training complete in: {self.train_time:.1f}s")
        return self.best_metrics

    # ------------------------------------------------------------------ #
    def quantize_model_params(self):
        """PTQ: 8-bit affine quantisation of every non-encoder weight
        (train_nerv_all.py:622-642). Returns (quantised params, quant_ckt)."""
        from flax.traverse_util import flatten_dict, unflatten_dict

        cfg = self.cfg
        if cfg.quant_model_bit == -1:
            return self.params, None
        flat = flatten_dict(jax.device_get(self.params))
        quant_ckt = {}
        new_flat = {}
        for k, v in flat.items():
            if any("encoder" in str(p) for p in k):
                new_flat[k] = v
                continue
            q, new_v = quant_tensor(np.asarray(v), cfg.quant_model_bit)
            quant_ckt["/".join(map(str, k))] = q
            new_flat[k] = jnp.asarray(new_v)
        return unflatten_dict(new_flat), quant_ckt

    def _batch_img(self, batch):
        """Device image batch: gathered from the resident uint8 frames on a
        single device, host-uploaded otherwise."""
        if self._resident:
            return self._gather(self.frames_dev, jnp.asarray(batch["idx"]))
        return jnp.asarray(batch["img"])

    def _collect_embeds(self):
        cfg = self.cfg
        embeds = []
        for batch in self.video.epoch_batches(range(self.video.n),
                                              cfg.batchSize, False, 0,
                                              drop_last=False):
            img = self._batch_img(batch)
            embeds.append(np.asarray(self.encode_step(self.params, img)))
        return np.concatenate(embeds, axis=0)

    def measure_fps(self, params, reps: int = 20) -> float:
        """Decode steps/s; encoder excluded for the HNeRV family (the
        reference clock convention, model_hnerv.py:240-250).

        Timed as `reps` decodes inside ONE lax.scan dispatch with a scalar
        readback: on the tunneled TPU backend, per-call block_until_ready
        returns at dispatch-ack, so naive rep loops measure RTT instead of
        compute (see CLAUDE.md).

        When the config matches the HNeRV-Boost paper decode (the serving
        runtime's supported shape) this reports the Pallas fast-decode
        path — the number a deployment would see — and falls back to the
        flax decode otherwise (mirrors the reference, which times its one
        eager path, train_nerv_all.py:490-496)."""
        cfg = self.cfg
        fast = self._try_fast_fps(params, reps)
        if fast is not None:
            return fast
        b = min(cfg.batchSize, self.video.n)
        batch = self.video.get_batch(list(range(b)))
        if self.encode_step is not None:
            embed = self.encode_step(params, jnp.asarray(batch["img"]))
            if self.mesh.sp > 1:
                # spatially-sharded decode: embed H over the 'spatial' axis
                embed = jax.device_put(
                    embed, self.mesh.batch_sharding(embed.ndim,
                                                    spatial_axis=1))
        else:
            embed = None
        decode = self.decode_step

        @jax.jit
        def decode_n(params, embed, ts):
            def body(c, tt):
                out = decode(params, embed, jnp.full((b,), tt))
                return c + out.astype(jnp.float32).mean(), None
            acc, _ = jax.lax.scan(body, 0.0, ts)
            return acc

        ts = jnp.linspace(0.01, 1.0, reps)
        float(decode_n(params, embed, ts))  # compile + warm
        t0 = time.time()
        float(decode_n(params, embed, ts))
        dt = time.time() - t0
        self.fps_decode_path = "flax"
        return reps * b / dt

    def _try_fast_fps(self, params, reps: int) -> Optional[float]:
        """Serving-runtime fps (Pallas fast decode, batch 1) when the
        config is eligible; None -> caller falls back to the flax path
        (ineligible config, sharded decode, or a non-TPU backend where
        Mosaic kernels cannot compile)."""
        cfg = self.cfg
        index_only = cfg.model in ("NeRV_Boost", "ENeRV_Boost")
        if (self.mesh.sp > 1 or self.mesh.dp > 1
                or not (index_only or (cfg.model == "HNeRV_Boost"
                                       and self.encode_step is not None))):
            return None
        from ..runtime.fast_decode import (build_fast_decode_v5,
                                           build_serving_decode)
        try:
            if index_only:
                embed = None
            else:
                batch = self.video.get_batch([0])
                embed = self.encode_step(params, jnp.asarray(batch["img"]))
        except Exception:
            return None
        # the serving policy's aggressive tile heights are hardware-
        # validated only at the bench shape; any compile/VMEM failure on
        # another shape (or HBM pressure from the live training state)
        # retries once with the universally-safe th=8 policy before
        # falling back to the flax decode — and says why, once.
        builders = (
            ("pallas", lambda: build_serving_decode(cfg, params)),
            ("pallas-safe", lambda: build_fast_decode_v5(
                cfg, params, planar_from_h=200, th=8)),
        )
        for path, mk in builders:
            try:
                decode = mk()

                @jax.jit
                def decode_n(embed, ts):
                    def body(c, tt):
                        out = decode(embed, tt[None])
                        return c + out.astype(jnp.float32).mean(), None
                    acc, _ = jax.lax.scan(body, 0.0, ts)
                    return acc

                ts = jnp.linspace(0.01, 1.0, reps)
                float(decode_n(embed, ts))  # compile+warm (raises off-TPU)
            except Exception as e:
                if not getattr(self, "_fast_fps_warned", False):
                    self._fast_fps_warned = True
                    print(f"fast-decode fps path '{path}' unavailable "
                          f"({type(e).__name__}: {str(e)[:120]}); "
                          "trying fallback")
                continue
            t0 = time.time()
            float(decode_n(embed, ts))
            dt = time.time() - t0
            self.fps_decode_path = path
            return reps / dt
        return None

    def evaluate(self, dump_vis: bool = False, huffman_coding: bool = False
                 ) -> Dict[str, float]:
        cfg = self.cfg
        params_q, quant_ckt = self.quantize_model_params()

        # 6-bit PTQ of the concatenated video embedding (HNeRV family,
        # train_nerv_all.py:533-546)
        quant_embed = None
        dequant_embeds = None
        if cfg.is_hnerv_family and self.encode_step is not None:
            vid_embed = self._collect_embeds()
            quant_embed, deq = quant_tensor(vid_embed, cfg.quant_embed_bit)
            dequant_embeds = dequant_tensor(quant_embed).astype(np.float32)

        slots = {k: [] for k in METRIC_NAMES}
        vis_dir = None
        if dump_vis:
            vis_dir = os.path.join(cfg.outf, "visualize_model_orig")
            os.makedirs(vis_dir, exist_ok=True)

        for model_ind, p in enumerate([self.params, params_q]):
            for bi, batch in enumerate(self.video.epoch_batches(
                    range(self.video.n), cfg.batchSize, False, 0,
                    drop_last=False)):
                if bi > 10 and cfg.debug:
                    break
                img = self._batch_img(batch)
                t = jnp.asarray(batch["norm_idx"])
                idx = batch["idx"]

                if (model_ind == 1 and dequant_embeds is not None):
                    # quant model decodes from the dequantised embedding;
                    # interpolation val frames still use the neighbour
                    # average, which OVERRIDES the dequantised embedding
                    # (model_hnerv.py:236-237 applies pre/post after the
                    # input_embed assignment; train_nerv_all.py:480-482)
                    e = jnp.asarray(dequant_embeds[idx])
                    if (cfg.interpolation and cfg.embed_inter
                            and self.encode_step is not None):
                        pre = self.encode_step(p, jnp.asarray(batch["pre_img"]))
                        post = self.encode_step(p, jnp.asarray(batch["post_img"]))
                        is_val = jnp.asarray(
                            [int(i) in self.val_ind_set for i in idx])
                        e = jnp.where(is_val[:, None, None, None],
                                      0.5 * (pre + post), e)
                    out = self.decode_step(p, e, t)
                    pv = np.asarray(psnr_per_frame(out, img))
                    sv = np.asarray(self._ssim_metric(out, img))
                elif (cfg.interpolation and cfg.embed_inter
                      and self.encode_step is not None):
                    e = self.encode_step(p, img)
                    pre = self.encode_step(p, jnp.asarray(batch["pre_img"]))
                    post = self.encode_step(p, jnp.asarray(batch["post_img"]))
                    is_val = jnp.asarray(
                        [int(i) in self.val_ind_set for i in idx])
                    mixed = jnp.where(is_val[:, None, None, None],
                                      0.5 * (pre + post), e)
                    out = self.decode_step(p, mixed, t)
                    pv = np.asarray(psnr_per_frame(out, img))
                    sv = np.asarray(self._ssim_metric(out, img))
                else:
                    out, pv, sv = self.eval_step(p, img, t)
                    pv, sv = np.asarray(pv), np.asarray(sv)

                for b, frame_idx in enumerate(idx):
                    seen = int(frame_idx) not in self.val_ind_set
                    base = (0 if seen else 2) + 4 * model_ind
                    slots[METRIC_NAMES[base]].append(float(pv[b]))
                    slots[METRIC_NAMES[base + 1]].append(float(sv[b]))

                if dump_vis and model_ind == 0:
                    from PIL import Image

                    arr = np.asarray(jnp.clip(out, 0, 1) * 255).astype(np.uint8)
                    for b, frame_idx in enumerate(idx):
                        Image.fromarray(arr[b]).save(os.path.join(
                            vis_dir,
                            f"pred_{int(frame_idx):04d}_{pv[b]:.2f}.png"))

        if dump_vis and cfg.dump_videos:
            import imageio

            frames = [imageio.v2.imread(os.path.join(vis_dir, f))
                      for f in sorted(os.listdir(vis_dir))]
            imageio.mimsave(os.path.join(cfg.outf, "gt_pred.gif"), frames,
                            format="GIF")

        self.fps = self.measure_fps(self.params,
                                    reps=100 if cfg.eval_fps else 20)

        if huffman_coding and quant_ckt is not None:
            self._huffman_accounting(quant_ckt, quant_embed)

        results = {k: (float(np.mean(v)) if v else 0.0)
                   for k, v in slots.items()}
        self.logger.print(
            "Eval FPS {:.2f}, ".format(self.fps)
            + " | ".join(f"{k}: {v:.4f}" for k, v in results.items()))
        return results

    def _huffman_accounting(self, quant_ckt, quant_embed):
        """bits/param, bits/param+overhead, total bpp
        (train_nerv_all.py:579-617)."""
        vals = []
        tmin_scale_len = 0
        if quant_embed is not None:
            vals.append(quant_embed["quant"].ravel())
            tmin_scale_len += (np.asarray(quant_embed["min"]).size
                               + np.asarray(quant_embed["scale"]).size)
        for q in quant_ckt.values():
            vals.append(q["quant"].ravel())
            tmin_scale_len += (np.asarray(q["min"]).size
                               + np.asarray(q["scale"]).size)
        all_vals = np.concatenate(vals)
        unique, counts = np.unique(all_vals, return_counts=True)
        table = {int(u): int(c) for u, c in zip(unique, counts)}
        lengths = huffman_code_lengths(table)
        total_bits = sum(table[s] * lengths[s] for s in table)
        self.bits_per_param = total_bits / len(all_vals)
        total_bits += tmin_scale_len * 16  # fp16 min/scale overhead
        self.full_bits_per_param = total_bits / len(all_vals)
        self.total_bpp = total_bits / self.video.final_size / self.video.n
        self.logger.print(
            f"After quantization and encoding: bits per parameter "
            f"{self.full_bits_per_param:.2f}, bits per pixel "
            f"{self.total_bpp:.4f}")

    # ------------------------------------------------------------------ #
    def dump_csv(self, filename: str):
        cfg = self.cfg
        row = {
            "Vid": cfg.vid, "CurEpoch": getattr(self, "cur_epoch", 0),
            "Time": round(getattr(self, "train_time", 0.0), 1),
            "FPS": round(self.fps, 2), "Split": cfg.data_split,
            "Embed": cfg.embed, "Crop": cfg.crop_list,
            "Lr_type": cfg.lr_type, "LR (E-3)": cfg.lr * 1e3,
            "Batch": cfg.batchSize,
            "Size (M)": f"{round(self.encoder_param, 2)}_"
                        f"{round(self.decoder_param, 2)}_"
                        f"{round(self.total_param, 2)}",
            "ModelSize": cfg.modelsize,
            "Epoch": cfg.epochs, "Loss": cfg.loss, "Act": cfg.act,
            "Norm": cfg.norm, "FC": cfg.fc_hw, "Reduce": cfg.reduce,
            "ENC_type": cfg.conv_type[0],
            "ENC_strds": ",".join(map(str, cfg.enc_strds)),
            "KS": cfg.ks, "enc_dim": cfg.enc_dim,
            "DEC": cfg.conv_type[1],
            "DEC_strds": ",".join(map(str, cfg.dec_strds)),
            "lower_width": cfg.lower_width,
            "Quant": f"quant_M{cfg.quant_model_bit}_E{cfg.quant_embed_bit}",
            "bits/param": round(self.bits_per_param, 4),
            "bits/param w/ overhead": round(self.full_bits_per_param, 4),
            "bits/pixel": round(self.total_bpp, 6),
            f"PSNR_list_{cfg.eval_freq}": ",".join(
                f"{v:.2f}" for v in self.psnr_history),
        }
        row.update({f"best_{k}": round(v, 4)
                    for k, v in self.best_metrics.items()})
        self.logger.dump_csv(row, filename)
