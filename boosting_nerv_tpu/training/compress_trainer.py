"""Compression trainer: quant-aware finetune with Consistent Entropy
Minimisation + real ANS coding at eval.

Orchestration parity with /root/reference/train_nerv_compression.py:164-585:
 - load a regression checkpoint, init quantiser scales from the loaded
   weight ranges (model.init_data, :333);
 - EVERY step fake-quantises all non-encoder weights/biases through the
   learned quantisers, runs the forward with the dequantised weights, and
   adds the noise-relaxed global-Gaussian rate term while
   bpp/N > target_bpp (:354-367);
 - --embed_entropy adds the per-frame embedding bitrate (:356-358);
 - eval (coding=True) emits real rANS bitstreams per tensor plus 32-bit
   meta (mean/std + transform params) -> total_bpp vs estimate_bpp
   (:456-585).

TPU-native design: the quantiser parameters are a second pytree trained by
the SAME jitted Adan step as the model (the whole
quantise -> forward -> loss+rate -> backward chain is one XLA program);
rANS runs host-side on fetched integer codes.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.traverse_util import flatten_dict, unflatten_dict

from ..config import BoostConfig
from ..data.video import VideoData
from ..ops.entropy import gaussian_bits, rate_bits
from ..ops.losses import loss_fn
from ..ops.metrics import psnr_per_frame
from ..ops.quantize import get_quantizer
from ..utils.logger import RunLogger
from .checkpoint import (load_checkpoint, save_checkpoint,
                         save_checkpoint_async, tree_restore,
                         wait_pending_saves)
from .schedules import lr_multiplier
from .trainer import METRIC_NAMES, RegressionTrainer


def _is_quantizable(path: Tuple) -> bool:
    if any("encoder" in str(p) for p in path):
        return False
    return str(path[-1]) in ("kernel", "bias")


class CompressionTrainer(RegressionTrainer):
    """Extends the regression trainer with the CEM quantisation state."""

    def __init__(self, cfg: BoostConfig, video: Optional[VideoData] = None,
                 logger: Optional[RunLogger] = None):
        super().__init__(cfg, video=video, logger=logger)
        cfg = self.cfg
        self.w_quant = get_quantizer(cfg.quantizer_w)
        self.b_quant = get_quantizer(cfg.quantizer_b)
        self.e_quant = get_quantizer(cfg.quantizer_e)
        self.qparams = None
        self.embed_qp = None
        self.estimate_bpp = 0.0
        self._resume_ck = None  # full CEM checkpoint picked up by init_qparams

        # target_bpp from the decoder+embedding budget
        # (train_nerv_compression.py:253)
        enc, dec = flatten_dict(jax.device_get(self.params)), None
        decoder_param = sum(
            int(np.prod(v.shape)) for k, v in enc.items()
            if not any("encoder" in str(p) for p in k)) / 1e6
        total_param = decoder_param + getattr(cfg, "embed_param", 0.0) / 1e6
        self.total_param = total_param
        self.target_bpp = (cfg.target_bit * total_param * 1e6
                           / self.video.final_size / self.video.n)

    # ------------------------------------------------------------------ #
    def init_qparams(self):
        """Quantiser state from the (loaded) weight ranges — the reference's
        init_data pass (model_hnerv.py:317-322)."""
        cfg = self.cfg
        flat = flatten_dict(jax.device_get(self.params))
        qp = {}
        for k, v in flat.items():
            if not _is_quantizable(k):
                continue
            v = jnp.asarray(v)
            if str(k[-1]) == "kernel":
                qp["/".join(map(str, k))] = self.w_quant.init_params(
                    v, cfg.quant_model_bit, signed=True,
                    per_channel=cfg.per_channel_w)
            else:
                qp["/".join(map(str, k))] = self.b_quant.init_params(
                    v, cfg.quant_bias_bit, signed=True,
                    per_channel=cfg.per_channel_b)
        self.qparams = qp

        # The reference attaches the embed quantizer whenever --quant for the
        # HNeRV family and quantises the embedding on EVERY forward
        # (model_hnerv.py:229-234); --embed_entropy only adds the rate term.
        if cfg.is_hnerv_family and self.encode_step is not None:
            batch = self.video.get_batch([0])
            embed = self.encode_step(self.params, jnp.asarray(batch["img"]))
            self.embed_qp = self.e_quant.init_params(
                embed, cfg.quant_embed_bit, signed=False,
                per_channel=cfg.per_channel_e)

        # resumed CEM run: learned quantiser state overrides the re-derived
        # ranges (train_nerv_compression.py:427-433 resume semantics)
        if self._resume_ck is not None:
            saved = self._resume_ck["params"]
            if isinstance(saved, dict) and "qp" in saved:
                self.qparams = tree_restore(self.qparams, saved["qp"])
                if (self.embed_qp is not None
                        and saved.get("embed_qp") is not None):
                    self.embed_qp = tree_restore(self.embed_qp,
                                                 saved["embed_qp"])

        self._build_cem_step()

    # ------------------------------------------------------------------ #
    def _dequant_params(self, params, qparams, key, training):
        """Fake-quantise all tagged leaves; returns (dequant params, total
        estimated bits over weights+biases)."""
        cfg = self.cfg
        flat = flatten_dict(params)
        new_flat = {}
        total_bits = 0.0
        for i, (k, v) in enumerate(sorted(flat.items(),
                                          key=lambda kv: "/".join(map(str, kv[0])))):
            ks = "/".join(map(str, k))
            if ks in qparams:
                if str(k[-1]) == "kernel":
                    Q, bits, pc = (self.w_quant, cfg.quant_model_bit,
                                   cfg.per_channel_w)
                else:
                    Q, bits, pc = (self.b_quant, cfg.quant_bias_bit,
                                   cfg.per_channel_b)
                code, quant, dequant = Q.apply(v, qparams[ks], bits,
                                               signed=True, per_channel=pc)
                sub = jax.random.fold_in(key, i)
                r = rate_bits(code, sub, training)
                total_bits = total_bits + r["bitrate"]
                new_flat[k] = dequant
            else:
                new_flat[k] = v
        return unflatten_dict(new_flat), total_bits

    def _build_cem_step(self):
        cfg = self.cfg
        mask = self.inpaint_mask
        lam = cfg.lambda_rate
        n_frames = self.video.n
        final_size = self.video.final_size

        # target_bpp rides as a traced scalar (not a baked constant) so the
        # three-point --target_bit sweep shares ONE compiled step via the
        # persistent XLA cache (1-core host: each recompile costs ~10 min).
        def step(state, opt_state, img, t, lr, key, target_bpp):
            def lossf(state):
                params, qparams, embed_qp = (state["model"], state["qp"],
                                             state.get("embed_qp"))
                dq_params, wbits = self._dequant_params(
                    params, qparams, key, training=True)
                img_in = jnp.clip(img * mask, 0, 1) if mask is not None else img

                if embed_qp is not None:
                    embed = self.model.apply(dq_params, img_in, method="encode")
                    code_e, quant_e, dequant_e = self.e_quant.apply(
                        embed, embed_qp, cfg.quant_embed_bit, signed=False,
                        per_channel=cfg.per_channel_e)
                    if cfg.embed_entropy:
                        r_e = rate_bits(code_e,
                                        jax.random.fold_in(key, 10_000),
                                        training=True)
                        bit_embed = r_e["bitrate"] * n_frames / img.shape[0]
                    else:
                        bit_embed = 0.0
                    if cfg.model == "HNeRV_Boost":
                        if self._planar_dec is not None:
                            out = self._planar_dec(dq_params, dequant_e, t)
                        else:
                            out = self.model.apply(dq_params, dequant_e, t,
                                                   method="decode")
                    else:
                        out = self.model.apply(dq_params, dequant_e,
                                               method="decode")
                    bpp = (wbits + bit_embed) / final_size
                else:
                    out = self._forward(dq_params, img_in, t)
                    bpp = wbits / final_size

                if mask is not None:
                    out_loss = loss_fn(out * mask, img * mask, cfg.loss)
                else:
                    out_loss = loss_fn(out, img, cfg.loss)
                rate_pen = jnp.where(bpp / n_frames > target_bpp,
                                     lam * bpp, 0.0)
                return out_loss + rate_pen, (out, bpp)

            (l, (out, bpp)), grads = jax.value_and_grad(
                lossf, has_aux=True)(state)
            updates, opt_state = self.opt.update(grads, opt_state, state, lr=lr)
            state = optax.apply_updates(state, updates)
            return state, opt_state, l, psnr_per_frame(out, img), bpp

        self.cem_step = jax.jit(step, donate_argnums=(0, 1))

        def step_idx(state, opt_state, frames, idx, t, lr, key, target_bpp):
            img = frames[idx].astype(jnp.float32) / 255.0
            return step(state, opt_state, img, t, lr, key, target_bpp)

        self.cem_step_idx = jax.jit(step_idx, donate_argnums=(0, 1))

        state = {"model": self.params, "qp": self.qparams}
        if self.embed_qp is not None:
            state["embed_qp"] = self.embed_qp
        self.state = state
        self.opt_state = self.opt.init(state)
        if (self._resume_ck is not None
                and self._resume_ck.get("opt_state") is not None):
            try:
                self.opt_state = tree_restore(self.opt_state,
                                              self._resume_ck["opt_state"])
            except ValueError as e:
                self.logger.print(f"=> opt_state not restored ({e}); "
                                  "reinitialised")

    # ------------------------------------------------------------------ #
    def train(self):
        cfg = self.cfg
        self.logger.dump_config(self.cfg0)
        self.maybe_resume()          # load regression weights / auto-resume
        self.init_qparams()          # after weights are in place
        n_train_batches = max(len(self.train_ind) // cfg.batchSize, 1)
        t_start = time.time()
        key = jax.random.key(cfg.manualSeed + 7)

        for epoch in range(self.start_epoch, cfg.epochs):
            psnr_accum = []
            bpp_last = 0.0
            bpp_dev = None
            batches = self.video.epoch_batches(
                self.train_ind, cfg.batchSize, shuffle=True,
                seed=cfg.manualSeed + epoch)
            for i, batch in enumerate(batches):
                if i > 10 and cfg.debug:
                    break
                progress = (epoch + i / n_train_batches) / cfg.epochs
                lr = cfg.lr * lr_multiplier(cfg.lr_type, progress,
                                            cur_iter=i, epochs=cfg.epochs,
                                            full_data_length=self.video.n,
                                            cur_epoch=epoch)
                key, sub = jax.random.split(key)
                if self._resident:
                    self.state, self.opt_state, loss, psnr, bpp = \
                        self.cem_step_idx(
                            self.state, self.opt_state, self.frames_dev,
                            jnp.asarray(batch["idx"]),
                            jnp.asarray(batch["norm_idx"]),
                            jnp.float32(lr), sub,
                            jnp.float32(self.target_bpp))
                else:
                    img, t = self._device_batch(batch)
                    self.state, self.opt_state, loss, psnr, bpp = \
                        self.cem_step(self.state, self.opt_state, img, t,
                                      jnp.float32(lr), sub,
                                      jnp.float32(self.target_bpp))
                psnr_accum.append(psnr)
                bpp_dev = bpp
                if i % cfg.print_freq == 0 or i == n_train_batches - 1:
                    bpp_last = float(bpp_dev) / self.video.n
                    cur = float(jnp.concatenate(psnr_accum).mean())
                    self.logger.print(
                        f"Epoch[{epoch + 1}/{cfg.epochs}], Step "
                        f"[{i + 1}/{n_train_batches}], lr:{lr:.2e} "
                        f"pred_PSNR: {cur:.2f}, loss:{float(loss):.4f}, "
                        f"bpp:{bpp_last:.6f}")
            if bpp_dev is not None:
                # keep the logged bpp fresh even when the epoch ends off a
                # print step (e.g. the debug inner-loop break)
                bpp_last = float(bpp_dev) / self.video.n

            self.params = self.state["model"]
            last = cfg.epochs - epoch
            is_best = False
            do_eval = (epoch + 1) % cfg.eval_freq == 0 or last in (1, 3, 5)
            if os.environ.get("BNT_CEM_EVAL_LAST_ONLY") and last != 1:
                # sweep mode: each non-final eval costs minutes (132-frame
                # decode + metrics on the 1-core host); only the final
                # coding=True eval produces the real-ANS row the sweep
                # needs.  Reference cadence (train_nerv_compression.py:577)
                # stays the default.
                do_eval = False
            if do_eval:
                results = self.evaluate_cem(coding=(last == 1))
                msg = f"Eval at epoch {epoch + 1}: "
                for k in METRIC_NAMES:
                    v = results[k]
                    if k == "quant_seen_psnr":
                        is_best = v >= self.best_metrics[k]
                        self.psnr_history.append(v)
                    self.best_metrics[k] = max(self.best_metrics[k], v)
                    msg += f"{k}: {v:.4f} | "
                self.logger.print(msg)

            save_checkpoint_async(
                os.path.join(cfg.outf, "model_latest.ckpt"),
                epoch + 1, self.state, self.opt_state)
            if is_best:
                # best-metric checkpoint (train_nerv_compression.py:431-433)
                save_checkpoint(os.path.join(cfg.outf, "model_best.ckpt"),
                                epoch + 1, self.state, self.opt_state)
            if (epoch + 1) % cfg.epochs == 0:
                save_checkpoint(os.path.join(cfg.outf, f"epoch{epoch + 1}.ckpt"),
                                epoch + 1, self.state, self.opt_state)

        wait_pending_saves()
        if cfg.epochs > self.start_epoch:
            # async saves may drop epochs; the final CEM state must land
            save_checkpoint(os.path.join(cfg.outf, "model_latest.ckpt"),
                            cfg.epochs, self.state, self.opt_state)
        self.train_time = time.time() - t_start
        self.cur_epoch = cfg.epochs
        self.dump_csv(f"epoch{cfg.epochs}.csv")
        self.logger.print(f"Training complete in: {self.train_time:.1f}s")
        return self.best_metrics

    # ------------------------------------------------------------------ #
    def evaluate_cem(self, coding: bool = False) -> Dict[str, float]:
        """Eval with the LEARNED quantisers (slots quant_*); when coding,
        also compute real ANS bpp + 32-bit meta overhead
        (train_nerv_compression.py:456-585)."""
        cfg = self.cfg
        state = self.state
        key = jax.random.key(0)
        dq_params, _ = jax.jit(
            lambda p, q: self._dequant_params(p, q, jax.random.key(0), False)
        )(state["model"], state["qp"])

        # host-side integer codes for coding
        est_bits = 0.0
        real_bits = 0
        meta_bits = 0
        if coding:
            flat = flatten_dict(jax.device_get(state["model"]))
            from ..compress.rans import gaussian_ans_bits

            for k, v in sorted(flat.items(),
                               key=lambda kv: "/".join(map(str, kv[0]))):
                ks = "/".join(map(str, k))
                if ks not in state["qp"]:
                    continue
                if str(k[-1]) == "kernel":
                    Q, bits, pc = (self.w_quant, cfg.quant_model_bit,
                                   cfg.per_channel_w)
                else:
                    Q, bits, pc = (self.b_quant, cfg.quant_bias_bit,
                                   cfg.per_channel_b)
                qp = jax.device_get(state["qp"][ks])
                code, quant, _ = Q.apply(jnp.asarray(v), qp, bits,
                                         signed=True, per_channel=pc)
                quant_i = np.asarray(quant).astype(np.int32)
                mean = float(np.asarray(code).mean())
                std = float(np.asarray(code).std(ddof=1)) if code.size > 1 else 1e-5
                est = float(np.sum(np.asarray(gaussian_bits(
                    jnp.asarray(quant_i, jnp.float32), mean, std))))
                est_bits += est
                real_bits += gaussian_ans_bits(quant_i, mean, std)
                meta_bits += 2 * 32  # mean/std
                meta_bits += sum(int(np.asarray(pv).size)
                                 for pv in qp.values()) * 32

        # metric pass with dequantised weights (+ embedding path)
        slots = {k: [] for k in METRIC_NAMES}
        for bi, batch in enumerate(self.video.epoch_batches(
                range(self.video.n), cfg.batchSize, False, 0, drop_last=False)):
            if bi > 10 and cfg.debug:
                break
            img = self._batch_img(batch)
            t = jnp.asarray(batch["norm_idx"])
            idx = batch["idx"]

            if state.get("embed_qp") is not None:
                embed = self.model.apply(dq_params, img, method="encode")
                code_e, quant_e, dequant_e = self.e_quant.apply(
                    embed, jax.device_get(state["embed_qp"]),
                    cfg.quant_embed_bit, signed=False,
                    per_channel=cfg.per_channel_e)
                # embedding bits enter the bitstream accounting only under
                # --embed_entropy (train_nerv_compression.py:511-517); the
                # embedding is still decoded from its quantised form
                if coding and cfg.embed_entropy:
                    qi = np.asarray(quant_e).astype(np.int32)
                    m = float(np.asarray(code_e).mean())
                    s = float(np.asarray(code_e).std(ddof=1))
                    from ..compress.rans import gaussian_ans_bits

                    est_bits += float(np.sum(np.asarray(gaussian_bits(
                        jnp.asarray(qi, jnp.float32), m, s))))
                    real_bits += gaussian_ans_bits(qi, m, s)
                    meta_bits += 2 * 32
                if cfg.model == "HNeRV_Boost":
                    out = self.model.apply(dq_params, dequant_e, t,
                                           method="decode")
                else:
                    out = self.model.apply(dq_params, dequant_e,
                                           method="decode")
            else:
                img_in = (jnp.clip(img * self.inpaint_mask, 0, 1)
                          if self.inpaint_mask is not None else img)
                out = self._forward(dq_params, img_in, t)

            pv = np.asarray(psnr_per_frame(out, img))
            sv = np.asarray(self._ssim_metric(out, img))
            for b, frame_idx in enumerate(idx):
                seen = int(frame_idx) not in self.val_ind_set
                base = (0 if seen else 2) + 4  # quant_* slots only
                slots[METRIC_NAMES[base]].append(float(pv[b]))
                slots[METRIC_NAMES[base + 1]].append(float(sv[b]))

        if coding:
            if state.get("embed_qp") is not None:
                meta_bits += sum(int(np.asarray(pv).size) for pv in
                                 jax.device_get(state["embed_qp"]).values()) * 32
            total_pixels = self.video.final_size * self.video.n
            self.total_bpp = (real_bits + meta_bits) / total_pixels
            self.estimate_bpp = (est_bits + meta_bits) / total_pixels
            self.logger.print(
                f"Gaussian Entropy Model real bpp: {self.total_bpp:.6f}, "
                f"estimated bpp: {self.estimate_bpp:.6f}, "
                f"target_bpp: {self.target_bpp:.6f}")

        self.fps = self.measure_fps(dq_params,
                                    reps=100 if cfg.eval_fps else 20)
        results = {k: (float(np.mean(v)) if v else 0.0)
                   for k, v in slots.items()}
        self.logger.print("Eval FPS {:.2f}, ".format(self.fps) + " | ".join(
            f"{k}: {v:.4f}" for k, v in results.items()))
        return results

    def maybe_resume(self):
        """Compression resume: --weight warm-starts the model from a
        regression {params} or CEM {state} checkpoint; auto-resume restores
        the FULL CEM state — model + learned quantiser params + opt_state —
        via `_resume_ck`, consumed by init_qparams/_build_cem_step
        (the reference resumes the whole state_dict incl. quantiser modules,
        train_nerv_compression.py:282-305, 427-433)."""
        cfg = self.cfg
        if cfg.weight not in ("None", "", None):
            ck = load_checkpoint(cfg.weight)
            saved = ck["params"]
            if isinstance(saved, dict) and "model" in saved:
                saved = saved["model"]
            self.params = self.mesh.replicate(
                tree_restore(self.params, saved))
            self.logger.print(f"=> loaded checkpoint '{cfg.weight}' "
                              f"(epoch {ck['epoch']})")
        if not cfg.not_resume:
            path = os.path.join(cfg.outf, "model_latest.ckpt")
            if os.path.isfile(path):
                ck = load_checkpoint(path)
                saved = ck["params"]
                if isinstance(saved, dict) and "model" in saved:
                    self.params = self.mesh.replicate(
                        tree_restore(self.params, saved["model"]))
                    self._resume_ck = ck  # qp/embed_qp/opt_state follow
                else:
                    self.params = self.mesh.replicate(
                        tree_restore(self.params, saved))
                self.start_epoch = ck["epoch"]
                self.logger.print(f"=> Auto resume loaded '{path}' "
                                  f"(epoch {ck['epoch']})")
