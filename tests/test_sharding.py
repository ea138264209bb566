"""Multi-device mesh tests on the 8-device virtual CPU backend: data-parallel
training equivalence and spatial decode sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_nerv_tpu.parallel.mesh import make_mesh_plan


class TestMeshPlan:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_mesh_shapes(self):
        plan = make_mesh_plan(4, 2)
        assert plan.mesh.shape == {"data": 4, "spatial": 2}
        with pytest.raises(ValueError):
            make_mesh_plan(16, 1)

    def test_batch_sharding_layout(self):
        plan = make_mesh_plan(4, 2)
        x = jnp.zeros((8, 16, 16, 3))
        xs = plan.shard_batch(x, spatial_axis=1)
        assert xs.sharding.spec == jax.sharding.PartitionSpec(
            "data", "spatial", None, None)


class TestDataParallelEquivalence:
    def test_dp_train_step_matches_single_device(self, tmp_path):
        """A dp=4 sharded train step must produce the same params as dp=1
        (XLA's psum over the mesh == serial gradient accumulation)."""
        import os

        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.data import VideoData, synthetic_video
        from boosting_nerv_tpu.training.trainer import RegressionTrainer
        from boosting_nerv_tpu.utils.logger import RunLogger

        frames = synthetic_video(8, 8, 16)
        base = dict(
            model="NeRV_Boost", embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 1], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4",
            epochs=1, batchSize=8, lr=1e-3, loss="L2", eval_freq=1000,
            not_resume=True)

        results = {}
        for dp in (1, 4):
            cfg = BoostConfig(**base, dp=dp,
                              outf=os.path.join(str(tmp_path), f"dp{dp}"))
            video = VideoData(frames)
            tr = RegressionTrainer(cfg, video=video,
                                   logger=RunLogger(cfg.outf, enable_tb=False))
            batch = video.get_batch(list(range(8)))
            img, t = tr._device_batch(batch)
            params, _, loss, _ = tr.train_step(
                tr.params, tr.opt_state, img, t, jnp.float32(1e-3))
            results[dp] = (jax.device_get(params), float(loss))

        np.testing.assert_allclose(results[1][1], results[4][1], rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(results[1][0]),
                        jax.tree_util.tree_leaves(results[4][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_planar_forward_dp_sp_grads_match_unsharded(self, tmp_path):
        """The subpixel-planar training forward under a dp=2 x sp=2 mesh:
        raw gradients must match the unsharded planar step (GSPMD halo
        exchange on the 2x2 coarse-grid convs + psum over 'data').  Tiny
        shapes — its compile at flagship shapes is too slow for the
        dryrun gate (tools/planar_compile_diag.py)."""
        import os

        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.data import VideoData, synthetic_video
        from boosting_nerv_tpu.ops.losses import loss_fn
        from boosting_nerv_tpu.training.trainer import RegressionTrainer
        from boosting_nerv_tpu.utils.logger import RunLogger

        frames = synthetic_video(4, 16, 16)
        base = dict(
            model="NeRV_Boost", embed="pe_1.25_20", fc_hw="4_4", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4",
            epochs=1, batchSize=4, lr=1e-3, loss="L2", eval_freq=1000,
            not_resume=True, planar_train=8)

        grads = {}
        for dp, sp in ((1, 1), (2, 2)):
            cfg = BoostConfig(**base, dp=dp, sp=sp,
                              outf=os.path.join(str(tmp_path),
                                                f"pl{dp}{sp}"))
            video = VideoData(frames)
            tr = RegressionTrainer(cfg, video=video,
                                   logger=RunLogger(cfg.outf,
                                                    enable_tb=False))
            assert tr._planar_fwd is not None
            batch = video.get_batch(list(range(4)))
            img, t = tr._device_batch(batch)
            g = jax.jit(jax.grad(
                lambda p: loss_fn(tr._forward(p, img, t), img,
                                  cfg.loss)))(tr.params)
            grads[(dp, sp)] = jax.device_get(g)

        for a, b in zip(jax.tree_util.tree_leaves(grads[(1, 1)]),
                        jax.tree_util.tree_leaves(grads[(2, 2)])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestSpatialSharding:
    def test_decode_with_spatial_sharding_matches(self):
        """H-axis sharded decode == unsharded decode (halo exchange via XLA)."""
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = BoostConfig(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 1], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4")
        model = build_model(cfg)
        img = jnp.asarray(np.random.default_rng(0).uniform(
            size=(2, 16, 16, 3)).astype(np.float32))
        t = jnp.array([0.3, 0.7])
        params = model.init(jax.random.key(0), img, t)
        embed = model.apply(params, img, method="encode")

        ref = model.apply(params, embed, t, method="decode")

        plan = make_mesh_plan(2, 4)
        e_sharded = jax.device_put(
            embed, NamedSharding(plan.mesh, P("data", "spatial", None, None)))
        t_sharded = jax.device_put(t, NamedSharding(plan.mesh, P("data")))
        p_repl = plan.replicate(params)
        out = jax.jit(lambda p, e, tt: model.apply(p, e, tt, method="decode")
                      )(p_repl, e_sharded, t_sharded)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestCEMDataParallel:
    def test_cem_step_dp_matches_single_device(self, tmp_path):
        """One dp=4 sharded CEM step (fake-quant + rate term + Adan over
        the qp pytree) must match dp=1: the entropy-model noise keys fold
        over PARAMS, not frames, so the step is dp-invariant up to psum
        reduction order (VERDICT r4 task 9)."""
        import os

        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.data import VideoData, synthetic_video
        from boosting_nerv_tpu.training.compress_trainer import (
            CompressionTrainer)
        from boosting_nerv_tpu.utils.logger import RunLogger

        frames = synthetic_video(8, 8, 16)
        base = dict(
            model="NeRV_Boost", embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 1], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4", enc_blks=1,
            epochs=1, batchSize=8, lr=5e-4, loss="L2", eval_freq=1000,
            optim_type="Adan", lr_type="cosine_0_1_0.1", not_resume=True,
            quant=True, quant_model_bit=8, quant_bias_bit=8,
            quantizer_w="scale", quantizer_b="scale",
            quantizer_e="scalebeta", lambda_rate=0.05, target_bit=4)

        results = {}
        for dp in (1, 4):
            cfg = BoostConfig(**base, dp=dp,
                              outf=os.path.join(str(tmp_path), f"dp{dp}"))
            video = VideoData(frames)
            ct = CompressionTrainer(cfg, video=video,
                                    logger=RunLogger(cfg.outf,
                                                     enable_tb=False))
            ct.init_qparams()
            batch = video.get_batch(list(range(8)))
            img, t = ct._device_batch(batch)
            key = jax.random.key(123)
            state, _, loss, _, bpp = ct.cem_step(
                ct.state, ct.opt_state, img, t, jnp.float32(5e-4), key,
                jnp.float32(ct.target_bpp))
            results[dp] = (jax.device_get(state), float(loss), float(bpp))

        np.testing.assert_allclose(results[1][1], results[4][1], rtol=1e-5)
        np.testing.assert_allclose(results[1][2], results[4][2], rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(results[1][0]),
                        jax.tree_util.tree_leaves(results[4][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestTrainerSpatialSharding:
    def test_sp_flag_shards_real_training(self, tmp_path):
        """--sp 2 must change the sharding of the actual trainer batch AND
        keep the train step numerically equal to dp-only (VERDICT r1 #7)."""
        import os

        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.data import VideoData, synthetic_video
        from boosting_nerv_tpu.training.trainer import RegressionTrainer
        from boosting_nerv_tpu.utils.logger import RunLogger

        frames = synthetic_video(4, 8, 16)
        base = dict(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 1], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4", enc_blks=1,
            epochs=1, batchSize=4, lr=1e-3, loss="L2", eval_freq=1000,
            not_resume=True)

        results = {}
        for tag, dp, sp in (("dp", 4, 1), ("dpsp", 2, 2)):
            cfg = BoostConfig(**base, dp=dp, sp=sp,
                              outf=os.path.join(str(tmp_path), tag))
            video = VideoData(frames)
            tr = RegressionTrainer(cfg, video=video,
                                   logger=RunLogger(cfg.outf, enable_tb=False))
            batch = video.get_batch(list(range(4)))
            img, t = tr._device_batch(batch)
            if sp > 1:
                spec = img.sharding.spec
                assert spec[0] == "data" and spec[1] == "spatial", spec
            # raw gradients (before the Adan update, which amplifies
            # reduction-order noise) must agree per-tensor across meshes
            from boosting_nerv_tpu.ops.losses import loss_fn as _lf
            grads = jax.jit(jax.grad(
                lambda p: _lf(tr._forward(p, img, t), img, cfg.loss)))(
                    tr.params)
            results[tag + "_grads"] = jax.tree_util.tree_map(
                lambda g: np.asarray(g, np.float64), grads)
            params, opt_state, loss1, _ = tr.train_step(
                tr.params, tr.opt_state, img, t, jnp.float32(1e-3))
            params, opt_state, loss2, _ = tr.train_step(
                params, opt_state, img, t, jnp.float32(1e-3))
            fps = tr.measure_fps(params, reps=2)
            assert fps > 0
            results[tag] = (float(loss1), float(loss2))

        # dp=4 and dp=2xsp=2 sum gradients (and the spatially-split convs'
        # partials) in different orders, and Adan turns near-zero-gradient
        # noise into full-size update flips — so per-param comparison is
        # meaningless. The LOSS TRAJECTORY is the equivalence check: step-1
        # losses are computed from identical params (tight), step-2 losses
        # reflect the first update through the whole model.
        np.testing.assert_allclose(results["dp"][0], results["dpsp"][0],
                                   rtol=1e-5)
        np.testing.assert_allclose(results["dp"][1], results["dpsp"][1],
                                   rtol=1e-3)
        ga = jax.tree_util.tree_leaves(results["dp_grads"])
        gb = jax.tree_util.tree_leaves(results["dpsp_grads"])
        for a, b in zip(ga, gb):
            scale = max(float(np.abs(a).max()), 1e-12)
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-5)


class TestDryrunEntry:
    def test_graft_entry_dryrun(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
