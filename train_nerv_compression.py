#!/usr/bin/env python
"""Compression entry point: CEM quant-aware finetune + ANS coding.

CLI-compatible with /root/reference/train_nerv_compression.py:30-159
(the regression flag set plus the quantisation flags)."""

from __future__ import annotations

from train_nerv_all import args_to_config, build_parser


def main():
    p = build_parser()
    # compression-specific flags (train_nerv_compression.py:89-104)
    p.add_argument('--quant_bias_bit', type=int, default=8)
    p.add_argument('--per_channel_w', action='store_true', default=False)
    p.add_argument('--per_channel_b', action='store_true', default=False)
    p.add_argument('--per_channel_e', action='store_true', default=False)
    p.add_argument('--quantizer_w', type=str, default='lsq')
    p.add_argument('--quantizer_b', type=str, default='lsq')
    p.add_argument('--quantizer_e', type=str, default='lsqv2')
    p.add_argument('--embed_entropy', action='store_true', default=False)
    p.add_argument('--target_bit', type=float, default=5)
    p.add_argument('--lambda_rate', default=0.2, type=float)
    args = p.parse_args()

    cfg = args_to_config(args)
    cfg = cfg.replace(
        quant=True, quant_bias_bit=args.quant_bias_bit,
        per_channel_w=args.per_channel_w, per_channel_b=args.per_channel_b,
        per_channel_e=args.per_channel_e, quantizer_w=args.quantizer_w,
        quantizer_b=args.quantizer_b, quantizer_e=args.quantizer_e,
        embed_entropy=args.embed_entropy, target_bit=args.target_bit,
        lambda_rate=args.lambda_rate)

    from boosting_nerv_tpu.training.compress_trainer import CompressionTrainer

    trainer = CompressionTrainer(cfg)
    trainer.logger.print(
        f"model {cfg.model} fc_dim {cfg.fc_dim} frames {trainer.video.n} "
        f"target_bpp {trainer.target_bpp:.6f} mesh dp={cfg.dp} sp={cfg.sp}")

    if cfg.eval_only:
        trainer.maybe_resume()
        trainer.init_qparams()
        results = trainer.evaluate_cem(coding=True)
        for k, v in results.items():
            trainer.best_metrics[k] = max(trainer.best_metrics[k], v)
        trainer.cur_epoch = cfg.epochs
        trainer.train_time = 0.0
        trainer.dump_csv('eval.csv')
        import os

        with open(os.path.join(cfg.outf, 'eval.txt'), 'a') as f:
            f.write(' | '.join(f'best_{k}: {v:.4f}'
                               for k, v in trainer.best_metrics.items())
                    + '\n\n')
        return

    trainer.train()


if __name__ == '__main__':
    main()
