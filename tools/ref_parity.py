"""Small-scale trainer parity: run the UNMODIFIED reference repo (torch,
CPU, with tools/ref_shims providing its uninstalled deps) and this repo's
trainer on the SAME synthetic clip and config, then compare per-epoch PSNR.

This is the strongest parity evidence available in this environment: no
real video (bunny/UVG) ships here and there is no egress, so the paper's
plots cannot be reproduced directly; instead the reference CODE is executed
as the golden model.

Usage (from /root/repo):
  python tools/ref_parity.py --workdir /tmp/parity --epochs 8
Writes a side-by-side table and exits nonzero if |dPSNR| > tol at the
final epoch.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SHIMS = os.path.join(REPO, "tools", "ref_shims")


def run(cmd, cwd, env_extra, log):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["CUDA_VISIBLE_DEVICES"] = ""
    env.update(env_extra)
    with open(log, "w") as f:
        p = subprocess.run(cmd, cwd=cwd, env=env, stdout=f,
                           stderr=subprocess.STDOUT)
    return p.returncode


def parse_psnrs(path, pattern):
    out = {}
    with open(path) as f:
        for line in f:
            m = re.search(pattern, line)
            if m:
                out[int(m.group(1))] = float(m.group(2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/parity")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    # MS-SSIM (5 scales, 11-tap window) needs min(h, w) >= 161; both
    # trainers evaluate it, so the clip must be at least 176 tall
    ap.add_argument("--crop", default="176_320")
    ap.add_argument("--loss", default="L2")
    ap.add_argument("--modelsize", type=float, default=0.15)
    ap.add_argument("--tol", type=float, default=0.1,
                    help="max |dPSNR| dB at final epoch")
    a = ap.parse_args()

    os.makedirs(a.workdir, exist_ok=True)
    data = os.path.join(a.workdir, "video")
    if not os.path.isdir(data) or len(os.listdir(data)) != a.frames:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from make_synth_video import write_video

        h, w = (int(v) for v in a.crop.split("_"))
        write_video(data, a.frames, h, w)
        print(f"wrote {a.frames} frames to {data}")

    common = [
        "--data_path", data, "--vid", "parity", "--crop_list", a.crop,
        "--model", "HNeRV_Boost", "--embed", "pe_1.25_40",
        "--enc_strds", "4", "2", "--enc_dim", "16_8",
        "--dec_strds", "4", "2", "--dec_blks", "1", "1",
        "--ks", "0_1_5", "--reduce", "1.2", "--lower_width", "6",
        "--modelsize", str(a.modelsize), "--conv_type", "convnext",
        "pshuffel_3x3", "--act", "sin", "--norm", "none",
        "--sft_block", "res_sft", "--ch_t", "16",
        "--loss", a.loss, "-e", str(a.epochs), "--eval_freq", "1",
        "-b", "1", "--lr", "0.003", "--manualSeed", "1",
        # the reference's un-cased optim default crashes (SURVEY quirk);
        # both CLIs accept the canonical spelling
        "--optim_type", "Adan",
    ]

    ref_out = os.path.join(a.workdir, "ref_out")
    ref_log = os.path.join(a.workdir, "ref.log")
    rc = run([sys.executable, "train_nerv_all.py", "--outf", ref_out]
             + common + ["--eval_fps"],
             cwd=REF, env_extra={"PYTHONPATH": SHIMS}, log=ref_log)
    print(f"reference rc={rc} (log {ref_log})")

    our_out = os.path.join(a.workdir, "our_out")
    our_log = os.path.join(a.workdir, "our.log")
    rc2 = run([sys.executable, "train_nerv_all.py", "--outf", our_out,
               "--not_resume"] + common,
              cwd=REPO, env_extra={}, log=our_log)
    print(f"ours rc={rc2} (log {our_log})")

    # both emit "(v|val)?...Epoch[N] ... PSNR: X" style eval lines in
    # rank0.txt; parse the broadest pattern that pins epoch+psnr
    pat = r"[Ee]poch\D*(\d+).*?(?:v_PSNR|val_psnr|PSNR)\D*([0-9]+\.[0-9]+)"
    ref_txt = _first_log(ref_out)
    our_txt = _first_log(our_out)
    ref_psnr = parse_psnrs(ref_txt, pat) if ref_txt else {}
    our_psnr = parse_psnrs(our_txt, pat) if our_txt else {}
    print(f"{'epoch':>6} {'reference':>10} {'ours':>10} {'diff':>8}")
    keys = sorted(set(ref_psnr) & set(our_psnr))
    for k in keys:
        print(f"{k:>6} {ref_psnr[k]:>10.3f} {our_psnr[k]:>10.3f} "
              f"{our_psnr[k] - ref_psnr[k]:>+8.3f}")
    if not keys:
        print("NO OVERLAPPING EVAL EPOCHS PARSED — check logs")
        sys.exit(2)
    d = abs(our_psnr[keys[-1]] - ref_psnr[keys[-1]])
    print(f"final |dPSNR| = {d:.3f} dB (tol {a.tol})")
    sys.exit(0 if d <= a.tol else 1)


def _first_log(outdir):
    for root, _dirs, files in os.walk(outdir):
        for f in files:
            if f == "rank0.txt":
                return os.path.join(root, f)
    return None


if __name__ == "__main__":
    main()
