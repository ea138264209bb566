"""Run logging: rank0.txt append-log, args.yaml snapshot, CSV dump, optional
TensorBoard scalars — the reference's observability surface
(/root/reference/train_nerv_all.py:233-249, 357-373, 434-448)."""

from __future__ import annotations

import dataclasses
import os
from datetime import datetime
from typing import Dict


class RunLogger:
    def __init__(self, outf: str, enable_tb: bool = True):
        self.outf = outf
        os.makedirs(outf, exist_ok=True)
        self.log_path = os.path.join(outf, "rank0.txt")
        self.tb = None
        if enable_tb:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(outf, "tensorboard"))
            except Exception:
                self.tb = None

    def dump_config(self, cfg):
        import yaml

        d = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else dict(cfg)
        with open(os.path.join(self.outf, "args.yaml"), "w") as f:
            yaml.safe_dump(d, f, default_flow_style=False)

    def print(self, msg: str):
        stamp = datetime.now().strftime("%Y/%m/%d %H:%M:%S")
        line = f"[{stamp}] {msg}"
        print(line, flush=True)
        with open(self.log_path, "a") as f:
            f.write(line + "\n")

    def scalar(self, tag: str, value: float, step: int):
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)

    def dump_csv(self, row: Dict, filename: str):
        import pandas as pd

        path = os.path.join(self.outf, filename)
        pd.DataFrame(row, index=[0]).to_csv(path)
        print(f"results dumped to {path}", flush=True)
